"""Declared queries for storage-layout operators (partition pruning,
bucketed co-located joins). Each materializes a layout under the
scratch dir, then runs the query whose PLAN the layout improves; the
oracle checks the values are unchanged by the layout (which is the
whole point — layout is a physical concern, never a semantic one).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sensor_data_pipeline_spark.plans.registry import register
from sensor_data_pipeline_spark.sources.tables import load_table
from sensor_data_pipeline_spark.sources.warehouse import bucketed_table, write_partitioned


@register(
    "q71_partition_pruning",
    category="storage",
    oracle="""
SELECT CAST(date_part('year', o_orderdate) AS INT) AS order_year,
       o_orderstatus,
       CAST(count(*) AS BIGINT) AS n,
       sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) / CAST(100.0 AS DOUBLE) AS revenue
FROM orders
WHERE o_orderstatus = 'F'
GROUP BY 1, 2 ORDER BY order_year, o_orderstatus
""",
)
def q71_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write orders hive-partitioned by status, re-read with a
    status predicate: the scan's PartitionFilters prune the other
    status directories before any I/O (at 100 TB: the difference
    between scanning 1/3 of the table and all of it). Values must be
    identical to the unpartitioned oracle."""
    o = load_table(spark, "orders", sf_dir)
    path = write_partitioned(o, "orders_by_status", ["o_orderstatus"])
    pruned = spark.read.parquet(path).filter(F.col("o_orderstatus") == "F")
    return (
        pruned.groupBy(
            F.year("o_orderdate").cast("int").alias("order_year"),
            "o_orderstatus",
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            (F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint")) / 100.0).alias("revenue"),
        )
        .orderBy("order_year", "o_orderstatus")
    )


@register(
    "q72_bucketed_join",
    category="storage",
    oracle="""
SELECT o.o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_lines,
       sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)) / CAST(100.0 AS DOUBLE) AS total_price
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority
""",
)
def q72_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket both fact tables on the join key at write time, then
    join: with matching bucket counts the sort-merge join reads
    co-located buckets and the plan has NO Exchange on either side —
    the write-once/join-many trade that pays for itself after one
    repeat join at scale. tests/test_storage.py asserts the
    exchange-free plan; the oracle asserts layout doesn't change
    values."""
    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_extendedprice")
    o = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_orderpriority")
    t_li = bucketed_table(spark, li, "li_bucketed", "l_orderkey")
    t_o = bucketed_table(spark, o, "o_bucketed", "o_orderkey")
    lb, ob = spark.table(t_li), spark.table(t_o)
    return (
        lb.join(ob, lb.l_orderkey == ob.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            (F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("bigint")) / 100.0).alias("total_price"),
        )
        .orderBy("o_orderpriority")
    )
