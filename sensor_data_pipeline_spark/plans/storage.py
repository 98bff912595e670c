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
    t_li = bucketed_table(spark, li, "li_bucketed", "l_orderkey", cache_key=sf_dir)
    t_o = bucketed_table(spark, o, "o_bucketed", "o_orderkey", cache_key=sf_dir)
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


@register(
    "q120_file_provenance",
    category="storage",
    oracle="""
SELECT 'lineitem.parquet' AS file_name,
       count(*) AS n_rows,
       min(l_orderkey) AS min_key,
       max(l_orderkey) AS max_key
FROM lineitem
GROUP BY 1
ORDER BY file_name
""",
)
def q120_file_provenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-file provenance via the ``_metadata`` struct: every row is
    attributed to its source file without any extra column in the data
    — the lineage primitive a training-data pipeline needs to trace a
    bad document back to its shard (and to build per-shard audits /
    reprocessing lists). The metadata column is populated by the scan
    itself (constant per file, no shuffle cost); grouping on it rolls
    up per input file. The oracle pins the expected basename since the
    fixture is one file per table — on a 100 TB partitioned table the
    same query yields one row per shard."""
    li = load_table(spark, "lineitem", sf_dir)
    fname = F.element_at(F.split(F.col("_metadata.file_path"), "/"), -1)
    return (
        li.select(fname.alias("file_name"), "l_orderkey")
        .groupBy("file_name")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("l_orderkey").alias("min_key"),
            F.max("l_orderkey").alias("max_key"),
        )
        .orderBy("file_name")
    )
