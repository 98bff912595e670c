"""Storage-layout plan assertions: partition pruning reaches the scan,
bucketed joins run without an Exchange."""

from __future__ import annotations

from pyspark.sql import functions as F

from sensor_data_pipeline_spark.sources.tables import load_table
from sensor_data_pipeline_spark.sources.warehouse import bucketed_table, write_partitioned

SF = "/root/testdata/sf0.001"


def test_partitioned_scan_prunes(spark):
    o = load_table(spark, "orders", SF)
    path = write_partitioned(o, "t_orders_part", ["o_orderstatus"])
    pruned = spark.read.parquet(path).filter(F.col("o_orderstatus") == "F")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # the predicate must appear as a partition filter on the scan (no
    # data filter, no row-level evaluation)
    assert "PartitionFilters" in plan
    assert pruned.count() == o.filter(F.col("o_orderstatus") == "F").count()


def test_bucketed_join_has_no_exchange(spark):
    li = load_table(spark, "lineitem", SF).select("l_orderkey", "l_extendedprice")
    o = load_table(spark, "orders", SF).select("o_orderkey", "o_orderpriority")
    lb = spark.table(bucketed_table(spark, li, "t_li_b", "l_orderkey"))
    ob = spark.table(bucketed_table(spark, o, "t_o_b", "o_orderkey"))
    # at sf0.001 the planner would pick a broadcast join (and rightly
    # skip bucketing); disable it so the sort-merge path — the one a
    # 100 TB fact-fact join takes — is what gets planned
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = lb.join(ob, lb.l_orderkey == ob.o_orderkey)
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        assert "SortMergeJoin" in plan
        # and the layout doesn't change the result
        assert joined.count() == li.join(o, li.l_orderkey == o.o_orderkey).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")


def test_dynamic_partition_overwrite(spark, tmp_path):
    """Dynamic partition overwrite (INSERT OVERWRITE PARTITION): a
    rewrite touches ONLY the partitions present in the incoming data —
    static mode would wipe the whole table. This is how a 100 TB
    partitioned corpus takes daily corrections without rewriting
    untouched shards."""
    path = str(tmp_path / "dpo")
    base = spark.createDataFrame(
        [("click", 1, 1.0), ("click", 2, 2.0), ("purchase", 3, 3.0)],
        "event_type string, event_id long, value double",
    )
    base.write.partitionBy("event_type").parquet(path)

    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        fix = spark.createDataFrame(
            [("click", 9, 9.9)], "event_type string, event_id long, value double"
        )
        fix.write.mode("overwrite").partitionBy("event_type").parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    got = {(r.event_type, r.event_id, r.value) for r in spark.read.parquet(path).collect()}
    # click partition replaced wholesale; purchase partition untouched
    assert got == {("click", 9, 9.9), ("purchase", 3, 3.0)}
