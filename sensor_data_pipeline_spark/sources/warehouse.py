"""Storage-layout helpers: partitioned and bucketed writes.

At 100 TB the scan layout IS the query plan: hive-style partitioning
turns predicates into directory pruning (zero I/O for excluded
partitions), and bucketing pre-shuffles a table ONCE at write time so
every later join/agg on the bucket key runs shuffle-free. These
helpers materialize testdata tables into both layouts under a scratch
dir so the declared queries can demonstrate the plans.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

SCRATCH = os.environ.get("SPARK_GRAFT_SCRATCH", "/tmp/sdp_spark_warehouse")


def write_partitioned(df: DataFrame, name: str, partition_by: list[str]) -> str:
    """Hive-layout parquet: one directory per partition value. Good for
    low-cardinality columns queries filter on; high-cardinality keys
    would produce pathological small files — bucket those instead."""
    path = os.path.join(SCRATCH, name)
    df.write.mode("overwrite").partitionBy(*partition_by).parquet(path)
    return path


def bucketed_table(spark: SparkSession, df: DataFrame, table: str, key: str, n_buckets: int = 8) -> str:
    """Bucketed managed table (bucketBy requires saveAsTable). Both
    sides of a later equi-join on ``key`` with the same bucket count
    read co-located buckets — no exchange in the join plan.

    The catalog is per-session (in-memory) but the warehouse location
    is on disk, so a stale location from a previous session must be
    cleared before the (to this session, brand-new) table writes."""
    import shutil

    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    loc = os.path.join(spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:"), table)
    shutil.rmtree(loc, ignore_errors=True)
    df.write.mode("overwrite").bucketBy(n_buckets, key).sortBy(key).saveAsTable(table)
    return table
