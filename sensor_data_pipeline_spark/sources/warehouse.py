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


def bucketed_table(
    spark: SparkSession,
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 8,
    cache_key: str = "",
) -> str:
    """Bucketed table (bucketBy requires saveAsTable). Both sides of a
    later equi-join on ``key`` with the same bucket count read
    co-located buckets — no exchange in the join plan.

    Write-once/join-many: the layout is the EXPENSIVE half, so it is
    cached on disk under SCRATCH keyed by ``cache_key`` (pass the sf
    dir — different data, different layout) and reused across
    sessions. The catalog is per-session (in-memory), so a warm disk
    layout is re-registered with CLUSTERED BY DDL instead of
    rewritten; the bucket-id-bearing file names produced by the
    original bucketed write carry the physical layout. Callers that
    mutate their input between calls must vary ``cache_key``."""
    import re
    import shutil

    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    tag = re.sub(r"[^A-Za-z0-9_]+", "_", cache_key).strip("_")
    tbl = f"{table}__{tag}" if tag else table
    if spark.catalog.tableExists(tbl):
        return tbl
    loc = os.path.join(SCRATCH, "bucketed", tbl)
    if tag and os.path.exists(os.path.join(loc, "_SUCCESS")):
        cols = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields)
        spark.sql(
            f"CREATE TABLE {tbl} ({cols}) USING parquet "
            f"CLUSTERED BY (`{key}`) SORTED BY (`{key}`) INTO {n_buckets} BUCKETS "
            f"LOCATION '{loc}'"
        )
        return tbl
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    shutil.rmtree(loc, ignore_errors=True)
    df.write.mode("overwrite").bucketBy(n_buckets, key).sortBy(key).option("path", loc).saveAsTable(tbl)
    return tbl
