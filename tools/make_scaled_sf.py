"""Build a K-times replica of a testdata scale-factor directory for
scaling experiments (the sf1 stress snapshot: BENCH_SF1.json).

The driver ships sf0.001/0.01/0.1 only; the 100 TB design claims are
plan-guarded but need at least one measured decade of scale-up to catch
superlinear surprises empirically. Replication rule: each replica i
shifts every key domain by i * (max_key + 1) so referential joins stay
consistent within a replica and replicas are disjoint — the workload
grows linearly by construction, which is exactly the property a
scaling measurement needs as its null hypothesis.

Content columns are decorrelated across replicas so dedup/similarity
operators see new data rather than 10 exact copies (which would blow
up their OUTPUT superlinearly and measure the fixture, not the plan):

- documents.text: every token gets a per-replica suffix (replica 0 is
  the original corpus), so within-replica duplicate/similarity
  structure is preserved exactly while cross-replica token sets are
  disjoint.
- embeddings.embedding: rotated by i positions (norm-preserving,
  direction-decorrelating), so ANN/semantic-dedup geometry scales as
  10 independent corpora.
- region/nation: fixed dimensions, copied once (TPC-H semantics).

Usage: python tools/make_scaled_sf.py SRC_DIR OUT_DIR [K]
"""

from __future__ import annotations

import glob as _glob
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

#: key columns per table, grouped by the shared key domain they draw from
KEY_DOMAINS = {
    "custkey": [("customer", "c_custkey"), ("orders", "o_custkey")],
    "orderkey": [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
    "partkey": [("part", "p_partkey"), ("lineitem", "l_partkey")],
    "suppkey": [("supplier", "s_suppkey"), ("lineitem", "l_suppkey")],
    "eventid": [("events", "event_id")],
    "userid": [("events", "user_id")],
    "docid": [("documents", "doc_id")],
    "vecid": [("embeddings", "vec_id")],
}

SCALED_TABLES = ["customer", "supplier", "part", "orders", "lineitem", "events", "documents", "embeddings"]
COPIED_TABLES = ["region", "nation"]


def _domain_strides(spark: SparkSession, src: str) -> dict[str, int]:
    strides: dict[str, int] = {}
    for dom, cols in KEY_DOMAINS.items():
        hi = 0
        for table, col in cols:
            df = spark.read.parquet(os.path.join(src, f"{table}.parquet"))
            hi = max(hi, df.agg(F.max(col)).collect()[0][0] or 0)
        strides[dom] = int(hi) + 1
    return strides


def _replica(df: DataFrame, table: str, i: int, strides: dict[str, int]) -> DataFrame:
    out = df
    for dom, cols in KEY_DOMAINS.items():
        for t, col in cols:
            if t == table:
                out = out.withColumn(col, (F.col(col) + F.lit(i * strides[dom])).cast("long"))
    if table == "documents" and i > 0:
        # per-replica token suffix: within-replica dup structure intact,
        # cross-replica token sets disjoint
        out = out.withColumn("text", F.regexp_replace("text", r"(\S+)", f"$1_r{i}"))
        out = out.withColumn("n_chars", F.length("text").cast("long"))
    if table == "embeddings" and i > 0:
        dims = 64  # fixture embeddings are 64-dim float32 (FIXTURES.md)
        rot = i % dims
        out = out.withColumn(
            "embedding",
            F.concat(F.slice("embedding", rot + 1, dims - rot), F.slice("embedding", 1, rot)),
        )
    return out


def _write_single_file(df: DataFrame, dst: str, table: str) -> None:
    """Match the testdata layout exactly: {dst}/{table}.parquet is a
    single parquet FILE, not a directory — _events_stream and the
    DuckDB views both glob for the literal filename.

    parquet.block.size is capped at 4 MB so the single file holds
    MANY row groups and stays splittable: the round-7 stress found the
    sf10 documents replica had ONE 500k-row row group (parquet cannot
    split inside a row group), so every text scan ran as a single task
    and serialized downstream pins — q335 measured 21.5x per decade
    from that alone. NOTE: the committed .scratch/sf1 and .scratch/sf10
    replicas predate this fix; regenerating them changes every
    BENCH_SF1/BENCH_SF10 number, so do it only together with a full
    decade re-baseline (planned round 8)."""
    tmp = os.path.join(dst, f"_{table}_tmp")
    df.coalesce(1).write.mode("overwrite").option(
        "parquet.block.size", 4 * 1024 * 1024
    ).parquet(tmp)
    part = _glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
    final = os.path.join(dst, f"{table}.parquet")
    if os.path.isdir(final):
        shutil.rmtree(final)
    shutil.move(part, final)
    shutil.rmtree(tmp)


def make_scaled(spark: SparkSession, src: str, dst: str, k: int) -> None:
    os.makedirs(dst, exist_ok=True)
    strides = _domain_strides(spark, src)
    for table in COPIED_TABLES:
        df = spark.read.parquet(os.path.join(src, f"{table}.parquet"))
        _write_single_file(df, dst, table)
    for table in SCALED_TABLES:
        df = spark.read.parquet(os.path.join(src, f"{table}.parquet"))
        parts = [_replica(df, table, i, strides) for i in range(k)]
        union = parts[0]
        for p in parts[1:]:
            union = union.unionByName(p)
        _write_single_file(union, dst, table)
        n = spark.read.parquet(os.path.join(dst, f"{table}.parquet")).count()
        print(f"{table}: {n} rows ({k}x)", flush=True)


if __name__ == "__main__":
    from sensor_data_pipeline_spark.session import get_spark

    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch", "sf1"
    )
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    spark = get_spark(app_name="make-scaled-sf")
    make_scaled(spark, src, dst, k)
