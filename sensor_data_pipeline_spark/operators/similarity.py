"""Similarity search over embedding columns (north-star).

Two paths:

- **brute-force top-k** (the correctness baseline): broadcast the
  (small) query set against the corpus; cosine in codegen'd
  higher-order functions; per-query top-k via ranking window. Corpus
  never shuffles for the join (broadcast), once for the window —
  at 100 TB the scan dominates, which is the right bottleneck.
- **sign-LSH bucketed** (the scale path): bucket both sides by the
  sign pattern of leading dimensions and join on bucket id, so each
  query only scores its bucket's corpus slice. Recall < 1 by design;
  multi-probe (flipping one bit) is available via ``n_probe_bits``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sensor_data_pipeline_spark.functions.vector import cosine_arrow, sign_lsh_bucket


def _scored(queries: DataFrame, corpus: DataFrame, query_id: str, corpus_id: str, vec_col: str) -> DataFrame:
    q = queries.select(F.col(query_id).alias("query_id"), F.col(vec_col).alias("_qv"))
    c = corpus.select(F.col(corpus_id).alias("match_id"), F.col(vec_col).alias("_cv"))
    return (
        c.join(F.broadcast(q))
        .filter(F.col("query_id") != F.col("match_id"))
        .withColumn("cosine", cosine_arrow(F.col("_qv"), F.col("_cv")))
    )


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k per query. Raw doubles are emitted: both the
    Spark and oracle sides compute the dot product in double precision
    in index order, so values are bit-identical; ties break by match_id."""
    scored = _scored(queries, corpus, query_id, corpus_id, vec_col).withColumn("cos_r", F.col("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.col("cos_r").desc(), F.col("match_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= k)
        .select("query_id", "match_id", F.col("cos_r").alias("cosine"), "rk")
    )


def lsh_bucket_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_bits: int = 8,
) -> DataFrame:
    """Approximate top-k: only corpus vectors in the query's sign-LSH
    bucket are scored. The join is an equi-join on bucket id — no
    broadcast needed when the query set is large, and the shuffle is
    keyed uniformly."""
    q = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        sign_lsh_bucket(F.col(vec_col), n_bits).alias("bucket"),
    )
    c = corpus.select(
        F.col(corpus_id).alias("match_id"),
        F.col(vec_col).alias("_cv"),
        sign_lsh_bucket(F.col(vec_col), n_bits).alias("bucket"),
    )
    scored = (
        q.join(c, "bucket")
        .filter(F.col("query_id") != F.col("match_id"))
        .withColumn("cos_r", cosine_arrow(F.col("_qv"), F.col("_cv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_r").desc(), F.col("match_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= k)
        .select("query_id", "bucket", "match_id", F.col("cos_r").alias("cosine"), "rk")
    )


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine >=
    threshold). Exact: compares all pairs via a broadcast self-join —
    right at small/medium corpus scale; for web-scale corpora compose
    ``sign_lsh_bucket`` blocking first (same output columns)."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    return (
        a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", cosine_arrow(F.col("_va"), F.col("_vb")))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
