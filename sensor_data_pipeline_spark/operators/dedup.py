"""Deduplication operators (north-star: training-data pipeline).

Four families, all shuffle-conscious:

- **exact**: hash-groupBy on a normalized fingerprint — one shuffle,
  map-side combine; at 100 TB this is the cheapest possible dedup.
- **n-gram Jaccard**: inverted-index join on shingles (docs sharing a
  shingle become candidates) — never the O(n^2) cross join. Skew note:
  ultra-common shingles explode the index; a frequency cap
  (``max_shingle_freq``) drops them, trading a sliver of recall for a
  bounded join fan-out.
- **MinHash + LSH banding**: constant-size signatures (K min-hashes)
  per doc, banded so only docs agreeing on a whole band collide; the
  candidate join is on (band_id, band_hash) — O(n·bands) shuffle keys.
- **SimHash**: one 32-bit fingerprint per doc from per-bit majority of
  word hashes; near-dups differ in few bits.

Hashes are the md5-derived 32-bit ints from ``functions.text`` so
every step is reproducible in the DuckDB oracle; swap in
``word_hash_fast`` (xxhash64) for production speed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sensor_data_pipeline_spark.functions.text import doc_fingerprint, tokenize, word_hash32, word_shingles


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup on the normalized text fingerprint: keep the lowest
    id per fingerprint group, count the copies."""
    return (
        df.withColumn("fp", doc_fingerprint(F.col(text_col)))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).cast("bigint").alias("n_copies"))
    )


def with_shingles(df: DataFrame, text_col: str, n: int = 3, out_col: str = "shingles") -> DataFrame:
    return df.withColumn(out_col, word_shingles(tokenize(F.col(text_col)), n))


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """Near-dup pairs by exact n-gram Jaccard, via inverted-index join.

    Returns (id_a, id_b, jaccard) with id_a < id_b and jaccard >=
    threshold. Jaccard is exact over *distinct* shingles, so the only
    approximation is the optional frequency cap.
    """
    sh = with_shingles(df.select(id_col, text_col), text_col, n)
    sizes = sh.select(F.col(id_col).alias("_id"), F.size("shingles").alias("_n"))
    inv = sh.select(F.col(id_col).alias("_id"), F.explode("shingles").alias("shingle"))
    if max_shingle_freq is not None:
        freq_ok = inv.groupBy("shingle").count().filter(F.col("count") <= max_shingle_freq).select("shingle")
        inv = inv.join(F.broadcast(freq_ok), "shingle")
    a = inv.select(F.col("_id").alias("id_a"), "shingle")
    b = inv.select(F.col("_id").alias("id_b"), "shingle")
    shared = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        shared.join(sizes.select(F.col("_id").alias("id_a"), F.col("_n").alias("n_a")), "id_a")
        .join(sizes.select(F.col("_id").alias("id_b"), F.col("_n").alias("n_b")), "id_b")
        .withColumn("jaccard", F.col("n_shared") / (F.col("n_a") + F.col("n_b") - F.col("n_shared")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_signatures(df: DataFrame, id_col: str, text_col: str, num_hashes: int = 16, n: int = 3) -> DataFrame:
    """K-permutation MinHash signature as K min-aggregations over the
    exploded shingle set — one shuffle, map-side combinable, constant
    output size per doc."""
    inv = with_shingles(df.select(id_col, text_col), text_col, n).select(
        id_col, F.explode("shingles").alias("shingle")
    )
    aggs = [F.min(word_hash32(F.col("shingle"), seed=k)).alias(f"mh_{k}") for k in range(num_hashes)]
    return inv.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(
    sig_df: DataFrame, id_col: str, num_hashes: int = 16, bands: int = 4
) -> DataFrame:
    """LSH banding over a MinHash signature: docs colliding on any
    whole band become a candidate pair. Join key is (band_id,
    band_hash) so the shuffle is uniform; output is distinct pairs."""
    rows_per_band = num_hashes // bands
    band_cols = []
    for b in range(bands):
        cols = [F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_cols.append(
            F.struct(F.lit(b).alias("band_id"), F.md5(F.concat_ws("_", *[c.cast("string") for c in cols])).alias("band_hash"))
        )
    banded = sig_df.select(F.col(id_col).alias("_id"), F.explode(F.array(*band_cols)).alias("band")).select(
        "_id", F.col("band.band_id").alias("band_id"), F.col("band.band_hash").alias("band_hash")
    )
    a = banded.select(F.col("_id").alias("id_a"), "band_id", "band_hash")
    b = banded.select(F.col("_id").alias("id_b"), "band_id", "band_hash")
    return (
        a.join(b, ["band_id", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 32) -> DataFrame:
    """SimHash fingerprint: per-bit majority vote over word hashes.

    explode(words) x explode(bits) keeps everything in codegen; the
    double shuffle is on (id, bit) then (id) — both uniform. Output:
    one bigint fingerprint per doc.
    """
    words = df.select(F.col(id_col), F.explode(tokenize(F.col(text_col))).alias("w")).withColumn(
        "h", word_hash32(F.col("w"))
    )
    per_bit = (
        words.select(id_col, "h", F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("bit"))
        .groupBy(id_col, "bit")
        .agg(
            F.sum(
                F.when(F.expr("(shiftright(h, bit) & 1)") == 1, 1).otherwise(-1)
            ).alias("vote")
        )
    )
    return per_bit.groupBy(id_col).agg(
        F.sum(F.when(F.col("vote") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), bit)")).otherwise(0))
        .cast("bigint")
        .alias("simhash")
    )
