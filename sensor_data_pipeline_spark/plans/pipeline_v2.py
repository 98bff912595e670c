"""Round-2 LLM-training-pipeline operators: context-window chunking,
sequence packing, DSIR-style importance weighting, weighted reservoir
sampling, ORC ingest fidelity, and a streaming left-outer join.

These extend the north-star corpus toolchain (`plans/northstar.py`,
`plans/corpus_quality.py`) with the remaining preprocessing steps a
pretraining data pipeline runs between "deduped corpus" and "token
shards": split documents into overlapping context windows, pack them
into fixed-budget sequences, score them against a target distribution,
and sample them by weight — each expressed as pure Catalyst plans (no
Python in the hot path) with a DuckDB oracle.

Reference analog: the reference pipeline ends at MQTT publication
(`src/modules/dd/producer.c`); these are the operators its data would
need next if it fed a training corpus rather than a dashboard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sensor_data_pipeline_spark.functions.text import tokenize, word_hash32
from sensor_data_pipeline_spark.operators.prefix import global_running_sum
from sensor_data_pipeline_spark.plans.registry import register
from sensor_data_pipeline_spark.sources.tables import load_table

# context-window chunking: 128-token windows advancing 96 tokens, the
# classic 25% overlap that keeps boundary sentences learnable twice
CHUNK_TOKENS = 128
CHUNK_STRIDE = 96

# sequence packing: byte budget per packed training sequence
PACK_BUDGET = 8192


@register(
    "q157_token_chunking",
    category="corpus",
    oracle=f"""
WITH t AS (
  SELECT doc_id, regexp_split_to_array(text, '\\s+') AS w FROM documents
),
s AS (
  SELECT doc_id, w, unnest(range(0, len(w), {CHUNK_STRIDE})) AS st FROM t
)
SELECT doc_id,
       CAST(st / {CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
       CAST(len(list_slice(w, st + 1, st + {CHUNK_TOKENS})) AS BIGINT) AS chunk_len,
       md5(array_to_string(list_slice(w, st + 1, st + {CHUNK_TOKENS}), ' ')) AS chunk_md5
FROM s
ORDER BY doc_id, chunk_idx
""",
)
def q157_token_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking: split every document into overlapping
    fixed-token windows (128 tokens, stride 96) — the step that turns a
    cleaned corpus into trainable sequences. The whole transform is
    three codegen'd higher-order functions (`sequence` for the window
    starts, `explode`, `slice`); no Python, no shuffle — a chunker that
    is a pure map stays embarrassingly parallel at 100 TB, and the
    chunk md5 pins byte-exact window boundaries against the oracle."""
    d = load_table(spark, "documents", sf_dir)
    toks = d.select("doc_id", tokenize(F.col("text")).alias("w"))
    starts = toks.select(
        "doc_id",
        "w",
        F.explode(F.sequence(F.lit(0), F.size("w") - 1, F.lit(CHUNK_STRIDE))).alias("st"),
    )
    chunk = F.slice(F.col("w"), F.col("st") + 1, CHUNK_TOKENS)
    return starts.select(
        "doc_id",
        (F.col("st") / CHUNK_STRIDE).cast("bigint").alias("chunk_idx"),
        F.size(chunk).cast("bigint").alias("chunk_len"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_md5"),
    ).orderBy("doc_id", "chunk_idx")


@register(
    "q158_sequence_packing",
    category="corpus",
    oracle=f"""
WITH scanned AS (
  SELECT doc_id, n_chars,
         sum(n_chars) OVER (ORDER BY doc_id) - n_chars AS pack_off
  FROM documents
)
SELECT CAST(floor(pack_off / {PACK_BUDGET}) AS BIGINT) AS bin_id,
       CAST(count(*) AS BIGINT)               AS n_docs,
       CAST(sum(n_chars) AS BIGINT)           AS bin_chars,
       CAST(min(doc_id) AS BIGINT)            AS first_doc,
       CAST(max(doc_id) AS BIGINT)            AS last_doc
FROM scanned
GROUP BY bin_id
ORDER BY bin_id
""",
)
def q158_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing (concat-and-chunk): lay documents end-to-end in
    a canonical order and cut the byte stream every PACK_BUDGET chars —
    each document's bin is its exclusive prefix sum div the budget.
    The prefix sum uses the two-pass range-partitioned scan
    (`operators/prefix.py`), NOT a global single-partition window: the
    oracle's `sum() OVER (ORDER BY doc_id)` is exactly the plan shape
    that dies at 100 TB, and this query differentially proves the
    distributed scan computes the identical packing."""
    d = load_table(spark, "documents", sf_dir).select("doc_id", "n_chars")
    scanned = global_running_sum(d, "doc_id", "n_chars", out_col="running")
    binned = scanned.withColumn(
        "bin_id", ((F.col("running") - F.col("n_chars")) / PACK_BUDGET).cast("bigint")
    )
    return (
        binned.groupBy("bin_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("bin_chars"),
            F.min("doc_id").cast("bigint").alias("first_doc"),
            F.max("doc_id").cast("bigint").alias("last_doc"),
        )
        .orderBy("bin_id")
    )


@register(
    "q159_ngram_importance",
    category="corpus",
    oracle="""
WITH tok AS (
  SELECT doc_id, lang, unnest(regexp_split_to_array(text, '\\s+')) AS w
  FROM documents
),
bg AS (SELECT w, count(*) AS cb FROM tok GROUP BY w),
tgt AS (SELECT w, count(*) AS ct FROM tok WHERE lang = 'en' GROUP BY w),
consts AS (
  SELECT (SELECT count(*) FROM tok)                 AS nb,
         (SELECT count(*) FROM tok WHERE lang='en') AS nt,
         (SELECT count(*) FROM bg)                  AS v
),
wt AS (
  SELECT bg.w,
         ln((COALESCE(tgt.ct, 0) + 1) / CAST(nt + v AS DOUBLE))
           - ln((bg.cb + 1) / CAST(nb + v AS DOUBLE)) AS lw
  FROM bg LEFT JOIN tgt ON bg.w = tgt.w, consts
)
SELECT tok.doc_id,
       CAST(count(*) AS BIGINT)      AS n_tokens,
       round(sum(wt.lw), 4)          AS importance
FROM tok JOIN wt ON tok.w = wt.w
GROUP BY tok.doc_id
ORDER BY tok.doc_id
""",
)
def q159_ngram_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance weighting: score every document by the
    log-likelihood ratio of its unigrams under a target LM (the 'en'
    slice) vs the background LM (whole corpus), add-one smoothed — the
    data-selection signal used to upsample target-like text. Plan: one
    explode, two token-count aggregations (map-side combined), a
    vocab-sized left join, then a doc-level re-aggregation. The vocab
    table shuffles once on the token key; corpus-scale constants (N_t,
    N_b, |V|) are single-row cross joins, never collected."""
    d = load_table(spark, "documents", sf_dir)
    tok = d.select("doc_id", "lang", F.explode(tokenize(F.col("text"))).alias("w"))
    bg = tok.groupBy("w").agg(F.count(F.lit(1)).alias("cb"))
    tgt = tok.filter(F.col("lang") == "en").groupBy("w").agg(F.count(F.lit(1)).alias("ct"))
    consts = tok.agg(
        F.count(F.lit(1)).alias("nb"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("nt"),
        F.countDistinct("w").alias("v"),
    )
    wt = (
        bg.join(tgt, "w", "left")
        .crossJoin(F.broadcast(consts))
        .select(
            "w",
            (
                F.log((F.coalesce(F.col("ct"), F.lit(0)) + 1) / (F.col("nt") + F.col("v")).cast("double"))
                - F.log((F.col("cb") + 1) / (F.col("nb") + F.col("v")).cast("double"))
            ).alias("lw"),
        )
    )
    return (
        tok.join(wt, "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.round(F.sum("lw"), 4).alias("importance"),
        )
        .orderBy("doc_id")
    )


@register(
    "q160_weighted_sample",
    category="sampling",
    oracle="""
WITH keyed AS (
  SELECT doc_id, source, n_chars,
         ln((CAST(('0x' || substr(md5('11:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) + 1)
            / 4294967296.0) / n_chars AS k
  FROM documents
),
ranked AS (
  SELECT doc_id, source, n_chars,
         row_number() OVER (PARTITION BY source ORDER BY k DESC, doc_id) AS rk
  FROM keyed
)
SELECT source, CAST(rk AS BIGINT) AS rk, CAST(doc_id AS BIGINT) AS doc_id,
       CAST(n_chars AS BIGINT) AS n_chars
FROM ranked WHERE rk <= 3
ORDER BY source, rk
""",
)
def q160_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted reservoir sampling (Efraimidis–Spirakis A-Res) with a
    deterministic seed: each doc draws u in (0,1] from the portable
    md5 hash and keeps key ln(u)/weight; the top-k keys per stratum ARE
    the weighted sample. Deterministic u makes the sample reproducible
    across engines and cluster sizes — the property a training-data
    lottery must have for auditability. One shuffle (the per-source
    top-k window); no floats in the output so libm ulp differences
    cannot hash-mismatch."""
    d = load_table(spark, "documents", sf_dir)
    u = (word_hash32(F.col("doc_id").cast("string"), seed=11) + 1) / F.lit(4294967296.0)
    keyed = d.select("doc_id", "source", "n_chars", (F.log(u) / F.col("n_chars")).alias("k"))
    w = Window.partitionBy("source").orderBy(F.col("k").desc(), "doc_id")
    return (
        keyed.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= 3)
        .select("source", "rk", "doc_id", "n_chars")
        .orderBy("source", "rk")
    )


@register(
    "q161_orc_roundtrip",
    category="json",
    oracle="""
SELECT lang, source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_distinct_texts
FROM documents
GROUP BY lang, source ORDER BY lang, source
""",
)
def q161_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC ingest fidelity, completing the columnar-format matrix next
    to parquet (native), JSONL (q154) and CSV (q155): write the
    documents table as ORC, read it back, aggregate; distinct-md5
    equality against the parquet oracle proves the serde lossless.
    ORC is the other splittable columnar format a 100 TB lakehouse
    ingests from (Hive-era estates), with the same predicate-pushdown
    and column-pruning behavior as parquet."""
    import re as _re

    from sensor_data_pipeline_spark.sources.warehouse import SCRATCH

    d = load_table(spark, "documents", sf_dir)
    tag = _re.sub(r"[^A-Za-z0-9_]+", "_", sf_dir).strip("_")
    path = f"{SCRATCH}/roundtrip/orc_{tag}"
    d.write.mode("overwrite").orc(path)
    back = spark.read.schema(
        "doc_id long, text string, lang string, source string, n_chars long"
    ).orc(path)
    return (
        back.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
            F.countDistinct(F.md5("text")).cast("bigint").alias("n_distinct_texts"),
        )
        .orderBy("lang", "source")
    )
