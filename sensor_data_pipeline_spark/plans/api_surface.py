"""Modern execution-API surface: mapInArrow, lateral joins, grouped map.

Completes the §2.8 UDF-surface matrix: scalar pandas UDF (q48),
GROUPED_AGG (q80), UDTF (q94), mapInPandas (q51-q54), cogrouped
applyInPandas (q113), applyInPandasWithState (q68) — plus, here,
RecordBatch-level mapInArrow (no pandas materialization at all; the
lowest-overhead Python hook) and DataFrame.lateralJoin (Spark 4's
correlated per-row subquery join, the declarative form of the
reference's per-tick "for this reading, fetch its context" pattern).

Scale notes: mapInArrow streams Arrow batches through Python with
zero copy on the JVM side — the right hook for vectorized math that
built-ins can't express; the lateral top-k is per-group-limit work
the optimizer rewrites away from a cross join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sensor_data_pipeline_spark.plans.registry import register
from sensor_data_pipeline_spark.sources.tables import load_table


@register(
    "q115_arrow_norms",
    category="similarity",
    oracle="""
SELECT vec_id,
       CAST(len(embedding) AS INTEGER) AS dim,
       sqrt(list_dot_product(list_transform(embedding, x -> CAST(x AS DOUBLE)),
                             list_transform(embedding, x -> CAST(x AS DOUBLE)))) AS l2_norm
FROM embeddings
ORDER BY vec_id
""",
)
def q115_arrow_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding L2 norms via ``mapInArrow``: the UDF receives raw
    Arrow RecordBatches (no pandas conversion), computes the norm with
    a float64 accumulator in dimension order — the same rounding
    sequence as DuckDB's list_dot_product, so the hash matches bit for
    bit. This is the minimal-overhead Python hook: one Arrow buffer
    in, one out, per batch, embarrassingly parallel over partitions."""
    import pyarrow as pa

    emb = load_table(spark, "embeddings", sf_dir).select("vec_id", "embedding")

    def norms(batches):
        import numpy as np

        for batch in batches:
            vec_ids = batch.column("vec_id")
            embs = batch.column("embedding")
            # (rows, dim) float64 matrix; accumulate per-dimension in
            # order to mirror the scalar loop's rounding sequence
            mat = np.asarray(embs.to_pylist(), dtype=np.float64)
            acc = np.zeros(len(mat), dtype=np.float64)
            for k in range(mat.shape[1] if mat.ndim == 2 else 0):
                acc += mat[:, k] * mat[:, k]
            yield pa.RecordBatch.from_arrays(
                [
                    vec_ids,
                    pa.array([mat.shape[1] if mat.ndim == 2 else 0] * len(mat), pa.int32()),
                    pa.array(np.sqrt(acc), pa.float64()),
                ],
                names=["vec_id", "dim", "l2_norm"],
            )

    return emb.mapInArrow(norms, schema="vec_id long, dim int, l2_norm double").orderBy("vec_id")


@register(
    "q116_lateral_topk",
    category="join",
    oracle="""
SELECT n.n_name, top.c_custkey, top.bal
FROM nation n,
LATERAL (
  SELECT c_custkey,
         CAST(round(c_acctbal * 100, 0) AS BIGINT) / 100.0 AS bal
  FROM customer
  WHERE c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_custkey
  LIMIT 3
) top
ORDER BY n.n_name, top.bal DESC, top.c_custkey
""",
)
def q116_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 customers per nation via ``DataFrame.lateralJoin`` — the
    correlated per-row subquery (Spark 4 API), matched against
    DuckDB's LATERAL. The optimizer executes it as a per-group
    window/limit, not |nation| separate scans, so the shape scales
    with data, not with the outer row count."""
    n = load_table(spark, "nation", sf_dir).select("n_nationkey", "n_name")
    c = load_table(spark, "customer", sf_dir)
    top = (
        c.where(F.col("c_nationkey") == F.col("n_nationkey").outer())
        .orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
        .limit(3)
        .select(
            "c_custkey",
            (F.round(F.col("c_acctbal") * 100, 0).cast("bigint") / 100.0).alias("bal"),
        )
    )
    return (
        n.lateralJoin(top)
        .select("n_name", "c_custkey", "bal")
        .orderBy("n_name", F.col("bal").desc(), "c_custkey")
    )


@register(
    "q117_group_zscore",
    category="udf",
    oracle="""
WITH m AS (
  SELECT lang, source,
         count(*) AS n,
         sum(n_chars) AS s,
         sum(n_chars * n_chars) AS q
  FROM documents
  GROUP BY lang, source
)
SELECT d.doc_id, d.lang, d.source,
       CASE WHEN m.n < 2 THEN NULL
            ELSE (d.n_chars - CAST(m.s AS DOUBLE) / m.n)
                 / sqrt((m.q - CAST(m.s * m.s AS DOUBLE) / m.n) / (m.n - 1))
       END AS z
FROM documents d JOIN m ON d.lang = m.lang AND d.source = m.source
ORDER BY d.doc_id
""",
)
def q117_group_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(lang, source) z-score of document length via plain
    grouped-map ``applyInPandas`` — the FlatMapGroupsInPandas surface
    (distinct from GROUPED_AGG/cogroup/state variants already gated).

    Determinism: moments come from exact int64 sums (counts and
    lengths are integers), and the float expression mirrors the oracle
    token for token — same IEEE op order, so the hash matches without
    rounding. One shuffle on the group key; each group's frame is a
    few thousand rows, far under Arrow batch limits."""
    d = load_table(spark, "documents", sf_dir).select("doc_id", "lang", "source", "n_chars")

    def zscore(pdf):
        import numpy as np

        x = pdf["n_chars"].to_numpy(dtype=np.int64)
        n = len(x)
        out = pdf[["doc_id", "lang", "source"]].copy()
        if n < 2:
            out["z"] = None
            return out
        s = int(x.sum())
        q = int((x * x).sum())
        mean = float(s) / n
        var = (q - float(s * s) / n) / (n - 1)
        out["z"] = (x - mean) / np.sqrt(var)
        return out

    return (
        d.groupBy("lang", "source")
        .applyInPandas(zscore, schema="doc_id long, lang string, source string, z double")
        .orderBy("doc_id")
    )


@register(
    "q121_xml_roundtrip",
    category="json",
    oracle="""
SELECT event_id,
       user_id,
       round(value, 2) AS value,
       event_type
FROM events
WHERE event_id % 7 = 0
ORDER BY event_id
""",
)
def q121_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML wire roundtrip (the q31 JSON pattern on Spark 4's XML
    serde): to_xml(struct) -> from_xml back; equality against the
    directly-read oracle proves the serde is lossless. The reference's
    wire format is JSON (producer.c:136-141), but a sensor fleet
    speaking XML (industrial SCADA does) drops into the same pipeline
    with only this serde pair changing."""
    import pyspark.sql.types as T

    e = load_table(spark, "events", sf_dir).filter(F.col("event_id") % 7 == 0)
    wire_schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("event_type", T.StringType()),
        ]
    )
    serialized = e.select(
        F.to_xml(F.struct("event_id", "user_id", "value", "event_type")).alias("payload")
    )
    parsed = serialized.select(F.from_xml("payload", wire_schema).alias("rec")).select("rec.*")
    return parsed.select(
        "event_id", "user_id", F.round("value", 2).alias("value"), "event_type"
    ).orderBy("event_id")


@register(
    "q122_arrow_python_udf",
    category="udf",
    oracle="""
SELECT event_id,
       CASE WHEN value >= 0 THEN floor(value) ELSE -floor(-value) END + 0.0 AS trunc_val,
       length(event_type) + CAST(event_id % 10 AS BIGINT) AS mixed_key
FROM events
WHERE event_id % 11 = 0
ORDER BY event_id
""",
)
def q122_arrow_python_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-optimized Python UDF (``@udf(useArrow=True)``): the
    fourth Python execution path after row-pickle UDFs, pandas UDFs,
    and mapInArrow — Arrow batch transfer with scalar Python logic,
    ArrowEvalPython in the plan. Logic kept integer/trunc-exact so the
    oracle comparison is bit-stable."""
    from pyspark.sql.functions import udf

    @udf("double", useArrow=True)
    def trunc_val(v: float) -> float:
        return float(int(v)) + 0.0  # trunc toward zero, exact for |v| < 2^53

    @udf("long", useArrow=True)
    def mixed_key(s: str, eid: int) -> int:
        return len(s) + eid % 10

    e = load_table(spark, "events", sf_dir).filter(F.col("event_id") % 11 == 0)
    return (
        e.select(
            "event_id",
            trunc_val(F.col("value")).alias("trunc_val"),
            mixed_key(F.col("event_type"), F.col("event_id")).alias("mixed_key"),
        )
        .orderBy("event_id")
    )


@register(
    "q124_embedding_quantization",
    category="similarity",
    oracle="""
WITH v AS (
  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
  FROM embeddings
),
scaled AS (
  SELECT vec_id, label, emb,
         list_max(list_transform(emb, x -> abs(x))) / 127.0 AS scale
  FROM v
),
err AS (
  SELECT vec_id, label, scale,
         list_max(list_transform(emb, x -> abs(x - round(x / scale, 0) * scale))) AS max_err
  FROM scaled WHERE scale > 0
)
SELECT label,
       count(*) AS n_vecs,
       max(max_err / scale) AS worst_rel_err,
       CAST(sum(CASE WHEN max_err <= scale * 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_within_half_step
FROM err
GROUP BY label
ORDER BY label
""",
)
def q124_embedding_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization audit: per-vector scale =
    max|x|/127, reconstruction error = max|x - round(x/scale)*scale| —
    the memory-4x step before ANN serving, with the audit every
    quantization rollout needs (worst relative error per label,
    fraction within half a quantization step).

    All math is codegen'd higher-order array functions over the scan —
    no UDF, no shuffle before the tiny per-label rollup. Every
    per-element op (abs, /, round, *) is a deterministic IEEE op in
    identical order on both engines; max is order-insensitive."""
    emb = load_table(spark, "embeddings", sf_dir)
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    d = emb.select("vec_id", "label", v.alias("emb"))
    scale = F.array_max(F.transform(F.col("emb"), lambda x: F.abs(x))) / 127.0
    d = d.withColumn("scale", scale).filter(F.col("scale") > 0)
    err_el = F.transform(
        F.col("emb"), lambda x: F.abs(x - F.round(x / F.col("scale"), 0) * F.col("scale"))
    )
    d = d.withColumn("max_err", F.array_max(err_el))
    return (
        d.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.max(F.col("max_err") / F.col("scale")).alias("worst_rel_err"),
            F.sum(F.when(F.col("max_err") <= F.col("scale") * 0.5, 1).otherwise(0))
            .cast("bigint")
            .alias("n_within_half_step"),
        )
        .orderBy("label")
    )


@register(
    "q135_nested_schema_surgery",
    category="scalar",
    oracle="""
SELECT event_id,
       user_id AS uid,
       event_type AS kind,
       CAST(round(value * 100, 0) AS BIGINT) AS val_cents
FROM events
WHERE event_id % 17 = 0
ORDER BY event_id
""",
)
def q135_nested_schema_surgery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested schema surgery with Column.withField/dropFields: build a
    wire-shaped struct, then retype one nested field (money double ->
    exact cents), rename another, and drop a deprecated one — WITHOUT
    exploding/rebuilding the struct by hand. This is nested schema
    evolution, the struct-level sibling of q126's by-name union;
    Catalyst collapses the field edits into a single struct projection
    (no per-field shuffle or UDF)."""
    e = load_table(spark, "events", sf_dir).filter(F.col("event_id") % 17 == 0)
    raw = e.select(
        "event_id",
        F.struct(
            F.col("user_id").alias("uid"),
            F.col("event_type").alias("kind"),
            F.col("value").alias("val"),
            F.lit("v1").alias("schema_tag"),  # deprecated field to drop
        ).alias("rec"),
    )
    surgered = raw.select(
        "event_id",
        F.col("rec")
        .withField("val_cents", F.round(F.col("rec.val") * 100, 0).cast("bigint"))
        .dropFields("val", "schema_tag")
        .alias("rec"),
    )
    # flatten for the gate: struct cells render differently per engine
    # (Row(...) vs dict), so the hash compares the leaf columns
    return surgered.select("event_id", "rec.uid", "rec.kind", "rec.val_cents").orderBy("event_id")


def _scratch_tag(sf_dir: str) -> str:
    import re as _re

    return _re.sub(r"[^A-Za-z0-9_]+", "_", sf_dir).strip("_")


@register(
    "q154_jsonl_roundtrip",
    category="json",
    oracle="""
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_distinct_texts
FROM documents
GROUP BY lang ORDER BY lang
""",
)
def q154_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL ingest fidelity: write the documents table as JSON lines
    (the wire format crawls and annotation pipelines actually deliver),
    read it back with an explicit schema (no inference pass — at 100 TB
    schema inference is a full extra scan), and aggregate. The
    distinct-md5 count proves byte-level text fidelity through the
    serde; the oracle computes the same from the parquet directly.
    PERMISSIVE corrupt-record handling is configured exactly as a
    production ingest would (E2), though the fixture is clean."""
    from sensor_data_pipeline_spark.sources.warehouse import SCRATCH

    d = load_table(spark, "documents", sf_dir)
    path = f"{SCRATCH}/roundtrip/jsonl_{_scratch_tag(sf_dir)}"
    d.write.mode("overwrite").json(path)
    back = (
        spark.read.schema("doc_id long, text string, lang string, source string, n_chars long")
        .option("mode", "PERMISSIVE")
        .json(path)
    )
    return (
        back.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
            F.countDistinct(F.md5("text")).cast("bigint").alias("n_distinct_texts"),
        )
        .orderBy("lang")
    )


@register(
    "q155_csv_roundtrip",
    category="json",
    oracle="""
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_distinct_texts
FROM documents
GROUP BY source ORDER BY source
""",
)
def q155_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV ingest fidelity, same proof shape as q154: explicit schema,
    header on, RFC-4180 quoting+escaping configured for embedded
    delimiters/newlines (multiLine covers quoted newlines — needed for
    real corpora even though this fixture is clean). Distinct-md5
    equality against the parquet oracle pins the serde losslessness."""
    from sensor_data_pipeline_spark.sources.warehouse import SCRATCH

    d = load_table(spark, "documents", sf_dir)
    path = f"{SCRATCH}/roundtrip/csv_{_scratch_tag(sf_dir)}"
    d.write.mode("overwrite").option("header", True).option("quoteAll", True).option(
        "escape", '"'
    ).csv(path)
    back = (
        spark.read.schema("doc_id long, text string, lang string, source string, n_chars long")
        .option("header", True)
        .option("quote", '"')
        .option("escape", '"')
        .option("multiLine", True)
        .csv(path)
    )
    return (
        back.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
            F.countDistinct(F.md5("text")).cast("bigint").alias("n_distinct_texts"),
        )
        .orderBy("source")
    )


@register(
    "q204_polymorphic_udtf",
    category="udf",
    oracle="""
SELECT doc_id, w[1] AS tok_1, w[2] AS tok_2, w[3] AS tok_3
FROM (SELECT doc_id, regexp_split_to_array(text, '\\s+') AS w
      FROM documents WHERE doc_id < 200)
ORDER BY doc_id
""",
)
def q204_polymorphic_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POLYMORPHIC Python UDTF (§2.8 depth): the output schema is
    computed at ANALYSIS time from the literal `k` argument
    (analyze() -> AnalyzeResult), so `lead_tokens(text, 3)` produces
    columns tok_1..tok_3 and `..., 5` would produce five — the
    schema-from-arguments contract q94's fixed-schema UDTF cannot
    express. eval() re-splits with the same regex as the oracle so
    token boundaries are engine-identical. Lateral application stays
    same-partition (no shuffle); Python UDTFs remain the slow path —
    the hot-path equivalent is the element_at projection."""
    import re as _re

    from pyspark.sql.functions import udtf
    from pyspark.sql.types import StringType, StructField, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    class LeadTokens:
        @staticmethod
        def analyze(text: AnalyzeArgument, k: AnalyzeArgument) -> AnalyzeResult:
            n = int(k.value)
            return AnalyzeResult(
                StructType([StructField(f"tok_{i + 1}", StringType()) for i in range(n)])
            )

        def eval(self, text: str, k: int):
            toks = _re.split(r"\s+", text or "")
            yield tuple(toks[i] if i < len(toks) else None for i in range(int(k)))

    spark.udtf.register("lead_tokens", udtf(LeadTokens))
    d = load_table(spark, "documents", sf_dir).filter(F.col("doc_id") < 200)
    d.select("doc_id", "text").createOrReplaceTempView("q204_docs")
    return spark.sql(
        """
        SELECT d.doc_id, t.*
        FROM q204_docs d, LATERAL lead_tokens(d.text, 3) t
        ORDER BY d.doc_id
        """
    )


# ---------------------------------------------------------------------------
# q304 — DataFrame.transpose (Spark 4 reshape API)
# ---------------------------------------------------------------------------


@register(
    "q304_transpose_metrics",
    category="reshape",
    oracle="""
WITH g AS (
  SELECT l_returnflag,
         CAST(count(*) AS BIGINT) AS n_rows,
         CAST(sum(CAST(round(l_quantity, 0) AS BIGINT)) AS BIGINT) AS qty_units,
         CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS price_cents
  FROM lineitem GROUP BY l_returnflag
)
SELECT 'n_rows' AS key,
       CAST(min(CASE WHEN l_returnflag = 'A' THEN n_rows END) AS BIGINT) AS A,
       CAST(min(CASE WHEN l_returnflag = 'N' THEN n_rows END) AS BIGINT) AS N,
       CAST(min(CASE WHEN l_returnflag = 'R' THEN n_rows END) AS BIGINT) AS R
FROM g
UNION ALL
SELECT 'price_cents',
       CAST(min(CASE WHEN l_returnflag = 'A' THEN price_cents END) AS BIGINT),
       CAST(min(CASE WHEN l_returnflag = 'N' THEN price_cents END) AS BIGINT),
       CAST(min(CASE WHEN l_returnflag = 'R' THEN price_cents END) AS BIGINT)
FROM g
UNION ALL
SELECT 'qty_units',
       CAST(min(CASE WHEN l_returnflag = 'A' THEN qty_units END) AS BIGINT),
       CAST(min(CASE WHEN l_returnflag = 'N' THEN qty_units END) AS BIGINT),
       CAST(min(CASE WHEN l_returnflag = 'R' THEN qty_units END) AS BIGINT)
FROM g
ORDER BY key
""",
)
def q304_transpose_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metric matrix pivot via DataFrame.transpose() (new in Spark 4):
    the per-returnflag aggregate frame (flags as rows, metrics as
    columns) flips to metrics-as-rows / flags-as-columns — the report
    layout — without hand-writing a stack+pivot pair. transpose()
    takes new column names from the FIRST column's values in row
    order, so the input is sorted on the flag first; all metric cells
    share one BIGINT type (transpose requires a least common type
    across transposed cells). The oracle writes the flipped layout as
    conditional aggregation. Scale: transpose collects the first
    column to the driver to learn the output schema — correct ONLY
    for domain-bounded frames like this 3-row aggregate (the same
    bound every pivot holds); the heavy reduce happens before it."""
    li = load_table(spark, "lineitem", sf_dir)
    g = (
        li.groupBy("l_returnflag")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.sum(F.round(F.col("l_quantity"), 0).cast("bigint"))
            .cast("bigint")
            .alias("qty_units"),
            F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("bigint"))
            .cast("bigint")
            .alias("price_cents"),
        )
        .orderBy("l_returnflag")
    )
    return g.transpose().orderBy("key")
