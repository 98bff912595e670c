"""Round-10 surface extensions — mixture/statistics/operational-scale
ops for a 100 TB training-data pipeline:

* q379 temperature-scaled source sampling (the multilingual-LM mixture
  rule: p_i ∝ n_i^α) with effective-epoch accounting;
* q380 Good-Turing unseen-mass + Chao1 richness estimation over the
  3-gram shingle space, per source and merged;
* q381 hot-key salting-plan synthesis with a post-salt balance proof;
* q382 partition-sizing advisor: measured per-table logical widths →
  scan/shuffle partition recommendations at byte targets;
* q383 n-gram vocabulary coverage curve (smallest vocab covering
  1-ε of token mass, ε grid) — the tokenizer-sizing table.

Family threads (continuing frontier5.py):

1. Sufficient statistics first: every query folds the corpus to a
   bounded frame (per-source token totals, the vocab-bounded
   frequency histogram, the |keys|-bounded key census, 1-row
   per-table stats) before any window/join runs — the only shapes
   whose shuffles stay constant-width as the corpus grows.

2. Portable float discipline: the only non-integer math is (a)
   IEEE-correctly-rounded sqrt chains (α = 1/2, 1/4 — identical
   bits on any IEEE engine), (b) ORDERED cumulative sums (prefix
   folds are deterministic; totals are read as max(cum) over the
   increasing prefix, never an unordered float SUM — the q288
   discipline), and (c) single divisions of identical operands.
   Everything else rides exact integers with DECIMAL(38,0)/HUGEINT
   operand guards where 100 TB token masses cross bigint*1e6.

All operators re-derived from public sources cited per query (Devlin
et al. 2019 / Conneau et al. 2020 temperature sampling, Good 1953 /
Gale & Sampson 1995 Good-Turing, Chao 1984, Spark AQE skew-join docs,
Zipf coverage folklore per Gage 1994 / Sennrich et al. 2016 BPE
sizing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sensor_data_pipeline_spark.functions.text import tokenize
from sensor_data_pipeline_spark.plans.registry import register
from sensor_data_pipeline_spark.sources.tables import load_table

_DUCK_WORDS = "regexp_split_to_array(text, '\\s+')"

# the SAME 3-gram shingle construction as the dedup/sketch family —
# import, never duplicate (a drifted copy would silently make the
# statistics a different species space; review r9 finding)
from sensor_data_pipeline_spark.plans.frontier4 import (  # noqa: E402
    _DUCK_SHINGLES_DUP as _DUCK_SHINGLES,
    _shingles_dup as _shingles,
)


# ---------------------------------------------------------------------------
# q379 — temperature-scaled source sampling (p_i ∝ n_i^α)
# ---------------------------------------------------------------------------


@register(
    "q379_temperature_mixture",
    category="mixing",
    oracle=f"""
WITH tok AS (
  SELECT source, CAST(sum(len({_DUCK_WORDS})) AS BIGINT) AS n_tok
  FROM documents GROUP BY source
),
w AS (
  SELECT source, n_tok,
         CAST(n_tok AS DOUBLE) AS w100,
         sqrt(CAST(n_tok AS DOUBLE)) AS w50,
         sqrt(sqrt(CAST(n_tok AS DOUBLE))) AS w25,
         sum(CAST(n_tok AS DOUBLE)) OVER (ORDER BY source ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c100,
         sum(sqrt(CAST(n_tok AS DOUBLE))) OVER (ORDER BY source ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c50,
         sum(sqrt(sqrt(CAST(n_tok AS DOUBLE)))) OVER (ORDER BY source ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c25
  FROM tok
),
tot AS (SELECT max(c100) AS t100, max(c50) AS t50, max(c25) AS t25,
               CAST(sum(n_tok) AS BIGINT) AS n_total FROM w)
SELECT source, n_tok,
       w100 / t100 AS share_a100,
       w50 / t50 AS share_a50,
       w25 / t25 AS share_a25,
       (w50 / t50) * CAST(n_total AS DOUBLE) / CAST(n_tok AS DOUBLE) AS epochs_a50,
       (w25 / t25) * CAST(n_total AS DOUBLE) / CAST(n_tok AS DOUBLE) AS epochs_a25
FROM w CROSS JOIN tot
ORDER BY source
""",
)
def q379_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source sampling (Devlin et al. 2019 mBERT
    exponential smoothing; Conneau et al. 2020 XLM-R, all public):
    sampling share p_i ∝ n_i^α flattens the source distribution as α
    falls — α=1 is proportional, α=1/4 strongly upsamples small
    sources. The α grid is {1, 1/2, 1/4} because those powers are
    sqrt CHAINS: IEEE-754 sqrt is correctly rounded, so the weights
    are bit-identical on any IEEE engine, where a pow(x, 0.3) would
    not be. epochs_aXX = share · N_total / n_i is the effective
    epoch count a one-total-epoch token budget implies per source —
    the over-repetition warning light (cf. q352's epoch budget).

    Float discipline: denominators are read as max() over the ORDERED
    cumulative sum by source (prefix folds are deterministic and the
    prefix is increasing — the q288 no-unordered-float-total rule);
    shares/epochs are single divisions of identical operands.

    Scale shape: per-source token counts are one map-side-combinable
    corpus scan onto |sources| keys; everything downstream runs on
    the |sources|-row frame. No row-scale join, no row-scale window."""
    d = load_table(spark, "documents", sf_dir)
    tok = d.groupBy("source").agg(
        F.sum(F.size(tokenize(F.col("text")))).cast("bigint").alias("n_tok")
    )
    cw = Window.orderBy("source").rowsBetween(Window.unboundedPreceding, 0)
    w = tok.select(
        "source",
        "n_tok",
        F.col("n_tok").cast("double").alias("w100"),
        F.sqrt(F.col("n_tok").cast("double")).alias("w50"),
        F.sqrt(F.sqrt(F.col("n_tok").cast("double"))).alias("w25"),
    ).select(
        "*",
        F.sum("w100").over(cw).alias("c100"),
        F.sum("w50").over(cw).alias("c50"),
        F.sum("w25").over(cw).alias("c25"),
    )
    tot = w.agg(
        F.max("c100").alias("t100"),
        F.max("c50").alias("t50"),
        F.max("c25").alias("t25"),
        F.sum("n_tok").cast("bigint").alias("n_total"),
    )
    return (
        w.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_tok",
            (F.col("w100") / F.col("t100")).alias("share_a100"),
            (F.col("w50") / F.col("t50")).alias("share_a50"),
            (F.col("w25") / F.col("t25")).alias("share_a25"),
            (
                (F.col("w50") / F.col("t50"))
                * F.col("n_total").cast("double")
                / F.col("n_tok").cast("double")
            ).alias("epochs_a50"),
            (
                (F.col("w25") / F.col("t25"))
                * F.col("n_total").cast("double")
                / F.col("n_tok").cast("double")
            ).alias("epochs_a25"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q380 — Good-Turing unseen mass + Chao1 richness over the shingle space
# ---------------------------------------------------------------------------


@register(
    "q380_unseen_mass_estimate",
    category="profile",
    oracle=f"""
WITH w AS (
  SELECT source, {_DUCK_WORDS} AS t FROM documents
),
sh AS (
  SELECT source, unnest({_DUCK_SHINGLES.format(w="t")}) AS s FROM w
),
cnt AS (
  SELECT source, s, CAST(count(*) AS BIGINT) AS c FROM sh GROUP BY source, s
),
allcnt AS (
  SELECT source, c FROM cnt
  UNION ALL
  SELECT '(all)' AS source, CAST(sum(c) AS BIGINT) AS c FROM cnt GROUP BY s
),
ff AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS v_distinct,
         CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
         CAST(sum(c) AS BIGINT) AS n_occ
  FROM allcnt GROUP BY source
)
SELECT source, v_distinct, n1, n2, n_occ,
       CAST(CAST(n1 AS HUGEINT) * 1000000 // n_occ AS BIGINT) AS unseen_ppm,
       CASE WHEN n2 > 0
            THEN CAST(v_distinct * 1000 + CAST(n1 AS HUGEINT) * n1 * 1000 // (2 * n2) AS BIGINT)
            ELSE NULL END AS chao1_milli
FROM ff
ORDER BY source
""",
)
def q380_unseen_mass_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Good-Turing unseen-probability mass (Good 1953; Gale & Sampson
    1995 — public) and Chao1 species-richness (Chao 1984) over the
    3-gram shingle space, per source AND merged: P(unseen) ≈ N1/N
    (the Turing estimator — the share of shingle mass held by
    singletons prices how much of the n-gram distribution a crawl of
    this source has NOT seen yet), and Chao1 = V + N1²/(2·N2) lower-
    bounds the true shingle vocabulary. Both ride the frequency-of-
    frequencies sufficient statistic. The unigram space would be
    degenerate here (the fixture's 31-word vocabulary has no
    singletons); shingles are the honest species, exactly as the
    dedup family uses them.

    Integer exactness: unseen_ppm and chao1's correction term guard
    the multiply operand-side (HUGEINT / DECIMAL(38,0)) — shingle
    masses cross bigint·1e6 at the 100 TB design point, and N1² alone
    reaches ~1e24. chao1_milli is fixed-point ×1000 (truncating DIV,
    portable by measurement); NULL when N2=0 (the estimator's own
    undefined case, surfaced rather than patched).

    Scale shape: the '(all)' row re-aggregates PER-SOURCE counts at
    the shingle key (counts are mergeable by addition — one
    vocab-bounded shuffle), never re-scans the corpus; the ff
    histogram then folds each source to 4 numbers. Corpus is scanned
    once; both shuffles are keyed and map-side combinable."""
    d = load_table(spark, "documents", sf_dir)
    # tokenize once into a stored column (q335 pin — see q367)
    tw = d.select("source", tokenize(F.col("text")).alias("w")).localCheckpoint(
        eager=True
    )
    sh = tw.select("source", F.explode(_shingles(F.col("w"))).alias("s"))
    # per-(source, shingle) counts: TWO consumers (per-source ff +
    # the merged re-aggregation) — pin the vocab-bounded frame, not
    # the corpus-scale shingle stream (the q367 lesson)
    cnt = (
        sh.groupBy("source", "s")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .localCheckpoint(eager=True)
    )
    merged = cnt.groupBy("s").agg(F.sum("c").cast("bigint").alias("c")).select(
        F.lit("(all)").alias("source"), "c"
    )
    allcnt = cnt.select("source", "c").unionByName(merged)
    ff = allcnt.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("v_distinct"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).cast("bigint").alias("n1"),
        F.sum(F.when(F.col("c") == 2, 1).otherwise(0)).cast("bigint").alias("n2"),
        F.sum("c").cast("bigint").alias("n_occ"),
    )
    return ff.select(
        "source",
        "v_distinct",
        "n1",
        "n2",
        "n_occ",
        F.expr(
            "CAST(CAST(n1 AS DECIMAL(38,0)) * 1000000 DIV n_occ AS BIGINT)"
        ).alias("unseen_ppm"),
        F.expr(
            "CASE WHEN n2 > 0 THEN CAST(v_distinct * 1000"
            " + CAST(n1 AS DECIMAL(38,0)) * n1 * 1000 DIV (2 * n2) AS BIGINT)"
            " ELSE NULL END"
        ).alias("chao1_milli"),
    ).orderBy("source")


# ---------------------------------------------------------------------------
# q381 — hot-key salting-plan synthesis with post-salt balance proof
# ---------------------------------------------------------------------------

_SALT_PARTITIONS = 32  # the plan's target parallelism (cluster task slots)


@register(
    "q381_salting_plan",
    category="layout",
    oracle=f"""
WITH census AS (
  SELECT event_type AS k, CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY event_type
),
tot AS (
  SELECT CAST(sum(cnt) AS BIGINT) AS total,
         CAST(CASE WHEN sum(cnt) // {_SALT_PARTITIONS} < 1 THEN 1
              ELSE sum(cnt) // {_SALT_PARTITIONS} END AS BIGINT) AS target
  FROM census
)
SELECT k, cnt,
       CAST(cnt * 1000000 // total AS BIGINT) AS share_ppm,
       cnt > target AS is_hot,
       CAST(CASE WHEN cnt > target
            THEN CASE WHEN (cnt + target - 1) // target > {_SALT_PARTITIONS}
                 THEN {_SALT_PARTITIONS}
                 ELSE (cnt + target - 1) // target END
            ELSE 1 END AS BIGINT) AS salt_factor,
       CAST((cnt + (CASE WHEN cnt > target
            THEN CASE WHEN (cnt + target - 1) // target > {_SALT_PARTITIONS}
                 THEN {_SALT_PARTITIONS}
                 ELSE (cnt + target - 1) // target END
            ELSE 1 END) - 1) // (CASE WHEN cnt > target
            THEN CASE WHEN (cnt + target - 1) // target > {_SALT_PARTITIONS}
                 THEN {_SALT_PARTITIONS}
                 ELSE (cnt + target - 1) // target END
            ELSE 1 END) AS BIGINT) AS post_salt_max_rows
FROM census CROSS JOIN tot
ORDER BY cnt DESC, k
""",
)
def q381_salting_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key salting-plan synthesis (the skew-mitigation pattern
    Spark's AQE skew-join documents, applied to aggregation keys —
    public folklore, mechanized): from the key census, a key is HOT
    when its row count exceeds the per-partition target
    (total DIV 32, floored at 1), and its salt factor
    is ceil(cnt/target) capped at the partition count — replicate the
    key into that many sub-keys and no task sees more than
    post_salt_max_rows = ceil(cnt/salt) rows. The output IS the plan
    plus its balance proof: post_salt_max_rows ≤ max(target,
    ceil(cnt/32)) by construction, which is what a
    pipeline checks before committing a salted repartition at 100 TB.
    ceil rides (a+b-1) DIV b — exact integers, engine-portable.

    Scale shape: the census is one map-side-combinable scan onto
    |keys| rows; the plan is arithmetic on that bounded frame against
    a broadcast 1-row total. The synthesized plan's own cost model is
    the point — the query never touches row-scale data again."""
    e = load_table(spark, "events", sf_dir)
    census = e.groupBy(F.col("event_type").alias("k")).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    tot = census.agg(
        F.sum("cnt").cast("bigint").alias("total"),
        F.expr(
            f"CAST(GREATEST(CAST(1 AS BIGINT), sum(cnt) DIV {_SALT_PARTITIONS}) AS BIGINT)"
        ).alias("target"),
    )
    salt = (
        f"CASE WHEN cnt > target THEN LEAST(CAST({_SALT_PARTITIONS} AS BIGINT),"
        f" (cnt + target - 1) DIV target) ELSE CAST(1 AS BIGINT) END"
    )
    return (
        census.crossJoin(F.broadcast(tot))
        .select(
            "k",
            "cnt",
            F.expr("CAST(cnt * 1000000 DIV total AS BIGINT)").alias("share_ppm"),
            (F.col("cnt") > F.col("target")).alias("is_hot"),
            F.expr(f"CAST({salt} AS BIGINT)").alias("salt_factor"),
            F.expr(
                f"CAST((cnt + ({salt}) - 1) DIV ({salt}) AS BIGINT)"
            ).alias("post_salt_max_rows"),
        )
        .orderBy(F.col("cnt").desc(), "k")
    )


# ---------------------------------------------------------------------------
# q382 — partition-sizing advisor from measured per-table logical widths
# ---------------------------------------------------------------------------

_SCAN_TARGET_BYTES = 128 * 1024 * 1024  # maxPartitionBytes-style scan target
_SHUFFLE_TARGET_BYTES = 64 * 1024 * 1024  # post-AQE shuffle-partition target

# (table, row-bytes expression) — logical widths: 8 bytes per
# int64/double/timestamp, measured character length per string, 4 per
# float32 element. Identical definitions on both engines, so the
# totals are exact integers; in production the same advisor reads
# parquet footer/catalog stats instead of scanning (the docstring
# covers why the math, not the scan, is the artifact).
_TABLE_WIDTH = {
    "region": "8 + length(r_name)",
    "nation": "8 + 8 + length(n_name)",
    "customer": "8 + 8 + 8 + length(c_name) + length(c_mktsegment)",
    "supplier": "8 + 8 + 8 + length(s_name)",
    "part": "8 + 4 + 8 + length(p_name) + length(p_brand) + length(p_type)",
    "orders": "8 + 8 + 8 + 8 + length(o_orderstatus) + length(o_orderpriority)",
    "lineitem": "8 * 9 + length(l_returnflag) + length(l_linestatus)",
    "events": "8 + 8 + 8 + 8 + length(event_type) + length(props)",
    "documents": "8 + 8 + length(text) + length(lang) + length(source)",
    "embeddings": "8 + 4 + 4 * len(embedding)",
}


@register(
    "q382_partition_sizing_advisor",
    category="layout",
    oracle="\nUNION ALL\n".join(
        f"""SELECT '{t}' AS tbl, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum({expr}) AS BIGINT) AS logical_bytes,
       CAST((sum({expr}) + {_SCAN_TARGET_BYTES - 1}) // {_SCAN_TARGET_BYTES} AS BIGINT) AS scan_partitions,
       CAST((sum({expr}) + {_SHUFFLE_TARGET_BYTES - 1}) // {_SHUFFLE_TARGET_BYTES} AS BIGINT) AS shuffle_partitions,
       CAST(sum({expr}) // count(*) AS BIGINT) AS avg_row_bytes
FROM {t}"""
        for t, expr in _TABLE_WIDTH.items()
    )
    + "\nORDER BY tbl",
)
def q382_partition_sizing_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-sizing advisor: per-table measured logical widths →
    the partition counts a 100 TB deployment should configure — scan
    partitions at the maxPartitionBytes-style 128 MB target and
    shuffle partitions at the AQE-style 64 MB advisory target (both
    knobs and targets are public Spark configuration practice). Width
    is a LOGICAL byte model (8 per fixed-width column, character
    length per string, 4 per float32 lane) so the advisory is
    storage-codec-independent and exactly reproducible; ceil rides
    (a+b-1) DIV b. In production the same arithmetic reads parquet
    footer statistics instead of scanning — the advisor's artifact is
    the sizing table, and this query doubles as the audit that the
    catalog stats match the data.

    Scale shape: ten independent column-pruned aggregate scans (each
    reads only the width columns — check ReadSchema), each folding to
    ONE row; the union is a 10-row frame. Nothing shuffles row-scale
    data."""
    frames = []
    for t, expr in _TABLE_WIDTH.items():
        spark_expr = expr.replace("len(", "size(")
        frames.append(
            load_table(spark, t, sf_dir).agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.expr(f"CAST(sum({spark_expr}) AS BIGINT)").alias("logical_bytes"),
            ).select(
                F.lit(t).alias("tbl"),
                "n_rows",
                "logical_bytes",
                F.expr(
                    f"CAST((logical_bytes + {_SCAN_TARGET_BYTES - 1})"
                    f" DIV {_SCAN_TARGET_BYTES} AS BIGINT)"
                ).alias("scan_partitions"),
                F.expr(
                    f"CAST((logical_bytes + {_SHUFFLE_TARGET_BYTES - 1})"
                    f" DIV {_SHUFFLE_TARGET_BYTES} AS BIGINT)"
                ).alias("shuffle_partitions"),
                F.expr("CAST(logical_bytes DIV n_rows AS BIGINT)").alias(
                    "avg_row_bytes"
                ),
            )
        )
    out = frames[0]
    for fr in frames[1:]:
        out = out.unionByName(fr)
    return out.orderBy("tbl")


# ---------------------------------------------------------------------------
# q383 — n-gram vocabulary coverage curve (tokenizer sizing)
# ---------------------------------------------------------------------------

_COVERAGE_EPS_PPM = (100000, 10000, 1000)  # 90% / 99% / 99.9% coverage


@register(
    "q383_vocab_coverage_curve",
    category="text",
    oracle=f"""
WITH w AS (
  SELECT {_DUCK_WORDS} AS t FROM documents
),
sh AS (
  SELECT unnest({_DUCK_SHINGLES.format(w="t")}) AS s FROM w
),
cnt AS (
  SELECT s, CAST(count(*) AS BIGINT) AS c FROM sh GROUP BY s
),
ranked AS (
  SELECT c,
         row_number() OVER (ORDER BY c DESC, s) AS rk,
         sum(c) OVER (ORDER BY c DESC, s ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM cnt
),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS v FROM cnt)
SELECT eps_ppm,
       CAST(min(CASE WHEN CAST(cum AS HUGEINT) * 1000000 >= CAST(1000000 - eps_ppm AS HUGEINT) * n
                THEN rk ELSE NULL END) AS BIGINT) AS vocab_size,
       (SELECT v FROM tot) AS v_total,
       CAST(CAST(min(CASE WHEN CAST(cum AS HUGEINT) * 1000000 >= CAST(1000000 - eps_ppm AS HUGEINT) * n
                THEN rk ELSE NULL END) AS HUGEINT) * 1000000 // (SELECT v FROM tot) AS BIGINT) AS vocab_share_ppm
FROM ranked CROSS JOIN tot
CROSS JOIN (SELECT unnest([{", ".join(str(e) for e in _COVERAGE_EPS_PPM)}]) AS eps_ppm)
GROUP BY eps_ppm, n
ORDER BY eps_ppm DESC
""",
)
def q383_vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve over the 3-gram shingle space: the
    smallest frequency-ranked vocabulary covering 1-ε of token mass,
    for ε ∈ {10%, 1%, 0.1%} — the sizing table a tokenizer/vocab
    decision reads (the Zipf-coverage argument behind BPE vocabulary
    budgets; Gage 1994, Sennrich et al. 2016, both public).
    vocab_share_ppm says what FRACTION of the distinct space that
    prefix is — the gap between 90% and 99.9% coverage is the long
    tail's price tag.

    Integer exactness: the coverage predicate is cum·1e6 ≥
    (1e6-ε)·N in HUGEINT/DECIMAL(38,0) operands (shingle mass crosses
    bigint·1e6 at 100 TB); ranks come from a deterministic
    (count DESC, shingle) order.

    Scale shape: the corpus folds to the vocab-bounded frequency
    frame in one map-side-combinable pass; the ranking window runs on
    that bounded frame (the allowed aggregate-dominated global-window
    shape), and the ε panel is a 3-row broadcast. The answer frame is
    3 rows."""
    d = load_table(spark, "documents", sf_dir)
    tw = d.select(tokenize(F.col("text")).alias("w")).localCheckpoint(eager=True)
    sh = tw.select(F.explode(_shingles(F.col("w"))).alias("s"))
    cnt = (
        sh.groupBy("s")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .localCheckpoint(eager=True)
    )
    rw = Window.orderBy(F.col("c").desc(), "s")
    ranked = cnt.select(
        "c",
        F.row_number().over(rw).cast("bigint").alias("rk"),
        F.sum("c").over(rw.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
    )
    tot = cnt.agg(
        F.sum("c").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("v"),
    )
    eps = spark.createDataFrame(
        [(e,) for e in _COVERAGE_EPS_PPM], "eps_ppm bigint"
    )
    return (
        ranked.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(eps))
        .groupBy("eps_ppm", "n", "v")
        .agg(
            F.expr(
                "CAST(min(CASE WHEN CAST(cum AS DECIMAL(38,0)) * 1000000"
                " >= CAST(1000000 - eps_ppm AS DECIMAL(38,0)) * n"
                " THEN rk ELSE NULL END) AS BIGINT)"
            ).alias("vocab_size"),
        )
        .select(
            "eps_ppm",
            "vocab_size",
            F.col("v").alias("v_total"),
            F.expr(
                "CAST(CAST(vocab_size AS DECIMAL(38,0)) * 1000000 DIV v AS BIGINT)"
            ).alias("vocab_share_ppm"),
        )
        .orderBy(F.col("eps_ppm").desc())
    )
