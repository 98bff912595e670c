"""Round-8 surface extensions — the training-data operations frontier,
part 3: template/boilerplate mining, corpus-statistics profiling (Zipf
octaves), privacy k-anonymity auditing, label-agreement measurement
(Cohen's kappa), data-constrained epoch budgeting (Muennighoff et al.),
filter-stack co-fire diagnostics, vocabulary-coverage (OOV) auditing,
and split-balance chi-square testing.

Family threads (continuing plans/frontier.py and frontier2.py):

1. Sufficient-statistic discipline: every audit reduces the corpus to
   the SMALLEST exact partial that answers the question (per-token
   counts, per-class sizes, a 2x2 confusion, per-stratum split counts)
   before any reshaping/windowing — at 100 TB the one corpus pass is
   the cost and everything downstream runs on bounded frames.

2. Integer-exact statistics: kappa, chi-square, Jaccard co-fire, OOV
   shares, and epoch utilities are all stated as single integer (or
   decimal(38,0)) divisions — ppm outputs, never accumulated floats —
   so both engines land bit-identical values and every gate decision
   is reproducible from a data version.

All operators here go beyond the reference's own surface (its analytics
stop at per-tick scalar derivation, e.g. src/modules/module_rpi_ups_hat.c);
they are the corpus-governance layer a 100 TB training pipeline needs,
re-derived from public papers cited per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sensor_data_pipeline_spark.functions.text import tokenize
from sensor_data_pipeline_spark.plans.registry import register
from sensor_data_pipeline_spark.sources.tables import load_table

_DUCK_WORDS = "regexp_split_to_array(text, '\\s+')"

# ---------------------------------------------------------------------------
# q348 — template skeleton mining (boilerplate detection)
# ---------------------------------------------------------------------------

_SKEL_PREFIX = 8  # tokens of structural prefix that define a template
_TOP_TEMPLATES = 20


@register(
    "q348_template_skeleton_mining",
    category="quality",
    oracle=f"""
WITH s AS (
  SELECT doc_id, source,
         array_to_string(list_transform(({_DUCK_WORDS})[1:{_SKEL_PREFIX}],
                         t -> CAST(length(t) AS VARCHAR)), '-') AS skeleton
  FROM documents
),
g AS (
  SELECT skeleton,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
         CAST(min(doc_id) AS BIGINT) AS first_doc
  FROM s GROUP BY skeleton HAVING count(*) >= 2
)
SELECT skeleton, n_docs, n_sources, first_doc
FROM g
ORDER BY n_docs DESC, skeleton
LIMIT {_TOP_TEMPLATES}
""",
)
def q348_template_skeleton_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Template/boilerplate mining by structural skeleton — the
    Drain-style log-template idea (He et al. 2017, public paper)
    applied to corpus curation: documents sharing the length-sequence
    of their first {_SKEL_PREFIX} tokens are instances of one
    structural template (navigation chrome, generated boilerplate,
    scraper artifacts), the mass dedup misses because the VALUES
    differ while the SHAPE repeats. Emitted: the top templates by
    instance count with their source spread (a template spanning many
    sources is site-chrome; one source is a generator signature).

    Scale shape: the skeleton is a per-row map (bounded at
    {_SKEL_PREFIX} small integers, <= ~50 chars of grouping key
    regardless of document length), so the corpus pass is one
    map-side-combinable aggregation on a short key; the HAVING >= 2
    filter and top-K ordering run on the template frame (bounded by
    distinct shapes, far below corpus size). No join, one shuffle."""
    d = load_table(spark, "documents", sf_dir)
    skel = F.array_join(
        F.transform(
            F.slice(tokenize(F.col("text")), 1, _SKEL_PREFIX),
            lambda t: F.length(t).cast("string"),
        ),
        "-",
    )
    return (
        d.select(skel.alias("skeleton"), "source", "doc_id")
        .groupBy("skeleton")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.countDistinct("source").cast("bigint").alias("n_sources"),
            F.min("doc_id").cast("bigint").alias("first_doc"),
        )
        .filter(F.col("n_docs") >= 2)
        .orderBy(F.col("n_docs").desc(), "skeleton")
        .limit(_TOP_TEMPLATES)
    )


# ---------------------------------------------------------------------------
# q349 — Zipf octave profile of the token frequency distribution
# ---------------------------------------------------------------------------


@register(
    "q349_zipf_octave_profile",
    category="text",
    oracle=f"""
WITH tok AS (
  SELECT unnest({_DUCK_WORDS}) AS token FROM documents
),
tc AS (
  SELECT token, count(*) AS cnt FROM tok GROUP BY token
),
oct AS (
  SELECT CAST(length(bin(cnt)) - 1 AS BIGINT) AS octave,
         CAST(count(*) AS BIGINT) AS n_types,
         CAST(sum(cnt) AS BIGINT) AS mass
  FROM tc GROUP BY 1
),
tot AS (SELECT sum(mass) AS total FROM oct)
SELECT octave, n_types, mass,
       CAST(mass * 1000000 // (SELECT total FROM tot) AS BIGINT) AS mass_ppm,
       CAST(mass * 1000000 // lag(mass) OVER (ORDER BY octave) AS BIGINT) AS ratio_vs_prev_ppm
FROM oct ORDER BY octave
""",
)
def q349_zipf_octave_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-shape profile of the corpus token-frequency distribution
    in frequency OCTAVES — the doubling buckets [2^k, 2^(k+1)). A
    Zipfian corpus (Zipf 1949; Piantadosi 2014 review, public) has
    near-constant token MASS per octave; a bot-inflated or
    deduplicated-to-death corpus bends the curve, so the
    octave-to-octave mass ratio is the drift signal a curation
    pipeline tracks per snapshot. Companion to q249 (Heaps' law vocab
    growth): that audits TYPE growth, this audits the frequency
    spectrum.

    The octave index is length(bin(cnt)) - 1 on both engines — the
    q339 integer-log2 idiom, because float log2 rounds unportably at
    exact powers of two. Ratios are single integer divisions (ppm).

    Scale shape: ONE corpus pass partial-aggregates token counts (the
    sufficient statistic, bounded by vocabulary size, Heaps-sublinear
    in corpus mass); the octave frame is <= 64 rows and PINNED (two
    consumers: the 1-row total and the profile — without the pin the
    corpus tokenizes twice), so its global window (lag over octave)
    is domain-bounded — it runs after an aggregation on every input
    path."""
    d = load_table(spark, "documents", sf_dir)
    tc = (
        d.select(F.explode(tokenize(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    oct_df = (
        tc.groupBy((F.length(F.bin(F.col("cnt"))) - 1).cast("bigint").alias("octave"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_types"),
            F.sum("cnt").cast("bigint").alias("mass"),
        )
        # <= 64 rows; two consumers (total + profile) — without the pin
        # the corpus tokenizes twice for the 1-row total
        .localCheckpoint(eager=True)
    )
    w = Window.orderBy("octave")
    total = oct_df.agg(F.sum("mass").alias("total"))
    return (
        oct_df.crossJoin(F.broadcast(total))
        .withColumn("prev_mass", F.lag("mass").over(w))
        .select(
            "octave",
            "n_types",
            "mass",
            F.expr("CAST((mass * 1000000) DIV total AS BIGINT)").alias("mass_ppm"),
            F.expr("CAST((mass * 1000000) DIV prev_mass AS BIGINT)").alias(
                "ratio_vs_prev_ppm"
            ),
        )
        .orderBy("octave")
    )


# ---------------------------------------------------------------------------
# q350 — k-anonymity audit over quasi-identifiers
# ---------------------------------------------------------------------------

_K_LEVELS = (2, 5, 10, 25)


@register(
    "q350_kanonymity_audit",
    category="privacy",
    oracle=f"""
WITH q AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(round(c_acctbal * 100, 0) AS BIGINT) // 100000 AS bal_bucket
  FROM customer
),
cls AS (
  SELECT c_nationkey, c_mktsegment, bal_bucket, count(*) AS sz
  FROM q GROUP BY 1, 2, 3
),
tot AS (SELECT sum(sz) AS n_rows FROM cls)
SELECT k,
       CAST(sum(CASE WHEN sz < k THEN 1 ELSE 0 END) AS BIGINT) AS classes_at_risk,
       CAST(sum(CASE WHEN sz < k THEN sz ELSE 0 END) AS BIGINT) AS rows_at_risk,
       CAST(sum(CASE WHEN sz < k THEN sz ELSE 0 END) * 1000000
            // (SELECT n_rows FROM tot) AS BIGINT) AS rows_at_risk_ppm
FROM cls CROSS JOIN (SELECT unnest([{", ".join(str(k) for k in _K_LEVELS)}]) AS k)
GROUP BY k ORDER BY k
""",
)
def q350_kanonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit (Sweeney 2002, public paper): under the
    quasi-identifier tuple (nation, market segment, $1000 account-
    balance bucket), how many rows sit in equivalence classes smaller
    than k — the re-identification risk profile a privacy review needs
    BEFORE user-derived data enters a training corpus, reported for
    the standard k ladder {_K_LEVELS}. The balance bucket is exact
    integer cents DIV 100000 (truncation identical on both engines,
    including negative balances — the int_div discipline).

    Scale shape: one pass aggregates rows to equivalence CLASSES (the
    sufficient statistic; bounded by the QI domain product, not row
    count), PINNED because two consumers read it (the row total and
    the ladder roll-up); the k-ladder is a 4-row broadcast cross join
    over that class frame. Nothing after the first aggregation sees
    row-scale data."""
    c = load_table(spark, "customer", sf_dir)
    cls = (
        c.select(
            "c_nationkey",
            "c_mktsegment",
            F.expr(
                "CAST(round(c_acctbal * 100, 0) AS BIGINT) DIV 100000"
            ).alias("bal_bucket"),
        )
        .groupBy("c_nationkey", "c_mktsegment", "bal_bucket")
        .agg(F.count(F.lit(1)).alias("sz"))
        # bounded by the QI domain product; two consumers (total +
        # ladder) — without the pin the row-scale table is read twice
        .localCheckpoint(eager=True)
    )
    ks = spark.createDataFrame([(k,) for k in _K_LEVELS], "k int")
    total = cls.agg(F.sum("sz").alias("n_rows"))
    return (
        cls.crossJoin(F.broadcast(ks))
        .groupBy("k")
        .agg(
            F.sum(F.when(F.col("sz") < F.col("k"), 1).otherwise(0))
            .cast("bigint")
            .alias("classes_at_risk"),
            F.sum(F.when(F.col("sz") < F.col("k"), F.col("sz")).otherwise(0))
            .cast("bigint")
            .alias("rows_at_risk"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            F.col("k").cast("bigint").alias("k"),
            "classes_at_risk",
            "rows_at_risk",
            F.expr("CAST((rows_at_risk * 1000000) DIV n_rows AS BIGINT)").alias(
                "rows_at_risk_ppm"
            ),
        )
        .orderBy("k")
    )


# ---------------------------------------------------------------------------
# q351 — rater agreement (Cohen's kappa) between two labeling rules
# ---------------------------------------------------------------------------

_KAPPA_TOK = 25  # rater A: document has >= 25 tokens
_KAPPA_CHR = 140  # rater B: document has >= 140 characters


@register(
    "q351_rater_agreement_kappa",
    category="quality",
    oracle=f"""
WITH lab AS (
  SELECT lang,
         CASE WHEN len({_DUCK_WORDS}) >= {_KAPPA_TOK} THEN 1 ELSE 0 END AS ra,
         CASE WHEN n_chars >= {_KAPPA_CHR} THEN 1 ELSE 0 END AS rb
  FROM documents
),
conf AS (
  SELECT lang,
         CAST(sum(ra * rb) AS BIGINT) AS n_pp,
         CAST(sum(ra * (1 - rb)) AS BIGINT) AS n_pn,
         CAST(sum((1 - ra) * rb) AS BIGINT) AS n_np,
         CAST(sum((1 - ra) * (1 - rb)) AS BIGINT) AS n_nn
  FROM lab GROUP BY lang
)
SELECT lang, n_pp, n_pn, n_np, n_nn,
       CAST((
         (CAST(n_pp + n_pn + n_np + n_nn AS HUGEINT) * (n_pp + n_nn)
          - (CAST(n_pp + n_pn AS HUGEINT) * (n_pp + n_np)
             + CAST(n_np + n_nn AS HUGEINT) * (n_pn + n_nn))) * 1000000
         // NULLIF(CAST(n_pp + n_pn + n_np + n_nn AS HUGEINT)
                   * (n_pp + n_pn + n_np + n_nn)
                   - (CAST(n_pp + n_pn AS HUGEINT) * (n_pp + n_np)
                      + CAST(n_np + n_nn AS HUGEINT) * (n_pn + n_nn)), 0)
       ) AS BIGINT) AS kappa_ppm
FROM conf ORDER BY lang
""",
)
def q351_rater_agreement_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-rater agreement as Cohen's kappa (Cohen 1960, public) —
    the measurement a labeling/RLHF data pipeline runs before trusting
    annotations: here the two 'raters' are two deterministic quality
    rules (token-count gate vs character-count gate), and kappa says
    how much they agree BEYOND chance per language. kappa = (po - pe)
    / (1 - pe) reduces over the 2x2 confusion (a=both-pos, b, c,
    d=both-neg, n=a+b+c+d) to the single integer division

        (n*(a+d) - ((a+b)*(a+c) + (c+d)*(b+d))) * 1e6
        DIV (n*n - ((a+b)*(a+c) + (c+d)*(b+d)))

    so the statistic is bit-identical on both engines (numerator may
    be negative; DIV/​// truncate toward zero identically — the
    measured int_div semantics). Products ride decimal(38,0)/HUGEINT
    so per-language counts past 2^31 cannot overflow n*n.

    Scale shape: one corpus pass folds to a per-language 2x2 confusion
    (the sufficient statistic, 4 integers per language); the kappa
    arithmetic runs on that bounded frame. No join, one map-side-
    combinable shuffle."""
    d = load_table(spark, "documents", sf_dir)
    ra = F.when(F.size(tokenize(F.col("text"))) >= _KAPPA_TOK, 1).otherwise(0)
    rb = F.when(F.col("n_chars") >= _KAPPA_CHR, 1).otherwise(0)
    conf = (
        d.select("lang", ra.alias("ra"), rb.alias("rb"))
        .groupBy("lang")
        .agg(
            F.sum(F.col("ra") * F.col("rb")).cast("bigint").alias("n_pp"),
            F.sum(F.col("ra") * (1 - F.col("rb"))).cast("bigint").alias("n_pn"),
            F.sum((1 - F.col("ra")) * F.col("rb")).cast("bigint").alias("n_np"),
            F.sum((1 - F.col("ra")) * (1 - F.col("rb"))).cast("bigint").alias("n_nn"),
        )
    )
    dec = "CAST({} AS DECIMAL(38,0))"
    n = "(n_pp + n_pn + n_np + n_nn)"
    pe_num = (
        f"({dec.format('n_pp + n_pn')} * (n_pp + n_np)"
        f" + {dec.format('n_np + n_nn')} * (n_pn + n_nn))"
    )
    return conf.select(
        "lang",
        "n_pp",
        "n_pn",
        "n_np",
        "n_nn",
        F.expr(
            f"CAST((({dec.format(n)} * (n_pp + n_nn) - {pe_num}) * 1000000)"
            f" DIV nullif({dec.format(n)} * {n} - {pe_num}, 0) AS BIGINT)"
        ).alias("kappa_ppm"),
    ).orderBy("lang")


# ---------------------------------------------------------------------------
# q352 — data-constrained epoch budgeting (repeat-value decay)
# ---------------------------------------------------------------------------

# value of the k-th epoch over the same tokens, per-mille, 0.7 decay
# (Muennighoff et al. 2023 measure rapidly diminishing returns past ~4
# repeats; the fixed rational table keeps both engines bit-identical
# where a float 0.7^k would round unportably)
_EPOCH_W = (1000, 700, 490, 343, 240, 168, 118, 82)
_EPOCH_CUM = (0, 1000, 1700, 2190, 2533, 2773, 2941, 3059, 3141)
_BUDGET_X = 3  # global token budget = 3x the corpus's unique supply


@register(
    "q352_epoch_repeat_budget",
    category="curation",
    oracle=f"""
WITH sup AS (
  SELECT source, CAST(sum(len({_DUCK_WORDS})) AS BIGINT) AS u_tokens
  FROM documents GROUP BY source
),
tot AS (
  SELECT CAST(CAST({_BUDGET_X} AS BIGINT) * sum(u_tokens) // count(*) AS BIGINT) AS per_source
  FROM sup
),
e AS (
  SELECT source, u_tokens, (SELECT per_source FROM tot) AS target_tokens,
         CAST(least((SELECT per_source FROM tot) // u_tokens, 8) AS BIGINT) AS full_epochs
  FROM sup
),
r AS (
  SELECT source, u_tokens, target_tokens, full_epochs,
         CASE WHEN full_epochs >= 8 THEN 0
              ELSE target_tokens - full_epochs * u_tokens END AS rem_tokens,
         ([{", ".join(str(c) for c in _EPOCH_CUM)}])[full_epochs + 1] AS cum_w,
         CASE WHEN full_epochs >= 8 THEN 0
              ELSE ([{", ".join(str(w) for w in _EPOCH_W)}])[full_epochs + 1] END AS w_next
  FROM e
)
SELECT source, u_tokens, target_tokens, full_epochs,
       CAST((CAST(cum_w AS HUGEINT) * u_tokens + CAST(w_next AS HUGEINT) * rem_tokens)
            // 1000 AS BIGINT) AS effective_tokens,
       CAST((CAST(cum_w AS HUGEINT) * u_tokens + CAST(w_next AS HUGEINT) * rem_tokens)
            * 1000 // NULLIF(target_tokens, 0) AS BIGINT) AS utility_ppm
FROM r ORDER BY source
""",
)
def q352_epoch_repeat_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-constrained epoch budgeting (Muennighoff et al. 2023,
    'Scaling Data-Constrained Language Models', public): when the
    token budget exceeds a source's unique supply, repeated epochs
    carry rapidly diminishing value. Each source gets an equal slice
    of a {_BUDGET_X}x-unique-supply budget; the k-th epoch over the
    same tokens is worth the fixed per-mille weight {_EPOCH_W}[k-1]
    (0.7 decay, capped at 8 epochs). Emitted per source: unique
    supply, target, full epochs, EFFECTIVE tokens (decayed value of
    what the budget buys), and utility_ppm = effective*1e6/target —
    the number that says which sources are epoch-starved (utility ~1e6
    at 1 epoch) vs repeat-saturated (utility collapsing toward
    cum_w/epochs). Weights/cumulative sums are fixed integer tables
    indexed by epoch count on both engines — no float power anywhere.

    utility is reported as value-per-mille of target scaled to ppm via
    *1000 on the per-mille weights (weights are already /1000, so
    effective*1e6/target = (cum*u + w*rem)*1000/target).

    Scale shape: one corpus pass sums token counts per source (the
    sufficient statistic — a bounded panel, PINNED: the budget row and
    the per-source arithmetic both read it); every epoch/utility
    column is per-row arithmetic on that panel plus one 1-row budget
    broadcast. The epoch weight 'table' is an array literal indexed by
    full_epochs, so no join at all."""
    d = load_table(spark, "documents", sf_dir)
    sup = (
        d.select("source", F.size(tokenize(F.col("text"))).cast("bigint").alias("nt"))
        .groupBy("source")
        .agg(F.sum("nt").alias("u_tokens"))
        # bounded source panel; two consumers (the budget row + the
        # per-source arithmetic) — without the pin the corpus
        # tokenizes twice
        .localCheckpoint(eager=True)
    )
    tot = sup.agg(
        F.expr(
            f"CAST({_BUDGET_X} AS BIGINT) * sum(u_tokens) DIV count(*)"
        ).alias("target_tokens")
    )
    cum_arr = "array(" + ", ".join(str(c) for c in _EPOCH_CUM) + ")"
    w_arr = "array(" + ", ".join(str(w) for w in _EPOCH_W) + ")"
    return (
        sup.crossJoin(F.broadcast(tot))
        .withColumn(
            "full_epochs",
            F.expr("CAST(least(target_tokens DIV u_tokens, 8) AS BIGINT)"),
        )
        .withColumn(
            "rem_tokens",
            F.expr(
                "CASE WHEN full_epochs >= 8 THEN CAST(0 AS BIGINT) "
                "ELSE target_tokens - full_epochs * u_tokens END"
            ),
        )
        .withColumn(
            "cum_w", F.expr(f"element_at({cum_arr}, CAST(full_epochs + 1 AS INT))")
        )
        .withColumn(
            "w_next",
            F.expr(
                "CASE WHEN full_epochs >= 8 THEN 0 "
                f"ELSE element_at({w_arr}, CAST(full_epochs + 1 AS INT)) END"
            ),
        )
        .select(
            "source",
            "u_tokens",
            "target_tokens",
            "full_epochs",
            F.expr(
                "CAST((CAST(cum_w AS DECIMAL(38,0)) * u_tokens"
                " + CAST(w_next AS DECIMAL(38,0)) * rem_tokens) DIV 1000 AS BIGINT)"
            ).alias("effective_tokens"),
            F.expr(
                "CAST((CAST(cum_w AS DECIMAL(38,0)) * u_tokens"
                " + CAST(w_next AS DECIMAL(38,0)) * rem_tokens) * 1000"
                " DIV nullif(target_tokens, 0) AS BIGINT)"
            ).alias("utility_ppm"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q353 — quality-gate co-fire matrix
# ---------------------------------------------------------------------------

_GATES = ("short", "few_stop", "long_tok", "dup_heavy")
_GATE_PAIRS = [(i, j) for i in range(4) for j in range(4) if i < j]


@register(
    "q353_gate_cofire_matrix",
    category="quality",
    oracle=f"""
WITH g AS (
  SELECT CASE WHEN len({_DUCK_WORDS}) < 20 THEN 1 ELSE 0 END AS g0,
         CASE WHEN len(list_filter({_DUCK_WORDS},
              w -> list_contains(['the','a','an','and','or','of','to','in','is','it'], w))) < 2
              THEN 1 ELSE 0 END AS g1,
         CASE WHEN list_aggregate(list_transform({_DUCK_WORDS}, w -> length(w)), 'max') > 6
              THEN 1 ELSE 0 END AS g2,
         CASE WHEN len(list_distinct({_DUCK_WORDS})) * 2 < len({_DUCK_WORDS})
              THEN 1 ELSE 0 END AS g3
  FROM documents
),
agg AS (
  SELECT CAST(sum(g0) AS BIGINT) AS s0, CAST(sum(g1) AS BIGINT) AS s1,
         CAST(sum(g2) AS BIGINT) AS s2, CAST(sum(g3) AS BIGINT) AS s3,
         CAST(sum(g0 * g1) AS BIGINT) AS b01, CAST(sum(g0 * g2) AS BIGINT) AS b02,
         CAST(sum(g0 * g3) AS BIGINT) AS b03, CAST(sum(g1 * g2) AS BIGINT) AS b12,
         CAST(sum(g1 * g3) AS BIGINT) AS b13, CAST(sum(g2 * g3) AS BIGINT) AS b23
  FROM g
)
SELECT gate_a, gate_b, n_a, n_b, n_both,
       n_a + n_b - n_both AS n_either,
       CAST(n_both * 1000000 // NULLIF(n_a + n_b - n_both, 0) AS BIGINT) AS jaccard_ppm
FROM (
  SELECT '{_GATES[0]}' AS gate_a, '{_GATES[1]}' AS gate_b, s0 AS n_a, s1 AS n_b, b01 AS n_both FROM agg
  UNION ALL SELECT '{_GATES[0]}', '{_GATES[2]}', s0, s2, b02 FROM agg
  UNION ALL SELECT '{_GATES[0]}', '{_GATES[3]}', s0, s3, b03 FROM agg
  UNION ALL SELECT '{_GATES[1]}', '{_GATES[2]}', s1, s2, b12 FROM agg
  UNION ALL SELECT '{_GATES[1]}', '{_GATES[3]}', s1, s3, b13 FROM agg
  UNION ALL SELECT '{_GATES[2]}', '{_GATES[3]}', s2, s3, b23 FROM agg
) ORDER BY gate_a, gate_b
""",
)
def q353_gate_cofire_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter-stack co-fire diagnostics: for every pair of quality
    gates, how often they reject the SAME documents (pairwise Jaccard
    over the rejected sets, ppm). This is the audit that tells a
    curation pipeline which gates are redundant (Jaccard ~1e6: drop
    one) and which are orthogonal (~0: both earn their scan) — the
    FineWeb/RefinedWeb ablation question (Penedo et al. 2023/2024,
    public) answered without rerunning the pipeline per gate subset.
    Gates: <20 tokens, <2 stopwords, a >6-char token, >50% duplicate
    token positions.

    Scale shape: gate booleans are per-row maps computed in ONE corpus
    pass that folds straight into a SINGLE aggregation row of 10
    sufficient sums (4 singles + 6 pairs — the q345 sufficient-sums
    rule); the 6-row pair matrix is reshaped from that one row with a
    stack(), touching no row-scale data. No join, no second scan."""
    from sensor_data_pipeline_spark.functions.text import stopword_count

    d = load_table(spark, "documents", sf_dir)
    w = tokenize(F.col("text"))
    flags = d.select(
        F.when(F.size(w) < 20, 1).otherwise(0).alias("g0"),
        F.when(stopword_count(w) < 2, 1).otherwise(0).alias("g1"),
        F.when(
            F.array_max(F.transform(w, lambda t: F.length(t))) > 6, 1
        ).otherwise(0).alias("g2"),
        F.when(F.size(F.array_distinct(w)) * 2 < F.size(w), 1)
        .otherwise(0)
        .alias("g3"),
    )
    agg = flags.agg(
        *[F.sum(f"g{i}").cast("bigint").alias(f"s{i}") for i in range(4)],
        *[
            F.sum(F.col(f"g{i}") * F.col(f"g{j}")).cast("bigint").alias(f"b{i}{j}")
            for i, j in _GATE_PAIRS
        ],
    )
    stack_args = ", ".join(
        f"'{_GATES[i]}', '{_GATES[j]}', s{i}, s{j}, b{i}{j}" for i, j in _GATE_PAIRS
    )
    return (
        agg.select(
            F.expr(
                f"stack({len(_GATE_PAIRS)}, {stack_args})"
                " AS (gate_a, gate_b, n_a, n_b, n_both)"
            )
        )
        .select(
            "gate_a",
            "gate_b",
            "n_a",
            "n_b",
            "n_both",
            (F.col("n_a") + F.col("n_b") - F.col("n_both")).alias("n_either"),
            F.expr(
                "CAST((n_both * 1000000) DIV nullif(n_a + n_b - n_both, 0) AS BIGINT)"
            ).alias("jaccard_ppm"),
        )
        .orderBy("gate_a", "gate_b")
    )


# ---------------------------------------------------------------------------
# q354 — out-of-vocabulary rate by (lang, source)
# ---------------------------------------------------------------------------

_VOCAB_K = 16  # top-K tokens by corpus frequency form the 'vocabulary'


@register(
    "q354_oov_rate_audit",
    category="text",
    oracle=f"""
WITH tok AS (
  SELECT lang, source, unnest({_DUCK_WORDS}) AS token FROM documents
),
tc AS (
  SELECT token, lang, source, count(*) AS cnt FROM tok GROUP BY 1, 2, 3
),
vocab AS (
  SELECT token FROM (
    SELECT token, sum(cnt) AS total,
           row_number() OVER (ORDER BY sum(cnt) DESC, token) AS rk
    FROM tc GROUP BY token
  ) WHERE rk <= {_VOCAB_K}
)
SELECT lang, source,
       CAST(sum(cnt) AS BIGINT) AS total_tokens,
       CAST(sum(CASE WHEN token IN (SELECT token FROM vocab) THEN 0 ELSE cnt END) AS BIGINT) AS oov_tokens,
       CAST(sum(CASE WHEN token IN (SELECT token FROM vocab) THEN 0 ELSE cnt END) * 1000000
            // sum(cnt) AS BIGINT) AS oov_ppm
FROM tc GROUP BY lang, source ORDER BY lang, source
""",
)
def q354_oov_rate_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-coverage (OOV) audit: with the corpus's own top-
    {_VOCAB_K} tokens as the working vocabulary, the out-of-vocabulary
    token share per (lang, source) — the signal that flags sources a
    fixed tokenizer/vocab will shred into rare pieces (high fertility,
    poor compression) before money is spent training on them
    (complements q329's fertility measure with a per-source roll-up).
    The vocabulary cut is a TOTAL order (count desc, token) so the
    top-K boundary is deterministic on both engines.

    Scale shape: the corpus explodes to tokens exactly once, folding
    immediately into per-(token, lang, source) counts — the sufficient
    statistic, bounded by vocabulary x source panel, Heaps-sublinear
    in corpus mass — which is PINNED (two consumers: the global top-K
    derivation and the per-group OOV roll-up; without the pin the
    corpus tokenizes twice). The vocabulary itself is {_VOCAB_K} rows,
    broadcast into a membership join against the pinned stat, never
    against row-scale data."""
    d = load_table(spark, "documents", sf_dir)
    tc = (
        d.select("lang", "source", F.explode(tokenize(F.col("text"))).alias("token"))
        .groupBy("token", "lang", "source")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=True)  # two consumers: vocab top-K + OOV roll-up
    )
    wv = Window.orderBy(F.col("total").desc(), "token")
    vocab = (
        tc.groupBy("token")
        .agg(F.sum("cnt").alias("total"))
        .withColumn("rk", F.row_number().over(wv))
        .filter(F.col("rk") <= _VOCAB_K)
        .select("token", F.lit(1).alias("in_vocab"))
    )
    return (
        tc.join(F.broadcast(vocab), "token", "left")
        .groupBy("lang", "source")
        .agg(
            F.sum("cnt").cast("bigint").alias("total_tokens"),
            F.sum(F.when(F.col("in_vocab").isNull(), F.col("cnt")).otherwise(0))
            .cast("bigint")
            .alias("oov_tokens"),
        )
        .select(
            "lang",
            "source",
            "total_tokens",
            "oov_tokens",
            F.expr("CAST((oov_tokens * 1000000) DIV total_tokens AS BIGINT)").alias(
                "oov_ppm"
            ),
        )
        .orderBy("lang", "source")
    )


# ---------------------------------------------------------------------------
# q355 — train/val split balance (per-stratum chi-square)
# ---------------------------------------------------------------------------

_SPLIT_SEED = 11
_SPLIT_MOD = 10
_SPLIT_TRAIN = 8  # hash residues 0-7 -> train (80/20 split)
# chi-square with 1 df at p=0.05 is 3.841; the gate works in ppm
_CHISQ_PPM = 3_841_000


@register(
    "q355_split_balance_chisq",
    category="sampling",
    oracle=f"""
WITH s AS (
  SELECT lang,
         CASE WHEN CAST(('0x' || substr(md5('{_SPLIT_SEED}:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                   % {_SPLIT_MOD} < {_SPLIT_TRAIN} THEN 1 ELSE 0 END AS is_train
  FROM documents
),
st AS (
  SELECT lang, CAST(sum(is_train) AS BIGINT) AS o_train,
         CAST(sum(1 - is_train) AS BIGINT) AS o_val
  FROM s GROUP BY lang
),
tot AS (
  SELECT sum(o_train) AS n_train, sum(o_val) AS n_val FROM st
)
SELECT lang, o_train, o_val,
       CAST(CAST(o_train * (SELECT n_val FROM tot) - o_val * (SELECT n_train FROM tot) AS HUGEINT)
            * (o_train * (SELECT n_val FROM tot) - o_val * (SELECT n_train FROM tot))
            * 1000000
            // (CAST(o_train + o_val AS HUGEINT)
                * (SELECT n_train FROM tot) * (SELECT n_val FROM tot)) AS BIGINT) AS chisq_ppm,
       CAST(CAST(o_train * (SELECT n_val FROM tot) - o_val * (SELECT n_train FROM tot) AS HUGEINT)
            * (o_train * (SELECT n_val FROM tot) - o_val * (SELECT n_train FROM tot))
            * 1000000
            // (CAST(o_train + o_val AS HUGEINT)
                * (SELECT n_train FROM tot) * (SELECT n_val FROM tot))
            > {_CHISQ_PPM} AS BOOLEAN) AS imbalanced
FROM st ORDER BY lang
""",
)
def q355_split_balance_chisq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-balance audit: after the deterministic 80/20 hash split
    (the q78 seeded-md5 idiom, reproducible on any engine), the per-
    stratum chi-square statistic against the global train/val ratio —
    the pre-training sanity check that a stratum (language) didn't
    land lopsided in the validation set, which would silently skew
    eval. For a 2x2 stratum-vs-split table the statistic reduces
    exactly to

        chi2 = d^2 / (T * N1 * N2 / N),  d = o_train*N_val - o_val*N_train

    (N1/N2 global train/val totals, T the stratum size, N=N1+N2); the
    emitted chisq_ppm folds the algebra into ONE integer division over
    decimal(38,0)/HUGEINT products — exact while |d| < ~1.8e18, i.e.
    any stratum with T * N below bigint range; flag = chisq_ppm >
    {_CHISQ_PPM} (the 1-df 95% critical value 3.841 in ppm).

    Note the d^2*1e6 DIV (T*N1*N2) form: chi2 = d^2*N/(T*N1*N2*N) =
    d^2/(T*N1*N2) after the N cancels — no float, no rounding.

    Scale shape: the split flag is a pure scan predicate (md5 of the
    row id — no shuffle, prunable); one pass folds to per-stratum
    counts (the sufficient statistic, PINNED: the global totals and
    the chi-square both read it), the totals are a 1-row broadcast,
    and the chi-square arithmetic runs on the bounded stratum
    frame."""
    from sensor_data_pipeline_spark.functions.text import word_hash32

    d = load_table(spark, "documents", sf_dir)
    is_train = F.when(
        F.pmod(
            word_hash32(F.col("doc_id").cast("string"), seed=_SPLIT_SEED),
            F.lit(_SPLIT_MOD),
        )
        < _SPLIT_TRAIN,
        1,
    ).otherwise(0)
    st = (
        d.select("lang", is_train.alias("is_train"))
        .groupBy("lang")
        .agg(
            F.sum("is_train").cast("bigint").alias("o_train"),
            F.sum(1 - F.col("is_train")).cast("bigint").alias("o_val"),
        )
        # bounded stratum frame; two consumers (global totals + the
        # per-stratum chi-square) — without the pin the corpus is
        # hashed and scanned twice
        .localCheckpoint(eager=True)
    )
    tot = st.agg(
        F.sum("o_train").alias("n_train"), F.sum("o_val").alias("n_val")
    )
    chisq = (
        "CAST(CAST(o_train * n_val - o_val * n_train AS DECIMAL(38,0))"
        " * (o_train * n_val - o_val * n_train) * 1000000"
        " DIV (CAST(o_train + o_val AS DECIMAL(38,0)) * n_train * n_val) AS BIGINT)"
    )
    return (
        st.crossJoin(F.broadcast(tot))
        .select(
            "lang",
            "o_train",
            "o_val",
            F.expr(chisq).alias("chisq_ppm"),
            F.expr(f"{chisq} > {_CHISQ_PPM}").alias("imbalanced"),
        )
        .orderBy("lang")
    )
