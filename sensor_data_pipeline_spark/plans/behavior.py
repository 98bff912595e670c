"""Behavioral analytics over the event stream: ordered funnels and
sweep-line concurrency — product-analytics queries built so the
sequential logic (stage machines, running sweeps) never becomes a
global sort or a single-partition window.

q265 folds per-user stage machines JVM-side (one user_id-keyed
shuffle); q266 runs the sweep-line running sum on the distributed
two-pass scan from operators/prefix.py. (Cohort retention already
lives at q109; this module holds the behavioral queries that need
ORDERED logic.)

Reference analog: the reference's consumer derives per-device session
facts from an ordered reading stream one record at a time
(src/modules/dd/consumer.cpp:241-268); these are the multi-user
generalizations where the ordered fold happens per key in parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sensor_data_pipeline_spark.operators.prefix import global_running_sum
from sensor_data_pipeline_spark.plans.registry import register
from sensor_data_pipeline_spark.sources.tables import load_table

_SESSION_US = 1800 * 1000000  # 30-minute session interval


@register(
    "q265_funnel_conversion",
    category="analytics",
    oracle="""
WITH t1 AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
t2 AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN t1 ON e.user_id = t1.user_id
  WHERE e.event_type = 'click' AND e.ts > t1.t1
  GROUP BY e.user_id
),
t3 AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN t2 ON e.user_id = t2.user_id
  WHERE e.event_type = 'purchase' AND e.ts > t2.t2
  GROUP BY e.user_id
)
SELECT CAST((SELECT count(*) FROM t1) AS BIGINT) AS n_viewed,
       CAST((SELECT count(*) FROM t2) AS BIGINT) AS n_clicked_after_view,
       CAST((SELECT count(*) FROM t3) AS BIGINT) AS n_purchased_after_click,
       CAST((SELECT count(*) FROM t3
             WHERE t3.t3 - (SELECT t1.t1 FROM t1 WHERE t1.user_id = t3.user_id)
                   <= INTERVAL 48 HOUR) AS BIGINT) AS n_converted_48h,
       CAST((SELECT sum(epoch_us(t2.t2) - epoch_us(t1.t1))
             FROM t2 JOIN t1 ON t2.user_id = t1.user_id) AS BIGINT)
         AS total_click_lag_us,
       CAST((SELECT sum(epoch_us(t3.t3) - epoch_us(t2.t2))
             FROM t3 JOIN t2 ON t3.user_id = t2.user_id) AS BIGINT)
         AS total_purchase_lag_us
""",
)
def q265_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view -> click -> purchase: how many users reach
    each stage IN ORDER (a later click only counts after the first
    view, a purchase only after that click), plus full conversions
    inside a 48-hour window (sized to split this fixture's completion
    distribution near its first quartile so the count discriminates)
    and exact stage-lag totals in microseconds — integer sums that are
    sensitive to the precise chaining even when stage counts saturate.
    The oracle chains three correlated min()
    scans; the Spark plan does ONE shuffle: per-user events fold
    JVM-side through a (t1,t2,t3) state struct over the time-sorted
    activity array — the stage-machine equivalent of q129's sequence
    mining, bounded by one user's event count, never a global sort.
    At 100 TB funnels over billions of users cost exactly one keyed
    exchange; adding stages extends the struct, not the shuffle count.
    Strict '>' stage transitions match the oracle's `e.ts > t1.t1`
    so same-microsecond events cannot double-fire a stage."""
    ev = load_table(spark, "events", sf_dir)
    seq = (
        ev.filter(F.col("event_type").isin("view", "click", "purchase"))
        .groupBy("user_id")
        .agg(F.sort_array(F.collect_list(F.struct("ts", "event_type"))).alias("evs"))
    )
    zero = F.struct(
        F.lit(None).cast("timestamp_ntz").alias("t1"),
        F.lit(None).cast("timestamp_ntz").alias("t2"),
        F.lit(None).cast("timestamp_ntz").alias("t3"),
    )
    state = F.aggregate(
        F.col("evs"),
        zero,
        lambda acc, e: F.struct(
            F.when(
                acc["t1"].isNull() & (e["event_type"] == "view"), e["ts"]
            )
            .otherwise(acc["t1"])
            .alias("t1"),
            F.when(
                acc["t2"].isNull()
                & (e["event_type"] == "click")
                & acc["t1"].isNotNull()
                & (e["ts"] > acc["t1"]),
                e["ts"],
            )
            .otherwise(acc["t2"])
            .alias("t2"),
            F.when(
                acc["t3"].isNull()
                & (e["event_type"] == "purchase")
                & acc["t2"].isNotNull()
                & (e["ts"] > acc["t2"]),
                e["ts"],
            )
            .otherwise(acc["t3"])
            .alias("t3"),
        ),
    )
    st = seq.select(state.alias("s"))
    win_us = F.lit(48 * 3600 * 1000000)
    return st.agg(
        F.sum(F.col("s.t1").isNotNull().cast("bigint")).cast("bigint").alias("n_viewed"),
        F.sum(F.col("s.t2").isNotNull().cast("bigint"))
        .cast("bigint")
        .alias("n_clicked_after_view"),
        F.sum(F.col("s.t3").isNotNull().cast("bigint"))
        .cast("bigint")
        .alias("n_purchased_after_click"),
        F.sum(
            (
                F.col("s.t3").isNotNull()
                & (
                    F.unix_micros(F.col("s.t3").cast("timestamp"))
                    - F.unix_micros(F.col("s.t1").cast("timestamp"))
                    <= win_us
                )
            ).cast("bigint")
        )
        .cast("bigint")
        .alias("n_converted_48h"),
        # stage-lag totals: exact integer sums that are sensitive to the
        # precise chaining (a fold that picks the wrong click shifts
        # these even when the stage COUNTS stay identical)
        F.sum(
            F.unix_micros(F.col("s.t2").cast("timestamp"))
            - F.unix_micros(F.col("s.t1").cast("timestamp"))
        )
        .cast("bigint")
        .alias("total_click_lag_us"),
        F.sum(
            F.unix_micros(F.col("s.t3").cast("timestamp"))
            - F.unix_micros(F.col("s.t2").cast("timestamp"))
        )
        .cast("bigint")
        .alias("total_purchase_lag_us"),
    )


@register(
    "q266_peak_concurrency",
    category="analytics",
    oracle="""
WITH b AS (
  SELECT epoch_us(ts) * 2 + 1 AS k, 1 AS delta FROM events
  UNION ALL
  SELECT (epoch_us(ts) + 1800000000) * 2 AS k, -1 AS delta FROM events
),
g AS (SELECT k, sum(delta) AS d FROM b GROUP BY k),
r AS (SELECT k, sum(d) OVER (ORDER BY k) AS occ FROM g),
m AS (SELECT max(occ) AS peak FROM r)
SELECT CAST(m.peak AS BIGINT) AS peak_concurrency,
       CAST((SELECT min(k) FROM r WHERE occ = m.peak) // 2 AS BIGINT)
         AS first_peak_epoch_us,
       CAST((SELECT count(*) FROM g) AS BIGINT) AS n_boundaries
FROM m
""",
)
def q266_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak interval concurrency: treat every event as a 30-minute
    active session and find the maximum number simultaneously open
    (plus when it first happens) — the capacity-planning sweep-line
    query. The classic algorithm is inherently a GLOBAL running sum
    over time-ordered +1/-1 boundaries, i.e. exactly the single-
    partition-window trap; here it runs on the distributed two-pass
    scan (operators/prefix.py): boundaries pre-aggregate per unique
    (instant, phase) key — so the scanned stream is bounded by
    DISTINCT timestamps, not events — then range-partitioned partial
    sums get broadcast offsets. Ends sort before starts at the same
    instant (phase bit in the key), so touching sessions never
    double-count. At 100 TB: one map-side-combinable groupBy plus the
    O(partitions) offset combine — no global sort of raw events.
    first_peak_epoch_us pins WHICH boundary first reaches the peak, so
    the hash check is sensitive to sweep order, not just the max."""
    ev = load_table(spark, "events", sf_dir)
    em = F.unix_micros(F.col("ts").cast("timestamp"))
    starts = ev.select((em * 2 + 1).alias("k"), F.lit(1).alias("delta"))
    ends = ev.select(((em + _SESSION_US) * 2).alias("k"), F.lit(-1).alias("delta"))
    g = starts.unionAll(ends).groupBy("k").agg(F.sum("delta").alias("d"))
    r = global_running_sum(g, "k", "d", out_col="occ")
    peak = r.agg(F.max("occ").alias("peak"))
    first = (
        r.join(F.broadcast(peak), F.col("occ") == F.col("peak"))
        .agg(F.min("k").alias("min_k"))
    )
    n_b = g.agg(F.count(F.lit(1)).alias("nb"))
    return (
        peak.join(F.broadcast(first)).join(F.broadcast(n_b))
        .select(
            F.col("peak").cast("bigint").alias("peak_concurrency"),
            F.expr("min_k div 2").cast("bigint").alias("first_peak_epoch_us"),
            F.col("nb").cast("bigint").alias("n_boundaries"),
        )
    )
