"""Behavioral analytics over the event stream: ordered funnels and
cohort retention — the product-analytics queries a clickstream
warehouse answers daily, built so the per-user sequential logic never
becomes a global sort.

Both queries follow the suite's scale rules: the only data-sized
shuffles are keyed by user_id, per-user event sequences are folded
JVM-side with higher-order functions (bounded by one user's activity,
like q129's sequence mining), and the final matrices are tiny keyed
aggregations.

Reference analog: the reference's consumer derives per-device session
facts from an ordered reading stream one record at a time
(src/modules/dd/consumer.cpp:241-268); these are the multi-user
generalizations where the ordered fold happens per key in parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sensor_data_pipeline_spark.plans.registry import register
from sensor_data_pipeline_spark.sources.tables import load_table

_WEEK_US = 7 * 86400 * 1000000  # one week in microseconds


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
    "q266_cohort_retention",
    category="analytics",
    oracle="""
WITH weeks AS (
  SELECT user_id,
         epoch_us(ts) // 604800000000 AS week,
         count(*) AS n
  FROM events
  GROUP BY user_id, week
),
cohorts AS (
  SELECT user_id, min(week) AS cohort_week FROM weeks GROUP BY user_id
)
SELECT CAST(c.cohort_week AS BIGINT) AS cohort_week,
       CAST(w.week - c.cohort_week AS BIGINT) AS week_offset,
       CAST(count(*) AS BIGINT) AS n_active_users,
       CAST(sum(w.n) AS BIGINT) AS n_events
FROM weeks w JOIN cohorts c ON w.user_id = c.user_id
GROUP BY c.cohort_week, w.week
ORDER BY cohort_week, week_offset
""",
)
def q266_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users are cohorted by their first
    active epoch-week; each (cohort_week, week_offset) cell counts the
    cohort's users still active that many weeks later — THE
    engagement-decay table behind every retention curve. The plan is
    two keyed aggregations and one user-keyed join: distinct
    (user, week) pairs (first shuffle, map-side combinable via
    partial aggregation), per-user min-week (reuses the same keyed
    data), then a cohort-by-offset count whose result is bounded by
    weeks², not users. Epoch-weeks come from integer microsecond
    division on both engines, so cohort boundaries cannot drift
    between Spark and DuckDB the way timezone-sensitive date_trunc
    could. At 100 TB the only data-sized exchanges hash on user_id;
    the matrix itself is a few hundred rows regardless of corpus."""
    ev = load_table(spark, "events", sf_dir)
    weeks = (
        ev.select(
            "user_id",
            (F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(_WEEK_US))
            .cast("bigint")
            .alias("week"),
        )
        .groupBy("user_id", "week")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    cohorts = weeks.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        weeks.join(cohorts, "user_id")
        .groupBy("cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_offset"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_active_users"),
            F.sum("n").cast("bigint").alias("n_events"),
        )
        .orderBy("cohort_week", "week_offset")
    )
