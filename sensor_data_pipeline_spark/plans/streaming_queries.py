"""Declared queries that exercise the Structured-Streaming layer
through the driver contract: each builds a file-source stream over the
sf parquet, drains it with an availableNow trigger into a memory sink,
and returns the sink's contents as the result DataFrame.

The watermark-emission query has a real SQL oracle: with availableNow
all data lands in one batch, so the final watermark is exactly
``max(ts) - delay`` and append mode emits precisely the windows whose
end is at or below it — a deterministic, SQL-reproducible subset.
The stateful-sessionization query is non-SQL-expressible (keyed state
across rows) → rows-only per the driver contract, with its semantics
pinned by tests/test_streaming.py and the batch-twin oracle (q26/q27).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sensor_data_pipeline_spark.plans.registry import register
from sensor_data_pipeline_spark.streaming.pipelines import windowed_event_stats
from sensor_data_pipeline_spark.streaming.stateful import sessionize_stream


def _drain(stream_df: DataFrame, name: str, state_partitions: int = 4) -> DataFrame:
    """Start → availableNow → stop, returning the memory sink.

    ``state_partitions`` pins the stateful-operator partition count for
    THIS query's (fresh) checkpoint. State stores cost real per-
    partition overhead (provider init, changelog files, commit fsync
    per partition per batch), so their count must track state VOLUME —
    at sf0.1 a handful; on a 100 TB/day stream, thousands. Inheriting
    the session's batch shuffle setting (32 here) made every stateful
    drain pay 4-8x its useful work: q96's two-sided join held 64 state
    stores for ~40k rows. The conf is scoped: set at .start() (when the
    streaming plan binds it) and restored immediately after."""
    spark = stream_df.sparkSession
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    # the setting is bound when the FIRST BATCH is planned (async, after
    # start()), so it stays lowered until the drain completes
    spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        # availableNow self-terminates after the final no-data batch
        # (the one that advances the watermark and flushes closed
        # windows); awaitTermination is the race-free way to observe
        # that, unlike processAllAvailable()+stop() which can cut the
        # run before the watermark-advancing batch commits.
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.sql(f"SELECT * FROM {name}")


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events table. events.parquet stores
    ts as TIMESTAMP(MICROS) at every scale factor (verified against the
    parquet footers), so the stream schema declares it as a plain
    timestamp — identical to what the batch scan reads."""
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    # the sf tables are single parquet FILES; the file stream source
    # requires a directory, so stream the dir with a glob filter
    return (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )


@register(
    "q67_stream_watermark_window",
    category="streaming",
    oracle="""
WITH mx AS (SELECT max(ts) - INTERVAL 1 HOUR AS wm FROM events),
agg AS (
  SELECT time_bucket(INTERVAL '10 minutes', ts) AS win_start, event_type,
         CAST(count(*) AS BIGINT) AS n,
         sum(CAST(round(value * 100, 0) AS BIGINT)) / CAST(100.0 AS DOUBLE) AS sum_value
  FROM events GROUP BY 1, 2
)
SELECT win_start, win_start + INTERVAL '10 minutes' AS win_end, event_type, n, sum_value
FROM agg, mx
WHERE win_start + INTERVAL '10 minutes' <= mx.wm
ORDER BY win_start, event_type
""",
)
def q67_stream_watermark_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked 10-minute windows over the events stream, drained
    with availableNow: append mode emits exactly the windows closed by
    the final watermark (max ts - 1 h) — the oracle reproduces that
    subset relationally. This differentially pins Spark's watermark
    semantics, not just the agg."""
    out = _drain(windowed_event_stats(_events_stream(spark, sf_dir)), "q67_mem")
    return out.orderBy("win_start", "event_type")


@register(
    "q68_stream_sessionize",
    category="streaming",
    # The per-key state machine (applyInPandasWithState) is replayed
    # relationally: a session starts whenever last_sign * sign <= 0
    # (module_rpi_ups_hat.c:253-258), so per-key session count =
    # running sum of boundary flags. Valid because the fixture has no
    # (user_id, ts) ties and the single-file source drains as one
    # micro-batch, so the stream processes each key in global ts order
    # — the same order the window below imposes.
    oracle="""
WITH t AS (
  SELECT CAST(user_id AS VARCHAR) AS k, ts, event_id,
         CASE WHEN value - 50.0 > 0 THEN 1
              WHEN value - 50.0 < 0 THEN -1 ELSE 0 END AS sgn
  FROM events WHERE user_id < 32
),
b AS (
  SELECT k,
         CASE WHEN lag(sgn) OVER (PARTITION BY k ORDER BY ts, event_id) IS NULL
                OR lag(sgn) OVER (PARTITION BY k ORDER BY ts, event_id) * sgn <= 0
              THEN 1 ELSE 0 END AS brk
  FROM t
)
SELECT k,
       CAST(sum(brk) AS BIGINT) AS n_sessions,
       CAST(count(*) AS BIGINT) AS n_rows
FROM b GROUP BY k ORDER BY k
""",
)
def q68_stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-flip sessionization running as a real streaming query with
    per-key state: events keyed by user bucket, `value` as the signed
    signal, drained via availableNow. The oracle replays the state
    machine with a lag window (new session iff last_sign*sign <= 0),
    upgrading this from a rows-only check to a full value-hash audit."""
    stream = _events_stream(spark, sf_dir).filter(F.col("user_id") < 32)
    readings = stream.select(
        F.col("user_id").cast("string").alias("k"),
        F.col("ts").alias("tick_ts"),
        (F.col("value") - 50.0).alias("signal"),  # centered so the sign flips
        F.col("value").alias("pct"),
    )
    out = _drain(sessionize_stream(readings), "q68_mem")
    return (
        out.groupBy("k")
        .agg(
            F.max("session_id").cast("bigint").alias("n_sessions"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        )
        .orderBy("k")
    )


@register(
    "q69_stream_dedup",
    category="streaming",
    oracle="""
SELECT event_type,
       CAST(count(DISTINCT event_id) AS BIGINT) AS n_unique
FROM events GROUP BY event_type ORDER BY event_type
""",
)
def q69_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup: dropDuplicatesWithinWatermark on
    event_id over the watermarked stream, then count per type. State
    is bounded by the watermark (old keys age out) — the streaming
    form of q40's batch dedup; the oracle is plain COUNT(DISTINCT)."""
    stream = _events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    # NOT dropDuplicates(): that variant keeps every key in state
    # forever; WithinWatermark ages keys out once the watermark passes,
    # which is what makes streaming dedup viable on an unbounded stream
    deduped = stream.dropDuplicatesWithinWatermark(["event_id"])
    out = _drain(deduped, "q69_mem")
    return (
        out.groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_unique"))
        .orderBy("event_type")
    )


@register(
    "q70_stream_static_join",
    category="streaming",
    oracle="""
SELECT c.c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_events,
       sum(CAST(round(e.value * 100, 0) AS BIGINT)) / CAST(100.0 AS DOUBLE) AS sum_value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment
""",
)
def q70_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join: the event stream joins the
    static customer dim per micro-batch (broadcast — no stream-side
    shuffle, the standard dimension-enrichment shape at scale)."""
    from sensor_data_pipeline_spark.sources.tables import load_table

    customers = F.broadcast(load_table(spark, "customer", sf_dir))
    stream = _events_stream(spark, sf_dir)
    joined = stream.join(customers, stream.user_id == customers.c_custkey)
    out = _drain(joined.select("c_mktsegment", "value"), "q70_mem")
    return (
        out.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            (F.sum(F.round(F.col("value") * 100, 0).cast("bigint")) / 100.0).alias("sum_value"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "q96_stream_stream_join",
    category="streaming",
    oracle="""
SELECT CAST(v.user_id % 16 AS BIGINT) AS user_bucket,
       CAST(count(*) AS BIGINT)       AS n_pairs
FROM events v JOIN events p
  ON v.user_id = p.user_id
 AND v.event_type = 'view' AND p.event_type = 'purchase'
 AND p.ts > v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
GROUP BY 1 ORDER BY user_bucket
""",
)
def q96_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join: the view stream joins the purchase
    stream per user with an event-time band (purchase within 1 h after
    the view). Both sides carry watermarks, so at steady state the join
    state is bounded to the band plus the watermark delay — the shape
    that keeps a two-stream join viable at 100 TB/day. With an
    availableNow drain everything lands in one batch, so the emitted
    pairs equal the relational interval self-join, which is exactly
    the oracle."""
    views = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "view")
        .select(F.col("user_id").alias("v_uid"), F.col("ts").alias("view_ts"))
        .withWatermark("view_ts", "1 hour")
    )
    purchases = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("p_uid"), F.col("ts").alias("p_ts"))
        .withWatermark("p_ts", "1 hour")
    )
    joined = views.join(
        purchases,
        F.expr("v_uid = p_uid AND p_ts > view_ts AND p_ts <= view_ts + interval 1 hour"),
    )
    out = _drain(joined.select("v_uid"), "q96_mem")
    return (
        out.groupBy((F.col("v_uid") % 16).cast("bigint").alias("user_bucket"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
        .orderBy("user_bucket")
    )


@register(
    "q162_stream_left_outer",
    category="streaming",
    oracle="""
WITH wm AS (SELECT max(ts) - INTERVAL 2 HOUR AS cutoff FROM events),
v AS (SELECT user_id, ts FROM events WHERE event_type = 'view'),
p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
matched AS (
  SELECT v.user_id
  FROM v JOIN p ON v.user_id = p.user_id
   AND p.ts > v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
),
unmatched AS (
  SELECT v.user_id
  FROM v, wm
  WHERE NOT EXISTS (
          SELECT 1 FROM p
          WHERE p.user_id = v.user_id
            AND p.ts > v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR)
    AND v.ts < wm.cutoff
),
unioned AS (
  SELECT user_id, 1 AS is_matched FROM matched
  UNION ALL
  SELECT user_id, 0 AS is_matched FROM unmatched
)
SELECT CAST(user_id % 16 AS BIGINT) AS user_bucket,
       CAST(count(*) AS BIGINT)     AS n_rows,
       CAST(sum(is_matched) AS BIGINT) AS n_matched
FROM unioned GROUP BY 1 ORDER BY user_bucket
""",
)
def q162_stream_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER interval join: q96's view-purchase band
    join, but views with no purchase inside the band must still emit a
    null-extended row — the attribution shape ("every impression, with
    its conversion if any") that needs state-expiry semantics batch SQL
    gets for free. A left row can only be emitted null-extended once the
    watermark proves no future match can arrive, i.e. once it passes
    view_ts + band (1 h). With an availableNow drain the final
    watermark rests at max(ts) - delay (1 h), so exactly the views with
    view_ts < max(ts) - 2 h have provably-closed bands: the oracle
    reproduces matched pairs unconditionally plus unmatched views below
    that cutoff. Views inside the last 2 h stay in state, correctly
    unemitted — the differential check pins Spark's eviction boundary,
    not just the join.

    Perf note (round-5 wobble protocol): BENCH_r04 reported 5.01 s
    in-suite (vs 2.03 s in r3) on an UNCHANGED plan; four solo runs at
    sf0.1 measure 3.07/2.74/2.73 s steady-state — the in-suite number
    was concurrent-suite interference on the state-store micro-batch
    path, not a regression. Wall time here is dominated by per-batch
    state-store fixed costs at toy scale; the plan (two-sided
    watermarks, banded condition, bounded state) is the 100 TB shape."""
    views = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "view")
        .select(F.col("user_id").alias("v_uid"), F.col("ts").alias("view_ts"))
        .withWatermark("view_ts", "1 hour")
    )
    purchases = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("p_uid"), F.col("ts").alias("p_ts"))
        .withWatermark("p_ts", "1 hour")
    )
    joined = views.join(
        purchases,
        F.expr("v_uid = p_uid AND p_ts > view_ts AND p_ts <= view_ts + interval 1 hour"),
        "leftOuter",
    )
    out = _drain(joined.select("v_uid", "p_uid"), "q162_mem")
    return (
        out.groupBy((F.col("v_uid") % 16).cast("bigint").alias("user_bucket"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.count("p_uid").cast("bigint").alias("n_matched"),
        )
        .orderBy("user_bucket")
    )


@register(
    "q170_stream_session_window",
    category="streaming",
    oracle="""
WITH t AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              OR epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) >= 3600
              THEN 1 ELSE 0 END AS brk,
         event_id
  FROM events
),
isl AS (
  SELECT user_id, ts, value,
         sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM t
),
sess AS (
  SELECT user_id,
         min(ts) AS session_start,
         max(ts) + INTERVAL 1 HOUR AS session_end,
         CAST(count(*) AS BIGINT) AS n,
         sum(CAST(round(value * 100, 0) AS BIGINT)) / CAST(100.0 AS DOUBLE) AS sum_value
  FROM isl GROUP BY user_id, sid
),
wm AS (SELECT max(ts) - INTERVAL 1 HOUR AS w FROM events)
SELECT user_id, session_start, session_end, n, sum_value
FROM sess, wm
WHERE session_end <= wm.w
ORDER BY user_id, session_start
""",
)
def q170_stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATIVE streaming session windows: session_window(ts, 1h) over
    the watermarked stream, append mode — the built-in merging-session
    state operator (vs q68's hand-rolled applyInPandasWithState).
    Append emits exactly the sessions whose end (last event + gap)
    closed at or below the final watermark; the oracle rebuilds gap
    sessions relationally and applies that same cutoff — so the
    differential check pins the session-merge semantics AND the
    emission boundary. Session state is per-user and bounded by the
    watermark, the shape that survives an unbounded stream."""
    stream = _events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    sess = (
        stream.groupBy(F.session_window(F.col("ts"), "1 hour").alias("sw"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            (F.sum(F.round(F.col("value") * 100, 0).cast("bigint")) / 100.0).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n",
            "sum_value",
        )
    )
    out = _drain(sess, "q170_mem")
    return out.orderBy("user_id", "session_start")


@register(
    "q171_stream_complete_topk",
    category="streaming",
    oracle="""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n
FROM events
GROUP BY event_type
ORDER BY n DESC, event_type
LIMIT 5
""",
)
def q171_stream_complete_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complete-output-mode streaming aggregation (the K4 console-sink
    shape as a declared query): a running top-k of event types where
    every trigger re-emits the full result table. Complete mode is the
    right choice exactly when the result is small (here: one row per
    event type) while the input is unbounded — the memory-sink table
    after the final batch must equal the batch aggregate, which is the
    oracle. No watermark needed: complete mode never drops state."""
    stream = _events_stream(spark, sf_dir)
    counts = stream.groupBy("event_type").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    spark_ = stream.sparkSession
    prev = spark_.conf.get("spark.sql.shuffle.partitions")
    spark_.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        q = (
            counts.writeStream.format("memory")
            .queryName("q171_mem")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark_.conf.set("spark.sql.shuffle.partitions", prev)
    return (
        spark_.sql("SELECT * FROM q171_mem")
        .orderBy(F.col("n").desc(), "event_type")
        .limit(5)
    )


@register(
    "q180_stream_dlq_routing",
    category="streaming",
    oracle="""
WITH tagged AS (
  SELECT CASE WHEN event_id % 97 = 0 THEN 'dlq' ELSE 'main' END AS route,
         event_type
  FROM events
)
SELECT route, event_type, CAST(count(*) AS BIGINT) AS n
FROM tagged GROUP BY route, event_type
ORDER BY route, event_type
""",
)
def q180_stream_dlq_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dead-letter routing end-to-end (E1/E2 as a LIVE
    pipeline, not just a batch split): the event stream's JSON payload
    is deterministically mangled for every 97th event, each micro-batch
    parses with columnNameOfCorruptRecord and fans out inside ONE
    foreachBatch write — corrupt rows land in the DLQ spool, good rows
    in the main spool; the stream never dies (E1's recoverable-error
    contract). The declared result re-reads BOTH spools and counts per
    route, so the oracle checks the whole fanout: nothing dropped,
    nothing double-written, corruption detected exactly where it was
    injected."""
    import os as _os

    from sensor_data_pipeline_spark.functions.json_wire import route_corrupt
    from sensor_data_pipeline_spark.sources.warehouse import SCRATCH

    import re as _re
    from pyspark.sql import types as T

    tag = _re.sub(r"[^A-Za-z0-9_]+", "_", sf_dir).strip("_")
    base = f"{SCRATCH}/dlq/{tag}"
    main_dir, dlq_dir = f"{base}/main", f"{base}/dlq"
    # fresh run: clear spools AND the checkpoint — a resumed checkpoint
    # would (correctly) re-deliver nothing, which is the exactly-once
    # property the poll-resume test pins; here we want the full replay
    import shutil as _shutil

    _shutil.rmtree(base, ignore_errors=True)
    for p in (main_dir, dlq_dir):
        _os.makedirs(p, exist_ok=True)

    # wire payload: a JSON envelope per event, corrupted (truncated)
    # for every 97th event id — the poison-pill shape a real queue sees
    stream = _events_stream(spark, sf_dir)
    envelope = F.to_json(F.struct("event_type", "value"))
    payload = F.when(
        F.col("event_id") % 97 == 0, F.concat(F.lit("{corrupt!"), envelope)
    ).otherwise(envelope)
    wired = stream.select(F.col("event_id"), payload.alias("payload"))

    schema = T.StructType(
        [T.StructField("event_type", T.StringType()), T.StructField("value", T.DoubleType())]
    )

    def fanout(batch_df, batch_id: int) -> None:
        good, bad = route_corrupt(batch_df, "payload", schema)
        # distributed writes, idempotent per (batch, route) directory —
        # the two-topic analog of a queue's main/DLQ split; overwrite
        # mode makes a replayed batch id converge instead of duplicate
        good.select("event_id", "event_type").write.mode("overwrite").json(
            f"{main_dir}/batch_{batch_id}"
        )
        bad.select("event_id").write.mode("overwrite").json(f"{dlq_dir}/batch_{batch_id}")

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        q = (
            wired.writeStream.foreachBatch(fanout)
            .option("checkpointLocation", f"{base}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)

    main = (
        spark.read.schema("event_id long, event_type string")
        .option("recursiveFileLookup", "true")
        .json(main_dir)
    )
    dlq = (
        spark.read.schema("event_id long")
        .option("recursiveFileLookup", "true")
        .json(dlq_dir)
    )
    # corrupt rows lost their parsed type; recover it by joining back to
    # the batch table on event_id (audit-side enrichment, not pipeline-side)
    from sensor_data_pipeline_spark.sources.tables import load_table

    events = load_table(spark, "events", sf_dir).select("event_id", "event_type")
    main_tagged = main.select(F.lit("main").alias("route"), "event_type")
    dlq_tagged = dlq.join(events, "event_id").select(F.lit("dlq").alias("route"), "event_type")
    return (
        main_tagged.unionByName(dlq_tagged)
        .groupBy("route", "event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy("route", "event_type")
    )


@register(
    "q183_stream_observe_audit",
    category="streaming",
    oracle="""
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS sum_cents
FROM events
""",
)
def q183_stream_observe_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K5 observability as a DRIVER-CHECKED query: DataFrame.observe
    rides the stream itself (named aggregates evaluated inside each
    micro-batch, zero extra passes over the data), and the per-batch
    observed metrics are read back from the query's progress log after
    the availableNow drain. Summed across batches they must equal the
    batch aggregate — so the oracle differentially pins that the
    OBSERVED telemetry equals the TRUTH, which is the whole point of
    an audit channel. This is how a 100 TB ingest watches itself:
    counts/sums come from metrics, never from a second scan. Metrics
    are collected via a StreamingQueryListener (sees every batch
    exactly once) rather than recentProgress, whose 100-entry ring
    buffer would silently undercount a drain of >100 micro-batches."""
    from sensor_data_pipeline_spark.streaming.listener import ObservedMetricsListener

    stream = _events_stream(spark, sf_dir)
    observed = stream.observe(
        "wire_audit",
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.round(F.col("value") * 100, 0).cast("bigint")).alias("sum_cents"),
    )
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    listener = ObservedMetricsListener("wire_audit")
    spark.streams.addListener(listener)
    try:
        q = (
            observed.writeStream.format("noop")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        last = q.lastProgress
        if last is not None:
            listener.wait_for_batch(str(q.id), last["batchId"])
        totals = listener.totals(str(q.id))
        total_rows = int(totals.get("n_rows", 0))
        total_cents = int(totals.get("sum_cents", 0))
    finally:
        spark.streams.removeListener(listener)
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.createDataFrame(
        [(total_rows, total_cents)], schema="n_rows long, sum_cents long"
    )


@register(
    "q200_stream_recursive_ewma",
    category="stateful",
    # The recursion is replayed relationally: DuckDB's recursive CTE
    # walks each user's rows in (ts, event_id) order applying the
    # identical float ops in the identical order, so the doubles are
    # bit-equal. Valid for the same reason as q68: the fixture is
    # (user_id, ts)-tie-free and the single-file source drains as one
    # micro-batch in global ts order (and the state carries across
    # batches if it ever splits).
    oracle="""
WITH RECURSIVE t AS (
  SELECT user_id, event_id,
         CAST(round(value * 100, 0) AS BIGINT) AS x,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events WHERE user_id < 16
),
r AS (
  SELECT user_id, event_id, rn, CAST(x AS DOUBLE) / 2 AS s FROM t WHERE rn = 1
  UNION ALL
  SELECT t.user_id, t.event_id, t.rn, (r.s + t.x) / 2 AS s
  FROM r JOIN t ON t.user_id = r.user_id AND t.rn = r.rn + 1
)
SELECT event_id, CAST(user_id AS VARCHAR) AS k, s AS ewma
FROM r ORDER BY event_id
""",
)
def q200_stream_recursive_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TRUE recursive EWMA (s_t = (s_{t-1}+x_t)/2) as a stateful
    streaming operator: per-key running state via
    applyInPandasWithState, the unbounded-history counterpart of
    q195's finite kernel — state is ONE double per key, so 10^9 keys
    is gigabytes spread across executors and each micro-batch does
    O(batch) work. The oracle replays the recursion with a recursive
    CTE; alpha=1/2 makes every step's rounding identical on both
    engines (halving is exact; only the add rounds)."""
    from sensor_data_pipeline_spark.streaming.stateful import ewma_stream

    stream = _events_stream(spark, sf_dir).filter(F.col("user_id") < 16)
    readings = stream.select(
        F.col("user_id").cast("string").alias("k"),
        F.col("ts").alias("tick_ts"),
        F.col("event_id"),
        F.round(F.col("value") * 100, 0).cast("bigint").alias("x"),
    )
    out = _drain(ewma_stream(readings), "q200_mem")
    return out.select("event_id", "k", "ewma").orderBy("event_id")


@register(
    "q233_stream_token_bucket",
    category="stateful",
    # The admission sequence is a pure integer function of each key's
    # (ts, event_id)-ordered event list, so DuckDB replays it with a
    # recursive CTE — the q200 pattern. Valid for the same reasons:
    # the fixture is (user_id, ts)-tie-free and state carries across
    # micro-batch splits via GroupState.
    oracle="""
WITH RECURSIVE t AS (
  SELECT user_id, event_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS es,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events WHERE user_id < 16
),
r AS (
  SELECT user_id, event_id, rn, es,
         CAST(5 - 1 AS BIGINT) AS tokens, TRUE AS allowed
  FROM t WHERE rn = 1
  UNION ALL
  SELECT t.user_id, t.event_id, t.rn, t.es,
         CASE WHEN least(5, r.tokens + (t.es - r.es) // 60) >= 1
              THEN least(5, r.tokens + (t.es - r.es) // 60) - 1
              ELSE least(5, r.tokens + (t.es - r.es) // 60) END,
         least(5, r.tokens + (t.es - r.es) // 60) >= 1
  FROM r JOIN t ON t.user_id = r.user_id AND t.rn = r.rn + 1
)
SELECT event_id, CAST(user_id AS VARCHAR) AS k, tokens AS tokens_after, allowed
FROM r ORDER BY event_id
""",
)
def q233_stream_token_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming per-key token-bucket rate limiter: capacity 5, one
    token per full minute of EVENT time, state = (last_ts, tokens) —
    two integers per key, so admission control over 10^9 keys is
    gigabytes of state spread across executors and each micro-batch
    does O(batch) work. All-integer refill arithmetic makes the
    admit/reject sequence bit-deterministic and replayable by the
    recursive-CTE oracle, across any micro-batch partitioning of the
    input (state carries the bucket over batch boundaries).

    This is the keyed, distributed form of the reference's redraw
    throttle (src/modules/dd/consumer.cpp suppresses updates arriving
    faster than the display can refresh)."""
    from sensor_data_pipeline_spark.streaming.stateful import token_bucket_stream

    stream = _events_stream(spark, sf_dir).filter(F.col("user_id") < 16)
    readings = stream.select(
        F.col("user_id").cast("string").alias("k"),
        F.col("ts").alias("tick_ts"),
        F.col("event_id"),
    )
    out = _drain(token_bucket_stream(readings), "q233_mem")
    return out.select("event_id", "k", "tokens_after", "allowed").orderBy("event_id")


@register(
    "q259_stream_learned_fences",
    category="streaming",
    # The oracle replays both halves relationally: fences from the
    # batch table, flags from joining every event against its key's
    # fence — which is exactly what the stream computes, since the
    # single-file source drains the same rows the batch scan reads.
    oracle="""
WITH cents AS (
  SELECT user_id, event_id, CAST(round(value * 100, 0) AS BIGINT) AS cents
  FROM events
),
med AS (SELECT user_id, quantile_cont(cents, 0.5) AS med FROM cents GROUP BY user_id),
mad AS (
  SELECT c.user_id, quantile_cont(abs(CAST(c.cents AS DOUBLE) - m.med), 0.5) AS mad
  FROM cents c JOIN med m USING (user_id) GROUP BY c.user_id
)
SELECT c.event_id, c.user_id, c.cents,
       abs(CAST(c.cents AS DOUBLE) - m.med) > CAST(3 AS DOUBLE) * CAST(1.4826 AS DOUBLE) * d.mad
         AS is_anomaly
FROM cents c
JOIN med m USING (user_id)
JOIN mad d USING (user_id)
ORDER BY c.event_id
""",
)
def q259_stream_learned_fences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-learned model, streaming inference — THE deployment
    pattern: q228's median/MAD fences are TRAINED on the batch table
    (two exact-median aggregations), then every arriving event is
    scored against its key's broadcast fence in a stream-static join
    (q70's mechanism carrying a learned artifact instead of a static
    dimension). At 100 TB the fence table is one row per stream key —
    broadcast- or at worst shuffle-joinable — and retraining swaps
    the static side without touching the streaming query, which is
    why feature stores version fences exactly this way.

    Flag math matches q228 bit-for-bit (exact k/k+.5 medians,
    identical double products), so the streamed flags hash-equal the
    fully-relational oracle."""
    from sensor_data_pipeline_spark.sources.tables import load_table

    cents_batch = (
        load_table(spark, "events", sf_dir)
        .select("user_id", F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"))
    )
    med = cents_batch.groupBy("user_id").agg(F.expr("percentile(cents, 0.5)").alias("med"))
    mad = (
        cents_batch.join(med, "user_id")
        .select("user_id", F.abs(F.col("cents").cast("double") - F.col("med")).alias("adev"))
        .groupBy("user_id")
        .agg(F.expr("percentile(adev, 0.5)").alias("mad"))
    )
    fences = med.join(mad, "user_id")
    stream = _events_stream(spark, sf_dir).select(
        "event_id", "user_id", F.round(F.col("value") * 100, 0).cast("bigint").alias("cents")
    )
    flagged = stream.join(fences, "user_id").select(
        "event_id",
        "user_id",
        "cents",
        (
            F.abs(F.col("cents").cast("double") - F.col("med"))
            > F.expr("CAST(3 AS DOUBLE) * CAST(1.4826 AS DOUBLE) * mad")
        ).alias("is_anomaly"),
    )
    out = _drain(flagged, "q259_mem")
    return out.select("event_id", "user_id", "cents", "is_anomaly").orderBy("event_id")


@register(
    "q260_stream_tws_delta",
    category="stateful",
    # A1's relational twin IS the oracle: delta = value - lag(value)
    # per key in (ts, event_id) order. Valid because the fixture is
    # (user_id, ts)-tie-free and state carries across micro-batch
    # splits, so the stateful replay equals the window replay row for
    # row; the subtraction is a single IEEE op on identical doubles.
    oracle="""
SELECT CAST(user_id AS VARCHAR) AS k,
       ts AS tick_ts,
       value,
       value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta
FROM events
WHERE user_id < 16
ORDER BY user_id, ts
""",
)
def q260_stream_tws_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 prev-value memory on Spark 4's transformWithStateInPandas
    (StatefulProcessor + ValueState — streaming/stateful_v2.py), the
    successor API to applyInPandasWithState: per-key delta from the
    immediately preceding row, across micro-batch boundaries.

    Engine selection is E3 init-failure degradation (the reference
    pattern at src/event_loops.c:26-31: a module whose init fails
    must degrade, not crash): transformWithStateInPandas talks to the
    state store over a protobuf wire protocol, so when
    google.protobuf is importable (standard on cluster images) the
    query runs the TWS engine; in this pip-less container it falls
    back to streaming/stateful.delta_stream_v1 — the
    applyInPandasWithState twin with IDENTICAL chunk handling, sort,
    and arithmetic — so the oracle pins the same semantics for
    whichever engine ran. Both engines: state is one double per key,
    one shuffle on the key, O(batch) per micro-batch.
    """
    try:
        import google.protobuf  # noqa: F401

        from sensor_data_pipeline_spark.streaming.stateful_v2 import delta_stream
    except ImportError:  # this container: no protobuf -> Spark-3-API twin
        from sensor_data_pipeline_spark.streaming.stateful import (
            delta_stream_v1 as delta_stream,
        )
    stream = _events_stream(spark, sf_dir).filter(F.col("user_id") < 16)
    readings = stream.select(
        F.col("user_id").cast("string").alias("k"),
        F.col("ts").alias("tick_ts"),
        F.col("value"),
    )
    out = _drain(delta_stream(readings), "q260_mem")
    return out.select("k", "tick_ts", "value", "delta").orderBy("k", "tick_ts")


@register(
    "q287_stream_nearest_match",
    category="streaming",
    # The oracle replays the two-sided band join + per-purchase argmin
    # relationally. The STREAM side stops at the raw pair join (q96's
    # drain-then-aggregate pattern): chaining the argmin aggregation
    # INTO the streaming query would make emission depend on the
    # join's internally-propagated watermark (measured: the join
    # lowers each side's output watermark by the band width, so tail
    # windows are withheld ~band+delay earlier than the naive
    # max(ts)-delay rule) — semantics a batch oracle cannot robustly
    # encode; see .claude/skills/verify/SKILL.md.
    oracle="""
WITH p AS (
  SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'
),
c AS (SELECT user_id, ts AS cts FROM events WHERE event_type = 'click'),
cand AS (
  SELECT p.event_id AS pid, p.user_id,
         abs(epoch_us(c.cts) - epoch_us(p.ts)) AS dist,
         epoch_us(c.cts) AS c_us,
         row_number() OVER (
           PARTITION BY p.event_id
           ORDER BY abs(epoch_us(c.cts) - epoch_us(p.ts)), epoch_us(c.cts)
         ) AS rn
  FROM p JOIN c ON p.user_id = c.user_id
   AND c.cts BETWEEN p.ts - INTERVAL 5 MINUTE AND p.ts + INTERVAL 5 MINUTE
)
SELECT CAST(pid AS BIGINT) AS pid, CAST(user_id AS BIGINT) AS user_id,
       CAST(dist AS BIGINT) AS diff_us, CAST(c_us AS BIGINT) AS click_us
FROM cand WHERE rn = 1 ORDER BY pid
""",
)
def q287_stream_nearest_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming bounded-delay nearest match — q284's as-of NEAREST
    lowered onto two live streams: purchases pair with the closest
    click within a +/-5-minute band. 'Nearest' needs the FUTURE, so
    unbounded nearest cannot stream; bounding the band makes it
    viable — each purchase is decidable once the click watermark
    passes its band end, and the two-sided interval join keeps both
    state stores bounded to band + watermark delay (the q96 property,
    here with a band in EACH direction). The drain emits raw pairs
    and the per-purchase argmin runs batch-side on the sink (ties to
    the earlier click, deterministically) — see the oracle comment
    for why the argmin must not be fused into the streaming DAG. At
    100 TB/day: join state is O(band x rate) per side, the argmin is
    a combiner min(struct) keyed by purchase."""
    p = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_uid"),
            F.col("ts").alias("p_ts"),
            F.col("event_id").alias("pid"),
        )
        .withWatermark("p_ts", "10 minutes")
    )
    c = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(F.col("user_id").alias("c_uid"), F.col("ts").alias("c_ts"))
        .withWatermark("c_ts", "10 minutes")
    )
    j = p.join(
        c,
        F.expr(
            "p_uid = c_uid AND c_ts >= p_ts - interval 5 minutes"
            " AND c_ts <= p_ts + interval 5 minutes"
        ),
    )
    out = _drain(
        j.select(
            "pid",
            F.col("p_uid").alias("user_id"),
            F.abs(F.unix_micros("c_ts") - F.unix_micros("p_ts")).alias("dist"),
            F.unix_micros("c_ts").alias("c_us"),
        ),
        "q287_mem",
    )
    best = out.groupBy("pid", "user_id").agg(
        F.min(F.struct("dist", "c_us")).alias("best")
    )
    return best.select(
        F.col("pid").cast("bigint").alias("pid"),
        F.col("user_id").cast("bigint").alias("user_id"),
        F.col("best.dist").cast("bigint").alias("diff_us"),
        F.col("best.c_us").cast("bigint").alias("click_us"),
    ).orderBy("pid")


# ---------------------------------------------------------------------------
# q301 — streaming hopping-window distinct-user census
# ---------------------------------------------------------------------------


@register(
    "q301_stream_hopping_distinct",
    category="streaming",
    oracle="""
WITH assigned AS (
  SELECT DISTINCT user_id,
         unnest([ts - to_microseconds(CAST(epoch_us(ts) % 1800000000 AS BIGINT)),
                 ts - to_microseconds(CAST(epoch_us(ts) % 1800000000 AS BIGINT))
                   - INTERVAL 30 MINUTE]) AS win_start
  FROM events
)
SELECT win_start, CAST(count(*) AS BIGINT) AS n_users
FROM assigned
GROUP BY win_start
ORDER BY win_start
""",
)
def q301_stream_hopping_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per HOPPING window (1 h length, 30 min slide),
    computed stream-side: every event expands into its two overlapping
    windows via window(), then dropDuplicatesWithinWatermark on
    (user_id, window) keeps only each user's first arrival per window
    — streaming aggregation can't do COUNT(DISTINCT), so the dedup
    IS the distinct, with state aged out by the watermark instead of
    growing forever. The drained first-arrivals are counted batch-side
    per the q96 pattern (one stateful operator in the streaming DAG;
    the count never fights the propagated-watermark emission rule).
    The oracle unnests the same two epoch-aligned hop starts and
    counts DISTINCT users exactly. At 100 TB/day: state is one key
    per active (user, window) within the watermark horizon — the
    window/slide ratio (2 here) multiplies state, so widening hops
    means re-budgeting state stores, not rewriting the query."""
    import tempfile

    stream = _events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    # the window struct inherits the event-time watermark metadata; ts
    # must NOT survive the projection or the plan has two event-time
    # columns and the stream aborts (XXKST)
    hopped = stream.select(F.window("ts", "1 hour", "30 minutes").alias("w"), "user_id")
    deduped = hopped.dropDuplicatesWithinWatermark(["user_id", "w"])
    # drain to a FILE sink, not the memory sink: first-arrivals are
    # O(N) rows and the memory sink materializes them on the driver —
    # at the 100x replica that's >1.3 GiB of task results and the job
    # dies on spark.driver.maxResultSize. Files keep the drain
    # executor-side (the production layout); the census then reads
    # them back as a batch scan.
    sink_dir = tempfile.mkdtemp(prefix="q301_sink_")
    ckpt = tempfile.mkdtemp(prefix="q301_ckpt_")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        q = (
            deduped.writeStream.format("parquet")
            .option("path", sink_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    out = spark.read.parquet(sink_dir)
    return (
        out.groupBy(F.col("w.start").alias("win_start"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
        .orderBy("win_start")
    )


# ---------------------------------------------------------------------------
# q303 — state-store data source audit
# ---------------------------------------------------------------------------


@register(
    "q303_stream_state_audit",
    category="streaming",
    oracle="""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS sum_cents
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def q303_stream_state_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audit a streaming aggregation's CHECKPOINT STATE with the state
    data source (`spark.read.format("statestore")`, Spark 4): run a
    per-type running count/sum over the event stream, then read the
    committed state store back as a batch DataFrame and verify it
    equals the batch GROUP BY — the state-debugging workflow for a
    production stream (is the store consistent with a bounded replay?)
    expressed as a differential query. The state source exposes
    key/value structs per partition; the audit projects them back to
    relational columns. At 100 TB/day this is how state corruption,
    skewed state partitions, and watermark bugs get diagnosed without
    stopping the stream: the reader works on checkpoint files alone.
    The checkpoint is a per-invocation temp dir (availableNow drain
    commits exactly one batch, so the read targets the last committed
    version deterministically)."""
    import tempfile

    ckpt = tempfile.mkdtemp(prefix="q303_state_")
    stream = _events_stream(spark, sf_dir)
    agg = stream.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.round(F.col("value") * 100, 0).cast("bigint")).cast("bigint").alias("sum_cents"),
    )
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        q = (
            agg.writeStream.format("noop")
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    state = spark.read.format("statestore").load(ckpt)
    # the value struct exposes the PHYSICAL aggregation buffer, named
    # after the aggregate functions (`count`, `sum`), not the query's
    # aliases — the audit maps buffer fields back to logical columns
    return (
        state.select(
            F.col("key.event_type").alias("event_type"),
            F.col("value.count").cast("bigint").alias("n"),
            F.col("value.sum").cast("bigint").alias("sum_cents"),
        )
        .orderBy("event_type")
    )
