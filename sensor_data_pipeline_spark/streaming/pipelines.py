"""Streaming pipelines: the producer/consumer dataflows as
readStream→transform→writeStream graphs (SURVEY.md §3.1-§3.3).

Each transform reuses the SAME column expressions as its
oracle-checked batch twin (functions/, plans/sensor.py), so streaming
correctness rides on the batch differential tests; the streaming tests
only have to prove plumbing (trigger, watermark, state, sink
lifecycle), which they drive deterministically with availableNow +
memory sinks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sensor_data_pipeline_spark.functions.json_wire import route_corrupt, to_wire_json
from sensor_data_pipeline_spark.functions.timefn import iso8601_format, iso8601_parse
from sensor_data_pipeline_spark.schemas import READINGS_WIRE, SENTINEL_MISSING

#: reference topic default (settings-sample.json shape)
DEFAULT_TOPIC = "sensor/readings"


def synthetic_readings(spark: SparkSession, rows_per_second: int = 1) -> DataFrame:
    """S8 + S2 analog: the rate source is the engine's synthetic
    counter module (reference src/modules/sample/sample.c:47-52); the
    derived pseudo-sensor columns stand in for device reads, exactly
    like the reference's `sample` module stands in for real sensors.
    Deterministic in `value` so tests can assert exact outputs."""
    rate = spark.readStream.format("rate").option("rowsPerSecond", rows_per_second).load()
    return rate.select(
        F.col("timestamp").alias("timestamp_utc"),
        (F.lit(20.0) + (F.col("value") % 10) / 10.0).alias("temp_outdoor_celsius"),
        (F.lit(22.0) + (F.col("value") % 7) / 10.0).alias("temp_indoor_celsius"),
        (F.lit(55.0) + (F.col("value") % 20)).alias("rh_outdoor"),
    )


def producer_pipeline(readings: DataFrame, topic: str = DEFAULT_TOPIC, qos: int = 1) -> DataFrame:
    """dd-producer dataflow (§3.1): readings → ISO-8601 stamp (T1) →
    wire JSON (K1 payload, producer.c:136-141) → MQTT_MESSAGE rows."""
    return readings.select(
        F.lit(topic).alias("topic"),
        F.lit(qos).alias("qos"),
        to_wire_json(
            iso8601_format(F.col("timestamp_utc")).alias("timestamp_utc"),
            F.round("temp_outdoor_celsius", 1).alias("temp_outdoor_celsius"),
            F.round("temp_indoor_celsius", 1).alias("temp_indoor_celsius"),
            F.round("rh_outdoor", 1).alias("rh_outdoor"),
        ).alias("payload"),
    )


def consumer_pipeline(messages: DataFrame) -> tuple[DataFrame, DataFrame]:
    """dd-consumer dataflow (§3.2): parse wire JSON (corrupt rows
    diverted, E2) → sentinel-default missing fields (P13, 888.8) →
    parse event time (T2) → project the display slots (P8).

    Returns (readings, corrupt). The staleness reset (T3) composes on
    top — batch form operators/staleness.py, streaming form
    stateful.staleness_monitor_stream.
    """
    good, bad = route_corrupt(messages, "payload", READINGS_WIRE)
    readings = good.select(
        iso8601_parse(F.col("timestamp_utc")).alias("event_ts"),
        F.coalesce("temp_outdoor_celsius", F.lit(SENTINEL_MISSING)).alias("temp_outdoor_celsius"),
        F.coalesce("rh_outdoor", F.lit(SENTINEL_MISSING)).alias("rh_outdoor"),
    )
    return readings, bad


def windowed_event_stats(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    watermark: str = "1 hour",
    window: str = "10 minutes",
    slide: str | None = None,
) -> DataFrame:
    """Watermarked tumbling/sliding window aggregation — the §2.5
    generalization the reference lacks (its only window is the loop
    period itself). Watermark bounds state exactly like the consumer's
    3600 s staleness tolerance bounds display trust (consumer.cpp:251).
    """
    win = F.window(F.col(ts_col), window, slide) if slide else F.window(F.col(ts_col), window)
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(win.alias("win"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(F.round(F.col("value") * 100, 0).cast("bigint")) / 100.0).alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )
