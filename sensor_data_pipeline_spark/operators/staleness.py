"""Staleness handling (SURVEY.md §2.5 T3), batch form.

The reference's consumer monitor resets displays to the 888.8 sentinel
when the last reading is older than 3600 s
(reference src/modules/dd/consumer.cpp:241-268). The batch analog
marks each row stale relative to the stream's frontier (max event
time) and substitutes the sentinel; the streaming twin is
``withWatermark`` + state timeout in ``streaming/staleness.py``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sensor_data_pipeline_spark.schemas import SENTINEL_MISSING, STALENESS_TOLERANCE_SEC


def apply_staleness(
    df: DataFrame,
    ts_col: str,
    value_cols: Sequence[str],
    partition_by: Sequence[str] = (),
    tolerance_sec: int = STALENESS_TOLERANCE_SEC,
    sentinel: float = SENTINEL_MISSING,
    stale_flag_col: str = "is_stale",
) -> DataFrame:
    """Flag rows older than ``tolerance_sec`` behind the frontier and
    replace their readings with the sentinel.

    The frontier is the max event time, global or per key. Computed as
    an unbounded window (single shuffle when partitioned; with no
    partition key Spark falls back to a single-partition window, so
    for global frontiers on huge inputs prefer a broadcast scalar agg
    — see ``plans/sensor.py`` q27 which uses that formulation).
    """
    if partition_by:
        frontier = F.max(F.col(ts_col)).over(Window.partitionBy(*partition_by))
    else:
        frontier = F.max(F.col(ts_col)).over(Window.partitionBy(F.lit(1)))
    age = F.unix_timestamp(frontier) - F.unix_timestamp(F.col(ts_col))
    out = df.withColumn(stale_flag_col, age > F.lit(tolerance_sec))
    for c in value_cols:
        out = out.withColumn(c, F.when(F.col(stale_flag_col), F.lit(sentinel)).otherwise(F.col(c)))
    return out
