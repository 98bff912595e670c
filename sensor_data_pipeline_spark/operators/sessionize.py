"""Predicate-based sessionization (SURVEY.md §2.4, A1-A5).

The reference detects charge/discharge sessions by a sign flip of the
current reading: ``prev_current * current <= 0`` starts a new session
and resets the rate baseline
(reference src/modules/module_rpi_ups_hat.c:253-258); the per-session
rate and ETA math is :200-219.

This is *predicate-based* session bounding, which Spark's gap-based
``session_window`` cannot express — so the batch operator is pure
window functions (lag -> flag -> running sum), one shuffle on the
partition key. The streaming twin lives in
``streaming/sessionize.py`` (applyInPandasWithState).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sessionize_by_sign_flip(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[str],
    signal_col: str,
    session_col: str = "session_id",
) -> DataFrame:
    """Assign a session id that increments whenever the signal's sign
    flips (or touches zero), reproducing
    ``prev_current * current <= 0 => new session``
    (module_rpi_ups_hat.c:253-258). The first row of each partition
    starts session 1.
    """
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    prev = F.lag(F.col(signal_col)).over(w)
    flip = F.when(prev.isNull() | (prev * F.col(signal_col) <= 0), 1).otherwise(0)
    return df.withColumn("_new_session", flip).withColumn(
        session_col,
        F.sum("_new_session").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast("bigint"),
    ).drop("_new_session")


def session_rates(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[str],
    ts_col: str,
    pct_col: str,
    session_col: str = "session_id",
    rate_col: str = "use_per_sec",
    eta_col: str = "eta_sec",
) -> DataFrame:
    """Per-session rate-of-change + extrapolated ETA (A3/A4/A5).

    Reproduces the reference arithmetic exactly
    (module_rpi_ups_hat.c:200-219):
      rate = (pct_t0 - pct) / (t - t0 + 1)      [+1 guards div-by-0]
      eta  = pct / rate, null when rate == 0    [the <NA> print path]
    """
    w = (
        Window.partitionBy(*partition_by, session_col)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    t0: Column = F.first(F.unix_timestamp(F.col(ts_col))).over(w)
    pct0: Column = F.first(F.col(pct_col)).over(w)
    rate = (pct0 - F.col(pct_col)) / (F.unix_timestamp(F.col(ts_col)) - t0 + 1)
    return (
        df.withColumn(rate_col, rate)
        .withColumn(eta_col, F.when(F.col(rate_col) != 0, F.col(pct_col) / F.col(rate_col)))
    )
