"""Join operators beyond Spark's built-ins.

The reference's only join is J1: the per-tick fan-in of two sensor
streams into one row (reference src/modules/dd/producer.c:236-265).
Generalized to event time, that is an **as-of join** — which Spark SQL
lacks natively. The distributed formulation here is union + a
last-non-null window: one shuffle on the key, one sort within each
partition, no cross join, no Python. That plan scales linearly — at
100 TB the cost is exactly one co-partitioning of both inputs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    *,
    tolerance_sec: int | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Backward (inclusive) as-of join: for every left row, attach the
    most recent right row with ``right_ts <= left_ts`` and equal keys.

    Semantics match DuckDB's ``ASOF LEFT JOIN ... ON l.ts >= r.ts``:
    left rows with no prior right row keep nulls. ``tolerance_sec``
    additionally nulls matches older than the tolerance — the engine
    form of the reference's staleness rule (consumer.cpp:251).

    Implementation: tag both sides, union by name, and take
    ``last(value, ignorenulls=True)`` over a key-partitioned,
    time-ordered window. Right rows sort before left rows at equal
    timestamps so equality matches are inclusive.
    """
    keys = [on] if isinstance(on, str) else list(on)
    val_cols = [c for c in right.columns if c not in keys and c != right_ts]

    l_tagged = left.withColumn("_ts", F.col(left_ts)).withColumn("_side", F.lit(1))
    for c in val_cols:
        new = f"{c}{suffix}" if c in left.columns else c
        l_tagged = l_tagged.withColumn(new, F.lit(None).cast(right.schema[c].dataType))
    r_tagged = right.withColumn("_ts", F.col(right_ts)).withColumn("_side", F.lit(0))
    for c in val_cols:
        new = f"{c}{suffix}" if c in left.columns else c
        if new != c:
            r_tagged = r_tagged.withColumnRenamed(c, new)
    for c in left.columns:
        if c not in r_tagged.columns:
            r_tagged = r_tagged.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    out_vals = [f"{c}{suffix}" if c in left.columns else c for c in val_cols]
    unioned = l_tagged.select(*keys, "_ts", "_side", *[c for c in left.columns if c not in keys], *out_vals).unionByName(
        r_tagged.select(*keys, "_ts", "_side", *[c for c in left.columns if c not in keys], *out_vals)
    )

    w = Window.partitionBy(*keys).orderBy("_ts", "_side").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    filled = unioned
    for c in out_vals:
        filled = filled.withColumn(c, F.last(c, ignorenulls=True).over(w))
    filled = filled.withColumn("_matched_ts", F.last(F.when(F.col("_side") == 0, F.col("_ts")), ignorenulls=True).over(w))

    result = filled.filter(F.col("_side") == 1)
    if tolerance_sec is not None:
        in_tol = (F.unix_timestamp("_ts") - F.unix_timestamp("_matched_ts")) <= F.lit(tolerance_sec)
        for c in out_vals:
            result = result.withColumn(c, F.when(in_tol, F.col(c)))
    return result.drop("_ts", "_side", "_matched_ts")
