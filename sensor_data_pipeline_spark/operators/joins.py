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


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_lo: str,
    right_hi: str,
    bucket_width: float,
) -> DataFrame:
    """Point-in-interval join: pairs where ``lo <= point <= hi``,
    without the cross join Spark's planner would otherwise produce for
    a pure theta join.

    Both sides are bucketed by ``floor(x / bucket_width)``: each
    interval explodes into the buckets it covers, each point lands in
    exactly one bucket, and the join becomes an equi-join on bucket id
    followed by the exact containment filter. Each matching pair meets
    in precisely one bucket (the point's), so no dedup is needed.

    Cost model: shuffle is O(points + intervals x avg_span/width); pick
    ``bucket_width`` near the median interval span so most intervals
    explode into ~2 buckets. This is the standard bucketed-range-join
    strategy (cf. Databricks range-join hints; Spark OSS has no native
    one).

    Columns ``lo``/``hi``/``point`` must be numeric (cast timestamps
    to epoch seconds first). Output: all left columns + all right
    columns.
    """
    pt = F.col(left_point)
    l_b = left.withColumn("_bucket", F.floor(pt / F.lit(bucket_width)).cast("bigint"))
    span = F.sequence(
        F.floor(F.col(right_lo) / F.lit(bucket_width)).cast("bigint"),
        F.floor(F.col(right_hi) / F.lit(bucket_width)).cast("bigint"),
    )
    r_b = right.withColumn("_bucket", F.explode(span))
    return (
        l_b.join(r_b, "_bucket")
        .filter((pt >= F.col(right_lo)) & (pt <= F.col(right_hi)))
        .drop("_bucket")
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the (large, possibly skewed) left
    side into ``n_salts`` sub-keys and replicate the right side once
    per salt, so one hot key spreads across ``n_salts`` reducers
    instead of melting a single one.

    Result is row-identical to the plain join (the differential oracle
    checks exactly that). With AQE skew handling on this is usually
    unnecessary — keep it for the cases AQE can't split (e.g. a single
    key too hot even after partition splitting, or stream-static joins
    where AQE doesn't apply).
    """
    salt = F.pmod(F.xxhash64(F.col(left_key), F.monotonically_increasing_id()), F.lit(n_salts))
    l_s = left.withColumn("_salt", salt.cast("int"))
    r_s = right.withColumn("_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)])))
    out = l_s.join(r_s, (F.col(left_key) == F.col(right_key)) & (l_s["_salt"] == r_s["_salt"]), how)
    return out.drop("_salt")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    *,
    tolerance_sec: int | None = None,
    suffix: str = "_right",
    direction: str = "backward",
) -> DataFrame:
    """As-of join, backward (default) or forward, both inclusive.

    Backward: attach the most recent right row with
    ``right_ts <= left_ts`` — DuckDB ``ASOF LEFT JOIN ... ON l.ts >=
    r.ts``. Forward: attach the NEXT right row with ``right_ts >=
    left_ts`` — DuckDB ``... ON l.ts <= r.ts`` (the "next maintenance
    after the failure" direction). Left rows with no match keep nulls;
    ``tolerance_sec`` additionally nulls matches farther than the
    tolerance — the engine form of the reference's staleness rule
    (consumer.cpp:251).

    Implementation: tag both sides, union by name, and take
    ``last(value, ignorenulls=True)`` over an unbounded-preceding
    frame (backward) or ``first(...)`` over an unbounded-following
    frame (forward). Side ordering at equal timestamps makes equality
    matches inclusive in both directions. One co-partitioning of both
    inputs either way.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    backward = direction == "backward"
    keys = [on] if isinstance(on, str) else list(on)
    val_cols = [c for c in right.columns if c not in keys and c != right_ts]

    l_tagged = left.withColumn("_ts", F.col(left_ts)).withColumn("_side", F.lit(1 if backward else 0))
    for c in val_cols:
        new = f"{c}{suffix}" if c in left.columns else c
        l_tagged = l_tagged.withColumn(new, F.lit(None).cast(right.schema[c].dataType))
    r_tagged = right.withColumn("_ts", F.col(right_ts)).withColumn("_side", F.lit(0 if backward else 1))
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

    wbase = Window.partitionBy(*keys).orderBy("_ts", "_side")
    if backward:
        w = wbase.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        pick, right_side, left_side = F.last, 0, 1
    else:
        w = wbase.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        pick, right_side, left_side = F.first, 1, 0
    filled = unioned
    for c in out_vals:
        filled = filled.withColumn(c, pick(c, ignorenulls=True).over(w))
    filled = filled.withColumn(
        "_matched_ts",
        pick(F.when(F.col("_side") == right_side, F.col("_ts")), ignorenulls=True).over(w),
    )

    result = filled.filter(F.col("_side") == left_side)
    if tolerance_sec is not None:
        gap = (
            F.unix_timestamp("_ts") - F.unix_timestamp("_matched_ts")
            if backward
            else F.unix_timestamp("_matched_ts") - F.unix_timestamp("_ts")
        )
        in_tol = gap <= F.lit(tolerance_sec)
        for c in out_vals:
            result = result.withColumn(c, F.when(in_tol, F.col(c)))
    return result.drop("_ts", "_side", "_matched_ts")


def asof_join_cogrouped(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    *,
    suffix: str = "_right",
) -> DataFrame:
    """Backward (inclusive) as-of join via cogrouped ``applyInPandas``
    — the Arrow-batched twin of ``asof_join`` (identical semantics,
    verified differentially by q113 against the same DuckDB ASOF
    oracle as q29).

    Implementation: both inputs shuffle once on the key; each
    key-cogroup arrives as two pandas frames and the match is a
    vectorized ``searchsorted`` (binary search of every left timestamp
    in the sorted right timestamps — 'right' side minus one gives the
    latest right row with ``right_ts <= left_ts``, equal stamps
    inclusive). Per-group work is O((n+m) log m) with no window state,
    which beats the union+last-non-null window form when right values
    are wide (the window carries every value column through the sort;
    this carries only the matched rows). The trade: rows cross the
    JVM<->Arrow boundary, so the pure-JVM ``asof_join`` stays the
    default.
    """
    import pandas as pd  # noqa: F401 (typing of the UDF frames)

    keys = [on] if isinstance(on, str) else list(on)
    val_cols = [c for c in right.columns if c not in keys and c != right_ts]
    out_names = {c: (f"{c}{suffix}" if c in left.columns else c) for c in val_cols}

    # Pre-rename every non-key right column so no name collides with a
    # left column: cogroup's attribute deduplication silently drops
    # same-named right attributes that aren't in the output schema
    # (observed: a shared 'ts' vanishes from the right pandas frame).
    rts = "_asof_rts"
    r_in = right.withColumnRenamed(right_ts, rts)
    for c in val_cols:
        if out_names[c] != c:
            r_in = r_in.withColumnRenamed(c, out_names[c])
    r_vals = [out_names[c] for c in val_cols]

    import pyspark.sql.types as T

    out_fields = list(left.schema.fields) + [
        T.StructField(out_names[c], right.schema[c].dataType, True) for c in val_cols
    ]
    out_schema = T.StructType(out_fields)
    left_cols = list(left.columns)

    def merge(ldf, rdf):
        import numpy as np

        if ldf.empty:
            return ldf.reindex(columns=[f.name for f in out_fields])
        out = ldf.sort_values(left_ts, kind="mergesort").reset_index(drop=True)
        if rdf.empty:
            for c in r_vals:
                out[c] = None
            return out[[f.name for f in out_fields]]
        r = rdf.sort_values(rts, kind="mergesort").reset_index(drop=True)
        idx = np.searchsorted(r[rts].values, out[left_ts].values, side="right") - 1
        ok = idx >= 0
        if ok.all():
            # fast path: native dtypes straight through Arrow
            for c in r_vals:
                out[c] = r[c].values[idx]
        else:
            # object arrays so unmatched rows carry real None (NaN is
            # NOT null to Spark — the distinction matters to the oracle)
            for c in r_vals:
                matched = r[c].values[np.clip(idx, 0, None)]
                out[c] = np.where(ok, matched, None)
                out[c] = out[c].where(ok)
        return out[[f.name for f in out_fields]]

    return (
        left.groupBy(*keys)
        .cogroup(r_in.groupBy(*keys))
        .applyInPandas(merge, schema=out_schema)
        .select(*left_cols, *r_vals)
    )


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    *,
    suffix: str = "_right",
) -> DataFrame:
    """As-of join, NEAREST direction: attach the right row whose
    timestamp minimizes ``|right_ts - left_ts|``; exact ties resolve
    to the earlier (backward) match, deterministically. Completes the
    family next to :func:`asof_join`'s backward/forward (reference
    J1 fan-in, src/modules/dd/producer.c:236-265 — "pair the reading
    taken closest in time").

    Same scale shape as asof_join: tag both sides, union, ONE
    co-partitioning on the key, then BOTH candidate directions come
    from two frames over the same keyed sort (last-non-null preceding
    for the backward candidate, first-non-null following for the
    forward one) — nearest selection is a row-local comparison, so
    no second shuffle and no join. Equal-timestamp right rows sort
    before left rows and are found by the backward frame with
    distance zero. The chosen right timestamp is returned as
    ``matched_ts`` so callers can emit the match distance.
    """
    keys = [on] if isinstance(on, str) else list(on)
    val_cols = [c for c in right.columns if c not in keys and c != right_ts]
    out_vals = [f"{c}{suffix}" if c in left.columns else c for c in val_cols]

    l_tagged = left.withColumn("_ts", F.col(left_ts)).withColumn("_side", F.lit(1))
    for c, new in zip(val_cols, out_vals):
        l_tagged = l_tagged.withColumn(new, F.lit(None).cast(right.schema[c].dataType))
    r_tagged = right.withColumn("_ts", F.col(right_ts)).withColumn("_side", F.lit(0))
    for c, new in zip(val_cols, out_vals):
        if new != c:
            r_tagged = r_tagged.withColumnRenamed(c, new)
    for c in left.columns:
        if c not in r_tagged.columns:
            r_tagged = r_tagged.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    cols = [*keys, "_ts", "_side", *[c for c in left.columns if c not in keys], *out_vals]
    unioned = l_tagged.select(*cols).unionByName(r_tagged.select(*cols))

    wbase = Window.partitionBy(*keys).orderBy("_ts", "_side")
    w_prev = wbase.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_next = wbase.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    right_ts_col = F.when(F.col("_side") == 0, F.col("_ts"))
    filled = unioned.withColumn(
        "_prev_ts", F.last(right_ts_col, ignorenulls=True).over(w_prev)
    ).withColumn("_next_ts", F.first(right_ts_col, ignorenulls=True).over(w_next))
    for c in out_vals:
        filled = filled.withColumn(f"_prev_{c}", F.last(c, ignorenulls=True).over(w_prev))
        filled = filled.withColumn(f"_next_{c}", F.first(c, ignorenulls=True).over(w_next))

    dist_prev = F.unix_micros(F.col("_ts").cast("timestamp")) - F.unix_micros(
        F.col("_prev_ts").cast("timestamp")
    )
    dist_next = F.unix_micros(F.col("_next_ts").cast("timestamp")) - F.unix_micros(
        F.col("_ts").cast("timestamp")
    )
    # forward wins only when strictly closer (ties -> backward/earlier)
    take_next = F.col("_prev_ts").isNull() | (
        F.col("_next_ts").isNotNull() & (dist_next < dist_prev)
    )
    result = filled.filter(F.col("_side") == 1).withColumn(
        "matched_ts", F.when(take_next, F.col("_next_ts")).otherwise(F.col("_prev_ts"))
    )
    for c in out_vals:
        result = result.withColumn(
            c, F.when(take_next, F.col(f"_next_{c}")).otherwise(F.col(f"_prev_{c}"))
        )
    drop = ["_ts", "_side", "_prev_ts", "_next_ts"]
    drop += [f"_prev_{c}" for c in out_vals] + [f"_next_{c}" for c in out_vals]
    return result.drop(*drop)
