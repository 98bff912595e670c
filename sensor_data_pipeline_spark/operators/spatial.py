"""Grid-bucketed spatial operators.

Uniform-grid candidate generation for exact radius-bounded
nearest-neighbor joins: with cell size >= radius, every point within
radius r of a probe lies in the probe's 3x3 cell neighborhood, so the
candidate set is an equi-join on cell ids — one hash shuffle whose
fan-out is bounded by cell occupancy, never an inequality join or
CartesianProduct. The nearest pick is a partial-aggregable min-struct
(dist2, tiebreak key), not a per-key sort.

The reference has no spatial operator; this generalizes its
nearest-reading lookup loop (src/modules/dd/consumer.cpp:241-268) to a
distributed two-sided join. At 100 TB the grid pitch must track point
density so occupancy stays executor-bounded (hash-uniform fixtures get
that for free; real geo data re-grids per density tier).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def grid_nn_join(
    probes: DataFrame,
    points: DataFrame,
    probe_key: str,
    point_key: str,
    px: Column,
    py: Column,
    qx: Column,
    qy: Column,
    radius: int,
    cell: int | None = None,
) -> DataFrame:
    """Exact nearest point within `radius` for every probe row.

    Coordinates must be integer columns (exact BIGINT distance math).
    Returns one row per probe: (probe_key, nn_<point_key> nullable,
    nn_dist2 nullable) — probes with no point inside the radius keep
    NULLs via the final left join.

    `cell` defaults to `radius`; any cell >= radius is correct (the
    3x3 neighborhood covers the radius disk by construction), larger
    cells trade fewer shuffle keys for bigger candidate lists.
    """
    cell = cell or radius
    if cell < radius:
        raise ValueError(f"cell {cell} < radius {radius} breaks 3x3 coverage")
    r2 = radius * radius
    # the candidate join EXPLODES relative to its shuffle-write size
    # (9 cells/probe x cell occupancy), which is AQE's blind spot: it
    # coalesces the small shuffle and then 3-4 tasks grind the whole
    # join (observed: a 10-minute straggler at the 100x replica).
    # Explicit-width co-partitioning on the cell key pins the join
    # fan-in — AQE never coalesces a user-specified partition count —
    # and both sides sharing HashPartitioning(_gx,_gy,n) means the
    # join itself adds no further exchange.
    n_part = int(points.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    pt = (
        points.select(
            F.col(point_key),
            qx.alias("_sx"),
            qy.alias("_sy"),
        )
        .select(
            point_key,
            "_sx",
            "_sy",
            F.expr(f"_sx DIV {cell}").alias("_gx"),
            F.expr(f"_sy DIV {cell}").alias("_gy"),
        )
        .repartition(n_part, "_gx", "_gy")
    )
    offsets = F.explode(
        F.array(
            *[
                F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
                for dx in (-1, 0, 1)
                for dy in (-1, 0, 1)
            ]
        )
    )
    pr = probes.select(F.col(probe_key), px.alias("_cx"), py.alias("_cy"))
    pr_cells = (
        pr.select(probe_key, "_cx", "_cy", offsets.alias("_o"))
        .select(
            probe_key,
            "_cx",
            "_cy",
            (F.expr(f"_cx DIV {cell}") + F.col("_o.dx")).alias("_gx"),
            (F.expr(f"_cy DIV {cell}") + F.col("_o.dy")).alias("_gy"),
        )
        .repartition(n_part, "_gx", "_gy")
    )
    d2 = (F.col("_cx") - F.col("_sx")) * (F.col("_cx") - F.col("_sx")) + (
        F.col("_cy") - F.col("_sy")
    ) * (F.col("_cy") - F.col("_sy"))
    cand = (
        pr_cells.join(pt, ["_gx", "_gy"])
        .select(probe_key, point_key, d2.alias("dist2"))
        .filter(F.col("dist2") <= r2)
    )
    best = cand.groupBy(probe_key).agg(F.min(F.struct("dist2", point_key)).alias("_b"))
    return (
        pr.select(probe_key)
        .join(best, probe_key, "left")
        .select(
            probe_key,
            F.col(f"_b.{point_key}").cast("bigint").alias(f"nn_{point_key}"),
            F.col("_b.dist2").cast("bigint").alias("nn_dist2"),
        )
    )
