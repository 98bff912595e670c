"""Top-k operators.

No top-k exists in the reference (SURVEY.md §2.9) — inherited from
Spark. Per-group top-k is a ranking window over a single shuffle;
never a self-join. Global top-k is orderBy+limit, which Spark executes
as TakeOrderedAndProject (per-partition heaps merged on the driver) —
no full sort at any scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def topk_per_group(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rank_col: str = "rk",
) -> DataFrame:
    """Keep the top ``k`` rows per group. ``order_by`` must be a total
    order (include a unique tiebreak column) for deterministic output.
    """
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return df.withColumn(rank_col, F.row_number().over(w).cast("bigint")).filter(F.col(rank_col) <= k)
