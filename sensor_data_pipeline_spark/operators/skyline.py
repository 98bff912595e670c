"""2-D Pareto frontier (skyline) without the O(n²) dominance join.

A point dominates another when it is >= on the value axis, <= on the
cost axis, and strictly better on at least one. For TWO dimensions the
non-dominated set is a monotone frontier, which turns the textbook
NOT-EXISTS self-join into:

1. collapse to the COST DOMAIN: max(value) per distinct cost — the
   domain is bounded (calendar days, price points, …) so this table is
   tiny regardless of row count, and the aggregation combines map-side;
2. a running max over that domain table ordered by cost — the only
   global window in the plan, and it runs over domain-sized data;
3. keep cost points whose best value strictly exceeds every cheaper
   point's best, then recover the original rows with a broadcast join
   (ties kept: identical (value, cost) points do not dominate each
   other, matching NOT-EXISTS semantics).

Property-tested against a brute-force reference in
tests/test_properties.py; q263 is the query-suite instance with a
DuckDB NOT-EXISTS oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def pareto_frontier_2d(df: DataFrame, value_col: str, cost_col: str) -> DataFrame:
    """Rows of ``df`` on the (maximize value_col, minimize cost_col)
    Pareto frontier. Both columns should be exact (integer/decimal)
    types so frontier membership is not float-order dependent."""
    dom = df.groupBy(cost_col).agg(F.max(value_col).alias("_best_val"))
    w = Window.orderBy(cost_col).rowsBetween(Window.unboundedPreceding, -1)
    frontier = (
        dom.withColumn("_prev_best", F.max("_best_val").over(w))
        .filter(F.col("_prev_best").isNull() | (F.col("_best_val") > F.col("_prev_best")))
        .select(cost_col, "_best_val")
    )
    return (
        df.alias("a")
        .join(
            F.broadcast(frontier.alias("f")),
            (F.col(f"a.{cost_col}") == F.col(f"f.{cost_col}"))
            & (F.col(f"a.{value_col}") == F.col("f._best_val")),
        )
        .select("a.*")
    )
