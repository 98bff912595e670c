"""Grouped-aggregate pandas UDFs (SURVEY.md §2.8: the
``pandas_udf GROUPED_AGG`` surface — custom aggregations the built-in
functions can't express, Arrow-batched per group).

Float-determinism discipline: the OLS slope accumulates in exact
Python/numpy int64 arithmetic (inputs are pre-scaled integers) and
performs exactly one float division at the end, so a SQL oracle
computing the same closed form from the same integer sums is
bit-identical regardless of per-group row order or partitioning.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType


@pandas_udf(DoubleType())
def ols_slope_int(x: pd.Series, y: pd.Series) -> float:
    """Least-squares slope of y on x for one group; ``x`` and ``y``
    must be integer-valued (epoch seconds, scaled cents).

    slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²), every term an exact
    Python int (arbitrary precision, no overflow at any group size).
    Returns None for degenerate groups (constant x).
    """
    xs = [int(v) for v in x]
    ys = [int(v) for v in y]
    n = len(xs)
    if n == 0:
        return None
    sx = sum(xs)
    sy = sum(ys)
    sxx = sum(v * v for v in xs)
    sxy = sum(a * b for a, b in zip(xs, ys))
    denom = n * sxx - sx * sx
    if denom == 0:
        return None
    return float(n * sxy - sx * sy) / float(denom)
