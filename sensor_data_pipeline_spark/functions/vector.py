"""Vector column functions for similarity search (north-star).

Embeddings are ``array<float>`` columns; all math here uses Spark's
higher-order functions (`zip_with` + `aggregate`) in double precision,
summed in index order — which makes results bit-comparable with a
DuckDB oracle computing the same expression. No UDFs: the dot product
compiles to codegen'd loops over the Arrow-backed array.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def seg_dot(a: Column, b: Column, start: int, length: int) -> Column:
    """JVM-side dot product over a dimension slice (1-based start),
    folding strictly in index order, so the bits match DuckDB's
    list_dot_product over the same slice — the engine-exactness
    contract every cosine in the suite relies on. Interpreted (not
    codegen) per the higher-order-function rule, which is fine over
    array data: the per-row cost is the multiplies themselves. Shared
    by the frontier similarity queries (q333/q336/q339/q342/q347);
    multi-width metrics derive every width from these segment partials
    (the q336 Matryoshka rule — the oracle must then use the SAME
    partial grouping, since (s1+s2)+s3 is not bit-equal to a flat
    64-dim fold)."""
    return dot(F.slice(a, start, length), F.slice(b, start, length))


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def _seq_dot(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    # Accumulate sequentially over dims (vectorized over rows): each
    # `acc + x_k*y_k` is one rounding step in index order, so results are
    # bit-identical to the interpreted `aggregate(zip_with(...))` path
    # and to DuckDB's list_dot_product — while running ~100x faster.
    acc = np.zeros(len(x), dtype=np.float64)
    for k in range(x.shape[1]):
        acc = acc + x[:, k] * y[:, k]
    return acc


# DoubleType() instance, not "double": the DDL-string form would need an
# active SparkSession at import time.
@pandas_udf(DoubleType())
def cosine_arrow(a: pd.Series, b: pd.Series) -> pd.Series:
    """Arrow-batched cosine over two ``array<float>`` columns — the hot
    path for all-pairs similarity. Same bits as :func:`cosine`."""
    if len(a) == 0:
        return pd.Series([], dtype="float64")
    x = np.stack(a.to_numpy()).astype(np.float64)
    y = np.stack(b.to_numpy()).astype(np.float64)
    d = _seq_dot(x, y)
    return pd.Series(d / (np.sqrt(_seq_dot(x, x)) * np.sqrt(_seq_dot(y, y))))


def sign_lsh_bucket(a: Column, n_bits: int = 8, offset: int = 0) -> Column:
    """Sign-LSH bucket id from ``n_bits`` dimensions starting at
    ``offset``: bit i set iff a[offset+i] > 0. A cheap, deterministic
    random-hyperplane LSH (the axes act as fixed hyperplanes since
    embeddings are roughly centered). Bucket-join on this id replaces
    the O(n^2) cross join with an O(n) shuffle at scale; banded
    callers pass distinct offsets so each band sees independent
    hyperplanes.
    """
    bits = [
        F.when(F.element_at(a, offset + i + 1) > 0, F.lit(1 << i)).otherwise(F.lit(0))
        for i in range(n_bits)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("bigint")
