"""Vector column functions for similarity search (north-star).

Embeddings are ``array<float>`` columns; all math here uses Spark's
higher-order functions (`zip_with` + `aggregate`) in double precision,
summed in index order — which makes results bit-comparable with a
DuckDB oracle computing the same expression. No UDFs: the dot product
compiles to codegen'd loops over the Arrow-backed array.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def sign_lsh_bucket(a: Column, n_bits: int = 8) -> Column:
    """Sign-LSH bucket id from the first ``n_bits`` dimensions:
    bit i set iff a[i] > 0. A cheap, deterministic random-hyperplane
    LSH (the axes act as fixed hyperplanes since embeddings are roughly
    centered). Bucket-join on this id replaces the O(n^2) cross join
    with an O(n) shuffle at scale.
    """
    bits = [
        F.when(F.element_at(a, i + 1) > 0, F.lit(1 << i)).otherwise(F.lit(0))
        for i in range(n_bits)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("bigint")
