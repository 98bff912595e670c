"""Declared-query registry.

Each QuerySpec pairs a Spark implementation with the ANSI-SQL oracle
DuckDB runs on the same parquet (the sqllogictest-style differential
corpus the reference lacks, SURVEY.md §5). Registration keeps the two
adjacent so column names/types stay in lockstep — the driver's compare
hashes values after sorting columns by name, so every computed column
is aliased identically on both sides.

Float determinism: aggregates over doubles are wrapped in ``round(x, k)``
on BOTH sides so Spark's partial-aggregation order and DuckDB's scan
order can't produce last-ulp hash mismatches.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark: SparkQuery
    oracle: str | None  # None => non-SQL-expressible; driver does rows-only check
    category: str
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, category: str, oracle: str | None, doc: str = "") -> Callable[[SparkQuery], SparkQuery]:
    def deco(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name=name, spark=fn, oracle=oracle, category=category, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def all_queries() -> dict[str, SparkQuery]:
    return {name: spec.spark for name, spec in REGISTRY.items()}


def all_oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}
