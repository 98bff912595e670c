"""Batch table sources: parquet scans of the testdata star schema.

The scan is the engine's S2-S4 analog (sensor reads become table
scans in tests, SURVEY.md §2.1). Schemas come from the registry —
never inferred — so column pruning and predicate pushdown reach the
parquet reader with zero inference passes, which matters when the
"table" is 100 TB instead of 6k rows.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from sensor_data_pipeline_spark.schemas import TESTDATA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """Scan one testdata table. Parquet is self-describing so we let the
    footer supply the schema (it matches ``TESTDATA_TABLES``); explicit
    ``.schema(...)`` on parquet would disable vectorized pushdown of
    mismatched physical types rather than help.
    """
    if name not in TESTDATA_TABLES:
        raise KeyError(f"unknown table {name!r}; known: {sorted(TESTDATA_TABLES)}")
    # Timestamp columns are TIMESTAMP(MICROS) in every testdata footer,
    # so the parquet reader yields Spark timestamps directly — no
    # conversion layer between the scan and the plan.
    #
    # The resolved relation is cached ON the session (a catalog resolves
    # a table once, not once per query): every spark.read.parquet call
    # re-lists the path and re-reads footers (~80 ms plan-side), which
    # across a 160-query suite is tens of seconds of pure re-resolution.
    # DataFrames are immutable logical plans, so reuse is safe; keying
    # the cache on the session object scopes it to that session's life.
    cache = getattr(spark, "_sdp_table_cache", None)
    if cache is None:
        cache = {}
        spark._sdp_table_cache = cache
    key = (name, sf_dir)
    if key not in cache:
        cache[key] = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    return cache[key]


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {name: load_table(spark, name, sf_dir) for name in TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every table as a temp view so ``spark.sql`` works against
    the same names the DuckDB oracle uses."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
