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
from pyspark.sql import functions as F
from pyspark.sql import types as T

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
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    # TIMESTAMP(NANOS) parquet columns arrive as nano-epoch longs (see
    # session.py nanosAsLong); truncate to micros exactly as DuckDB does.
    expected = TESTDATA_TABLES[name]
    for field in df.schema.fields:
        want = expected[field.name].dataType if field.name in expected.fieldNames() else None
        if isinstance(field.dataType, T.LongType) and isinstance(want, T.TimestampType):
            df = df.withColumn(field.name, F.timestamp_micros(F.expr(f"{field.name} div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {name: load_table(spark, name, sf_dir) for name in TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every table as a temp view so ``spark.sql`` works against
    the same names the DuckDB oracle uses."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
