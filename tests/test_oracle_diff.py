"""Differential correctness: every registered query vs its DuckDB
oracle at sf0.001 (fast twin of the driver's sf0.01 gate).

Mirrors the driver's compare exactly: row count, column-name set,
order-insensitive value hash with columns sorted by name
(tools/compare_oracle.py holds the shared canonicalization).
"""

from __future__ import annotations

import pytest

from sensor_data_pipeline_spark.plans import REGISTRY
from tools.compare_oracle import canon, duck_conn

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duck_conn(SF_SMOKE)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, duck, name):
    spec = REGISTRY[name]
    sdf = spec.spark(spark, SF_SMOKE)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    if spec.oracle is None:
        # non-SQL-expressible: rows-only contract (driver does the same)
        assert isinstance(s_rows, list)
        return

    res = duck.execute(spec.oracle)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()

    assert len(s_rows) == len(d_rows), f"rowcount spark={len(s_rows)} duck={len(d_rows)}"
    assert sorted(s_cols) == sorted(d_cols), f"cols spark={sorted(s_cols)} duck={sorted(d_cols)}"
    assert canon(s_rows, s_cols) == canon(d_rows, d_cols), "value-hash mismatch"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == e.entry(spark).columns  # stable schema


def test_every_query_has_registry_doc():
    for name, spec in REGISTRY.items():
        assert spec.doc.strip(), f"{name} has no doc"
        assert spec.category, f"{name} has no category"
