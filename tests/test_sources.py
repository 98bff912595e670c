"""Source-layer tests: config pointer access (S7), rate-source
synthetic readings (S8), table scans (S2-S4 analog)."""

from __future__ import annotations

import json
import time

import pytest

from sensor_data_pipeline_spark.sources.config import PipelineConfig
from sensor_data_pipeline_spark.sources.tables import load_table, register_views


def test_config_pointer_access(tmp_path):
    cfg_path = tmp_path / "settings.json"
    cfg_path.write_text(
        json.dumps(
            {
                "collection_event_interval_ms": 1000,
                "dd": {"mqtt": {"host": "broker.example", "port": 8883}, "displays": [{"hz": 1000}]},
            }
        )
    )
    cfg = PipelineConfig.from_file(str(cfg_path))
    assert cfg.get("/collection_event_interval_ms") == 1000
    assert cfg.get("/dd/mqtt/host") == "broker.example"
    assert cfg.get("/dd/displays/0/hz") == 1000
    assert cfg.get("/dd/mqtt/missing", default=42) == 42  # P13 defaulting
    with pytest.raises(KeyError, match="/dd/mqtt/ca_path"):  # P12 fail-fast
        cfg.require("/dd/mqtt/host", "/dd/mqtt/ca_path")


def test_rate_source_synthetic_readings(spark):
    from sensor_data_pipeline_spark.streaming import synthetic_readings

    stream = synthetic_readings(spark, rows_per_second=50)
    q = (
        stream.writeStream.format("memory")
        .queryName("rate_smoke")
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.time() + 30
        while time.time() < deadline and spark.sql("SELECT * FROM rate_smoke").count() < 5:
            time.sleep(0.5)
        rows = spark.sql("SELECT * FROM rate_smoke").collect()
    finally:
        q.stop()
    assert len(rows) >= 5
    # readings are deterministic in the rate counter: bounded ranges
    for r in rows:
        assert 20.0 <= r.temp_outdoor_celsius <= 21.0
        assert 22.0 <= r.temp_indoor_celsius <= 22.7
        assert 55.0 <= r.rh_outdoor <= 75.0


def test_register_views_sql_twin(spark):
    register_views(spark, "/root/testdata/sf0.001")
    via_sql = spark.sql("SELECT count(*) AS n FROM lineitem").first().n
    via_df = load_table(spark, "lineitem", "/root/testdata/sf0.001").count()
    assert via_sql == via_df > 0


def test_load_table_rejects_unknown(spark):
    with pytest.raises(KeyError):
        load_table(spark, "nonexistent", "/root/testdata/sf0.001")
