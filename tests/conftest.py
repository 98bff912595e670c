from __future__ import annotations

import pytest

from sensor_data_pipeline_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="sdp-spark-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "broker: integration tests that need a live MQTT broker on "
        "127.0.0.1:1883 plus paho-mqtt (skipped automatically otherwise)",
    )
