"""Session-factory config policy tests (no SparkSession needed).

The AQE coalescing floor is the one config whose LOCAL-optimal value
(64k — a local task costs ~2-5 ms, so 64 KB of post-shuffle input is
already worth a task) is WRONG on a network cluster (per-task cost is
10-100x higher; Spark's 1m default is right there). The policy under
test: a deployment that forgets SPARK_GRAFT_AQE_MIN_PARTITION must get
the cluster-safe behaviour — the 64k floor applies only to local[*]
masters (VERDICT r11 item 5 / ADVICE r11).
"""

import pytest

from sensor_data_pipeline_spark.session import _resolve_aqe_floor


@pytest.fixture
def _no_env(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_AQE_MIN_PARTITION", raising=False)


def test_local_master_gets_64k_floor(_no_env):
    assert _resolve_aqe_floor("local[32]") == "64k"
    assert _resolve_aqe_floor("local[*]") == "64k"
    assert _resolve_aqe_floor("local") == "64k"


def test_cluster_master_keeps_spark_default(_no_env):
    # None = get_spark does not set the conf at all; Spark's 1m
    # default stays in force on every non-local deployment.
    assert _resolve_aqe_floor("spark://host:7077") is None
    assert _resolve_aqe_floor("yarn") is None
    assert _resolve_aqe_floor("k8s://https://host:443") is None


def test_env_override_wins_everywhere(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_AQE_MIN_PARTITION", "2m")
    assert _resolve_aqe_floor("local[32]") == "2m"
    assert _resolve_aqe_floor("yarn") == "2m"
