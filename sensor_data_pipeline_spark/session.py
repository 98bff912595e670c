"""SparkSession factory.

The reference resolves all configuration once at startup
(``src/utils.c:12-44`` loads a JSON config into globals before the loop
starts); the engine analog is a single, explicitly-configured
SparkSession. Defaults are tuned for the test harness (local[N]) but
every knob matters at cluster scale:

- AQE on: runtime re-planning (skew joins, coalesced shuffle
  partitions) is the single cheapest scale insurance.
- ``spark.sql.shuffle.partitions`` small locally; on a real cluster
  AQE coalesces from a high initial number, so we set the initial
  partition count instead of disabling it.
- Arrow on: every pandas_udf / applyInPandas transfer is Arrow-batched.
"""

from __future__ import annotations

import os
from contextlib import contextmanager

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "*")


@contextmanager
def composed_pins(spark: SparkSession):
    """Build scope that makes ``localCheckpoint(eager=False)`` pins
    actually lazy.

    Under AQE, ``Dataset.localCheckpoint`` resolves the RDD through
    ``AdaptiveSparkPlanExec``, which materializes EVERY adaptive query
    stage synchronously — so each "lazy" pin is a driver-blocking job
    at BUILD time (measured on q302: 11.9s in ``spec.spark(...)``,
    0.15s in the subsequent collect; the r11 eager→lazy flips never
    composed anything). Disabling AQE inside this scope makes the pins
    plan statically (at the session's shuffle-partition count), so the
    whole pin chain executes as ONE composed action on first
    consumption with its stages pipelined (guide §2.6). The CONSUMER's
    plan is finalized at action time, outside the scope, and keeps AQE
    (skew-join handling, partition coalescing, runtime broadcast).

    Adopt per query by interleaved same-session measurement, not by
    default: q335 (-27%) and q236 (-15%) win — their pins are
    corpus-pass maps whose static 32-partition stages pipeline well;
    q332 / q269 / q226 LOSE (their pin stages profit from AQE's
    runtime broadcast conversion and coalescing) and stay unscoped.

    Contract for scoped LAZY pins: every consumer must fully
    materialize all partitions (collect/toPandas/noop write). A
    partial consumer (limit/take) would silently trigger
    LocalRDDCheckpointData's end-of-job fill-in job — correct output,
    hidden re-execution. tests/test_plan_shapes.py::
    test_lazy_pin_consumers_materialize_fully enforces it.
    """
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)


def _resolve_aqe_floor(resolved_master: str) -> str | None:
    """AQE coalescing minPartitionSize: explicit env override wins;
    otherwise 64k on local[*] masters only, and None (= keep Spark's
    cluster-safe 1m default) everywhere else."""
    env = os.environ.get("SPARK_GRAFT_AQE_MIN_PARTITION")
    if env is not None:
        return env
    return "64k" if resolved_master.startswith("local") else None


def get_spark(
    app_name: str = "sensor-data-pipeline-spark",
    master: str | None = None,
    shuffle_partitions: int = DEFAULT_SHUFFLE_PARTITIONS,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    On a cluster, drop ``master`` and submit normally; these configs are
    master-agnostic.
    """
    resolved_master = master or f"local[{DEFAULT_CPUS}]"
    # AQE coalescing sizes post-shuffle partitions by SHUFFLE BYTES,
    # which under-parallelizes stages whose work is dominated by
    # post-shuffle fan-out (posting-list pair explosion, per-group
    # array expansion): a 1 MB posting shuffle that explodes to
    # millions of pair rows was coalesced to ONE task (measured:
    # q41's pair stage ran 1/32 cores, 3.7s solo; at 64k it spreads
    # and runs 1.4s). The floor is the LOCAL task-overhead tradeoff
    # (a local task costs ~2-5 ms, so 64 KB of input is already
    # worth a task); on a network cluster per-task cost (scheduler
    # round-trip, shuffle fetch setup) is 10-100x higher, so Spark's
    # 1m default is right there — the 64k floor therefore applies
    # ONLY when the resolved master is local[*]; any other master
    # keeps Spark's default unless SPARK_GRAFT_AQE_MIN_PARTITION
    # overrides (a deployment that forgets the env var must get the
    # cluster-safe value, not the bench-host one). Scale-adaptive
    # either way: AQE still derives the partition COUNT from input
    # size; this only moves the floor.
    aqe_floor = _resolve_aqe_floor(resolved_master)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(resolved_master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # testdata events.parquet stores TIMESTAMP(NANOS) which Spark's
        # parquet reader rejects; read as long and convert in the source
        # layer (sources/tables.py) — same truncation DuckDB applies.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # parquet scans: keep splits big enough that sf0.1 doesn't
        # explode into thousands of tiny tasks, small enough that a
        # 100 TB table still parallelizes across every executor.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.sql.shuffle.spill.compress", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # managed tables (bucketing needs saveAsTable) go to scratch,
        # never the repo working dir
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_SCRATCH", "/tmp/sdp_spark_warehouse") + "/managed",
        )
    )
    if aqe_floor is not None:
        builder = builder.config(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize", aqe_floor
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
