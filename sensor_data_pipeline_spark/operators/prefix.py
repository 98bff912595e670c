"""Distributed global prefix sums (scan) without a single-partition window.

``Window.orderBy(...)`` with no ``partitionBy`` collapses the whole
dataset into ONE task — the canonical Spark scaling trap for running
totals. The operator here computes the same result with the classic
two-pass scan:

1. range-repartition on the order key so partitions hold contiguous
   key ranges,
2. an intra-partition running sum (window partitioned by the physical
   partition id — parallel, no global shuffle of the ordered stream),
3. per-partition totals (one tiny row per partition) turned into
   exclusive offsets on the driver and broadcast-joined back.

The per-partition totals table has exactly ``numPartitions`` rows, so
the driver-side cumulation is O(partitions), never O(rows) — this is a
scan-combine, not a ``collect()`` of data.

Reference analog: the reference keeps running state in a single-threaded
loop (`src/modules/module_rpi_ups_hat.c:64,259`); this operator is the
distributed generalization of "running accumulator over an ordered
stream".
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def global_running_sum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "running_sum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact global ``sum(value) OVER (ORDER BY order_col)`` at scale.

    ``order_col`` must be globally unique (a key): uniqueness is what
    lets rows with the same key never straddle a partition boundary.
    The result is identical to the single-partition window for any
    range partitioning, because each row's prefix sum depends only on
    the set of rows ordered before it, not on where the cuts fall.

    The range-partitioned frame is materialized with
    ``localCheckpoint(eager=True)`` before the totals pass: the offsets
    job and the final join job are SEPARATE Spark jobs, and without
    pinning, the second job re-executes the range exchange — whose
    boundary SAMPLING may cut differently — so the collected offsets
    would attach to the wrong partitions (observed as shifted prefix
    sums under adaptive.enabled=false at sf0.01). ``localCheckpoint``
    rather than ``persist()`` for two reasons: (a) it severs lineage,
    so a lost block can only fail loudly — it can never silently
    recompute the exchange with re-sampled boundaries and reintroduce
    the misalignment; (b) its blocks are released by the
    ContextCleaner as soon as the checkpointed frame is
    garbage-collected, so repeated calls don't accumulate pinned
    blocks for the session lifetime the way an unpaired ``persist()``
    does.
    """
    parts = df.repartitionByRange(*( [num_partitions] if num_partitions else [] ), F.col(order_col))
    with_pid = parts.withColumn("_pid", F.spark_partition_id()).localCheckpoint(eager=True)
    w = Window.partitionBy("_pid").orderBy(order_col).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    local = with_pid.withColumn("_local_sum", F.sum(value_col).over(w))
    totals = (
        with_pid.groupBy("_pid").agg(F.sum(value_col).alias("_part_total")).orderBy("_pid").collect()
    )  # O(numPartitions) rows — a scan-combine, not a data collect; reads the checkpoint
    offsets, acc = [], 0
    for row in totals:
        offsets.append((row["_pid"], acc))
        acc += row["_part_total"]
    spark = df.sparkSession
    off_df = spark.createDataFrame(offsets, schema="_pid int, _offset bigint")
    return (
        local.join(F.broadcast(off_df), "_pid")
        .withColumn(out_col, (F.col("_local_sum") + F.col("_offset")).cast("bigint"))
        .drop("_pid", "_local_sum", "_offset")
    )


def stable_global_ids(
    df: DataFrame,
    order_col: str,
    out_col: str = "global_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Dense, deterministic 1-based global row IDs ordered by
    ``order_col`` (globally unique key) — the corpus-ID assignment step
    for a new training dataset, at scale.

    Neither built-in works: ``monotonically_increasing_id`` is sparse
    and partitioning-dependent (re-running on different parallelism
    yields different ids), and ``row_number() OVER (ORDER BY ...)``
    collapses to one task. This is the same two-pass scan as
    ``global_running_sum`` with value 1: range-partition by the key,
    number rows within each partition, add the exclusive count offsets
    of preceding partitions. Output is a pure function of the data and
    the key order — any cluster size reproduces identical ids.
    """
    counted = global_running_sum(
        df.withColumn("_one", F.lit(1)),
        order_col,
        "_one",
        out_col=out_col,
        num_partitions=num_partitions,
    )
    return counted.drop("_one")
