"""Physical-plan shape assertions for the flagship queries: these pin
the properties that matter at 100 TB — predicate pushdown reaching the
scan, column pruning, map-side partial aggregation, broadcast joins
for small dims, and the absence of cartesian products in the
candidate-generation paths."""

from __future__ import annotations

import re

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q01_pushdown_pruning_partial_agg(spark):
    from sensor_data_pipeline_spark.plans.relational import q01_pricing_summary

    import contextlib
    import io

    df = q01_pricing_summary(spark, SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    # the shipdate predicate reaches the parquet reader
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: the 11-column table is read as 7 columns
    m = re.search(r"\(1\) Scan parquet ?\nOutput \[(\d+)\]", plan)
    assert m and m.group(1) == "7", plan[:500]
    # map-side combine before the exchange
    assert "partial_sum" in plan


def test_q03_small_dims_broadcast(spark):
    from sensor_data_pipeline_spark.plans.relational import q03_broadcast_dim_chain

    plan = plan_of(q03_broadcast_dim_chain(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_dedup_jaccard_no_cartesian(spark):
    from sensor_data_pipeline_spark.plans.northstar import q41_dedup_jaccard

    plan = plan_of(q41_dedup_jaccard(spark, SF))
    # candidate pairs come from posting-list arrays, never a cross join
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_similarity_broadcasts_query_side(spark):
    from sensor_data_pipeline_spark.plans.northstar import q48_cosine_topk

    plan = plan_of(q48_cosine_topk(spark, SF))
    # the query set rides a broadcast (nested-loop over broadcast is the
    # intended all-pairs shape); the corpus must never shuffle for the
    # join itself
    assert "Broadcast" in plan
    assert "CartesianProduct" not in plan


def test_range_join_is_equi_join(spark):
    from sensor_data_pipeline_spark.plans.advanced import q55_range_join

    plan = plan_of(q55_range_join(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_scan_layer_reads_events_with_pruning(spark):
    from pyspark.sql import functions as F

    from sensor_data_pipeline_spark.sources.tables import load_table

    ev = load_table(spark, "events", SF).filter(F.col("event_type") == "purchase").select("event_id")
    plan = plan_of(ev)
    # predicate pushdown survives the ts long->timestamp conversion layer
    assert "PushedFilters: [IsNotNull(event_type), EqualTo(event_type,purchase)]" in plan
