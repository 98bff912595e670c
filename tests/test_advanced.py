"""Invariants for the advanced operators: bucketed range join
(vs a reference cross-join filter), salted join (vs the plain join),
approximate aggregate error bounds."""

from __future__ import annotations

from pyspark.sql import functions as F

from sensor_data_pipeline_spark.operators.joins import range_join, salted_join


def test_range_join_equals_theta_join(spark):
    points = spark.createDataFrame([(i, float(i * 7 % 100)) for i in range(60)], "pid int, pt double")
    intervals = spark.createDataFrame(
        [(1, 10.0, 30.0), (2, 25.0, 26.0), (3, 90.0, 200.0), (4, -50.0, -10.0)],
        "iid int, lo double, hi double",
    )
    got = {(r.pid, r.iid) for r in range_join(points, intervals, "pt", "lo", "hi", 10.0).collect()}
    want = {
        (r.pid, r.iid)
        for r in points.crossJoin(intervals).filter((F.col("pt") >= F.col("lo")) & (F.col("pt") <= F.col("hi"))).collect()
    }
    assert got == want and len(want) > 0


def test_range_join_boundary_inclusive(spark):
    points = spark.createDataFrame([(1, 10.0), (2, 30.0), (3, 9.999), (4, 30.001)], "pid int, pt double")
    intervals = spark.createDataFrame([(1, 10.0, 30.0)], "iid int, lo double, hi double")
    got = sorted(r.pid for r in range_join(points, intervals, "pt", "lo", "hi", 7.0).collect())
    assert got == [1, 2]  # closed interval on both ends


def test_salted_join_equals_plain_join(spark):
    left = spark.createDataFrame([(i, i % 3) for i in range(100)], "id int, k int")
    right = spark.createDataFrame([(0, "a"), (1, "b"), (2, "c")], "rk int, v string")
    got = sorted((r.id, r.v) for r in salted_join(left, right, "k", "rk", n_salts=4).collect())
    want = sorted((r.id, r.v) for r in left.join(right, left.k == right.rk).collect())
    assert got == want and len(want) == 100


def test_approx_aggs_error_bounds(spark):
    from sensor_data_pipeline_spark.plans.advanced import q62_approx_aggs
    from sensor_data_pipeline_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    approx = {r.event_type: r for r in q62_approx_aggs(spark, sf).collect()}
    ev = load_table(spark, "events", sf)
    exact = {
        r.event_type: r
        for r in ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.percentile("value", 0.5).alias("median"),
        )
        .collect()
    }
    for et, ex in exact.items():
        ap = approx[et]
        assert ap.exact_users == ex.users
        # the sketch error bounds are now part of the query output
        # (self-audit booleans hash-checked by the oracle)
        assert ap.hll_within_10pct  # HLL rsd=0.02, wide margin
        assert ap.gk_within_rank_tol
