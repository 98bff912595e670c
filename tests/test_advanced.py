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


# --- round-7 frontier family invariants -----------------------------------

SF001 = "/root/testdata/sf0.001"


def test_waterfill_allocation_exhausts_budget(spark):
    """q346: sum(alloc) == budget exactly (budget < corpus here), no
    source exceeds its size, and capped flags match alloc < n."""
    from sensor_data_pipeline_spark.plans.frontier2 import q346_waterfill_source_caps
    from sensor_data_pipeline_spark.sources.tables import load_table

    rows = q346_waterfill_source_caps(spark, SF001).collect()
    total = load_table(spark, "documents", SF001).count()
    budget = total * 3 // 5
    assert sum(r.alloc for r in rows) == budget
    for r in rows:
        assert 0 <= r.alloc <= r.n_docs
        assert r.capped == (r.alloc < r.n_docs)


def test_token_budget_selection_respects_budget(spark):
    """q341: the selected token mass never exceeds the 40% budget and
    is within one document of it (greedy tightness)."""
    from pyspark.sql import functions as F

    from sensor_data_pipeline_spark.plans.frontier2 import q341_token_budget_selection

    from sensor_data_pipeline_spark.sources.tables import load_table

    rows = q341_token_budget_selection(spark, SF001).collect()
    tok_total = sum(r.tok_total for r in rows)
    budget = tok_total * 2 // 5
    picked = sum(r.tok_selected for r in rows)
    assert picked <= budget
    # greedy fills to within ONE document of the budget — the bound
    # must be the largest single document's token count, not a source
    # total (round-7 review: the source-total bound was so loose that
    # dropping a whole partition of selected docs would still pass)
    max_doc_ntok = (
        load_table(spark, "documents", SF001)
        .select(F.size(F.split(F.col("text"), r"\s+")).alias("ntok"))
        .agg(F.max("ntok"))
        .first()[0]
    )
    assert budget - picked <= max_doc_ntok, (budget, picked, max_doc_ntok)


def test_migration_matrix_covers_every_vector(spark):
    """q342: the (cell_a, cell_b) matrix partitions the corpus — row
    counts sum to the vector count, cells are in range."""
    from sensor_data_pipeline_spark.plans.frontier2 import q342_centroid_migration
    from sensor_data_pipeline_spark.sources.tables import load_table

    rows = q342_centroid_migration(spark, SF001).collect()
    n = load_table(spark, "embeddings", SF001).count()
    assert sum(r.n_vectors for r in rows) == n
    assert all(0 <= r.cell_a < 8 and 0 <= r.cell_b < 8 for r in rows)


def test_cluster_keyed_split_never_leaks(spark):
    """q343: the cluster_hash strategy has zero straddling clusters and
    zero leaked pairs BY CONSTRUCTION; the doc_hash row reports the
    same duplicate-cluster census."""
    from sensor_data_pipeline_spark.plans.frontier2 import q343_split_leakage_audit

    rows = {r.strategy: r for r in q343_split_leakage_audit(spark, SF001).collect()}
    assert rows["cluster_hash"].n_straddling == 0
    assert rows["cluster_hash"].leaked_pairs == 0
    assert rows["cluster_hash"].n_dup_clusters == rows["doc_hash"].n_dup_clusters
    assert rows["cluster_hash"].dup_docs == rows["doc_hash"].dup_docs


def test_decontamination_curve_monotone(spark):
    """q344: widening the n-gram can only shrink the flagged set."""
    from sensor_data_pipeline_spark.plans.frontier2 import q344_decontamination_curve

    rows = sorted(q344_decontamination_curve(spark, SF001).collect(), key=lambda r: r.width)
    flagged = [r.n_flagged for r in rows]
    assert flagged == sorted(flagged, reverse=True)


def test_ivf_probe_recall_monotone(spark):
    """q347: recall is non-decreasing in the probe count, per query,
    and n_hits never exceeds k."""
    from collections import defaultdict

    from sensor_data_pipeline_spark.plans.frontier2 import q347_ivf_probe_recall_curve

    per_q = defaultdict(list)
    for r in q347_ivf_probe_recall_curve(spark, SF001).collect():
        per_q[r.query_id].append((r.probes, r.n_hits))
        assert 0 <= r.n_hits <= 5
        assert abs(r.recall - r.n_hits / 5.0) < 1e-15
    for q, pts in per_q.items():
        hits = [h for _, h in sorted(pts)]
        assert hits == sorted(hits), (q, pts)


def test_padding_waste_mult64_alignment(spark):
    """q345: the mult64 strategy's padded mass is 64-aligned, every
    strategy's padded mass >= token mass, and ppm stays in [0, 1e6)."""
    from sensor_data_pipeline_spark.plans.frontier2 import q345_padding_waste_audit

    rows = {r.strategy: r for r in q345_padding_waste_audit(spark, SF001).collect()}
    assert rows["mult64"].padded_mass % 64 == 0
    for r in rows.values():
        assert r.padded_mass >= r.token_mass
        assert 0 <= r.waste_ppm < 1_000_000
