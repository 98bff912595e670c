"""Property-based tests (hypothesis): the distributed as-of join must
agree with pandas.merge_asof on arbitrary inputs, and sessionization
must agree with a direct single-pass reference implementation."""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sensor_data_pipeline_spark.operators.joins import asof_join
from sensor_data_pipeline_spark.operators.sessionize import sessionize_by_sign_flip

_ts = st.integers(min_value=0, max_value=10_000)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    left_ts=st.lists(_ts, min_size=1, max_size=12),
    right=st.lists(st.tuples(_ts, st.integers(-100, 100)), min_size=1, max_size=12, unique_by=lambda t: t[0]),
)
def test_asof_join_matches_pandas_merge_asof(spark, left_ts, right):
    from pyspark.sql import functions as F

    left = spark.createDataFrame([("k", t) for t in left_ts], "k string, lts long").withColumn(
        "lts", F.timestamp_seconds("lts")
    )
    rdf = spark.createDataFrame([("k", t, float(v)) for t, v in right], "k string, rts long, v double")
    rdf = rdf.withColumn("rts", F.timestamp_seconds("rts"))
    got = {
        (r.k, r.lts): r.v
        for r in asof_join(left, rdf, on="k", left_ts="lts", right_ts="rts").collect()
    }

    lp = pd.DataFrame({"k": "k", "lts": pd.to_datetime(sorted(left_ts), unit="s")})
    rp = pd.DataFrame(
        {"k": "k", "rts": pd.to_datetime([t for t, _ in sorted(right)], unit="s"), "v": [float(v) for _, v in sorted(right)]}
    )
    want_df = pd.merge_asof(lp, rp, left_on="lts", right_on="rts", by="k", direction="backward")
    for row in want_df.itertuples(index=False):
        want_v = None if pd.isna(row.v) else row.v
        assert got[(row.k, row.lts.to_pydatetime())] == want_v


def _reference_sessions(signals: list[float]) -> list[int]:
    """Direct replay of the reference loop (module_rpi_ups_hat.c:253-258)."""
    out, sid, prev = [], 0, None
    for cur in signals:
        if prev is None or prev * cur <= 0:
            sid += 1
        out.append(sid)
        prev = cur
    return out


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(signals=st.lists(st.floats(-10, 10, allow_nan=False, width=32), min_size=1, max_size=30))
def test_sessionize_matches_reference_loop(spark, signals):
    rows = [("k", i, float(s)) for i, s in enumerate(signals)]
    df = spark.createDataFrame(rows, "k string, t int, sig double")
    got = [r.session_id for r in sessionize_by_sign_flip(df, ["k"], ["t"], "sig").orderBy("t").collect()]
    assert got == _reference_sessions([float(s) for s in signals])


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=40,
    )
)
def test_dedup_components_matches_union_find(spark, edges):
    """Distributed min-label propagation must agree with a driver-side
    union-find on arbitrary small graphs (chains, stars, cycles,
    disconnected islands — whatever hypothesis draws)."""
    from sensor_data_pipeline_spark.operators.dedup import dedup_components

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = {v for e in edges for v in e}
    want = {n: find(n) for n in nodes}
    # min-rep canonicalization: union-find roots are already minimal
    # because unions always point the larger root at the smaller
    df = spark.createDataFrame([(a, b) for a, b in edges], "id_a int, id_b int")
    # both strategies must agree with the reference: the distributed
    # label-propagation loop (threshold 0) and the small-graph local
    # union-find fast path (default threshold)
    got_dist = {r.doc_id: r.cluster_id for r in dedup_components(df, small_graph_edges=0).collect()}
    got_local = {r.doc_id: r.cluster_id for r in dedup_components(df).collect()}
    assert got_dist == want
    assert got_local == want


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(vals=st.lists(st.integers(-1000, 1000), min_size=1, max_size=60))
def test_global_running_sum_matches_accumulate(spark, vals):
    """The two-pass distributed scan must equal itertools.accumulate
    for any value sequence and any partition count."""
    from itertools import accumulate

    from sensor_data_pipeline_spark.operators.prefix import global_running_sum

    df = spark.createDataFrame(list(enumerate(vals)), "k int, v long")
    got = {r.k: r.running_sum for r in global_running_sum(df, "k", "v", num_partitions=5).collect()}
    want = dict(enumerate(accumulate(vals)))
    assert got == want


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    events=st.lists(
        st.tuples(
            st.integers(0, 3),  # user
            st.integers(0, 50),  # ts offset seconds
            st.booleans(),  # True = left (purchase), False = right (click)
        ),
        min_size=1,
        max_size=30,
    )
)
def test_asof_implementations_agree(spark, events):
    """Cross-implementation invariant: the JVM window form (asof_join)
    and the cogrouped-pandas form (asof_join_cogrouped) must produce
    identical results on arbitrary inputs — same keys, same backward-
    inclusive tie handling, same null behavior for match-less rows.
    Timestamps are deduplicated per (user, side) so both tie-break
    rules see a unique ordering."""
    from datetime import datetime, timedelta

    from sensor_data_pipeline_spark.operators.joins import asof_join, asof_join_cogrouped

    base = datetime(2024, 1, 1)
    seen = set()
    lrows, rrows = [], []
    for i, (u, t, is_left) in enumerate(events):
        if (u, t, is_left) in seen:
            continue
        seen.add((u, t, is_left))
        ts = base + timedelta(seconds=t)
        if is_left:
            lrows.append((i, u, ts, float(i)))
        else:
            rrows.append((u, ts, 1000 + i, float(100 + i)))
    if not lrows:
        return
    left = spark.createDataFrame(
        lrows, "event_id long, user_id long, ts timestamp, value double"
    )
    right = spark.createDataFrame(
        rrows or [(99, base - timedelta(days=1), 0, 0.0)],
        "user_id long, ts timestamp, click_event_id long, click_value double",
    )
    a = asof_join(left, right, on="user_id", left_ts="ts", right_ts="ts")
    b = asof_join_cogrouped(left, right, on="user_id", left_ts="ts", right_ts="ts")
    # repr-keyed sort: rows may contain None (match-less left rows)
    ra = sorted((tuple(r) for r in a.select(*sorted(a.columns)).collect()), key=repr)
    rb = sorted((tuple(r) for r in b.select(*sorted(b.columns)).collect()), key=repr)
    assert ra == rb


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    left_ts=st.lists(_ts, min_size=1, max_size=12),
    right=st.lists(st.tuples(_ts, st.integers(-100, 100)), min_size=1, max_size=12, unique_by=lambda t: t[0]),
)
def test_asof_forward_matches_pandas(spark, left_ts, right):
    """Forward direction vs pandas.merge_asof(direction='forward'):
    the first right row at-or-after each left timestamp."""
    from pyspark.sql import functions as F

    left = spark.createDataFrame([("k", t) for t in left_ts], "k string, lts long").withColumn(
        "lts", F.timestamp_seconds("lts")
    )
    rdf = spark.createDataFrame([("k", t, float(v)) for t, v in right], "k string, rts long, v double")
    rdf = rdf.withColumn("rts", F.timestamp_seconds("rts"))
    got = {
        (r.k, r.lts): r.v
        for r in asof_join(
            left, rdf, on="k", left_ts="lts", right_ts="rts", direction="forward"
        ).collect()
    }

    lp = pd.DataFrame({"k": "k", "lts": pd.to_datetime(sorted(left_ts), unit="s")})
    rp = pd.DataFrame(
        {"k": "k", "rts": pd.to_datetime([t for t, _ in sorted(right)], unit="s"), "v": [float(v) for _, v in sorted(right)]}
    )
    want_df = pd.merge_asof(lp, rp, left_on="lts", right_on="rts", by="k", direction="forward")
    for row in want_df.itertuples(index=False):
        want_v = None if pd.isna(row.v) else row.v
        assert got[(row.k, row.lts.to_pydatetime())] == want_v


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    build=st.lists(st.integers(0, 10**12), min_size=1, max_size=40, unique=True),
    probe=st.lists(st.integers(0, 10**12), min_size=1, max_size=40, unique=True),
)
def test_bloom_filter_never_false_negative(spark, build, probe):
    """Every inserted key must pass bloom_contains (no false
    negatives) for arbitrary key sets — the guarantee q261's pruning
    correctness rests on. Probe-side false positives are allowed (and
    bounded by geometry), never asserted absent."""
    from pyspark.sql import functions as F

    from sensor_data_pipeline_spark.operators.filters import bloom_bitmap, bloom_contains

    kdf = spark.createDataFrame([(k,) for k in build], "k long")
    bloom = bloom_bitmap(kdf, "k")
    hits = (
        kdf.join(F.broadcast(bloom))
        .select(bloom_contains(F.col("bloom"), F.col("k")).alias("hit"))
        .collect()
    )
    assert all(r.hit for r in hits)
    # and the filter is not degenerate-full: disjoint probes mostly miss
    misses = [p for p in probe if p not in set(build)]
    if misses:
        pdf = spark.createDataFrame([(k,) for k in misses], "k long")
        n_fp = (
            pdf.join(F.broadcast(bloom))
            .filter(bloom_contains(F.col("bloom"), F.col("k")))
            .count()
        )
        # with n <= 40 keys in 8192 bits the FP probability is ~1e-11;
        # a full-size miss set passing would mean the bitmap is all-ones
        assert n_fp < len(misses)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(pts=st.lists(st.tuples(st.integers(0, 50), st.integers(0, 50)), min_size=1, max_size=40))
def test_pareto_frontier_matches_bruteforce(spark, pts):
    """The monotone-frontier skyline must equal the O(n^2) dominance
    definition for arbitrary integer point sets, duplicates included."""
    from sensor_data_pipeline_spark.operators.skyline import pareto_frontier_2d

    df = spark.createDataFrame([(i, v, c) for i, (v, c) in enumerate(pts)], "i long, v long, c long")
    got = sorted((r.i, r.v, r.c) for r in pareto_frontier_2d(df, "v", "c").collect())

    def dominated(a, b):  # b dominates a
        return b[0] >= a[0] and b[1] <= a[1] and (b[0] > a[0] or b[1] < a[1])

    want = sorted(
        (i, v, c)
        for i, (v, c) in enumerate(pts)
        if not any(dominated((v, c), q) for q in pts)
    )
    assert got == want


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(ids=st.lists(st.integers(0, 10**9), min_size=1, max_size=60, unique=True))
def test_rendezvous_grow_moves_only_to_new_shard(spark, ids):
    """HRW minimal disruption: growing 8 -> 9 shards, every document
    whose assignment changes must land on the NEW shard — no old-shard
    to old-shard churn, for arbitrary id sets."""
    from pyspark.sql import functions as F

    from sensor_data_pipeline_spark.plans.scale_ops import _hrw_scores

    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")

    def shard_of(n):
        arr = _hrw_scores(F.col("doc_id"), n)
        return F.array_position(arr, F.array_max(arr)) - 1

    rows = df.select(shard_of(8).alias("s8"), shard_of(9).alias("s9")).collect()
    assert all(r.s9 == 8 for r in rows if r.s8 != r.s9)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    left_ts=st.lists(_ts, min_size=1, max_size=12),
    right=st.lists(
        st.tuples(_ts, st.integers(-100, 100)), min_size=0, max_size=12, unique_by=lambda t: t[0]
    ),
)
def test_asof_nearest_matches_reference(spark, left_ts, right):
    from pyspark.sql import functions as F

    from sensor_data_pipeline_spark.operators.joins import asof_join_nearest

    left = spark.createDataFrame([("k", t) for t in left_ts], "k string, lts long").withColumn(
        "lts", F.timestamp_seconds("lts")
    )
    rdf = spark.createDataFrame(
        [("k", t, float(v)) for t, v in right], "k string, rts long, v double"
    ).withColumn("rts", F.timestamp_seconds("rts"))
    got = {
        (r.k, r.lts): r.v
        for r in asof_join_nearest(left, rdf, on="k", left_ts="lts", right_ts="rts").collect()
    }
    assert len(got) == len(set(left_ts))  # one dict entry per distinct left ts
    # reference: minimize (|rts - lts|, rts) — ties to the earlier match
    import datetime

    for t in left_ts:
        if right:
            rt, rv = min(right, key=lambda rv_: (abs(rv_[0] - t), rv_[0]))
            want = float(rv)
        else:
            want = None
        key = ("k", datetime.datetime.fromtimestamp(t, datetime.timezone.utc).replace(tzinfo=None))
        assert got[key] == want, (t, got[key], want)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    probes=st.lists(st.tuples(st.integers(0, 200), st.integers(0, 200)), min_size=1, max_size=25),
    points=st.lists(st.tuples(st.integers(0, 200), st.integers(0, 200)), min_size=0, max_size=25),
    radius=st.integers(5, 60),
)
def test_grid_nn_join_matches_bruteforce(spark, probes, points, radius):
    from pyspark.sql import functions as F

    from sensor_data_pipeline_spark.operators.spatial import grid_nn_join

    pr = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(probes)], "pid long, x long, y long"
    )
    pt = spark.createDataFrame(
        [(j, x, y) for j, (x, y) in enumerate(points)], "qid long, x long, y long"
    )
    out = {
        r["pid"]: (r["nn_qid"], r["nn_dist2"])
        for r in grid_nn_join(
            pr, pt, "pid", "qid",
            px=F.col("x"), py=F.col("y"), qx=F.col("x"), qy=F.col("y"),
            radius=radius,
        ).collect()
    }
    for i, (x, y) in enumerate(probes):
        cands = [
            ((x - px) ** 2 + (y - py) ** 2, j)
            for j, (px, py) in enumerate(points)
            if (x - px) ** 2 + (y - py) ** 2 <= radius * radius
        ]
        expect = (None, None) if not cands else (min(cands)[1], min(cands)[0])
        assert out[i] == expect, (i, out[i], expect)


@settings(deadline=None, max_examples=60)
@given(
    sets=st.lists(
        st.frozensets(st.integers(min_value=0, max_value=40), min_size=1, max_size=12),
        min_size=2,
        max_size=10,
    )
)
def test_prefix_filter_is_complete(sets):
    """q326's core guarantee, engine-independent: under ANY common total
    order of elements, two sets with Jaccard >= t share at least one
    element within each other's (n - ceil(t*n) + 1)-element prefix.
    Verified directly against brute-force Jaccard on random set
    families (t = 3/5, the q326 threshold)."""
    import math

    num, den = 3, 5
    # global order: by (frequency, value) — the same df-rarest-first
    # order q326 uses; any total order preserves the property
    from collections import Counter

    freq = Counter(x for s in sets for x in s)
    order = {v: i for i, v in enumerate(sorted(freq, key=lambda v: (freq[v], v)))}
    prefixes = []
    for s in sets:
        n = len(s)
        plen = n - math.ceil(num * n / den) + 1
        prefixes.append(set(sorted(s, key=lambda v: order[v])[:plen]))
    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            inter = len(sets[i] & sets[j])
            union = len(sets[i] | sets[j])
            if den * inter >= num * union and union > 0:
                assert prefixes[i] & prefixes[j], (
                    f"prefix filter dropped a true pair: {sets[i]} {sets[j]}"
                )


@settings(deadline=None, max_examples=60)
@given(
    recs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),   # nation
            st.integers(min_value=-1, max_value=4),  # band
            st.integers(min_value=0, max_value=9),   # name mod (small domain)
            st.integers(min_value=0, max_value=9),   # key tail
        ),
        min_size=2,
        max_size=14,
    )
)
def test_fellegi_sunter_blocking_complete_for_matches(recs):
    """q327's blocking completeness, engine-independent: any pair whose
    F-S score reaches the match threshold (40) MUST agree on band or
    name-mod (max disagreeing score = 21 - 2 - 1 = 18), so the
    multi-pass union (nation+band) | (nation+mod & band-disagree)
    captures every match-class pair exactly once."""
    W = {"key_tail": (21, -3), "acct_band": (18, -2), "name_mod": (25, -1)}
    half = len(recs) // 2
    cust, supp = recs[:half], recs[half:]
    for c in cust:
        for s in supp:
            if c[0] != s[0]:
                continue  # different nation: outside every pass AND unscored
            score = (
                (W["key_tail"][0] if c[3] == s[3] else W["key_tail"][1])
                + (W["acct_band"][0] if c[1] == s[1] else W["acct_band"][1])
                + (W["name_mod"][0] if c[2] == s[2] else W["name_mod"][1])
            )
            in_pass1 = c[1] == s[1]
            in_pass2 = c[2] == s[2] and c[1] != s[1]
            assert not (in_pass1 and in_pass2)  # disjoint by construction
            if score >= 40:
                assert in_pass1 or in_pass2, (c, s, score)


def test_fragile_cells_negative_and_boundary():
    """fragile_cells must catch NEGATIVE >2^53-magnitude exact integers
    (q282's area can be negative for negative cents) and accept the
    exact float64 boundaries."""
    import decimal

    from tools.compare_oracle import fragile_cells

    assert fragile_cells([(-(2**53 + 1),)], ["x"]) == [("x", -(2**53 + 1))]
    assert fragile_cells([(decimal.Decimal(-(2**53) - 1),)], ["x"])
    assert not fragile_cells([(-(2**53), 2**53, 0, -1)], list("abcd"))
