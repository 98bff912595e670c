"""Property-based tests (hypothesis, pure Python — no Spark) for the
mathematical identities the relational rewrites in plans/behavior.py
and plans/scale_ops.py rest on. The differential oracle proves each
query on the fixtures; these prove the IDENTITIES on arbitrary inputs,
so correctness does not depend on what the fixture happens to contain.

- q276: CUSUM clamp recursion == reflection via running-min of prefix
  sums (the window-expressible form).
- q275: the keyed-lag interval set-difference emits each (user,
  window) exactly once and covers exactly the union of trailing
  windows.
- q272: FIFO queue matching of two ordered flows == interval overlap
  of their cumulative sums, and conservation matched == min(in, out).
- q280: truncated integer credit shares conserve the purchase amount
  to within one unit per click.
- q277: KMV sketches merge losslessly — the k smallest of the union
  of two k-sketches equal the k smallest of the raw union.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st


# --- q276: CUSUM reflection identity -------------------------------------


@settings(max_examples=300, deadline=None)
@given(devs=st.lists(st.integers(-1000, 1000), min_size=1, max_size=60))
def test_cusum_reflection_identity(devs):
    # recursion: S_t = max(0, S_{t-1} + d_t)
    s, rec = 0, []
    for d in devs:
        s = max(0, s + d)
        rec.append(s)
    # reflection: S_t = P_t - min(0, min_{j<=t} P_j)
    p, run_min, refl = 0, 0, []
    for d in devs:
        p += d
        run_min = min(run_min, p)
        refl.append(p - min(0, run_min))
    assert rec == refl


# --- q275: interval set-difference expansion ------------------------------


@settings(max_examples=300, deadline=None)
@given(days=st.sets(st.integers(0, 60), min_size=1, max_size=25), span=st.integers(1, 10))
def test_sliding_window_expansion_exact_cover(days, span):
    ordered = sorted(days)
    emitted = []
    prev = None
    for d in ordered:
        start = d if prev is None else max(d, prev + span)
        emitted.extend(range(start, d + span))
        prev = d
    # exactly once per covered window-end, and exactly the union
    assert len(emitted) == len(set(emitted))
    want = set()
    for d in ordered:
        want.update(range(d, d + span))
    assert set(emitted) == want


# --- q272: FIFO matching == cumulative-interval overlap -------------------


def _fifo_replay(ins: list[int], outs: list[int]) -> int:
    """Direct queue simulation: consume credits first-in-first-out."""
    matched, lots, i = 0, [int(x) for x in ins], 0
    for need in outs:
        need = int(need)
        while need > 0 and i < len(lots):
            take = min(need, lots[i])
            matched += take
            lots[i] -= take
            need -= take
            if lots[i] == 0:
                i += 1
    return matched


@settings(max_examples=300, deadline=None)
@given(
    ins=st.lists(st.integers(1, 500), min_size=0, max_size=20),
    outs=st.lists(st.integers(1, 500), min_size=0, max_size=20),
)
def test_fifo_matching_equals_interval_overlap(ins, outs):
    cum_in = []
    c = 0
    for x in ins:
        c += x
        cum_in.append((c - x, c))
    cum_out = []
    c = 0
    for x in outs:
        c += x
        cum_out.append((c - x, c))
    overlap = sum(
        max(0, min(ih, oh) - max(il, ol)) for il, ih in cum_in for ol, oh in cum_out
    )
    assert overlap == _fifo_replay(ins, outs)
    assert overlap == min(sum(ins), sum(outs))


# --- q280: truncated share conservation -----------------------------------


@settings(max_examples=300, deadline=None)
@given(
    cents=st.integers(0, 100_000),
    weights=st.lists(st.sampled_from([64, 32, 16, 8, 4, 2]), min_size=1, max_size=15),
)
def test_decay_credit_conserves_within_truncation(cents, weights):
    tot = sum(weights)
    shares = [(cents * w * 1000) // tot for w in weights]
    total = sum(shares)
    assert total <= cents * 1000
    assert total >= cents * 1000 - (len(weights) - 1)


# --- q277: KMV merge losslessness ----------------------------------------


@settings(max_examples=300, deadline=None)
@given(
    a=st.sets(st.integers(0, 2**31 - 1), max_size=200),
    b=st.sets(st.integers(0, 2**31 - 1), max_size=200),
    k=st.integers(1, 64),
)
def test_kmv_union_of_sketches_is_sketch_of_union(a, b, k):
    sk_a = sorted(a)[:k]
    sk_b = sorted(b)[:k]
    merged = sorted(set(sk_a) | set(sk_b))[:k]
    truth = sorted(a | b)[:k]
    assert merged == truth


# --- q283: clamp-fold composition is a 3-parameter monoid -----------------


def _clamp(x, lo, hi):
    return max(lo, min(hi, x))


@settings(max_examples=300, deadline=None)
@given(
    deltas=st.lists(st.integers(-50_000, 50_000), min_size=1, max_size=40),
    cap=st.integers(1, 30_000),
    s0=st.integers(0, 30_000),
)
def test_bounded_inventory_clamp_composes(deltas, cap, s0):
    s0 = min(s0, cap)
    # sequential fold
    s = s0
    for d in deltas:
        s = _clamp(s + d, 0, cap)
    # composed transform: each step is f(s) = clamp(s + d, 0, cap),
    # composition stays in the (shift, lo, hi) family — the property
    # that makes the fold a parallel scan at scale
    D, lo, hi = 0, -(10**18), 10**18
    for d in deltas:
        D = D + d
        lo = _clamp(lo + d, 0, cap)
        hi = _clamp(hi + d, 0, cap)
    assert _clamp(s0 + D, lo, hi) == s


# --- q285: midrank rank-sum AUC == pairwise AUC ---------------------------


@settings(max_examples=300, deadline=None)
@given(
    pos=st.lists(st.integers(0, 30), min_size=1, max_size=40),
    neg=st.lists(st.integers(0, 30), min_size=1, max_size=40),
)
def test_exact_auc_ranksum_equals_pairwise(pos, neg):
    # pairwise: wins + half-ties over all (pos, neg) score pairs
    wins2 = sum(2 if p > n else (1 if p == n else 0) for p in pos for n in neg)
    # rank-sum with 2x midranks over the bounded score domain
    from collections import Counter

    cn = Counter(pos + neg)
    cp = Counter(pos)
    cum_before, r2 = 0, 0
    for c in sorted(cn):
        r2 += cp.get(c, 0) * (2 * cum_before + cn[c] + 1)
        cum_before += cn[c]
    npos = len(pos)
    u2 = r2 - npos * (npos + 1)
    assert u2 == wins2


# --- q300: largest-remainder apportionment invariants ---------------------


@settings(max_examples=300, deadline=None)
@given(
    weights=st.lists(st.integers(1, 10**9), min_size=1, max_size=30),
    budget=st.integers(1, 5000),
)
def test_largest_remainder_conserves_budget(weights, budget):
    total = sum(weights)
    base = [w * budget // total for w in weights]
    rem = [w * budget % total for w in weights]
    extra = budget - sum(base)
    # rank remainders desc, tiebreak on index (the query's nationkey)
    order = sorted(range(len(weights)), key=lambda i: (-rem[i], i))
    seats = list(base)
    for i in order[:extra]:
        seats[i] += 1
    # budget conservation — the property float quotas can't guarantee
    assert sum(seats) == budget
    # quota property: every group gets floor or ceil of its ideal share
    for w, s in zip(weights, seats):
        ideal = w * budget / total
        assert s in (int(ideal), int(ideal) + 1)


# --- q290: Kaplan-Meier equals empirical survival without censoring -------


@settings(max_examples=300, deadline=None)
@given(durs=st.lists(st.integers(0, 40), min_size=1, max_size=60))
def test_kaplan_meier_matches_empirical_when_uncensored(durs):
    n = len(durs)
    times = sorted(set(durs))
    at_risk, surv, out = n, 1.0, {}
    for t in times:
        d = durs.count(t)
        surv *= 1.0 - d / at_risk
        out[t] = surv
        at_risk -= d
    for t in times:
        # with no censoring S(t) is exactly the fraction still alive
        assert abs(out[t] - sum(1 for x in durs if x > t) / n) < 1e-9


# --- q292: cumulative-weight median equals sort-and-walk ------------------


@settings(max_examples=300, deadline=None)
@given(rows=st.lists(st.tuples(st.integers(0, 10), st.integers(1, 50)), min_size=1, max_size=40))
def test_weighted_median_cumweight_equals_walk(rows):
    # query form: group by value, smallest value with 2*cumw >= total
    from collections import defaultdict

    agg = defaultdict(int)
    for v, w in rows:
        agg[v] += w
    total = sum(agg.values())
    cum, by_cum = 0, None
    for v in sorted(agg):
        cum += agg[v]
        if by_cum is None and 2 * cum >= total:
            by_cum = v
    # reference: expand to units and walk to the ceil(total/2)-th unit
    units = sorted(v for v, w in rows for _ in range(w))
    by_walk = units[(total - 1) // 2]
    assert by_cum == by_walk


# --- q302: unrolled relaxation equals bounded-hop shortest path -----------


@settings(max_examples=150, deadline=None)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 7), st.integers(0, 7), st.integers(1, 20)),
        min_size=0,
        max_size=25,
    ),
    rounds=st.integers(1, 6),
)
def test_bellman_rounds_equal_bounded_hop_paths(edges, rounds):
    # round-k relaxation table == min-cost path using <= k edges (DP)
    INF = float("inf")
    dist = {0: 0}
    for _ in range(rounds):
        nxt = dict(dist)
        for s, t, w in edges:
            if s in dist and dist[s] + w < nxt.get(t, INF):
                nxt[t] = dist[s] + w
        dist = nxt
    dp = {(0, 0): 0}
    for k in range(1, rounds + 1):
        for node in range(8):
            best = dp.get((k - 1, node), INF)
            for s, t, w in edges:
                if t == node and (k - 1, s) in dp:
                    best = min(best, dp[(k - 1, s)] + w)
            if best < INF:
                dp[(k, node)] = best
    bounded = {}
    for (k, node), d in dp.items():
        bounded[node] = min(bounded.get(node, INF), d)
    assert dist == bounded


# --- q309: winsorized mean on the aggregated domain == rowwise clamp -----


@settings(max_examples=300, deadline=None)
@given(vals=st.lists(st.integers(0, 100), min_size=1, max_size=80))
def test_winsorized_domain_form_equals_rowwise(vals):
    from collections import Counter

    n = len(vals)
    agg = Counter(vals)
    # counting-quantile fences (query form: smallest v with 20*cw >= q*n)
    cum, p05, p95 = 0, None, None
    for v in sorted(agg):
        cum += agg[v]
        if p05 is None and 20 * cum >= n:
            p05 = v
        if p95 is None and 20 * cum >= 19 * n:
            p95 = v
    dom_sum = sum(c * min(max(v, p05), p95) for v, c in agg.items())
    row_sum = sum(min(max(v, p05), p95) for v in vals)
    assert dom_sum == row_sum
    # clamping cannot move the mean outside the fences
    assert p05 * n <= dom_sum <= p95 * n


# --- q310: zone-map pruning is sound (never prunes a matching row) --------


@settings(max_examples=300, deadline=None)
@given(
    rows=st.lists(st.tuples(st.integers(0, 20), st.integers(0, 1000)), min_size=1, max_size=80),
    lo=st.integers(0, 1000),
    width=st.integers(0, 500),
)
def test_zonemap_pruning_sound(rows, lo, width):
    hi = lo + width
    zones = {}
    for chunk, v in rows:
        mn, mx = zones.get(chunk, (v, v))
        zones[chunk] = (min(mn, v), max(mx, v))
    pruned = {c for c, (mn, mx) in zones.items() if mx < lo or mn >= hi}
    # soundness: every row matching [lo, hi) lives in an unpruned chunk
    for chunk, v in rows:
        if lo <= v < hi:
            assert chunk not in pruned


# --- q311: closed-form OLS equals definitional least squares --------------


@settings(max_examples=200, deadline=None)
@given(
    pts=st.lists(
        st.tuples(st.integers(1, 50), st.integers(-1000, 100000)),
        min_size=3,
        max_size=60,
    )
)
def test_ols_sufficient_sums_match_normal_equations(pts):
    # require non-degenerate x variance
    xs = [p[0] for p in pts]
    if len(set(xs)) < 2:
        return
    n = len(pts)
    sx = sum(p[0] for p in pts)
    sy = sum(p[1] for p in pts)
    sxx = sum(p[0] * p[0] for p in pts)
    sxy = sum(p[0] * p[1] for p in pts)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    # definitional check: residuals are orthogonal to [1, x]
    r = [y - (slope * x + intercept) for x, y in pts]
    assert abs(sum(r)) < 1e-6 * max(1.0, abs(sy))
    assert abs(sum(ri * x for ri, (x, _) in zip(r, pts))) < 1e-5 * max(
        1.0, float(abs(sxy))
    )


# --- q312: chi-square terms sum to the classic statistic ------------------


@settings(max_examples=200, deadline=None)
@given(
    cells=st.lists(
        st.tuples(st.integers(0, 4), st.integers(0, 2), st.integers(1, 500)),
        min_size=2,
        max_size=15,
    )
)
def test_chi2_cell_terms_match_definition(cells):
    # collapse duplicate (r,c) cells
    agg = {}
    for r, c, n in cells:
        agg[(r, c)] = agg.get((r, c), 0) + n
    rows = {}
    cols = {}
    total = 0
    for (r, c), n in agg.items():
        rows[r] = rows.get(r, 0) + n
        cols[c] = cols.get(c, 0) + n
        total += n
    terms = {}
    for (r, c), n in agg.items():
        e = rows[r] * cols[c] / total
        terms[(r, c)] = (n - e) ** 2 / e
    # invariance: scaling every cell by k scales each term by k
    k = 7
    rows2 = {r: v * k for r, v in rows.items()}
    cols2 = {c: v * k for c, v in cols.items()}
    for (r, c), n in agg.items():
        e2 = rows2[r] * cols2[c] / (total * k)
        t2 = (n * k - e2) ** 2 / e2
        assert abs(t2 - k * terms[(r, c)]) < 1e-6 * max(1.0, t2)


# --- q315: BH step-up is monotone and controls the right boundary ---------


@settings(max_examples=300, deadline=None)
@given(
    ps=st.lists(st.floats(0.0001, 0.9999), min_size=1, max_size=40),
    alpha=st.floats(0.01, 0.5),
)
def test_bh_stepup_rejection_set_is_prefix(ps, alpha):
    m = len(ps)
    ordered = sorted(ps)
    k = 0
    for i, p in enumerate(ordered, start=1):
        if p <= alpha * i / m:
            k = i
    rejected = [i <= k for i in range(1, m + 1)]
    # the rejection set is a prefix of the sorted order
    assert rejected == sorted(rejected, reverse=True)
    # every rejected p is <= the threshold AT RANK K (step-up property)
    if k:
        assert all(ordered[i] <= alpha * k / m for i in range(k))


# --- q316: Poisson ladder is a valid inverse CDF --------------------------


def test_poisson_ladder_constants_are_cdf():
    import math

    from sensor_data_pipeline_spark.plans.inference import _POIS_CDF

    acc = 0.0
    for kk in range(5):
        acc += math.exp(-1.0) / math.factorial(kk)
        assert abs(_POIS_CDF[kk] - acc) < 1e-12
    # monotone, in (0,1)
    assert all(0 < c < 1 for c in _POIS_CDF)
    assert list(_POIS_CDF) == sorted(_POIS_CDF)


# --- q319: PSI terms are non-negative and vanish iff p == q ---------------


@settings(max_examples=300, deadline=None)
@given(
    ref=st.lists(st.integers(0, 500), min_size=2, max_size=10),
    cur=st.lists(st.integers(0, 500), min_size=2, max_size=10),
)
def test_psi_terms_nonnegative_and_zero_iff_equal(ref, cur):
    import math

    bins = min(len(ref), len(cur))
    ref, cur = ref[:bins], cur[:bins]
    tr, tc = sum(ref), sum(cur)
    for nr, nc in zip(ref, cur):
        p = (nr + 1) / (tr + bins)
        q = (nc + 1) / (tc + bins)
        term = (p - q) * math.log(p / q)
        assert term >= 0.0
        if abs(p - q) < 1e-15:
            assert abs(term) < 1e-12


# --- q317: pooled bucket mean is the count-weighted segment-mean mix ------


@settings(max_examples=200, deadline=None)
@given(
    segs=st.lists(
        st.lists(st.tuples(st.integers(1, 50), st.integers(-100, 100)), min_size=1, max_size=8),
        min_size=1,
        max_size=5,
    )
)
def test_pooled_mean_is_weighted_mix(segs):
    # per "bucket": (n_i, s_i) per segment; pooled = sum(s)/sum(n)
    tot_n = sum(n for seg in segs for n, _ in seg)
    tot_s = sum(s * n for seg in segs for n, s in seg)  # s as per-item value
    pooled = tot_s / tot_n
    mix = sum(
        (sum(n for n, _ in seg) / tot_n)
        * (sum(s * n for n, s in seg) / sum(n for n, _ in seg))
        for seg in segs
    )
    assert abs(pooled - mix) < 1e-9 * max(1.0, abs(pooled))


# --- q346: water-filling closed-form bracket ------------------------------


@settings(max_examples=300, deadline=None)
@given(
    sizes=st.lists(st.integers(0, 500), min_size=1, max_size=30),
    budget_num=st.integers(0, 100),
)
def test_waterfill_bracket_identity(sizes, budget_num):
    """The closed-form level bracket (exactly one sorted-census row j
    satisfies t_cand < n_j and n_{j-1} <= t_cand) reproduces the naive
    iterative water-filling, and the remainder distribution makes
    sum(alloc) == budget exactly whenever budget <= total."""
    total = sum(sizes)
    budget = total * budget_num // 100
    # naive reference: raise the level until the budget is exhausted
    # (only meaningful below the corpus size — at or above it the level
    # is unbounded and everyone is fully allocated)
    ref_level = None
    if budget < total:
        t = 0
        while sum(min(n, t + 1) for n in sizes) <= budget:
            t += 1
        ref_level = t
    # closed form over the sorted census
    ordered = sorted(range(len(sizes)), key=lambda i: (sizes[i], i))
    S = len(sizes)
    p = 0
    found = None
    for rank, i in enumerate(ordered, start=1):
        n = sizes[i]
        excl = p
        p += n
        t_cand = (budget - excl) // (S - rank + 1)
        prev_n = sizes[ordered[rank - 2]] if rank > 1 else None
        if t_cand < n and (rank == 1 or prev_n <= t_cand):
            found = (rank, t_cand, budget - excl - (S - rank + 1) * t_cand)
            break
    if budget >= total:
        assert found is None  # everyone fully allocated
        return
    assert found is not None, (sizes, budget)
    rank, lvl, leftover = found
    assert lvl == ref_level
    # allocation: min(n, lvl) with +1 to the first `leftover` capped
    capped = [i for i in sorted(range(S)) if sizes[i] > lvl]
    assert 0 <= leftover < len(capped) + 1
    alloc = {i: min(sizes[i], lvl) for i in range(S)}
    for i in capped[:leftover]:
        alloc[i] += 1
        assert alloc[i] <= sizes[i]
    assert sum(alloc.values()) == budget


# --- q351: Cohen's kappa single-division reduction -------------------------


def _trunc_div(a: int, b: int) -> int:
    """Truncating integer division — the measured Spark DIV / DuckDB //
    semantics (toward zero, not floor)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


@settings(max_examples=300, deadline=None)
@given(
    a=st.integers(0, 10_000),
    b=st.integers(0, 10_000),
    c=st.integers(0, 10_000),
    d=st.integers(1, 10_000),
)
def test_kappa_integer_reduction_matches_float(a, b, c, d):
    """q351: (n*(a+d) - pe_num) * 1e6 DIV (n*n - pe_num) equals the
    textbook kappa = (po - pe) / (1 - pe) within 1 ppm truncation,
    where pe_num = (a+b)(a+c) + (c+d)(b+d)."""
    n = a + b + c + d
    pe_num = (a + b) * (a + c) + (c + d) * (b + d)
    den = n * n - pe_num
    if den == 0:
        return  # NULL on both engines (constant raters)
    kappa_ppm = _trunc_div((n * (a + d) - pe_num) * 1_000_000, den)
    po = (a + d) / n
    pe = pe_num / (n * n)
    ref = (po - pe) / (1 - pe)
    assert abs(kappa_ppm / 1e6 - ref) < 2e-6, (a, b, c, d)


# --- q355: 2x2 chi-square single-division reduction ------------------------


@settings(max_examples=300, deadline=None)
@given(
    strata=st.lists(
        st.tuples(st.integers(0, 2000), st.integers(0, 2000)), min_size=1, max_size=12
    ),
)
def test_split_chisq_reduction_matches_float(strata):
    """q355: d^2 / (T * N1 * N2) with d = o1*N2 - o2*N1 equals the
    textbook 2-cell chi-square sum((o - e)^2 / e) with e from the
    global split ratio."""
    n1 = sum(o1 for o1, _ in strata)
    n2 = sum(o2 for _, o2 in strata)
    n = n1 + n2
    if n1 == 0 or n2 == 0:
        return
    for o1, o2 in strata:
        t = o1 + o2
        if t == 0:
            continue
        d = o1 * n2 - o2 * n1
        chisq_ppm = _trunc_div(d * d * 1_000_000, t * n1 * n2)
        e1, e2 = t * n1 / n, t * n2 / n
        ref = (o1 - e1) ** 2 / e1 + (o2 - e2) ** 2 / e2
        assert abs(chisq_ppm / 1e6 - ref) < 2e-6 * max(1.0, ref), (o1, o2, n1, n2)


# --- q352: epoch repeat-budget invariants -----------------------------------

_EPOCH_W = (1000, 700, 490, 343, 240, 168, 118, 82)
_EPOCH_CUM = (0, 1000, 1700, 2190, 2533, 2773, 2941, 3059, 3141)


def _effective_tokens(u: int, target: int) -> int:
    e = min(target // u, 8)
    rem = 0 if e >= 8 else target - e * u
    w_next = 0 if e >= 8 else _EPOCH_W[e]
    return (_EPOCH_CUM[e] * u + w_next * rem) // 1000


@settings(max_examples=300, deadline=None)
@given(u=st.integers(1, 100_000), target=st.integers(0, 1_000_000))
def test_epoch_budget_invariants(u, target):
    """q352: effective tokens (a) never exceed the target (epoch
    weights <= 1000 per mille), (b) equal the target exactly while the
    budget stays within one epoch of unique supply (first-epoch weight
    is 1000), (c) are monotone nondecreasing in the target, and
    (d) cap at cum_w[8]*u once the budget saturates 8 epochs."""
    eff = _effective_tokens(u, target)
    assert eff <= target
    if target <= u:
        assert eff == target
    assert eff <= _EPOCH_CUM[8] * u // 1000 + 1
    if target >= 8 * u:
        assert eff == _EPOCH_CUM[8] * u // 1000
    assert _effective_tokens(u, target + 1) >= eff


# --- q356: exact rational LSH S-curve ---------------------------------------


def test_lsh_s_curve_rational_matches_float():
    """q356: (2^64 - (65536 - k^4)^4) * 1e6 // 2^64 equals
    1 - (1 - (k/16)^4)^4 in ppm (truncated) for every k."""
    for k in range(17):
        m = 65536 - k**4
        ppm = (2**64 - m**4) * 1_000_000 // 2**64
        ref = 1.0 - (1.0 - (k / 16.0) ** 4) ** 4
        assert abs(ppm / 1e6 - ref) < 2e-6, k
    # the curve is monotone and hits both endpoints exactly
    assert (2**64 - 65536**4) == 0  # k=0 -> 0 ppm
    assert (2**64 - (65536 - 16**4) ** 4) * 1_000_000 // 2**64 == 1_000_000  # k=16


# --- q358: rank-sum AUC identity --------------------------------------------


@settings(max_examples=200, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 8), st.booleans()), min_size=2, max_size=60
    ),
)
def test_auc_ranksum_matches_pair_counting(rows):
    """q358: the tie-group 2R identity equals brute-force pair
    counting AUC = (#(pos > neg) + 0.5 * #(pos == neg)) / (n_pos*n_neg)."""
    scores = [s for s, _ in rows]
    labels = [p for _, p in rows]
    n_pos = sum(labels)
    n_neg = len(rows) - n_pos
    if n_pos == 0 or n_neg == 0:
        return
    # brute force over pairs
    wins = ties = 0
    for sp, lp in rows:
        if not lp:
            continue
        for sn, ln in rows:
            if ln:
                continue
            if sp > sn:
                wins += 1
            elif sp == sn:
                ties += 1
    ref = (wins + 0.5 * ties) / (n_pos * n_neg)
    # tie-group identity: per distinct score, 2R contribution
    from collections import Counter

    cnt = Counter(scores)
    pos_cnt = Counter(s for s, p in rows if p)
    two_r = 0
    cum = 0
    for s in sorted(cnt):
        two_r += pos_cnt.get(s, 0) * (2 * cum + cnt[s] + 1)
        cum += cnt[s]
    auc_ppm = (two_r - n_pos * (n_pos + 1)) * 1_000_000 // (2 * n_pos * n_neg)
    assert abs(auc_ppm / 1e6 - ref) < 2e-6, rows


# --- q363: Cochran sample-size ceiling division ------------------------------


@settings(max_examples=300, deadline=None)
@given(n=st.integers(1, 10**9), f_pct=st.integers(0, 100))
def test_cochran_ceiling_matches_float(n, f_pct):
    """q363: ceil(9604 f (n-f) / n^2) equals the float formula
    ceil(1.96^2 * p(1-p) / 0.02^2) with p = f/n (up to the float's own
    representation error at the ceiling boundary, which the integer
    form resolves exactly — so allow the integer answer to differ only
    where the float sits within 1e-9 of an integer)."""
    import math

    f = n * f_pct // 100
    n_req = (9604 * f * (n - f) + n * n - 1) // (n * n)
    p = f / n
    ref = 9604 * p * (1 - p)
    assert n_req in (math.ceil(ref), math.ceil(ref - 1e-9)), (n, f)
    assert n_req <= 2401  # 9604 * max p(1-p) = 9604/4


# --- q367: HyperLogLog register identities ---------------------------------


def _hll_reg(items, m=64, w=26, seed=7):
    """Replay q367's register construction: md5-derived 32-bit hash,
    j = h mod m, rho = leading zeros of the remaining w bits + 1."""
    import hashlib

    regs = {}
    for s in items:
        h = int(hashlib.md5(f"{seed}:{s}".encode()).hexdigest()[:8], 16)
        j, r = h % m, h // m
        rho = (w + 1) if r == 0 else (w + 1 - r.bit_length())
        regs[j] = max(regs.get(j, 0), rho)
    return regs


@settings(max_examples=200, deadline=None)
@given(
    a=st.sets(st.text(st.characters(min_codepoint=97, max_codepoint=122), min_size=1, max_size=6), max_size=60),
    b=st.sets(st.text(st.characters(min_codepoint=97, max_codepoint=122), min_size=1, max_size=6), max_size=60),
)
def test_hll_registers_merge_losslessly(a, b):
    """q367's '(all)' row is max-merged FROM per-shard registers; the
    sketch is only honest if that equals building registers over the
    union directly — max is associative/commutative/idempotent, so
    duplicate elements across shards cannot distort it."""
    ra, rb, ru = _hll_reg(a), _hll_reg(b), _hll_reg(a | b)
    merged = {j: max(ra.get(j, 0), rb.get(j, 0)) for j in set(ra) | set(rb)}
    assert merged == ru


@settings(max_examples=200, deadline=None)
@given(items=st.sets(st.text(st.characters(min_codepoint=97, max_codepoint=122), min_size=1, max_size=6), min_size=1, max_size=80))
def test_hll_integer_scaled_sum_is_exact(items):
    """The estimate's denominator sum(2^-M_j) rides the INTEGER scale
    sum(2^(33-M_j)): every term is a power of two in [2^6, 2^33], so
    the scaled integer sum over 64 registers fits well under 2^40 and
    equals 2^33 times the float sum computed in ANY order — the
    order-independence that makes q367's single float division
    bit-identical across engines."""
    regs = _hll_reg(items)
    m = 64
    s_scaled = sum(1 << (33 - mj) for mj in regs.values()) + (m - len(regs)) * (1 << 33)
    f_fwd = sum(2.0 ** -mj for mj in sorted(regs.values())) + (m - len(regs))
    f_rev = sum(2.0 ** -mj for mj in sorted(regs.values(), reverse=True)) + (m - len(regs))
    assert f_fwd == f_rev == s_scaled / 2.0**33
    assert s_scaled < 1 << 40


# --- q372: count-min sketch identities --------------------------------------


@settings(max_examples=200, deadline=None)
@given(tokens=st.lists(st.sampled_from("abcdefgh"), min_size=1, max_size=200))
def test_countmin_estimate_is_one_sided(tokens):
    """CMS estimates never UNDER-count (each counter holds the true
    count plus non-negative collision mass), so q372's over_ppm is
    >= 0 — the property the audit column rests on. Also: counters
    merge by plain addition (map-side combine soundness)."""
    import hashlib
    from collections import Counter

    d_rows, width, seed = 4, 16, 41

    def cols(tok):
        digest = hashlib.md5(f"{seed}:{tok}".encode()).hexdigest()
        return [int(digest[i * 8 : i * 8 + 8], 16) % width for i in range(d_rows)]

    counters = [[0] * width for _ in range(d_rows)]
    for t in tokens:
        for i, c in enumerate(cols(t)):
            counters[i][c] += 1
    true = Counter(tokens)
    for t, n in true.items():
        est = min(counters[i][c] for i, c in enumerate(cols(t)))
        assert est >= n
    # shard-merge: counters(A) + counters(B) == counters(A ++ B)
    half = len(tokens) // 2
    ca = [[0] * width for _ in range(d_rows)]
    cb = [[0] * width for _ in range(d_rows)]
    for t in tokens[:half]:
        for i, c in enumerate(cols(t)):
            ca[i][c] += 1
    for t in tokens[half:]:
        for i, c in enumerate(cols(t)):
            cb[i][c] += 1
    assert [[x + y for x, y in zip(ra, rb)] for ra, rb in zip(ca, cb)] == counters


# --- q368: MinHash signature merge -------------------------------------------


@settings(max_examples=200, deadline=None)
@given(
    a=st.sets(st.text(st.characters(min_codepoint=97, max_codepoint=122), min_size=1, max_size=5), min_size=1, max_size=40),
    b=st.sets(st.text(st.characters(min_codepoint=97, max_codepoint=122), min_size=1, max_size=5), min_size=1, max_size=40),
)
def test_minhash_signature_merges_by_min(a, b):
    """q368's per-source signature is a MIN aggregate, so shard
    signatures merge by elementwise min into exactly the union's
    signature. The production query feeds the min a pre-distinct'd
    (source, shingle) frame because its EXACT-Jaccard audit side needs
    set semantics anyway — but the min itself is duplicate-immune
    (this test feeds raw multisets), which is what lets a 100 TB
    deployment skip the distinct and stream occurrences straight into
    the signature."""
    import hashlib

    def sig(items):
        out = []
        for seed in (21, 22, 23, 24):
            mins = [None] * 4
            for s in items:
                digest = hashlib.md5(f"{seed}:{s}".encode()).hexdigest()
                for i in range(4):
                    h = int(digest[i * 8 : i * 8 + 8], 16)
                    mins[i] = h if mins[i] is None or h < mins[i] else mins[i]
            out.extend(mins)
        return out

    sa, sb, su = sig(a), sig(b), sig(a | b)
    assert [min(x, y) for x, y in zip(sa, sb)] == su


# --- q371: octave function == integer log2 -----------------------------------


@settings(max_examples=300, deadline=None)
@given(doc_id=st.integers(0, 2**62))
def test_novelty_octave_is_integer_log2(doc_id):
    """q371's octave = length(bin(doc_id + 1)) - 1 must equal
    floor(log2(doc_id + 1)) for the full bigint range — bit_length is
    the exact integer form (float log2 misrounds at exact powers,
    the q339 lesson)."""
    import math

    assert len(bin(doc_id + 1)[2:]) - 1 == (doc_id + 1).bit_length() - 1
    if doc_id + 1 <= 2**53:  # float log2 is only trustworthy below 2^53
        assert (doc_id + 1).bit_length() - 1 == math.floor(math.log2(doc_id + 1))


# --- q374: conformal rank ceiling division -----------------------------------


@settings(max_examples=300, deadline=None)
@given(n=st.integers(1, 10**9))
def test_conformal_rank_ceiling_matches_float(n):
    """q374: k = ceil((n+1)(1-alpha)) at alpha=0.10 as the exact
    integer ((n+1)*90 + 99) DIV 100 — the finite-sample-valid
    split-conformal rank (Lei et al. 2018). Must match math.ceil and
    stay within [1, n+1]."""
    k = ((n + 1) * 90 + 99) // 100
    # exact rational ceiling: k-1 < (n+1)*9/10 <= k (float ceil is NOT
    # the ground truth here — (n+1)*0.9 rounds at large n)
    assert (k - 1) * 10 < (n + 1) * 9 <= k * 10
    assert 1 <= k <= n + 1


# --- q379: temperature-scaled mixture identities -----------------------------


@settings(max_examples=300, deadline=None)
@given(
    toks=st.lists(st.integers(1, 10**13), min_size=2, max_size=8),
)
def test_temperature_sampling_flattens(toks):
    """q379's α grid must actually flatten: for α' < α the max share
    falls and the min share rises (weights x^α are a monotone concave
    reweighting for 0 < α < 1), and each share column sums to ~1.
    Replays the exact float semantics (sqrt chains + prefix-fold
    denominator)."""
    import math

    def shares(alpha_sqrt_depth):
        ws = []
        for n in toks:
            w = float(n)
            for _ in range(alpha_sqrt_depth):
                w = math.sqrt(w)
            ws.append(w)
        cum = 0.0
        for w in ws:  # the ordered prefix fold q379 uses
            cum += w
        return [w / cum for w in ws]

    s100, s50, s25 = shares(0), shares(1), shares(2)
    for s in (s100, s50, s25):
        assert abs(sum(s) - 1.0) < 1e-9
    assert max(s50) <= max(s100) + 1e-12
    assert min(s50) >= min(s100) - 1e-12
    assert max(s25) <= max(s50) + 1e-12
    assert min(s25) >= min(s50) - 1e-12


@settings(max_examples=200, deadline=None)
@given(n=st.integers(1, 4 * 10**15))
def test_sqrt_of_perfect_square_is_exact(n):
    """q379 rides correctly-rounded IEEE sqrt for bit-portability;
    the supporting fact (documented in the module header) is that
    sqrt is exact on perfect squares up to 2^52-ish — so no engine
    can disagree even at representability boundaries."""
    import math

    k = math.isqrt(n)
    assert math.sqrt(float(k * k)) == float(k)


# --- q380: Good-Turing / Chao1 identities ------------------------------------


@settings(max_examples=200, deadline=None)
@given(
    a=st.dictionaries(st.text(st.characters(min_codepoint=97, max_codepoint=104), min_size=1, max_size=3), st.integers(1, 50), max_size=30),
    b=st.dictionaries(st.text(st.characters(min_codepoint=97, max_codepoint=104), min_size=1, max_size=3), st.integers(1, 50), max_size=30),
)
def test_count_merge_by_addition_is_lossless(a, b):
    """q380's '(all)' row re-aggregates per-source counts at the
    shingle key. Counts merge by ADDITION (unlike HLL's max), so the
    merged frequency-of-frequencies must equal the one computed over
    the concatenated corpus — the mergeability that lets the global
    row avoid a corpus re-scan."""
    from collections import Counter

    merged = Counter(a)
    merged.update(b)
    direct = {k: a.get(k, 0) + b.get(k, 0) for k in set(a) | set(b)}
    assert dict(merged) == direct


@settings(max_examples=300, deadline=None)
@given(
    v=st.integers(1, 10**12),
    n1=st.integers(0, 10**12),
    n2=st.integers(1, 10**12),
)
def test_chao1_milli_is_exact_floor(v, n1, n2):
    """q380's chao1_milli = V*1000 + N1²*1000 DIV (2*N2) must equal
    floor(1000 * (V + N1²/(2N2))) computed in exact rationals — the
    integer form never drifts, and the N1² product (up to 1e24)
    exceeds bigint, which is why the operand rides DECIMAL/HUGEINT."""
    from fractions import Fraction

    got = v * 1000 + (n1 * n1 * 1000) // (2 * n2)
    ref = Fraction(1000) * (v + Fraction(n1 * n1, 2 * n2))
    assert got == ref.numerator // ref.denominator


# --- q381: salting-plan invariants -------------------------------------------


@settings(max_examples=300, deadline=None)
@given(
    counts=st.lists(st.integers(1, 10**12), min_size=1, max_size=40),
)
def test_salting_plan_balances(counts):
    """q381's synthesized plan must satisfy its own balance proof:
    salt ∈ [1, P]; a non-hot key keeps salt 1; a hot key's post-salt
    max task load is ≤ max(target, ceil(cnt/P)) — i.e. salting always
    lands within the partition target unless the key alone exceeds
    P·target, where the P-way cap makes ceil(cnt/P) the floor of the
    achievable."""
    P = 32
    total = sum(counts)
    target = max(1, total // P)
    for cnt in counts:
        hot = cnt > target
        salt = min(P, (cnt + target - 1) // target) if hot else 1
        assert 1 <= salt <= P
        post = (cnt + salt - 1) // salt
        assert post <= max(target, (cnt + P - 1) // P)
        if not hot:
            assert post == cnt


# --- q383: coverage-curve invariants -----------------------------------------


@settings(max_examples=200, deadline=None)
@given(
    counts=st.lists(st.integers(1, 10**9), min_size=1, max_size=60),
)
def test_vocab_coverage_monotone_in_eps(counts):
    """q383's vocab_size must be non-increasing as ε grows (covering
    99.9% needs at least as much vocab as 90%), and the integer
    predicate cum*1e6 >= (1e6-eps)*N must agree with the exact
    rational comparison."""
    from fractions import Fraction

    ranked = sorted(counts, reverse=True)
    n = sum(ranked)
    sizes = []
    for eps_ppm in (100000, 10000, 1000):
        cum = 0
        size = None
        for rk, c in enumerate(ranked, 1):
            cum += c
            int_pred = cum * 1000000 >= (1000000 - eps_ppm) * n
            frac_pred = Fraction(cum, n) >= Fraction(1000000 - eps_ppm, 1000000)
            assert int_pred == frac_pred
            if int_pred:
                size = rk
                break
        sizes.append(size)
    assert sizes[0] <= sizes[1] <= sizes[2]


@settings(max_examples=300, deadline=None)
@given(
    counts=st.lists(st.integers(1, 10**6), min_size=1, max_size=60),
    eps_ppm=st.sampled_from([100000, 10000, 1000]),
)
def test_vocab_coverage_block_formula_matches_ranked_scan(counts, eps_ppm):
    """q383 computes the boundary rank from the frequency-of-
    frequencies histogram (sizes-before-block + ceil of the remaining
    mass over the block's count level) instead of ranking the
    vocabulary; the block arithmetic must reproduce the rank a full
    (count DESC) scan finds, for every input — the rewrite that took
    the query's window from the vocab-scale frame to the bounded
    histogram."""
    from collections import Counter

    n = sum(counts)
    x = (1000000 - eps_ppm) * n
    # reference: ranked scan
    ranked = sorted(counts, reverse=True)
    cum, ref = 0, None
    for rk, c in enumerate(ranked, 1):
        cum += c
        if cum * 1000000 >= x:
            ref = rk
            break
    # block formula over the ff histogram
    ff = sorted(Counter(counts).items(), reverse=True)  # (c, n_types) desc
    cum_sizes = cum_mass = 0
    got = None
    for c, n_types in ff:
        prior_sizes, prior_mass = cum_sizes, cum_mass
        cum_sizes += n_types
        cum_mass += n_types * c
        if cum_mass * 1000000 >= x and prior_mass * 1000000 < x:
            k = (x - prior_mass * 1000000 + c * 1000000 - 1) // (c * 1000000)
            got = prior_sizes + k
            break
    assert got == ref


# --- q386: Kish design-effect identities -------------------------------------


@settings(max_examples=300, deadline=None)
@given(
    strata=st.lists(st.integers(1, 10**9), min_size=1, max_size=30),
    n=st.integers(1, 10**6),
)
def test_kish_deff_lower_bound(strata, n):
    """q386's deff = n·Σ(N_h²/a_h)/N² is ≥ 1 for ANY allocation with
    Σa_h = n (Cauchy-Schwarz), with equality at exact proportional
    allocation — the invariant that makes deff a penalty factor. The
    integer-scaled form floors each term at 1e6 scale, so the scaled
    statistic can undershoot 1e6 by at most H (one unit of floor
    slack per stratum)."""
    from fractions import Fraction

    h = len(strata)
    big_n = sum(strata)
    # q386's regime: the budget never exceeds the population (and at
    # least one unit per stratum); outside it the floor-slack bound
    # below would scale with n/N instead of being O(1) ppm
    n = max(h, min(n, big_n))
    # any feasible allocation: min-1 floor + proportional remainder
    rest = n - h
    base = [1 + rest * nh // big_n for nh in strata]
    left = n - sum(base)
    order = sorted(
        range(h), key=lambda i: (-(rest * strata[i] % big_n), i)
    )
    for i in order[:left]:
        base[i] += 1
    assert sum(base) == n
    exact = Fraction(n) * sum(Fraction(nh * nh, a) for nh, a in zip(strata, base)) / (big_n * big_n)
    assert exact >= 1
    varfac_scaled = sum(nh * nh * 1000000 // a for nh, a in zip(strata, base))
    deff_ppm = n * varfac_scaled // (big_n * big_n)
    # per-term floor loses < 1 each: varfac >= 1e6*exact - H, and with
    # n <= N, H <= N the scaled statistic undershoots by at most 2
    assert deff_ppm >= 1000000 - 2


# --- q387: entropy/CE/KL Gibbs inequality (pure Python) --------------------


@settings(max_examples=300, deadline=None)
@given(
    cs=st.lists(st.integers(1, 500), min_size=1, max_size=20),
    c0_extra=st.lists(st.integers(0, 500), min_size=1, max_size=20),
)
def test_entropy_ce_kl_identities(cs, c0_extra):
    """KL(p||q) >= 0 with equality iff p == q (Gibbs), CE = H + KL, and
    the q387 '(all)' row's KL is exactly 0.0 in FLOAT arithmetic too —
    every term is p*ln(1.0) with bit-identical operands, which is the
    query's built-in float-path canary."""
    import math

    k = min(len(cs), len(c0_extra))
    cs, c0_extra = cs[:k], c0_extra[:k]
    c0 = [a + b for a, b in zip(cs, c0_extra)]
    n, n0 = sum(cs), sum(c0)
    h = -sum(c / n * math.log(c / n) for c in cs)
    ce = -sum(c / n * math.log(q / n0) for c, q in zip(cs, c0))
    kl = sum(c / n * math.log((c / n) / (q / n0)) for c, q in zip(cs, c0))
    assert kl >= -1e-12  # Gibbs, up to float noise
    assert abs((h + kl) - ce) < 1e-9  # chain identity
    # the '(all)' self-KL is EXACTLY zero bit-for-bit: ln of a ratio of
    # identical doubles is ln(1.0) == 0.0
    self_kl = sum(c / n * math.log((c / n) / (c / n)) for c in cs)
    assert self_kl == 0.0


# --- q393: footrule bounds + block-churn expectation -----------------------


@settings(max_examples=200, deadline=None)
@given(st.permutations(list(range(1, 41))))
def test_footrule_bounds(perm):
    """Spearman footrule of any permutation is between 0 and
    floor(n^2/2) (Diaconis & Graham 1977), so the q393 ppm normalizer
    2e6*F/n^2 is always in [0, 1e6]."""
    n = len(perm)
    f = sum(abs((i + 1) - r) for i, r in enumerate(perm))
    assert 0 <= f <= n * n // 2
    assert 0 <= f * 2000000 // (n * n) <= 1000000


# --- q389: multi-probe candidate-set monotonicity --------------------------


def test_multiprobe_candidates_monotone(spark):
    """Probe depth t' > t can only ADD candidates (the home bucket is
    probe_rank 0 and flips are disjoint extra buckets), so recall and
    candidate count are monotone in the probe budget — the property
    that makes the q389 recall-vs-probes table a tuning CURVE."""
    from pyspark.sql import functions as F

    from sensor_data_pipeline_spark.operators.similarity import (
        sign_lsh_multiprobe_candidates,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 4)
    cand = sign_lsh_multiprobe_candidates(q, emb, n_bits=6, n_probes=3).collect()
    by_depth = {
        t: {(r["query_id"], r["match_id"]) for r in cand if r["probe_rank"] <= t}
        for t in (0, 1, 2, 3)
    }
    assert by_depth[0] <= by_depth[1] <= by_depth[2] <= by_depth[3]
    # pairs are distinct across probes: a corpus vector lives in
    # exactly one bucket, so no (query, match) pair repeats
    pairs = [(r["query_id"], r["match_id"], r["probe_rank"]) for r in cand]
    assert len({(a, b) for a, b, _ in pairs}) == len(pairs)
