"""Meta-tests on the declared-query registry: the driver contract
(queries()/oracle_sql() in __spark_entry__.py) must stay structurally
sound as the suite grows — every query named/documented, every oracle
referencing only the pre-registered testdata views, and the adapter
exposing exactly the registry."""

from __future__ import annotations

import re

from sensor_data_pipeline_spark.plans import REGISTRY

TABLES = {
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
}


def test_names_follow_convention():
    for name in REGISTRY:
        assert re.fullmatch(r"q\d{2,3}_[a-z0-9_]+", name), name


def test_every_query_documented_and_categorized():
    for name, spec in REGISTRY.items():
        assert spec.spark.__doc__, f"{name} has no docstring"
        assert spec.category, f"{name} has no category"


def test_oracles_reference_only_registered_views():
    # FROM/JOIN targets must be the driver's pre-registered views, CTE
    # names defined inside the oracle itself, or DuckDB table functions
    # (q114 regenerates the custom source's synthetic data via range())
    table_functions = {"range", "generate_series", "unnest"}
    for name, spec in REGISTRY.items():
        if spec.oracle is None:
            continue
        # CTE names, with or without an explicit column list:
        #   WITH x AS (...)  |  WITH RECURSIVE x(a, b) AS (...)
        ctes = set(
            re.findall(
                r"(?:WITH(?:\s+RECURSIVE)?|,)\s*([a-z_][a-z0-9_]*)\s*(?:\([^)]*\))?\s+AS\s*\(",
                spec.oracle,
                re.I,
            )
        ) | table_functions
        # (?<![a-z0-9_.]) so a column named n_from doesn't make the
        # following word look like a FROM target
        targets = re.findall(
            r"(?<![a-z0-9_.])(?:FROM|JOIN)\s+([a-z_][a-z0-9_]*)", spec.oracle, re.I
        )
        for t in targets:
            assert t.lower() in TABLES or t.lower() in {c.lower() for c in ctes}, (
                f"{name}: oracle references unknown relation {t!r}"
            )


def test_driver_adapter_exposes_registry():
    import __spark_entry__ as mod

    qs = mod.queries()
    os_ = mod.oracle_sql()
    assert set(qs) == set(REGISTRY)
    assert set(os_) == {n for n, s in REGISTRY.items() if s.oracle is not None}
    rows_only = {n for n, s in REGISTRY.items() if s.oracle is None}
    # every declared query now carries a full value-hash oracle (the
    # former rows-only trio q54/q62/q68 was upgraded to deterministic
    # self-audits in round 3) — this must not regress
    assert rows_only == set(), rows_only


def test_driver_window_spans_all_families():
    """The driver verifies only the FIRST 50 registered queries, so the
    first 50 must include a representative of every operator family
    (round-1 lesson: import order left streaming/dedup/similarity/
    multimodal/warehouse entirely unverified by the driver)."""
    from sensor_data_pipeline_spark.plans import _DRIVER_WINDOW

    first50 = list(REGISTRY)[:50]
    assert first50 == _DRIVER_WINDOW
    cats = {REGISTRY[n].category for n in first50}
    for family in (
        "streaming", "dedup", "similarity", "text", "multimodal",
        "quality", "cdc", "analytics", "source", "stateful", "json",
        "time", "join", "window", "aggregation", "udf", "functions",
    ):
        assert family in cats, f"driver window misses family {family!r}"


def test_no_hugeint_leaks_in_oracle_schemas():
    """The q114 bug class: DuckDB's sum() over BIGINT returns HUGEINT,
    which exports through Arrow as decimal128(38,0) while Spark emits
    int64 — the driver's value-hash then mismatches even when every
    value is identical. Guard: execute EVERY oracle at sf0.001 and
    assert no decimal128(38,0) column survives (integer aggregates must
    be outer-wrapped in CAST(... AS BIGINT)). Fractional decimals with
    scale > 0 are allowed — they arise from intentional decimal-exact
    queries (q99) and hash-match Spark's decimal/double output."""
    import pyarrow as pa

    from tools.compare_oracle import duck_conn

    # intentional symmetric decimal-exact outputs: BOTH engines emit
    # DECIMAL(38,0) (Spark .cast + oracle CAST), so there is no
    # int64-vs-decimal asymmetry to mismatch on. q237.cov_num exceeds
    # int64 a decade above sf0.1 (BENCH_SF1 finding).
    symmetric_decimal = {
        ("q237_correlation_moments", "cov_num"),
        # q279: rev*qty products exceed int64 a decade above sf1, so
        # both engines carry them in DECIMAL(38,0)/HUGEINT by design
        ("q279_revenue_bridge", "price_effect_num"),
        ("q279_revenue_bridge", "volume_effect_num"),
    }
    con = duck_conn("/root/testdata/sf0.001")
    leaks = []
    for name, spec in REGISTRY.items():
        if spec.oracle is None:
            continue
        schema = con.execute(spec.oracle).arrow().schema
        for f in schema:
            if (
                pa.types.is_decimal(f.type)
                and f.type.scale == 0
                and (name, f.name) not in symmetric_decimal
            ):
                leaks.append((name, f.name, str(f.type)))
    con.close()
    assert not leaks, f"HUGEINT/decimal-scale-0 leaked into oracle output: {leaks}"


def test_survey_readme_counts_in_sync():
    """Prose counts (SURVEY.md tally, README parenthetical) must be
    generated from the registry — run tools/sync_counts.py after adding
    a query (round-2 finding: three different totals in SURVEY.md)."""
    from tools.sync_counts import sync

    assert sync(check=True) == 0


def _window_order_epoch_violations(sql: str) -> list[str]:
    """The q164 bug class, generalized: DuckDB's epoch(ts) keeps
    FRACTIONAL seconds while Spark's unix_timestamp() truncates to
    whole seconds, so any window ORDER BY / RANGE frame keyed on a
    bare epoch() silently depends on the fixture having no sub-second
    timestamps — peers fall in or out of the frame differently the
    moment one does. Every epoch( inside a window's ORDER BY (and
    therefore any RANGE frame over it) must be wrapped floor(epoch(.

    Returns the offending ORDER BY snippets (empty = clean)."""
    bad: list[str] = []
    for m in re.finditer(r"\bOVER\s*\(", sql, re.I):
        # balanced-paren scan for the window body
        depth, i = 1, m.end()
        while i < len(sql) and depth:
            depth += {"(": 1, ")": -1}.get(sql[i], 0)
            i += 1
        body = sql[m.end() : i - 1]
        ob = re.search(r"\bORDER\s+BY\b(.*?)(?:\bROWS\b|\bRANGE\b|$)", body, re.I | re.S)
        if not ob:
            continue
        keys = ob.group(1)
        for e in re.finditer(r"epoch\s*\(", keys, re.I):
            prefix = keys[: e.start()].rstrip()
            if not prefix.lower().endswith("floor("):
                bad.append(keys.strip()[:120])
    return bad


def test_no_fractional_epoch_in_window_order_keys():
    """Round-3 ADVICE bug class: fractional epoch() as a window order
    key / RANGE frame basis diverges from Spark's whole-second
    unix_timestamp on any fixture with sub-second timestamps."""
    offenders = {
        name: v
        for name, spec in REGISTRY.items()
        if spec.oracle is not None
        and (v := _window_order_epoch_violations(spec.oracle))
    }
    assert not offenders, f"fractional epoch() in window ORDER BY: {offenders}"


def test_fractional_epoch_guard_catches_seeded_mutant():
    """The checker must actually fire: q164's pre-fix oracle shape
    (bare epoch(ts) ordering a RANGE frame) is the seeded mutant."""
    mutant = """
    SELECT user_id,
           median(v) OVER (PARTITION BY user_id ORDER BY epoch(ts)
                           RANGE BETWEEN 600 PRECEDING AND CURRENT ROW) AS med
    FROM events
    """
    assert _window_order_epoch_violations(mutant)
    fixed = mutant.replace("epoch(ts)", "CAST(floor(epoch(ts)) AS BIGINT)")
    assert not _window_order_epoch_violations(fixed)
