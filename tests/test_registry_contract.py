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
    """The driver verifies only the FIRST 50 registered queries, and no
    operator family may go driver-unverified (round-1 lesson: import
    order left streaming/dedup/similarity/multimodal/warehouse entirely
    unverified by the driver). The invariant, per required family:
    EITHER a representative sits in the current window, OR every member
    of the family is already cumulative-green in the committed
    CORRECTNESS_r*.json artifacts (checked from the artifacts, not
    asserted in prose). The second arm exists for the round-8 closure
    window: 42 never-checked rows + 8 rep families with zero checked
    alternates is already 50 slots, and json — whose 11 members are all
    driver-green, the last (q155) in r7 — is exactly the family with no
    claim to a closure-round slot. The r9+ staleness rotation
    (plans/__init__.py window comment) cycles fully-green families back
    through the window, so this arm never lets evidence go stale by
    more than the rotation period."""
    import glob
    import json
    import os

    from sensor_data_pipeline_spark.plans import _DRIVER_WINDOW

    first50 = list(REGISTRY)[:50]
    assert first50 == _DRIVER_WINDOW
    cats = {REGISTRY[n].category for n in first50}

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    checked: set[str] = set()
    for path in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        with open(path) as f:
            for q, row in json.load(f).items():
                if row.get("rows_match") and row.get("schema_match"):
                    checked.add(q)
    assert checked, "no committed CORRECTNESS artifacts found"

    for family in (
        "streaming", "dedup", "similarity", "text", "multimodal",
        "quality", "cdc", "analytics", "source", "stateful", "json",
        "time", "join", "window", "aggregation", "udf", "functions",
    ):
        members = [n for n, s in REGISTRY.items() if s.category == family]
        assert members, f"required family {family!r} has no queries"
        fully_green = all(n in checked for n in members)
        assert family in cats or fully_green, (
            f"driver window misses family {family!r} and it has "
            f"never-checked members: {[n for n in members if n not in checked]}"
        )


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

    # NO exemptions. Round 4 falsified the "symmetric DECIMAL(38,0)"
    # theory (q237/q279 red driver rows): even when BOTH engines emit
    # scale-0 decimals, the driver's canonicalization renders them
    # through a float64 path that drops bits above 2^53, so the hash
    # mismatches despite identical values. The absolute contract is:
    # no OUTPUT column is a scale-0 decimal on either engine — exact
    # >2^53 integers leave as digit strings (internal decimal(38,0)
    # accumulators are fine; they never reach the driver's hash).
    con = duck_conn("/root/testdata/sf0.001")
    leaks = []
    for name, spec in REGISTRY.items():
        if spec.oracle is None:
            continue
        schema = con.execute(spec.oracle).arrow().schema
        for f in schema:
            if pa.types.is_decimal(f.type) and f.type.scale == 0:
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

def test_fragile_rendering_guard_catches_seeded_mutant():
    """Round-4 bug class (q237/q279 red driver rows): an exact integer
    above 2^53 — whether Python int or Decimal — renders differently
    under a float64-routing canonicalization, so the local gate must
    flag it even when both engines agree exactly. Seed the mutant the
    driver caught: a Decimal(38,0) value just above 2^53."""
    import decimal

    from tools.compare_oracle import fragile_cells

    big = decimal.Decimal(2**53 + 1)
    assert fragile_cells([(big,)], ["cov_num"]) == [("cov_num", big)]
    assert fragile_cells([(2**53 + 1,)], ["n"]) == [("n", 2**53 + 1)]
    # exact-in-float64 values, strings, floats, bools, None all pass
    assert not fragile_cells(
        [(2**53, decimal.Decimal(42), "9007199254740993", 1.5, True, None)],
        list("abcdef"),
    )


def test_no_scale0_decimal_in_spark_output_schemas(spark):
    """Spark side of the absolute no-scale-0-decimal-output rule: the
    oracle-side Arrow sweep (above) cannot see Spark's schema, and a
    .cast('decimal(38,0)') without the trailing .cast('string') would
    ship the exact bug class round 4 proved fatal. Mostly schema
    analysis, but NOT free: building the plan runs the eager
    localCheckpoint()/count() jobs in the pinned queries (q318, q326,
    q331, q332, q221, q225, ...), so this sweep costs a few seconds —
    accepted, because the schema of a pinned plan can't be derived
    without building it (ADVICE r5 corrected the old 'no job runs'
    claim here)."""
    from pyspark.sql.types import DecimalType

    leaks = []
    for name, spec in REGISTRY.items():
        try:
            schema = spec.spark(spark, "/root/testdata/sf0.001").schema
        except Exception:
            continue  # streaming/stateful entries that execute eagerly
        for f in schema.fields:
            if isinstance(f.dataType, DecimalType) and f.dataType.scale == 0:
                leaks.append((name, f.name, str(f.dataType)))
    assert not leaks, f"scale-0 decimal in Spark output schema: {leaks}"


def test_no_complex_types_in_oracle_output_schemas():
    """Round-8 bug class (q129 red driver row): the driver sorts the
    result frame with pandas, which cannot hash list/dict cells, so a
    top-level ARRAY / MAP / STRUCT output column errors the whole
    CORRECTNESS row even when the values are identical. Oracle side:
    execute every oracle at sf0.001 and assert no list/struct/map Arrow
    column survives — sequences leave as delimited STRINGs
    (array_to_string) on both engines."""
    import pyarrow as pa

    from tools.compare_oracle import duck_conn

    con = duck_conn("/root/testdata/sf0.001")
    leaks = []
    for name, spec in REGISTRY.items():
        if spec.oracle is None:
            continue
        schema = con.execute(spec.oracle).arrow().schema
        for f in schema:
            if (
                pa.types.is_list(f.type)
                or pa.types.is_large_list(f.type)
                or pa.types.is_fixed_size_list(f.type)
                or pa.types.is_struct(f.type)
                or pa.types.is_map(f.type)
            ):
                leaks.append((name, f.name, str(f.type)))
    con.close()
    assert not leaks, f"complex type leaked into oracle output: {leaks}"


def test_no_complex_types_in_spark_output_schemas(spark):
    """Spark side of the q129 canonicalizability contract: no declared
    query's output schema may contain a top-level ArrayType / MapType /
    StructType column. Uses the same plan-building sweep as the
    scale-0-decimal gate (streaming/eager entries that can't build a
    lazy plan are skipped there too)."""
    from tools.compare_oracle import complex_output_columns

    leaks = []
    for name, spec in REGISTRY.items():
        try:
            schema = spec.spark(spark, "/root/testdata/sf0.001").schema
        except Exception:
            continue  # streaming/stateful entries that execute eagerly
        bad = complex_output_columns(schema)
        if bad:
            leaks.append((name, bad))
    assert not leaks, f"ARRAY/MAP/STRUCT in Spark output schema: {leaks}"


def test_complex_type_guard_catches_seeded_mutant(spark):
    """The probe must actually fire: q129's pre-fix output shape (an
    ARRAY column from sliced collect_list) is the seeded mutant, plus a
    MAP and a STRUCT variant; the fixed delimited-string shape passes."""
    from pyspark.sql import functions as F

    from tools.compare_oracle import complex_output_columns

    df = spark.range(3)
    mutant = df.select(
        F.col("id"),
        F.array(F.lit("a"), F.lit("b")).alias("first_events"),
        F.create_map(F.lit("k"), F.lit(1)).alias("m"),
        F.struct(F.lit(1).alias("x")).alias("s"),
    )
    assert complex_output_columns(mutant.schema) == ["first_events", "m", "s"]
    fixed = df.select(
        F.col("id"),
        F.concat_ws("|", F.array(F.lit("a"), F.lit("b"))).alias("first_events"),
    )
    assert complex_output_columns(fixed.schema) == []


def test_reference_citations_resolve():
    """Every `src/...` file cited in a docstring must exist under
    /root/reference — round 4 shipped a fabricated module path
    (src/modules/rs/main.c) and two misspelled extensions
    (consumer.c for consumer.cpp); SURVEY discipline is that every
    parity claim carries a REAL file:line."""
    import re
    from pathlib import Path

    ref = Path("/root/reference")
    if not ref.exists():
        pytest.skip("reference checkout not present")
    pkg = Path(__file__).resolve().parents[1]
    # longest-first alternation + boundary: `c` before `cpp` would
    # truncate consumer.cpp -> consumer.c and flag a valid citation
    pat = re.compile(r"src/[A-Za-z0-9_/.\-]+\.(?:cpp|json|py|rs|go|c|h)(?![A-Za-z])")
    missing = set()
    for py in (pkg / "sensor_data_pipeline_spark").rglob("*.py"):
        for m in pat.findall(py.read_text()):
            if not (ref / m).exists():
                missing.add((py.name, m))
    assert not missing, f"citations to nonexistent reference files: {sorted(missing)}"
