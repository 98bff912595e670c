"""Per-query physical-plan digest artifact (PLAN_SUMMARY.json).

The scale review reads physical plans by hand; this tool condenses
every declared query's executed plan into the counters that matter at
100 TB so the whole suite can be audited at a glance:

- ``scans``: real FileSourceScan leaves per table (cache-aware — scans
  printed inside InMemoryRelation definitions are not counted; see
  tools/plan_audit.py for the round-5 false-positive story),
- ``exchanges``: shuffle boundaries (hash/range/single),
- ``broadcasts``: BroadcastExchange count (small-dim discipline),
- ``pins``: InMemoryTableScan + Scan ExistingRDD leaves (persist /
  localCheckpoint reuse points),
- ``codegen_spans``: WholeStageCodegen regions (JVM-side coverage),
- ``python``: BatchEvalPython / ArrowEvalPython / FlatMapGroupsInPandas
  etc. (the deliberate Python-path surface),
- ``python_rowwise``: BatchEvalPython only — the row-at-a-time slow
  path the plan audit gates on,
- ``cartesian`` / ``global_window``: anti-pattern booleans, so the
  audit (tools/plan_audit.py) and the pytest regression gate can run
  off ONE plan build per query.

The committed PLAN_SUMMARY.json doubles as the plan-shape BASELINE:
tests/test_plan_shapes.py fails if any query's digest gets worse than
the committed one (more scans of a table, more python, a cartesian
appearing) — so a removed localCheckpoint or a new rescan can't land
silently even when it stays under the audit's absolute thresholds.

Run: ``python tools/plan_summary.py [sf_dir]`` — writes
PLAN_SUMMARY.json at the repo root.
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SUMMARY_PATH = os.path.join(ROOT, "PLAN_SUMMARY.json")


_BOUNDED_NODES = ("TakeOrderedAndProject", "GlobalLimit", "CollectLimit")


def _walk(node, visit) -> None:
    visit(node)
    it = node.children().iterator()
    while it.hasNext():
        _walk(it.next(), visit)


def digest_jplan(jplan) -> dict:
    """Digest one already-built executed plan (py4j handle)."""
    if jplan.nodeName() == "AdaptiveSparkPlan":
        jplan = jplan.initialPlan()  # AQE root hides its children
    txt = jplan.toString()
    leaves = jplan.collectLeaves()
    scans: dict[str, int] = {}
    pins = 0
    for i in range(leaves.size()):
        head = leaves.apply(i).toString().splitlines()[0]
        m = re.search(r"parquet[^\n]*?(\w+)\.parquet", head)
        if m:
            scans[m.group(1)] = scans.get(m.group(1), 0) + 1
        if "InMemoryTableScan" in head or "Scan ExistingRDD" in head:
            pins += 1
    # Global windows need a TREE walk: Spark 4 prints a Window node's
    # partition spec only when NON-empty ("Window [exprs], [order]" vs
    # "Window [exprs], [part], [order]"), so the old empty-bracket
    # regex matched nothing — the detector was dead (round-6 finding;
    # every round-3..5 audit silently had zero global-window coverage).
    # A Window with an empty partitionSpec whose input subtree is
    # bounded by a global limit (TakeOrderedAndProject / GlobalLimit /
    # CollectLimit — the ranked-top-k idiom: limit(k) then rank the k
    # survivors) sorts a provably tiny frame and is NOT flagged; an
    # unbounded one sorts the world in one task and is.
    global_windows = 0
    bounded_global_windows = 0

    def visit(n):
        nonlocal global_windows, bounded_global_windows
        if n.nodeName() == "Window":
            try:
                empty = n.partitionSpec().isEmpty()
            except Exception:
                empty = False
            if empty:
                sub: list[str] = []
                _walk(n, lambda c: sub.append(c.nodeName()))
                if any(b in sub for b in _BOUNDED_NODES):
                    bounded_global_windows += 1
                else:
                    global_windows += 1

    _walk(jplan, visit)
    return {
        "scans": scans,
        "exchanges": len(re.findall(r"Exchange (hash|range|Single)", txt)),
        "broadcasts": txt.count("BroadcastExchange"),
        "pins": pins,
        "codegen_spans": txt.count("WholeStageCodegen"),
        "python": len(
            re.findall(
                r"BatchEvalPython|ArrowEvalPython|FlatMapGroupsInPandas"
                r"|MapInPandas|PythonMapInArrow|FlatMapCoGroupsInPandas"
                r"|AggregateInPandas",
                txt,
            )
        ),
        "python_rowwise": txt.count("BatchEvalPython"),
        "cartesian": "CartesianProduct" in txt,
        "global_window": global_windows > 0,
        "bounded_global_windows": bounded_global_windows,
    }


def summarize(sf_dir: str) -> dict[str, dict]:
    from sensor_data_pipeline_spark.plans import REGISTRY
    from sensor_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="plan-summary")
    out: dict[str, dict] = {}
    for name, spec in sorted(REGISTRY.items()):
        try:
            jplan = spec.spark(spark, sf_dir)._jdf.queryExecution().executedPlan()
            out[name] = digest_jplan(jplan)
        except Exception as e:
            out[name] = {"error": str(e).splitlines()[0][:120]}
    return out


def regressions(current: dict[str, dict], baseline: dict[str, dict]) -> dict[str, list[str]]:
    """Per-query plan-shape regressions of `current` vs the committed
    `baseline` digest. A query regresses when any scale-relevant
    counter gets WORSE: a table scanned more often, more Python
    operators, more shuffles, or a cartesian/global-window appearing
    that the baseline did not have. Queries absent from the baseline
    (new this round) are skipped — the absolute audit still covers
    them. Improvements (fewer scans, fewer exchanges) never fail."""
    out: dict[str, list[str]] = {}
    for name, cur in current.items():
        base = baseline.get(name)
        if base is None or "error" in base or "error" in cur:
            continue
        probs: list[str] = []
        for tbl, cnt in cur.get("scans", {}).items():
            if cnt > base.get("scans", {}).get(tbl, 0):
                probs.append(f"scans:{tbl} {base.get('scans', {}).get(tbl, 0)}->{cnt}")
        # `exchanges` is deliberately NOT compared: for queries with
        # persist()/cache(), Spark's CacheManager matches a re-built
        # plan by canonicalized logical plan, so whether an earlier
        # query in the SAME session already materialized the cache
        # changes how the rebuilt plan prints its exchange nodes
        # (observed in-suite: q216 23->54, q86 14->23 purely from
        # test_oracle_diff having executed them first). Scan leaves,
        # python ops and the anti-pattern booleans are leaf-/node-based
        # and stable across session history; exchanges stay in the
        # artifact for human review only.
        for key in ("python", "python_rowwise"):
            if cur.get(key, 0) > base.get(key, 0):
                probs.append(f"{key} {base.get(key, 0)}->{cur.get(key, 0)}")
        for key in ("cartesian", "global_window"):
            if cur.get(key, False) and not base.get(key, False):
                probs.append(f"{key} appeared")
        if probs:
            out[name] = probs
    return out


def load_baseline() -> dict[str, dict]:
    with open(SUMMARY_PATH) as f:
        return json.load(f)["queries"]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = summarize(sf_dir)
    doc = {
        "definition": (
            "per-query physical-plan digest at sf0.001 (plan shape is "
            "scale-invariant); scans = real FileSourceScan leaves per "
            "table (cache-aware), exchanges = shuffle boundaries, "
            "broadcasts = BroadcastExchange nodes, pins = cached/"
            "checkpointed reuse leaves, codegen_spans = WholeStageCodegen "
            "regions, python = deliberate Python-path operators, "
            "python_rowwise = BatchEvalPython only, cartesian/"
            "global_window = anti-pattern booleans; the committed file "
            "is also the regression baseline for tests/test_plan_shapes.py"
        ),
        "queries": out,
    }
    with open(SUMMARY_PATH, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    n_err = sum(1 for v in out.values() if "error" in v)
    print(f"wrote PLAN_SUMMARY.json: {len(out)} queries, {n_err} errors")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
