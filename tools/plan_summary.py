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
  etc. (the deliberate Python-path surface).

Run: ``python tools/plan_summary.py [sf_dir]`` — writes
PLAN_SUMMARY.json at the repo root.
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def summarize(sf_dir: str) -> dict[str, dict]:
    from sensor_data_pipeline_spark.plans import REGISTRY
    from sensor_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="plan-summary")
    out: dict[str, dict] = {}
    for name, spec in sorted(REGISTRY.items()):
        try:
            jplan = spec.spark(spark, sf_dir)._jdf.queryExecution().executedPlan()
        except Exception as e:
            out[name] = {"error": str(e).splitlines()[0][:120]}
            continue
        if jplan.nodeName() == "AdaptiveSparkPlan":
            jplan = jplan.initialPlan()
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
        out[name] = {
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
        }
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = summarize(sf_dir)
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(here, "PLAN_SUMMARY.json")
    doc = {
        "definition": (
            "per-query physical-plan digest at sf0.001 (plan shape is "
            "scale-invariant); scans = real FileSourceScan leaves per "
            "table (cache-aware), exchanges = shuffle boundaries, "
            "broadcasts = BroadcastExchange nodes, pins = cached/"
            "checkpointed reuse leaves, codegen_spans = WholeStageCodegen "
            "regions, python = deliberate Python-path operators"
        ),
        "queries": out,
    }
    with open(path, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    n_err = sum(1 for v in out.values() if "error" in v)
    print(f"wrote PLAN_SUMMARY.json: {len(out)} queries, {n_err} errors")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
