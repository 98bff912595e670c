"""Anti-pattern audit over every declared query's PHYSICAL plan.

Builds (never executes) all 213 plans and flags the shapes that do not
survive a 100x scale-up:

- ``cartesian``: CartesianProduct — an all-pairs join that isn't a
  broadcast nested loop. Always a scale killer.
- ``global_window``: a Window operator with an empty partitionBy —
  one task sorts the world.
- ``python_udf``: row-at-a-time BatchEvalPython — the 10-100x-slower
  Python path where an Arrow variant exists.
- ``rescan``: the same parquet table scanned more than RESCAN_MAX
  times in one plan — loop lineage re-derivation (persist the
  invariant instead).

Known-and-justified exceptions live in ALLOW; a finding not listed
there fails the audit (exit 1), so new anti-patterns can't land
silently. Run: ``python tools/plan_audit.py [sf_dir]``.
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESCAN_MAX = 6

#: query -> reasons that are understood and acceptable at scale.
ALLOW: dict[str, set[str]] = {
    # deliberate API-surface exercise of the row-at-a-time Arrow UDF
    "q122_arrow_python_udf": {"python_udf"},
    # UDTFs run on the Python worker path BY DEFINITION — these two
    # queries exist to exercise the Spark 4 UDTF surface (SURVEY §2.8);
    # both are bounded (q94 expands a 25-row dim, q204's analyze-time
    # polymorphism is the feature under test), so the slow path never
    # touches fact-table mass
    "q94_udtf_expand": {"python_udf"},
    "q204_polymorphic_udtf": {"python_udf"},
}


def audit(sf_dir: str) -> dict[str, list[str]]:
    from sensor_data_pipeline_spark.plans import REGISTRY
    from sensor_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="plan-audit")
    findings: dict[str, list[str]] = {}
    for name, spec in sorted(REGISTRY.items()):
        try:
            plan = spec.spark(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        except Exception as e:
            findings[name] = [f"plan_error: {str(e).splitlines()[0][:120]}"]
            continue
        f: list[str] = []
        if "CartesianProduct" in plan:
            f.append("cartesian")
        # global window: "Window [exprs]" physical node prints
        # "Window [wexprs], [part], [order]" — empty partition spec
        # shows as ", [], ["
        if re.search(r"Window \[[^\n]*\], \[\], \[", plan):
            f.append("global_window")
        if "BatchEvalPython" in plan:
            f.append("python_udf")
        # count ACTUAL scan leaves via tree traversal: a persisted
        # frame prints its full cached lineage (with its Scan parquet)
        # inside every InMemoryRelation reference, so regexing the
        # toString over-counts pinned queries (q216 false-positived at
        # "20 scans" that were 17 cache-definition prints). Leaves of
        # the executed tree stop at InMemoryTableScan, so FileSourceScan
        # leaves are exactly the real per-execution parquet reads.
        jplan = spec.spark(spark, sf_dir)._jdf.queryExecution().executedPlan()
        if jplan.nodeName() == "AdaptiveSparkPlan":
            jplan = jplan.initialPlan()  # AQE root hides its children
        leaves = jplan.collectLeaves()
        from collections import Counter

        scan_tbls = []
        for i in range(leaves.size()):
            leaf = leaves.apply(i)
            head = leaf.toString().splitlines()[0]
            m = re.search(r"Scan parquet[^\n]*?(\w+)\.parquet|FileScan parquet[^\n]*?(\w+)\.parquet", head)
            if m:
                scan_tbls.append(m.group(1) or m.group(2))
        for tbl, cnt in Counter(scan_tbls).items():
            if cnt > RESCAN_MAX:
                f.append(f"rescan:{tbl}x{cnt}")
        if f:
            findings[name] = f
    return findings


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    findings = audit(sf_dir)
    unexplained = {
        name: [r for r in reasons if r.split(":")[0] not in {x.split(":")[0] for x in ALLOW.get(name, set())}]
        for name, reasons in findings.items()
    }
    unexplained = {k: v for k, v in unexplained.items() if v}
    print(json.dumps({"findings": findings, "unexplained": unexplained}, indent=1, sort_keys=True))
    return 1 if unexplained else 0


if __name__ == "__main__":
    raise SystemExit(main())
