"""Anti-pattern audit over every declared query's PHYSICAL plan.

Builds (never executes, beyond the eager localCheckpoint pins some
plans contain) every REGISTRY plan — the count is whatever
``len(REGISTRY)`` says, never hardcoded here — and flags the shapes
that do not survive a 100x scale-up:

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
silently. ALLOW entries match the FULL reason string (``python_udf``,
``rescan:documentsx4``) — never a bare prefix, which would whitelist
every future rescan of any table for that query (ADVICE r5).
Run: ``python tools/plan_audit.py [sf_dir]``.
"""

from __future__ import annotations

import json
import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESCAN_MAX = 6

#: query -> full reason strings that are understood and acceptable at
#: scale. Rescan entries name the table AND the count
#: (``rescan:<table>x<n>``), so a plan regression to a higher count
#: fails the audit even for an allowed query.
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


def unexplained_findings(
    findings: dict[str, list[str]], allow: dict[str, set[str]] | None = None
) -> dict[str, list[str]]:
    """Findings minus the ALLOW list. Shared by the CLI and the pytest
    gate (tests/test_plan_shapes.py) so the two can't drift. Matching
    is exact on the full reason string."""
    allow = ALLOW if allow is None else allow
    out = {
        name: [r for r in reasons if r not in allow.get(name, set())]
        for name, reasons in findings.items()
    }
    return {k: v for k, v in out.items() if v}


def _digest(jplan) -> list[str]:
    """Anti-pattern reasons for one already-built physical plan."""
    plan = jplan.toString()
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
    if jplan.nodeName() == "AdaptiveSparkPlan":
        jplan = jplan.initialPlan()  # AQE root hides its children
    leaves = jplan.collectLeaves()
    scan_tbls = []
    for i in range(leaves.size()):
        head = leaves.apply(i).toString().splitlines()[0]
        m = re.search(
            r"Scan parquet[^\n]*?(\w+)\.parquet|FileScan parquet[^\n]*?(\w+)\.parquet",
            head,
        )
        if m:
            scan_tbls.append(m.group(1) or m.group(2))
    for tbl, cnt in Counter(scan_tbls).items():
        if cnt > RESCAN_MAX:
            f.append(f"rescan:{tbl}x{cnt}")
    return f


def audit(sf_dir: str) -> dict[str, list[str]]:
    from sensor_data_pipeline_spark.plans import REGISTRY
    from sensor_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="plan-audit")
    findings: dict[str, list[str]] = {}
    for name, spec in sorted(REGISTRY.items()):
        # ONE plan build per query (the build itself runs any eager
        # localCheckpoint jobs, so building twice doubled audit cost —
        # ADVICE r5), and the whole digest stays inside the try so a
        # traversal failure records as plan_error instead of aborting.
        try:
            jplan = spec.spark(spark, sf_dir)._jdf.queryExecution().executedPlan()
            f = _digest(jplan)
        except Exception as e:
            findings[name] = [f"plan_error: {str(e).splitlines()[0][:120]}"]
            continue
        if f:
            findings[name] = f
    return findings


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    findings = audit(sf_dir)
    unexplained = unexplained_findings(findings)
    print(json.dumps({"findings": findings, "unexplained": unexplained}, indent=1, sort_keys=True))
    return 1 if unexplained else 0


if __name__ == "__main__":
    raise SystemExit(main())
