"""Audit physical-plan scan counts for every registered query.

For each query, compile the physical plan at the given sf dir and count
`Scan parquet` occurrences plus the distinct parquet paths referenced.
A query whose plan scans the same file K times is re-reading the base
table K times — at 100 TB that multiplies the dominant cost K-fold
(this audit caught q312 at 4 scans and q323 at 10 before round 4's
fix). Self-joins legitimately scan twice; the report is for human
review, not a hard gate.

Usage: python tools/scan_audit.py [sf_dir] [min_scans]
"""

from __future__ import annotations

import os
import re
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sensor_data_pipeline_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    min_scans = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(master="local[8]")
    from sensor_data_pipeline_spark.plans import REGISTRY

    rows = []
    for name in sorted(REGISTRY):
        spec = REGISTRY[name]
        try:
            df = spec.spark(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception:
            rows.append((name, -1, -1, "ERROR: " + traceback.format_exc(limit=1).splitlines()[-1]))
            continue
        scans = plan.count("Scan parquet")
        # distinct tables: the scan lines name the location
        tables = set(re.findall(r"Scan parquet[^\[\n]*", plan))
        rows.append((name, scans, len(tables), ""))

    flagged = [r for r in rows if r[1] >= min_scans or r[1] < 0]
    print(f"{len(rows)} queries compiled; {len(flagged)} with >= {min_scans} scans or errors\n")
    for name, scans, ntab, err in sorted(flagged, key=lambda r: -r[1]):
        print(f"{scans:3d} scans  {ntab:2d} distinct  {name}  {err}")


if __name__ == "__main__":
    main()
