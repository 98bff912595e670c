"""Run the committed-battery protocol: the full bench.py suite, then
the battery-guard fields (host factor + host-adjusted regressions vs
the PREVIOUS committed battery), written to BATTERY.json — the
artifact tests/test_scale_coverage.py gates on. Also refreshes
BENCH_FULL.json so the older consumers (solo_wobble's host-factor
control, the judge's cost table) see the same numbers.

Run it ALONE on a quiet host (the bench.py rule), in tmux for the
~6-10 min wall clock. Usage:

    python tools/battery.py [sf_dir]

After it writes, `python -m pytest tests/test_scale_coverage.py -q`
tells you whether any flagged regression still needs a solo-wobble
(tools/solo_wobble.py writes the WOBBLE.json ledger entries).
"""

from __future__ import annotations

import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    from tools import battery_guard

    if len(sys.argv) > 1:
        os.environ["SPARK_GRAFT_SF_DIR"] = sys.argv[1]
    prev = battery_guard.load("BATTERY.json")

    # Run bench against a STAGING artifact: a failed or interrupted
    # run must never clobber the committed BATTERY.json baseline with
    # a guard-field-less file (which would make the wobble gate pass
    # vacuously — ADVICE r10, medium). BATTERY.json is replaced only
    # after rc == 0 AND the guard fields are computed.
    staging = "BATTERY.staging.json"
    os.environ["BENCH_ARTIFACT"] = staging
    import bench

    rc = bench.main()
    if rc:
        print(f"bench reported failures; BATTERY.json untouched ({staging} kept)")
        return rc

    with open(os.path.join(ROOT, staging)) as f:
        new = json.load(f)
    if prev.get("queries"):
        hf, regr = battery_guard.regressions_vs_prev(prev["queries"], new["queries"])
        new["prev_value"] = prev.get("value")
        new["host_factor_vs_prev"] = round(hf, 4)
        new["regressions_vs_prev"] = regr
        new["guard_definition"] = (
            "regressions_vs_prev = shared queries (prev >= "
            f"{battery_guard.MIN_PREV_SEC}s) whose now/prev divided by the "
            "median battery ratio exceeds "
            f"{battery_guard.THRESHOLD}; each needs a WOBBLE.json entry "
            "bound to this battery (tools/solo_wobble.py)"
        )
    with open(os.path.join(ROOT, "BATTERY.json"), "w") as f:
        json.dump(new, f, indent=1, sort_keys=True)
    os.remove(os.path.join(ROOT, staging))
    shutil.copyfile(
        os.path.join(ROOT, "BATTERY.json"), os.path.join(ROOT, "BENCH_FULL.json")
    )
    flagged = sorted(new.get("regressions_vs_prev", {}))
    print(
        f"BATTERY.json written: {new['value']}s, host_factor="
        f"{new.get('host_factor_vs_prev')}, flagged={flagged}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
