"""Adversarial-config correctness sweep.

Re-runs registry queries against the DuckDB oracle under Spark configs
chosen to shake out order/partitioning dependence — exactly the bugs
that stay hidden on a developer-sized session and appear on a 1000-
executor cluster:

- a prime, tiny shuffle-partition count (7) so every partial
  aggregation sees a different row mix than the default 32;
- AQE disabled (no runtime coalescing to paper over skew);
- auto-broadcast disabled (joins that silently relied on broadcast
  become shuffle joins, changing build sides and row order).

A query whose output hash survives all of these AND the default config
is order-insensitive by construction, which is what the 100 TB claim
needs. Usage:

    python tools/conf_sweep.py [sf_dir] [query ...]   # default: all

Per-round artifact (VERDICT r10 item 6): every run MERGES its
per-query results into SWEEP.json at the repo root, so the sweep
evidence is committed per round the way BATTERY.json is, instead of
living only in a claim. tests/test_scale_coverage.py gates on the
artifact covering the CURRENT driver window (the 50 queries the
driver will re-check) with zero failures — a stale artifact (window
rotated, new queries unswept) fails the gate by missing coverage, not
by a date heuristic. Sweep the current window with:

    python tools/conf_sweep.py --window [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SWEEPS = [
    {"spark.sql.shuffle.partitions": "7"},
    {"spark.sql.adaptive.enabled": "false"},
    {"spark.sql.autoBroadcastJoinThreshold": "-1"},
]


def main() -> int:
    from pyspark.sql import SparkSession

    from sensor_data_pipeline_spark.plans import REGISTRY
    from sensor_data_pipeline_spark.session import get_spark
    from tools.compare_oracle import canon, duck_conn

    args = sys.argv[1:]
    window_mode = "--window" in args
    if window_mode:
        args = [a for a in args if a != "--window"]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    if window_mode:
        # the driver window = first 50 registered queries (REGISTRY is
        # ordered by plans.__init__._apply_driver_window)
        names = list(REGISTRY)[:50]
    else:
        names = args[1:] or sorted(REGISTRY)

    duck = duck_conn(sf_dir)
    oracle_hash: dict[str, tuple[int, str]] = {}
    for name in names:
        spec = REGISTRY[name]
        if spec.oracle is None:
            continue
        res = duck.execute(spec.oracle)
        cols = [d[0] for d in res.description]
        rows = res.fetchall()
        oracle_hash[name] = (len(rows), canon(rows, cols))

    failures = 0
    results: dict[str, dict[str, str]] = {}
    for sweep in SWEEPS:
        # a fresh session per sweep: several configs are fixed at
        # session/plan creation and must not leak between sweeps
        active = SparkSession.getActiveSession()
        if active:
            active.stop()
        spark = get_spark(app_name=f"sweep-{list(sweep)[0].rsplit('.', 1)[-1]}")
        for k, v in sweep.items():
            spark.conf.set(k, v)
        tag = ",".join(f"{k.rsplit('.', 1)[-1]}={v}" for k, v in sweep.items())
        for name in names:
            if name not in oracle_hash:
                continue
            try:
                df = REGISTRY[name].spark(spark, sf_dir)
                rows = [tuple(r) for r in df.collect()]
                got = (len(rows), canon(rows, df.columns))
                ok = got == oracle_hash[name]
            except Exception as e:  # noqa: BLE001
                ok, got = False, str(e).splitlines()[0][:120]
            results.setdefault(name, {})[tag] = "pass" if ok else "fail"
            if not ok:
                failures += 1
                print(f"FAIL [{tag}] {name}: {got} != {oracle_hash[name]}")
            else:
                print(f"PASS [{tag}] {name}")
    _write_artifact(results, sf_dir)
    print(f"\n{'OK' if failures == 0 else 'FAILURES'}: {failures} failures across {len(SWEEPS)} sweeps")
    return 1 if failures else 0


def _write_artifact(results: dict, sf_dir: str) -> None:
    """Merge this run's per-query sweep results into SWEEP.json. Merge,
    not overwrite: a window is swept in batches, and re-swept queries
    get fresh rows while untouched ones keep theirs (the BENCH_SF*
    incremental pattern)."""
    import json

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(root, os.environ.get("SWEEP_ARTIFACT", "SWEEP.json"))
    merged: dict[str, dict] = {}
    if os.path.exists(path):
        with open(path) as f:
            merged = json.load(f).get("queries", {})
    merged.update(results)
    doc = {
        "definition": (
            "per-query oracle-hash verdicts under each adversarial config "
            "(tools/conf_sweep.py); the scale-coverage gate requires every "
            "oracle-bearing query in the CURRENT driver window to be "
            "present with all sweeps 'pass'"
        ),
        "sf_dir": sf_dir,
        "sweeps": [
            ",".join(f"{k.rsplit('.', 1)[-1]}={v}" for k, v in s.items())
            for s in SWEEPS
        ],
        "queries": merged,
    }
    with open(path, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)


if __name__ == "__main__":
    raise SystemExit(main())
