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

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or sorted(REGISTRY)

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
            if not ok:
                failures += 1
                print(f"FAIL [{tag}] {name}: {got} != {oracle_hash[name]}")
            else:
                print(f"PASS [{tag}] {name}")
    print(f"\n{'OK' if failures == 0 else 'FAILURES'}: {failures} failures across {len(SWEEPS)} sweeps")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
