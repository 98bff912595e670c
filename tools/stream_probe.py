"""Instrumented streaming drain: where does per-batch time go?

VERDICT r11 item 6: the streaming family (~6 queries x 2-4s) is the
largest untouched cost, and the multi-batch epochs are the tested
semantics — so before touching anything, measure the per-batch
breakdown (offset/commit-log persistence vs state-store work vs
planning vs actual processing) with a StreamingQueryListener and
decide what is config-addressable.

Runs the named streaming queries once each in a fresh session with a
listener attached, then prints per-batch ``durationMs`` maps (Spark's
own breakdown: triggerExecution, queryPlanning, getBatch, latestOffset,
walCommit, commitOffsets, addBatch) and state-operator commit times.

Usage: python tools/stream_probe.py [--sf SF_DIR] q170 [q162 ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
    from pyspark.sql.streaming import StreamingQueryListener

    from sensor_data_pipeline_spark.plans import REGISTRY
    from sensor_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="stream-probe")

    batches: list[dict] = []

    class _Probe(StreamingQueryListener):
        def onQueryStarted(self, event):  # noqa: N802
            pass

        def onQueryProgress(self, event):  # noqa: N802
            p = event.progress
            row = {
                "name": p.name,
                "batchId": p.batchId,
                "numInputRows": p.numInputRows,
                "durationMs": dict(p.durationMs),
            }
            try:
                row["state"] = [
                    {
                        "commitTimeMs": s.commitTimeMs,
                        "numStateRows": s.numRowsTotal,
                        "memoryUsedBytes": s.memoryUsedBytes,
                    }
                    for s in p.stateOperators
                ]
            except Exception:
                pass
            batches.append(row)

        def onQueryIdle(self, event):  # noqa: N802
            pass

        def onQueryTerminated(self, event):  # noqa: N802
            pass

    probe = _Probe()
    spark.streams.addListener(probe)

    for name in args.queries:
        spec = REGISTRY[name]
        batches.clear()
        t0 = time.perf_counter()
        n = len(spec.spark(spark, args.sf).collect())
        wall = round(time.perf_counter() - t0, 3)
        # listener events are delivered async; give the bus a moment
        time.sleep(1.0)
        total_trigger = sum(
            b["durationMs"].get("triggerExecution", 0) for b in batches
        )
        print(f"=== {name}: {n} rows, wall {wall}s, "
              f"{len(batches)} batches, trigger-total {total_trigger}ms")
        for b in batches:
            print(json.dumps(b, sort_keys=True))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
