"""Optimization-round probe: per-query solo measurement + plan capture.

For each named query, replicates bench.py's environment exactly (same
warmup — page-cache read-through, no base-table .cache() since the r12
methodology ruling — same toPandas materialization) and then:

1. captures ``df.explain("formatted")`` to a file (for plans/r11/
   before/after evidence),
2. times a cold pass + N warm passes with bench's methodology
   (fresh ``spec.spark(...)`` build per pass, so plan-construction
   cost is included — the number the driver's bench reports),
3. optionally times a noop-sink pass (guide §1.4: computation without
   the collect/Arrow-transfer cost) so collect-dominated queries are
   distinguishable from compute-dominated ones.

Usage:
    python tools/opt_probe.py [--plans DIR] [--suffix before|after]
        [--noop] [--runs N] [--sf SF_DIR] q1 [q2 ...]

Prints one JSON line per query:
    {"query": ..., "cold": s, "warm": [s, ...], "best": s,
     "noop": s|null, "plan_file": path}
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--plans", default=None, help="directory for explain captures")
    ap.add_argument("--suffix", default=None, help="file suffix (before/after)")
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
    from pyspark.sql import functions as F

    from sensor_data_pipeline_spark.plans import REGISTRY
    from sensor_data_pipeline_spark.session import get_spark
    from sensor_data_pipeline_spark.sources.tables import load_table

    spark = get_spark(app_name="opt-probe")

    # bench.py's warmup, verbatim in spirit: codegen compiler, shuffle
    # machinery, Arrow/UDF worker pool, then the base-table page-cache
    # warmup (read-through noop, NO .cache() — the r12 methodology
    # ruling: timed queries compute from the parquet inputs)
    warm = spark.read.parquet(os.path.join(args.sf, "lineitem.parquet"))
    warm.groupBy("l_returnflag").agg(F.sum("l_quantity")).collect()
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _warm_udf(x):
        return x * 1.0

    spark.range(1000).select(_warm_udf(F.col("id").cast("double"))).collect()
    for t in (
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ):
        load_table(spark, t, args.sf).write.format("noop").mode("overwrite").save()

    def materialize(df) -> int:
        try:
            return len(df.toPandas())
        except Exception:
            return len(df.collect())

    for name in args.queries:
        spec = REGISTRY[name]
        spark.sparkContext.setJobDescription(f"opt-probe:{name}")
        plan_file = None
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            df = spec.spark(spark, args.sf)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            sfx = f"_{args.suffix}" if args.suffix else ""
            plan_file = os.path.join(args.plans, f"{name}{sfx}.txt")
            with open(plan_file, "w") as f:
                f.write(buf.getvalue())
        t0 = time.perf_counter()
        materialize(spec.spark(spark, args.sf))
        cold = round(time.perf_counter() - t0, 3)
        warms = []
        for _ in range(args.runs):
            t1 = time.perf_counter()
            materialize(spec.spark(spark, args.sf))
            warms.append(round(time.perf_counter() - t1, 3))
        noop_s = None
        if args.noop:
            dfn = spec.spark(spark, args.sf)
            t2 = time.perf_counter()
            dfn.write.format("noop").mode("overwrite").save()
            noop_s = round(time.perf_counter() - t2, 3)
        # per-query storage hygiene (ADVICE r11): drop caches the query
        # created and GC the eager/lazy checkpoint blocks so a
        # late-listed query is measured under the same storage headroom
        # as an early one (clearCache does not free checkpoint blocks;
        # the GC's ContextCleaner weak refs do)
        spark.catalog.clearCache()
        try:
            spark._jvm.System.gc()
        except Exception:
            pass
        print(
            json.dumps(
                {
                    "query": name,
                    "cold": cold,
                    "warm": warms,
                    "best": min([cold] + warms),
                    "noop": noop_s,
                    "plan_file": plan_file,
                }
            ),
            flush=True,
        )
        spark.sparkContext.setJobDescription(None)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
