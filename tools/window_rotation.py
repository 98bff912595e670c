"""Compute the staleness-ordered driver-window rotation for round 9+.

With cumulative driver coverage closed at 339/339 (the round-8 window),
the 42 fresh slots become a REGRESSION rotation (round-7 VERDICT item
5): re-verify the queries whose most recent green driver row is OLDEST
first (primary key: round of last green row ascending; tie-break:
registration order), so r1/r2-vintage evidence — checked before ANSI
mode and the exact integer-division discipline existed — refreshes
first. Queries never driver-checked (new frontier members) jump the
queue: never-checked beats stale. The 8 family-rep slots stay forced.

Usage: python tools/window_rotation.py [n_fresh]
Prints the ordered fresh-slot list for the next _DRIVER_WINDOW edit,
annotated with each query's last green round.
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

FORCED_REPS = [
    "q114_custom_source",
    "q215_media_phash_neardup",
    "q243_disorder_profile",
    "q287_stream_nearest_match",
    "q260_stream_tws_delta",
    "q117_group_zscore",
    "q65_array_map_funcs",
    "q194_incremental_rollup",
]


def last_green_rounds() -> dict[str, int]:
    """query -> most recent round with a fully-green driver row."""
    out: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        rnd = int(path.rsplit("_r", 1)[1].split(".")[0])
        with open(path) as f:
            rows = json.load(f)
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            green = (
                row.get("rows_match")
                and row.get("schema_match", True)
                and row.get("hash_match", True)
                and row.get("err") in (None, "")
            )
            if green:
                out[name] = max(out.get(name, 0), rnd)
    return out


def rotation(n_fresh: int = 42) -> list[tuple[str, int]]:
    from sensor_data_pipeline_spark.plans import REGISTRY

    green = last_green_rounds()
    # registration order as the tie-break (REGISTRY is insertion-ordered
    # with the current window head first; use the stable name sort of
    # the full declared set minus the head reordering by falling back
    # to enumeration order)
    reg_order = {name: i for i, name in enumerate(REGISTRY)}
    candidates = [n for n in REGISTRY if n not in FORCED_REPS]
    candidates.sort(key=lambda n: (green.get(n, -1), reg_order[n]))
    return [(n, green.get(n, -1)) for n in candidates[:n_fresh]]


def main() -> int:
    n_fresh = int(sys.argv[1]) if len(sys.argv) > 1 else 42
    rows = rotation(n_fresh)
    never = [n for n, r in rows if r < 0]
    print(f"# fresh slots ({len(rows)}; {len(never)} never-checked jump the queue)")
    for name, rnd in rows:
        tag = "NEVER" if rnd < 0 else f"r{rnd}"
        print(f'    "{name}",  # last green: {tag}')
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
