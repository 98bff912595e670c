"""Committed-battery regression guard (VERDICT r9 item 4).

Round 9 shipped four per-query battery regressions >=1.5x (q332 q50
q330 q318) with unchanged plan digests and no solo-wobble runs — the
judge had to flag them by hand. These functions mechanize the rule so
pytest fails when a committed battery carries an unexonerated
regression:

* A "committed battery" is BATTERY.json, written ONLY by
  ``python tools/battery.py`` (the bench.py full-suite protocol plus
  these guard fields). The driver's per-round bench run overwrites
  BENCH_FULL.json but never BATTERY.json, so the committed baseline
  survives driver hours and the guard compares battery-to-battery,
  not battery-to-whatever-hour-the-driver-got.

* The shared host swings 1.4-1.7x between hours (the r8/r9 control
  experiments), so a raw now/prev ratio flags half the suite in a bad
  hour. The guard divides by the battery-level HOST FACTOR — the
  median now/prev ratio over all shared queries — and flags only
  queries whose adjusted ratio still exceeds ``threshold`` (1.5x).
  A genuinely regressed query moves against the whole battery; host
  weather moves the battery together.

* Every flagged query needs a WOBBLE.json ledger entry BOUND to the
  flagging battery (``battery_value`` equal to the battery's best-of
  for that query) — a wobble run against last month's numbers proves
  nothing. ``tools/solo_wobble.py`` writes the ledger.

tests/test_scale_coverage.py::test_committed_battery_regressions_are_wobbled
is the gate; test_battery_guard_flags_seeded_mutant proves the guard
actually fires.
"""

from __future__ import annotations

import json
import os
from statistics import median

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

THRESHOLD = 1.5
# queries faster than this in the PREVIOUS battery are never flagged:
# sub-second timings are scheduler noise at suite level and a 0.3s ->
# 0.5s swing is not a regression anyone can wobble reproducibly
MIN_PREV_SEC = 1.0


def host_factor(prev_queries: dict, now_queries: dict) -> float:
    """Median now/prev ratio over shared queries with prev >=
    MIN_PREV_SEC — the battery-level host-weather factor, computed
    over the SAME population the flags are drawn from (ADVICE r10:
    sub-second queries' noisy ratios would otherwise skew the factor
    every real flag is adjusted by). 1.0 when there is no usable
    overlap."""
    ratios = [
        now_queries[q] / prev_queries[q]
        for q in prev_queries
        if q in now_queries and prev_queries[q] >= MIN_PREV_SEC
    ]
    return median(ratios) if ratios else 1.0


def regressions_vs_prev(
    prev_queries: dict, now_queries: dict, threshold: float = THRESHOLD
) -> tuple[float, dict]:
    """(host_factor, {query: {prev, now, adj_ratio}}) for every shared
    query whose host-adjusted ratio exceeds ``threshold``."""
    hf = host_factor(prev_queries, now_queries)
    out = {}
    for q, prev in prev_queries.items():
        if q not in now_queries or prev < MIN_PREV_SEC:
            continue
        adj = (now_queries[q] / prev) / hf
        if adj > threshold:
            out[q] = {
                "prev": prev,
                "now": now_queries[q],
                "adj_ratio": round(adj, 3),
            }
    return hf, out


def unwobbled(battery: dict, wobble: dict) -> list[str]:
    """Flagged queries lacking a ledger entry bound to THIS battery.

    A ledger entry exonerates (or triages) a flag only if its
    ``battery_value`` matches the battery's best-of for the query —
    the proof the wobble ran after the battery that flagged it — and
    it carries a non-empty ``verdict``.
    """
    missing = []
    for q in battery.get("regressions_vs_prev", {}):
        row = wobble.get(q)
        if (
            not isinstance(row, dict)
            or row.get("battery_value") != battery["queries"].get(q)
            or not row.get("verdict")
        ):
            missing.append(q)
    return sorted(missing)


def load(name: str) -> dict:
    path = os.path.join(ROOT, name)
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        return json.load(f)
