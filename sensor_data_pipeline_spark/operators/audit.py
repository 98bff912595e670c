"""Pipeline observability: zero-cost audit metrics riding the job.

The reference syslogs every reading change as its observability story
(`src/utils.h:7-8`, `src/modules/dd/producer.c:262-265`). The Spark
analog for batch plans is ``DataFrame.observe``: named aggregate
metrics accumulated DURING the action — no second scan, no extra
shuffle — and read on the driver after the action completes. The
streaming analog is the ``StreamingQueryListener`` wired in
streaming/sinks.py.

Use this to make every production load self-auditing: row counts,
null counts on critical keys, and value bounds come back with the
write instead of a follow-up validation query over 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def observed_audit(
    df: DataFrame,
    name: str = "audit",
    key_cols: tuple[str, ...] = (),
    extra: dict[str, Column] | None = None,
) -> tuple[DataFrame, Observation]:
    """Attach an audit observation to ``df``.

    Default metrics: ``n_rows`` plus ``n_null_<col>`` for each key
    column (a non-zero null count on a join/dedup key is the classic
    silent-corruption signal). ``extra`` adds caller aggregates.
    Returns (df, observation); read ``observation.get`` after the
    next action on ``df`` completes.
    """
    metrics: dict[str, Column] = {"n_rows": F.count(F.lit(1))}
    for c in key_cols:
        metrics[f"n_null_{c}"] = F.count(F.when(F.col(c).isNull(), 1))
    if extra:
        metrics.update(extra)
    obs = Observation(name)
    first, *rest = [v.alias(k) for k, v in metrics.items()]
    return df.observe(obs, first, *rest), obs
