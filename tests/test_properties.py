"""Property-based tests (hypothesis): the distributed as-of join must
agree with pandas.merge_asof on arbitrary inputs, and sessionization
must agree with a direct single-pass reference implementation."""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sensor_data_pipeline_spark.operators.joins import asof_join
from sensor_data_pipeline_spark.operators.sessionize import sessionize_by_sign_flip

_ts = st.integers(min_value=0, max_value=10_000)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    left_ts=st.lists(_ts, min_size=1, max_size=12),
    right=st.lists(st.tuples(_ts, st.integers(-100, 100)), min_size=1, max_size=12, unique_by=lambda t: t[0]),
)
def test_asof_join_matches_pandas_merge_asof(spark, left_ts, right):
    from pyspark.sql import functions as F

    left = spark.createDataFrame([("k", t) for t in left_ts], "k string, lts long").withColumn(
        "lts", F.timestamp_seconds("lts")
    )
    rdf = spark.createDataFrame([("k", t, float(v)) for t, v in right], "k string, rts long, v double")
    rdf = rdf.withColumn("rts", F.timestamp_seconds("rts"))
    got = {
        (r.k, r.lts): r.v
        for r in asof_join(left, rdf, on="k", left_ts="lts", right_ts="rts").collect()
    }

    lp = pd.DataFrame({"k": "k", "lts": pd.to_datetime(sorted(left_ts), unit="s")})
    rp = pd.DataFrame(
        {"k": "k", "rts": pd.to_datetime([t for t, _ in sorted(right)], unit="s"), "v": [float(v) for _, v in sorted(right)]}
    )
    want_df = pd.merge_asof(lp, rp, left_on="lts", right_on="rts", by="k", direction="backward")
    for row in want_df.itertuples(index=False):
        want_v = None if pd.isna(row.v) else row.v
        assert got[(row.k, row.lts.to_pydatetime())] == want_v


def _reference_sessions(signals: list[float]) -> list[int]:
    """Direct replay of the reference loop (module_rpi_ups_hat.c:253-258)."""
    out, sid, prev = [], 0, None
    for cur in signals:
        if prev is None or prev * cur <= 0:
            sid += 1
        out.append(sid)
        prev = cur
    return out


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(signals=st.lists(st.floats(-10, 10, allow_nan=False, width=32), min_size=1, max_size=30))
def test_sessionize_matches_reference_loop(spark, signals):
    rows = [("k", i, float(s)) for i, s in enumerate(signals)]
    df = spark.createDataFrame(rows, "k string, t int, sig double")
    got = [r.session_id for r in sessionize_by_sign_flip(df, ["k"], ["t"], "sig").orderBy("t").collect()]
    assert got == _reference_sessions([float(s) for s in signals])
