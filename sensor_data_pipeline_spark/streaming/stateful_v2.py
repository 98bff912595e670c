"""transformWithStateInPandas: the A1 prev-value memory on Spark 4's
StatefulProcessor API.

The reference keeps one scalar across ticks (`prev_current`,
src/modules/module_rpi_ups_hat.c:64,259) to compute per-tick deltas
and detect sign flips. `streaming/stateful.py` implements that with
applyInPandasWithState (the Spark 3 API); this module is the same
semantics on the Spark 4 replacement — ValueState through a
StatefulProcessorHandle, schema-checked state, per-key timers
available — so the engine covers both generations of the arbitrary
stateful API. Batch twin: ``lag(value) over (partition by k order by
ts)`` (q12's shape), which the test compares against.

Scale: state is one row of (double,) per key in the state store; the
stream shuffles once on the key, exactly like the Spark 3 form.

Runtime dependency: transformWithStateInPandas talks to the state
store through a protobuf wire protocol, so `google.protobuf` must be
installed (standard on cluster images; absent in this test container,
where the test importorskips — E3-style degradation, the
applyInPandasWithState twin in ``stateful.py`` covers the semantics).
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Iterator

import pandas as pd
from pyspark.sql.streaming.stateful_processor import StatefulProcessor, StatefulProcessorHandle
from pyspark.sql.types import DoubleType, StructField, StructType

if TYPE_CHECKING:
    from pyspark.sql import DataFrame

DELTA_OUTPUT_SCHEMA = (
    "k string, tick_ts timestamp, value double, delta double"
)

_STATE_SCHEMA = StructType([StructField("prev", DoubleType())])


class PrevValueDeltaProcessor(StatefulProcessor):
    """Per-key previous-value memory: emits each row with its delta
    from the immediately preceding row of the same key (null for the
    key's first row ever), across micro-batch boundaries."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._prev = handle.getValueState("prev", _STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:  # noqa: ARG002
        prev = self._prev.get()[0] if self._prev.exists() else None
        # A key's micro-batch rows can arrive as SEVERAL Arrow chunks in
        # arbitrary order (chunking is by batch size, not time) — concat
        # and sort ONCE; per-chunk sorting with chained prev would
        # interleave wrongly whenever a later chunk holds earlier rows.
        chunks = list(rows)
        if not chunks:
            return
        out = (
            pd.concat(chunks, ignore_index=True)
            .sort_values("tick_ts", kind="mergesort")
            .reset_index(drop=True)
        )
        deltas = out["value"].diff()
        if prev is not None:
            deltas.iloc[0] = out["value"].iloc[0] - prev
        out["delta"] = deltas
        self._prev.update((float(out["value"].iloc[-1]),))
        yield out[["k", "tick_ts", "value", "delta"]]

    def close(self) -> None:
        pass


def delta_stream(readings: "DataFrame") -> "DataFrame":
    """Streaming per-key delta over (k, tick_ts, value) rows via
    transformWithStateInPandas."""
    return readings.groupBy("k").transformWithStateInPandas(
        statefulProcessor=PrevValueDeltaProcessor(),
        outputStructType=DELTA_OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="none",
    )
