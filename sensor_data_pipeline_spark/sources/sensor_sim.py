"""Custom Python DataSource: a deterministic sensor-fleet simulator.

The reference's sources are physical sensor scans on a tick loop —
DHT31 temp/humidity (src/modules/dd/producer.c:243-252), DL11 modbus
(src/modules/ch/ch.c:189-208), INA219 registers
(src/modules/module_rpi_ups_hat.c:130-180). SURVEY.md §2.1 maps them
to "custom streaming source"; this module is that source, built on
Spark 4's Python DataSource API (`pyspark.sql.datasource`) rather
than a rate-source stand-in:

- **batch reader**: one InputPartition per device — the scan
  parallelizes across the fleet exactly like a real ingest would
  (devices are the natural partition key; no shuffle to read);
- **stream reader**: offsets are tick counters; each micro-batch
  reads a tick range per device — the engine-side form of the
  reference's `collection_event_interval_ms` loop (event_loops.c:33).

Readings are a pure integer formula of (device, tick), so the source
is exactly reproducible anywhere — including in ANSI SQL for the
DuckDB oracle (q114) — and emits the reference's value shapes:
deci-°C integers (P2's input) and percent humidity doubles.
"""

from __future__ import annotations

from datetime import datetime, timedelta
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

SENSOR_SIM_SCHEMA = StructType(
    [
        StructField("device", StringType()),
        StructField("tick", LongType()),
        StructField("ts", TimestampType()),
        StructField("temp_deci_c", IntegerType()),
        StructField("rh", DoubleType()),
    ]
)

_EPOCH = datetime(2024, 1, 1)


def reading(device: int, tick: int) -> tuple:
    """The deterministic reading formula — shared by every partition
    and mirrored in the q114 oracle SQL (primes keep adjacent ticks
    uncorrelated; value ranges match the reference's sensors)."""
    base = (device * 7919 + tick * 104729) % 1000
    temp_deci_c = 180 + base % 150  # 18.0 .. 32.9 deci-°C (DL11 shape)
    rh = 40.0 + ((base * 31) % 400) / 10.0  # 40.0 .. 79.9 % (DHT31 shape)
    return (f"dev{device}", tick, _EPOCH + timedelta(seconds=tick), temp_deci_c, rh)


class _DevicePartition(InputPartition):
    def __init__(self, device: int, start_tick: int, end_tick: int) -> None:
        self.device = device
        self.start_tick = start_tick
        self.end_tick = end_tick


class _SensorSimBatchReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self._devices = int(options.get("devices", 4))
        self._ticks = int(options.get("ticks", 100))

    def partitions(self) -> list[InputPartition]:
        return [_DevicePartition(d, 0, self._ticks) for d in range(self._devices)]

    def read(self, partition: _DevicePartition) -> Iterator[tuple]:
        for t in range(partition.start_tick, partition.end_tick):
            yield reading(partition.device, t)


class _SensorSimStreamReader(SimpleDataSourceStreamReader):
    """Offsets are global tick counters; every micro-batch covers
    [start_tick, start_tick + ticksPerBatch) for all devices.

    Built on SimpleDataSourceStreamReader because its ``read(start)``
    receives the CHECKPOINTED position — progress is a pure function
    of the offset log, so a restarted query resumes exactly where it
    committed (a stateful latestOffset() counter would restart at 0
    and re-deliver). ``readBetweenOffsets`` replays any planned-but-
    uncommitted range deterministically; commit() is a no-op because
    the simulator is replayable from any offset. The trade: the simple
    reader ingests on the driver (fine for a simulator; the batch
    reader keeps the one-partition-per-device layout)."""

    def __init__(self, options: dict) -> None:
        self._devices = int(options.get("devices", 4))
        self._ticks_per_batch = int(options.get("ticksPerBatch", 10))
        self._max_ticks = int(options.get("maxTicks", 1_000_000))

    def initialOffset(self) -> dict:
        return {"tick": 0}

    def _rows(self, start_tick: int, end_tick: int) -> list[tuple]:
        # a materialized list, not a generator: the simple-reader
        # wrapper pickles the rows into its prefetch cache for replay
        return [
            reading(d, t)
            for d in range(self._devices)
            for t in range(start_tick, end_tick)
        ]

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        s = start["tick"]
        e = min(s + self._ticks_per_batch, self._max_ticks)
        e = max(e, s)  # never regress even if maxTicks shrank across restarts
        return iter(self._rows(s, e)), {"tick": e}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        return iter(self._rows(start["tick"], end["tick"]))

    def commit(self, end: dict) -> None:
        pass


class SensorSimDataSource(DataSource):
    """`spark.read.format("sensor_sim")` / `spark.readStream.format(
    "sensor_sim")` after `spark.dataSource.register(SensorSimDataSource)`.

    Options: devices (fleet size), ticks (batch row count per device),
    ticksPerBatch / maxTicks (stream pacing)."""

    @classmethod
    def name(cls) -> str:
        return "sensor_sim"

    def schema(self) -> StructType:
        return SENSOR_SIM_SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return _SensorSimBatchReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> SimpleDataSourceStreamReader:  # noqa: ARG002
        return _SensorSimStreamReader(self.options)


def register_sensor_sim(spark) -> None:
    spark.dataSource.register(SensorSimDataSource)
