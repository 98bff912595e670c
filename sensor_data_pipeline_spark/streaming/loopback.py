"""Vendored loopback MQTT client: the paho Client surface with a
file-spool "broker" behind it, so ``MqttPublisher``'s real wiring —
TLS setup, connect, network-loop start, per-message publish with QoS,
loop stop, disconnect — executes end-to-end in an environment with no
broker and no paho (reference broker behavior:
src/modules/libs/mqtt.c:80-89, src/modules/dd/producer.c:152-161).

The spool is file-based because foreach writers run in executor worker
processes: an in-memory list on the driver can never observe them. Each
client instance appends its lifecycle events and publishes to its own
file (pid + object id), so concurrent partitions never interleave
writes; ``read_events`` merges them for assertions.

Protocol checks are strict where the reference's broker would be:
publishing while unconnected raises (a silently dropped message is the
worst failure mode a QoS-1 path can have).
"""

from __future__ import annotations

import json
import os
from typing import Any


class LoopbackMqttClient:
    """Drop-in for ``paho.mqtt.client.Client`` backed by a spool dir.

    Construct via ``functools.partial(LoopbackMqttClient, spool_dir)``
    and pass that as ``MqttPublisher(client_factory=...)`` — partials
    over module-level classes pickle cleanly into foreach workers.
    """

    def __init__(self, spool_dir: str) -> None:
        self._dir = spool_dir
        self._connected = False
        self._loop_running = False
        self._tls: dict[str, Any] | None = None
        self._path: str | None = None

    def _record(self, kind: str, **detail: Any) -> None:
        if self._path is None:
            os.makedirs(self._dir, exist_ok=True)
            self._path = os.path.join(self._dir, f"client-{os.getpid()}-{id(self):x}.jsonl")
        with open(self._path, "a") as f:
            f.write(json.dumps({"kind": kind, **detail}) + "\n")

    # --- paho Client surface -------------------------------------------
    def tls_set(self, **kwargs: Any) -> None:
        self._tls = kwargs

    def connect(self, host: str, port: int, keepalive: int) -> None:
        self._connected = True
        self._record("connect", host=host, port=port, keepalive=keepalive, tls=self._tls is not None)

    def loop_start(self) -> None:
        if not self._connected:
            raise RuntimeError("loop_start before connect")
        self._loop_running = True
        self._record("loop_start")

    def publish(self, topic: str, payload: str, qos: int = 0) -> None:
        if not self._connected:
            raise RuntimeError(f"publish to {topic!r} while not connected")
        self._record("publish", topic=topic, payload=payload, qos=qos)

    def loop_stop(self) -> None:
        self._loop_running = False
        self._record("loop_stop")

    def disconnect(self) -> None:
        self._connected = False
        self._record("disconnect")


def read_events(spool_dir: str) -> list[dict[str, Any]]:
    """All recorded events across clients, per-file order preserved."""
    import glob

    out: list[dict[str, Any]] = []
    for path in sorted(glob.glob(f"{spool_dir}/client-*.jsonl")):
        with open(path) as f:
            out.extend(json.loads(line) for line in f)
    return out
