"""Custom Python DataSource stream writer: a two-phase-commit JSONL
spool sink (K1/K2 as a first-class ``format``, not just foreach).

The reference publishes each tick to MQTT with QoS levels
(src/modules/dd/producer.c:152-161 QoS 1, src/modules/hko/hko.cpp:69-72
QoS 2). ``streaming/sinks.py`` models that with foreach/foreachBatch;
this module is the formal sink-API form on Spark 4's
``DataSourceStreamWriter``:

- ``write(iterator)`` runs per partition and spools rows to a *temp*
  file, returning its path in the commit message;
- ``commit(messages, batchId)`` renames the temps to
  ``epoch{batchId}-part{N}.jsonl`` and then writes the epoch's
  MANIFEST (one atomic ``os.replace``) listing exactly those parts.
  Readers resolve files through manifests only, so an epoch becomes
  visible in a single atomic step, a torn commit (some parts renamed,
  no manifest) is invisible, and a replayed epoch that produces a
  different partition count simply re-points its manifest — stale
  part files from the crashed attempt are never read;
- ``abort`` deletes the temps, so failed epochs leave nothing behind.

Paired with checkpointed offsets this is exactly-once end to end —
the same commit-protocol layering (data files + atomically swapped
metadata) that transactional table formats use, at spool-file scale.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    WriterCommitMessage,
)


class SpoolCommitMessage(WriterCommitMessage):
    def __init__(self, tmp_path: str, partition_id: int) -> None:
        self.tmp_path = tmp_path
        self.partition_id = partition_id


class _JsonlSpoolStreamWriter(DataSourceStreamWriter):
    def __init__(self, options: dict) -> None:
        self._dir = options.get("path")
        if not self._dir:
            raise ValueError("jsonl_spool requires option 'path'")

    def write(self, iterator) -> SpoolCommitMessage:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        os.makedirs(self._dir, exist_ok=True)
        tmp = os.path.join(self._dir, f".tmp-{uuid.uuid4().hex}-part{pid}.jsonl")
        n = 0
        with open(tmp, "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict()) + "\n")
                n += 1
        if n == 0:
            os.remove(tmp)
            return SpoolCommitMessage("", pid)
        return SpoolCommitMessage(tmp, pid)

    def commit(self, messages, batchId: int) -> None:
        parts = []
        for m in messages:
            if m and m.tmp_path:
                final = f"epoch{batchId}-part{m.partition_id}.jsonl"
                os.replace(m.tmp_path, os.path.join(self._dir, final))
                parts.append(final)
        # single atomic step that makes the epoch visible (and, on a
        # replay with different parallelism, atomically re-points it
        # away from any stale parts of a crashed earlier attempt)
        manifest_tmp = os.path.join(self._dir, f".tmp-manifest-{uuid.uuid4().hex}")
        with open(manifest_tmp, "w") as f:
            json.dump({"batch_id": batchId, "parts": parts}, f)
        os.replace(manifest_tmp, os.path.join(self._dir, f"epoch{batchId}.manifest"))

    def abort(self, messages, batchId: int) -> None:  # noqa: ARG002
        for m in messages:
            if m and m.tmp_path and os.path.exists(m.tmp_path):
                os.remove(m.tmp_path)


class JsonlSpoolDataSource(DataSource):
    """``df.writeStream.format("jsonl_spool").option("path", dir)``
    after ``spark.dataSource.register(JsonlSpoolDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_spool"

    def streamWriter(self, schema, overwrite: bool) -> DataSourceStreamWriter:  # noqa: ARG002
        return _JsonlSpoolStreamWriter(self.options)


def register_jsonl_spool(spark) -> None:
    spark.dataSource.register(JsonlSpoolDataSource)


def read_spool(spool_dir: str) -> list[dict]:
    """Read back every committed epoch, resolving part files through
    the manifests — uncommitted/torn/stale parts are invisible."""
    import glob

    out: list[dict] = []
    for mpath in sorted(glob.glob(os.path.join(spool_dir, "epoch*.manifest"))):
        with open(mpath) as mf:
            manifest = json.load(mf)
        for part in manifest["parts"]:
            with open(os.path.join(spool_dir, part)) as f:
                out.extend(json.loads(line) for line in f)
    return out
