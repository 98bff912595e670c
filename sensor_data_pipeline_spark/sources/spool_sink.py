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

The BATCH ``writer()`` side (round 8) completes the format: ``df.write
.format("jsonl_spool").option("path", d).mode("append"|"overwrite")
.save()`` runs the same two-phase protocol for batch jobs —
``_SUCCESS`` is the batch manifest (parts + row counts), the
atomically-replaced single visibility step. New parts carry
generation-unique names, so overwrite deletes the old generation only
AFTER the manifest swap (readers resolving through ``_SUCCESS`` see
old-or-new, never a mix, even across a crash at any commit point);
the next commit reconciles any unreferenced parts a crashed rename
phase left behind. Abort/commit also SWEEP stray ``.tmp-*`` spools: a
task that raises — or is killed when a sibling fails — never returns
its commit message, and a retried task leaves its first attempt's
temp even on a successful job, so the driver cannot enumerate leakage
by name; spool directories are single-writer (one job/stream at a
time — the side-effect-device model), which makes the sweep exact up
to one race: a sibling task async-killed mid-``write`` can recreate
its temp just after the sweep — that straggler is collected by the
NEXT commit/abort sweep (eventual cleanliness, never read meanwhile).
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    DataSourceWriter,
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
        _sweep_temps(self._dir)  # retried tasks' first-attempt temps

    def abort(self, messages, batchId: int) -> None:  # noqa: ARG002
        _abort_sweep(self._dir)


def _abort_sweep(spool_dir: str) -> None:
    """Abort-time sweep, repeated until QUIET: task kill is
    cooperative/async, so a sibling killed mid-``write`` can recreate
    its temp milliseconds after a sweep. A fixed settle-then-resweep
    (the first form) could still lose the race on a loaded host, so
    this polls — sweep, short sleep, resweep — until a pass finds no
    temps, bounded at ~2s total. A straggler landing after the bound
    is collected by the next commit/abort sweep (documented eventual
    cleanliness), but within the bound the directory is clean, which
    is what the abort-path test asserts immediately after abort."""
    import time

    _sweep_temps(spool_dir)
    deadline = time.monotonic() + 2.0
    while time.monotonic() < deadline:
        time.sleep(0.1)
        if not _sweep_temps(spool_dir):
            return


def _sweep_temps(spool_dir: str) -> int:
    """Remove every ``.tmp-*`` spool — not just the ones messages name.
    A task that raises (or is killed when a sibling fails) never
    returns its commit message, and a task retried after a transient
    failure leaves its first attempt's temp behind even on a
    SUCCESSFUL job, so the driver cannot enumerate leaked temps by
    name. Spool dirs are single-writer, making the sweep exact.
    Returns the number of temps removed (0 = the directory was quiet,
    which is _abort_sweep's stop condition)."""
    if not os.path.isdir(spool_dir):
        return 0
    removed = 0
    for name in os.listdir(spool_dir):
        if name.startswith(".tmp-"):
            try:
                os.remove(os.path.join(spool_dir, name))
                removed += 1
            except FileNotFoundError:
                pass
    return removed


class BatchSpoolCommitMessage(WriterCommitMessage):
    def __init__(self, tmp_path: str, n_rows: int) -> None:
        self.tmp_path = tmp_path
        self.n_rows = n_rows


class _JsonlSpoolBatchWriter(DataSourceWriter):
    """Batch twin of the stream writer: same temp-then-rename
    protocol, with ``_SUCCESS`` as the atomically-replaced batch
    manifest. ``fail_over`` is a test hook exercising the abort path:
    any numeric cell above it raises in the task."""

    def __init__(self, options: dict, overwrite: bool) -> None:
        self._dir = options.get("path")
        if not self._dir:
            raise ValueError("jsonl_spool requires option 'path'")
        self._overwrite = overwrite
        fail = options.get("fail_over")
        self._fail_over = int(fail) if fail is not None else None

    def write(self, iterator) -> BatchSpoolCommitMessage:
        os.makedirs(self._dir, exist_ok=True)
        tmp = os.path.join(self._dir, f".tmp-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(tmp, "w") as f:
            for row in iterator:
                d = row.asDict()
                if self._fail_over is not None:
                    for v in d.values():
                        if isinstance(v, (int, float)) and v > self._fail_over:
                            raise ValueError(
                                f"injected failure: {v} > {self._fail_over}"
                            )
                f.write(json.dumps(d) + "\n")
                n += 1
        if n == 0:
            os.remove(tmp)
            return BatchSpoolCommitMessage("", 0)
        return BatchSpoolCommitMessage(tmp, n)

    def commit(self, messages) -> None:
        # Driver-side, once, only after every task succeeded. The
        # old-or-new guarantee rests on ORDERING, not deletion-first:
        # new parts get generation-unique names (no collision with any
        # prior generation), the manifest swap is the single atomic
        # visibility step, and only THEN does overwrite delete the old
        # generation. A crash at any point leaves a readable dataset:
        # before the swap, readers still resolve the old manifest
        # (new-generation parts are unreferenced noise); after it, the
        # new one (old parts linger until reconciliation but are never
        # read). The review of the first form found the inverse order
        # destroyed the old dataset before the new manifest existed.
        success = os.path.join(self._dir, "_SUCCESS")
        old = {"parts": [], "total_rows": 0}
        if os.path.exists(success):
            with open(success) as f:
                old = json.load(f)
        old_names = {p["name"] for p in old["parts"]}
        # reconcile: on-disk parts referenced by NO manifest are
        # orphans of a commit that crashed between rename and swap —
        # the only point new-generation parts exist unreferenced
        for name in os.listdir(self._dir):
            if name.startswith("part-") and name not in old_names:
                os.remove(os.path.join(self._dir, name))
        gen = uuid.uuid4().hex[:8]
        # append mode copies `old` DEEPLY: a dict(old) shallow copy
        # would alias old["parts"], so the append below mutates `old`
        # too — a latent trap for any future read of `old` after here
        manifest = (
            {"parts": [], "total_rows": 0}
            if self._overwrite
            else {"parts": list(old["parts"]), "total_rows": old["total_rows"]}
        )
        for i, m in enumerate(m for m in messages if m and m.tmp_path):
            final = f"part-{gen}-{i}.jsonl"
            os.replace(m.tmp_path, os.path.join(self._dir, final))
            manifest["parts"].append({"name": final, "rows": m.n_rows})
            manifest["total_rows"] += m.n_rows
        # the atomic visibility step
        tmp_manifest = os.path.join(self._dir, f".tmp-manifest-{uuid.uuid4().hex}")
        with open(tmp_manifest, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp_manifest, success)
        if self._overwrite:
            for name in old_names:  # now unreferenced; safe to drop
                try:
                    os.remove(os.path.join(self._dir, name))
                except FileNotFoundError:
                    pass
        _sweep_temps(self._dir)  # retried tasks' first-attempt temps

    def abort(self, messages) -> None:  # noqa: ARG002
        _abort_sweep(self._dir)


class JsonlSpoolDataSource(DataSource):
    """``df.writeStream.format("jsonl_spool").option("path", dir)``
    after ``spark.dataSource.register(JsonlSpoolDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_spool"

    def streamWriter(self, schema, overwrite: bool) -> DataSourceStreamWriter:  # noqa: ARG002
        return _JsonlSpoolStreamWriter(self.options)

    def writer(self, schema, overwrite: bool) -> DataSourceWriter:  # noqa: ARG002
        return _JsonlSpoolBatchWriter(self.options, overwrite)


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
