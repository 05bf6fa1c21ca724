"""Spark 4 Python Data Source WRITER: a newline-JSON gold export with
real two-phase commit — the write-side completion of the Python Data
Source surface (``io/pyds.py`` covers batch + streaming READ).

The reference pipeline's terminal step uploads gold KPI blobs for a
BI consumer (final_kpis.py:52-58 writes the KPI JSON out through the
storage client); this module expresses that "export curated rows to a
feed consumers can read atomically" step as a first-class
``df.write.format("gold_export")`` sink instead of a driver loop.

Commit protocol (the part worth copying):

* **write (executors)** — each task serializes its partition to a
  STAGED file (``_staged-<partition>-<uuid>.jsonl``) and returns the
  filename + row count as its commit message.  Staged files are
  invisible to readers: consumers only ever read what the manifest
  lists.
* **commit (driver)** — renames every staged file to its final,
  **commit-unique** ``part-<txn>-<i>.jsonl`` name (txn is a fresh
  uuid per commit, so no generation ever reuses a previous
  generation's filename) and THEN writes ``_MANIFEST.json`` (file
  list + per-file and total row counts) last; the manifest write is
  the single atomicity point, so a reader sees the old export or the
  new one, never a torn mix — a reader holding the OLD manifest keeps
  reading the old generation's (untouched) files mid-commit, and a
  crash before the manifest swap leaves the old manifest pointing at
  old bytes.  ``mode("overwrite")``: part files NOT listed by the new
  manifest (the superseded generation + any orphans from crashed
  commits) are removed only after the new manifest lands.
  ``mode("append")`` is a real append: the new manifest lists the
  previous manifest's files plus the new ones, and nothing is
  deleted — prior committed rows stay visible.
* **abort (driver)** — deletes whatever staged files the failed job
  managed to produce; the previous manifest (if any) stays intact.

Values are serialized with explicit keys per the DataFrame schema
(string/long/double only — the export contract; cast timestamps to
strings upstream), so a read-back with the same explicit schema is
value-exact.  At scale the sink is embarrassingly parallel: one file
per task, no driver fan-in of data, commit touches filenames only.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)

MANIFEST = "_MANIFEST.json"


@dataclass
class ExportCommit(WriterCommitMessage):
    staged: str
    rows: int


class GoldExportWriter(DataSourceWriter):
    def __init__(self, options: dict, schema, overwrite: bool) -> None:
        self.path = options["path"]
        self.fields = [f.name for f in schema.fields]
        self.overwrite = overwrite

    def write(self, iterator) -> ExportCommit:
        from pyspark import TaskContext

        os.makedirs(self.path, exist_ok=True)
        pid = TaskContext.get().partitionId()
        name = f"_staged-{pid}-{uuid.uuid4().hex}.jsonl"
        n = 0
        with open(os.path.join(self.path, name), "w") as fh:
            for row in iterator:
                fh.write(
                    json.dumps(
                        {k: row[k] for k in self.fields}, sort_keys=True
                    )
                )
                fh.write("\n")
                n += 1
            fh.flush()
            os.fsync(fh.fileno())
        return ExportCommit(staged=name, rows=n)

    def commit(self, messages) -> None:
        previous: list[dict] = []
        mpath = os.path.join(self.path, MANIFEST)
        if os.path.exists(mpath):
            with open(mpath) as fh:
                previous = json.load(fh)["files"]
        # commit-unique final names: a new generation NEVER reuses a
        # previous generation's filename, so the renames below cannot
        # mutate any file the still-live old manifest lists (no torn
        # reads), and a crash before the manifest swap leaves the old
        # manifest pointing at intact old bytes.
        txn = uuid.uuid4().hex[:12]
        files = []
        for i, m in enumerate(sorted(
            (m for m in messages if m is not None), key=lambda m: m.staged
        )):
            final = f"part-{txn}-{i:05d}.jsonl"
            os.replace(
                os.path.join(self.path, m.staged),
                os.path.join(self.path, final),
            )
            files.append({"name": final, "rows": m.rows})
        if not self.overwrite:
            # real append: prior generations stay listed (and visible)
            files = previous + files
        # the manifest write is the commit point: readers resolve the
        # export through it, so everything above is invisible until here
        tmp = mpath + f".{uuid.uuid4().hex}.tmp"
        with open(tmp, "w") as fh:
            json.dump(
                {"files": files, "total_rows": sum(f["rows"] for f in files)},
                fh,
            )
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, mpath)
        # GC stray manifest tmps from crashed commits (invisible to
        # readers — they resolve only the exact manifest name — but
        # they'd otherwise accumulate forever).  Only tmps older than
        # an hour are reaped (ADVICE r11): a concurrent writer's
        # in-flight tmp is seconds old, and deleting it would make its
        # os.replace fail — this keeps the GC from widening the
        # already-racy concurrent-writers window.
        now = time.time()
        for name in os.listdir(self.path):
            if name.startswith(MANIFEST + ".") and name.endswith(".tmp"):
                full = os.path.join(self.path, name)
                try:
                    if now - os.path.getmtime(full) > 3600:
                        os.remove(full)
                except FileNotFoundError:
                    pass
        if self.overwrite:
            # only after the manifest swap: drop every part file the new
            # manifest does not list — the superseded generation plus
            # any orphans left by crashed commits.  A reader that loaded
            # the old manifest before the swap may briefly see deleted
            # files; that is the same read-after-overwrite hazard every
            # snapshot store has, and it never yields torn/mixed rows.
            kept = {f["name"] for f in files}
            for name in os.listdir(self.path):
                if (
                    name.startswith("part-")
                    and name.endswith(".jsonl")
                    and name not in kept
                ):
                    try:
                        os.remove(os.path.join(self.path, name))
                    except FileNotFoundError:
                        pass

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None:
                try:
                    os.remove(os.path.join(self.path, m.staged))
                except FileNotFoundError:
                    pass


class GoldExportDataSource(DataSource):
    """``df.write.format("gold_export").option("path", ...).save()``"""

    @classmethod
    def name(cls) -> str:
        return "gold_export"

    def writer(self, schema, overwrite: bool) -> GoldExportWriter:
        return GoldExportWriter(self.options, schema, overwrite)

    def streamWriter(self, schema, overwrite: bool) -> "GoldExportStreamWriter":
        return GoldExportStreamWriter(self.options, schema)


def read_export(spark, path: str, schema):
    """Read a committed export: manifest-listed part files ONLY (staged
    or orphaned files are never visible), with the explicit schema the
    export contract guarantees round-trips value-exact."""
    with open(os.path.join(path, MANIFEST)) as fh:
        manifest = json.load(fh)
    files = [os.path.join(path, f["name"]) for f in manifest["files"]]
    if not files:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).json(files)


class GoldExportStreamWriter(DataSourceStreamWriter):
    """Streaming twin of :class:`GoldExportWriter`: one manifest PER
    MICRO-BATCH (``_MANIFEST-<batchId>.json``), written last, with
    **idempotent batch commit** — if a restarted query replays a batch
    whose manifest already exists (the checkpoint said "in flight" but
    the commit actually landed), the replayed batch's staged files are
    discarded instead of double-publishing rows.  That turns Structured
    Streaming's at-least-once sink contract into exactly-once
    visibility for manifest-resolving readers, the same trick file/
    Delta sinks use (transaction log keyed by batch id).

    Part files are ``part-<batchId>-<i>.jsonl`` so batches never
    collide; abort removes only the aborted batch's staged files and
    already-committed manifests stay intact.
    """

    def __init__(self, options: dict, schema) -> None:
        self.path = options["path"]
        self.fields = [f.name for f in schema.fields]

    def write(self, iterator) -> ExportCommit:
        from pyspark import TaskContext

        os.makedirs(self.path, exist_ok=True)
        pid = TaskContext.get().partitionId()
        name = f"_staged-{pid}-{uuid.uuid4().hex}.jsonl"
        n = 0
        with open(os.path.join(self.path, name), "w") as fh:
            for row in iterator:
                fh.write(
                    json.dumps(
                        {k: row[k] for k in self.fields}, sort_keys=True
                    )
                )
                fh.write("\n")
                n += 1
            fh.flush()
            os.fsync(fh.fileno())
        return ExportCommit(staged=name, rows=n)

    def _manifest_path(self, batch_id: int) -> str:
        return os.path.join(self.path, f"_MANIFEST-{batch_id}.json")

    def commit(self, messages, batchId: int) -> None:
        live = [m for m in messages if m is not None]
        if os.path.exists(self._manifest_path(batchId)):
            # replay of an already-committed batch after a restart:
            # its rows are already visible — discard, don't duplicate
            for m in live:
                try:
                    os.remove(os.path.join(self.path, m.staged))
                except FileNotFoundError:
                    pass
            return
        files = []
        for i, m in enumerate(sorted(live, key=lambda m: m.staged)):
            final = f"part-{batchId}-{i:05d}.jsonl"
            os.replace(
                os.path.join(self.path, m.staged),
                os.path.join(self.path, final),
            )
            files.append({"name": final, "rows": m.rows})
        tmp = self._manifest_path(batchId) + f".{uuid.uuid4().hex}.tmp"
        with open(tmp, "w") as fh:
            json.dump(
                {
                    "batch_id": batchId,
                    "files": files,
                    "total_rows": sum(f["rows"] for f in files),
                },
                fh,
            )
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, self._manifest_path(batchId))
        # GC stray manifest tmps a crashed attempt of THIS batch left
        # behind (reader-invisible; see the batch writer's commit)
        stem = f"_MANIFEST-{batchId}.json."
        for name in os.listdir(self.path):
            if name.startswith(stem) and name.endswith(".tmp"):
                try:
                    os.remove(os.path.join(self.path, name))
                except FileNotFoundError:
                    pass

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m is not None:
                try:
                    os.remove(os.path.join(self.path, m.staged))
                except FileNotFoundError:
                    pass


def read_stream_export(spark, path: str, schema):
    """Read every committed micro-batch of a streaming export: the
    union of all per-batch manifests' part files (staged/aborted files
    stay invisible, replayed batches appear once)."""
    import re

    files: list[str] = []
    for name in sorted(os.listdir(path)):
        if re.fullmatch(r"_MANIFEST-\d+\.json", name):
            with open(os.path.join(path, name)) as fh:
                manifest = json.load(fh)
            files += [
                os.path.join(path, f["name"]) for f in manifest["files"]
            ]
    if not files:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).json(files)
