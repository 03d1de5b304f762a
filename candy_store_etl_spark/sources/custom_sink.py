"""Custom Python DataSource WRITER: manifest-committed JSONL reports.

The reader twin (``custom_source.py``) replaces the reference's
per-day Mongo scan loop; this module completes the connector story in
the write direction — the shape a real Mongo/warehouse write-back
connector takes (the reference writes its reports from the driver,
`data_processor.py:62-85`, one file at a time).

Commit protocol (the part worth copying): each task writes its rows to
a task-private staging file and reports it in a ``WriterCommitMessage``;
only the driver's ``commit()`` — which runs once, after every task
succeeded — renames staged files into place and writes a
``manifest.json`` naming them all with row counts. A reader that
honors the manifest never sees partial output from a failed or
speculatively-retried task (Spark may run duplicate attempts; the
losing attempt's staging file is simply never manifested). This is the
same two-phase scheme Spark's own FileOutputCommitter uses, expressed
in the Python DataSource API.

Caveats (by construction of the local-rename protocol):
- The driver renames files written by executor tasks, so driver and
  executors must share a filesystem (true in local mode and on any
  shared mount; an object-store deployment would move the rename into
  a per-task commit or use a path-listing manifest instead).
- ``abort()`` can only remove staging files whose commit messages
  reached the driver; a task that died before returning one leaves a
  ``.….staging`` stray. An overwrite-mode ``commit()`` sweeps strays;
  in append mode they persist on disk but are never manifested, so
  manifest-honoring readers never see them.
"""

from __future__ import annotations

import json
import os
import uuid
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceWriter, WriterCommitMessage
from pyspark.sql.types import Row


class _PartFile(WriterCommitMessage):
    def __init__(self, staged: str, final: str, rows: int) -> None:
        self.staged = staged
        self.final = final
        self.rows = rows


class CandyReportsWriter(DataSourceWriter):
    def __init__(self, options: dict, overwrite: bool) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("candy_reports requires option 'path'")
        self.overwrite = overwrite

    def write(self, iterator: Iterator[Row]) -> WriterCommitMessage:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        # attempt-unique staging name: a speculative duplicate attempt
        # writes its own file, and only the attempt whose message
        # reaches commit() is manifested
        name = f"part-{pid:05d}-{uuid.uuid4().hex}.jsonl"
        os.makedirs(self.path, exist_ok=True)
        staged = os.path.join(self.path, f".{name}.staging")
        n = 0
        with open(staged, "w", encoding="utf-8") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict(recursive=True), sort_keys=True))
                f.write("\n")
                n += 1
        return _PartFile(staged=staged, final=os.path.join(self.path, name), rows=n)

    def commit(self, messages) -> None:
        files = []
        for m in messages:
            os.rename(m.staged, m.final)
            files.append({"file": os.path.basename(m.final), "rows": m.rows})
        manifest = {
            "files": sorted(files, key=lambda e: e["file"]),
            "total_rows": sum(e["rows"] for e in files),
        }
        with open(os.path.join(self.path, "manifest.json"), "w") as f:
            json.dump(manifest, f, indent=2, sort_keys=True)
        if self.overwrite:
            # honor mode("overwrite"): drop every file from prior runs
            # (data files AND crashed-task staging strays) that this
            # commit did not produce. The sweep runs AFTER the renames
            # and the new manifest hit disk, so a crash at any point
            # leaves a manifest whose named files all still exist —
            # either the complete old snapshot or the complete new one
            # (possibly with stale extras that the next overwrite or a
            # manifest-honoring reader ignores).
            committed = {os.path.basename(m.final) for m in messages} | {
                "manifest.json"
            }
            for entry in os.listdir(self.path):
                if entry not in committed:
                    try:
                        os.remove(os.path.join(self.path, entry))
                    except OSError:
                        pass

    def abort(self, messages) -> None:
        for m in messages:
            try:
                os.remove(m.staged)
            except OSError:
                pass


class CandyReportsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "candy_reports"

    def writer(self, schema, overwrite: bool) -> CandyReportsWriter:
        return CandyReportsWriter(self.options, overwrite)
