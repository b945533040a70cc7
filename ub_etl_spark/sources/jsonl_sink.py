"""JSONL sink: the WRITE side of the Spark 4 Python DataSource surface.

The reference pipeline's sink is per-row INSERTs into PostgreSQL
(scripts/course_catalog.py:208-210, per-record transactions at :80); the
Spark-native replacement contract is batch-atomic, exactly-once file
output.  This sink demonstrates the full writer protocol on plain JSONL:

  - ``write(iterator)`` runs once per partition in a python worker and
    stages rows into a task-attempt temp file (never the final name);
  - each task returns a ``WriterCommitMessage`` carrying its temp path;
  - ``commit(messages)`` runs on the driver AFTER every task succeeded
    and atomically renames the staged files into place plus a _SUCCESS
    marker — a failed/speculated task's garbage is never visible;
  - ``abort()`` removes staged files on job failure.

That staging-rename shape is the same commit protocol Spark's file sinks
use, here made explicit and testable (tests/test_jsonl_sink.py covers
commit visibility and abort cleanup).
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)


@dataclass
class _StagedFile(WriterCommitMessage):
    staged_path: str
    rows: int


class JsonlWriter(DataSourceWriter):
    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl sink requires a 'path' option")
        self.overwrite = overwrite
        # final names carry a per-commit tag: append commits must never
        # collide with (and silently os.replace) an earlier commit's
        # part-NNNNN files
        self.commit_tag = uuid.uuid4().hex[:12]

    def write(self, iterator):
        """Per-partition: stage rows into a temp file, return its path."""
        os.makedirs(os.path.join(self.path, "_staging"), exist_ok=True)
        staged = os.path.join(self.path, "_staging", f"part-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(staged, "w", encoding="utf-8") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return _StagedFile(staged_path=staged, rows=n)

    def commit(self, messages):
        """Driver-side, after ALL tasks succeeded: atomic renames."""
        if self.overwrite:
            for name in os.listdir(self.path):
                if name.endswith(".jsonl") and not name.startswith("_"):
                    os.remove(os.path.join(self.path, name))
        total = 0
        for i, m in enumerate(messages):
            final = os.path.join(
                self.path, f"part-{self.commit_tag}-{i:05d}.jsonl"
            )
            os.replace(m.staged_path, final)
            total += m.rows
        # _SUCCESS records the LAST commit's row count (commit marker
        # semantics, like Spark's file sinks — not a directory total)
        with open(os.path.join(self.path, "_SUCCESS"), "w") as f:
            f.write(str(total))
        self._cleanup_staging()

    def abort(self, messages):
        for m in messages:
            if m is not None and os.path.exists(m.staged_path):
                os.remove(m.staged_path)
        self._cleanup_staging()

    def _cleanup_staging(self):
        staging = os.path.join(self.path, "_staging")
        if os.path.isdir(staging) and not os.listdir(staging):
            os.rmdir(staging)


class JsonlSink(DataSource):
    """``df.write.format("jsonl_sink").option("path", dir).save()``."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_sink"

    def writer(self, schema, overwrite: bool):
        return JsonlWriter(self.options, overwrite)


def register_jsonl_sink(spark) -> None:
    spark.dataSource.register(JsonlSink)
