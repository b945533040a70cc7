"""Transaction-log semantics (operators/txlog.py): atomic commits,
optimistic concurrency, snapshot isolation, time travel."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest

from ub_etl_spark.operators.txlog import VersionConflict, VersionedTable


@pytest.fixture()
def table_dir():
    d = tempfile.mkdtemp(prefix="ub_etl_txlog_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _ids(spark, t, version=None):
    return sorted(r.id for r in t.read(spark, version=version).collect())


def test_append_overwrite_and_time_travel(spark, table_dir):
    t = VersionedTable(table_dir)
    v1 = t.write_commit(spark.range(0, 3).withColumnRenamed("id", "id"), "append")
    v2 = t.write_commit(spark.range(10, 12), "append")
    v3 = t.write_commit(spark.range(100, 101), "overwrite")
    assert (v1, v2, v3) == (1, 2, 3)
    assert _ids(spark, t, 1) == [0, 1, 2]
    assert _ids(spark, t, 2) == [0, 1, 2, 10, 11]
    assert _ids(spark, t, 3) == [100]
    assert _ids(spark, t) == [100]  # head = v3
    # overwrite was LOGICAL: v1/v2 files still on disk, history readable
    assert _ids(spark, t, 2) == [0, 1, 2, 10, 11]


def test_optimistic_concurrency_exactly_one_winner(spark, table_dir):
    t = VersionedTable(table_dir)
    t.write_commit(spark.range(0, 2), "append")
    head = t.latest_version()
    # two writers base their work on the same head; the second to commit
    # must get a conflict, and its staged files must not become visible
    t.write_commit(spark.range(5, 6), "append", expected_version=head)
    before = set(t.snapshot_files())
    with pytest.raises(VersionConflict):
        t.write_commit(spark.range(7, 8), "append", expected_version=head)
    assert set(t.snapshot_files()) == before
    assert 7 not in _ids(spark, t)


def test_snapshot_isolation_ignores_unreferenced_files(spark, table_dir):
    t = VersionedTable(table_dir)
    t.write_commit(spark.range(0, 2), "append")
    # simulate a writer that staged data files but has not committed:
    # drop a parquet dir into the table root, bypassing the log
    stray = os.path.join(table_dir, "part-stray")
    spark.range(50, 60).write.parquet(stray)
    assert _ids(spark, t) == [0, 1]  # invisible: readers list the log


def test_commit_log_is_dense_and_replayable(spark, table_dir):
    t = VersionedTable(table_dir)
    for i in range(5):
        t.write_commit(spark.range(i, i + 1), "append")
    assert t.latest_version() == 5
    assert _ids(spark, t, 5) == [0, 1, 2, 3, 4]
    # deleting a middle entry makes replay fail loudly, not silently skip
    os.remove(os.path.join(table_dir, "_txlog", "00000003.json"))
    with pytest.raises(ValueError):
        t.snapshot_files(5)


def test_stats_table_skips_files_and_loses_nothing(spark, table_dir):
    """Manifest min/max pruning: the probe opens strictly fewer files
    than live, and pruned-read + exact filter equals the full-scan
    filter exactly (superset guarantee)."""
    from pyspark.sql import functions as F

    from ub_etl_spark.operators.txlog import StatsTable

    t = StatsTable(table_dir, stats_cols=["v"])
    df = spark.range(0, 10000).select(
        F.col("id"), (F.col("id") % 1000).cast("double").alias("v")
    )
    t.write_commit(df.repartitionByRange(10, "v"), mode="append")
    kept, total = t.pruned_files("v", 100.0, 199.0)
    assert total == 10
    assert 0 < len(kept) <= 3  # range clustering -> ~1-2 of 10 files
    got = sorted(
        r.id
        for r in t.read_pruned(spark, "v", 100.0, 199.0)
        .filter(F.col("v").between(100.0, 199.0))
        .collect()
    )
    expect = sorted(i for i in range(10000) if 100 <= i % 1000 <= 199)
    assert got == expect


def test_stats_table_keeps_files_without_stats(spark, table_dir):
    """A file with no recorded stats for the probe column is
    conservatively kept (pruning must never drop a candidate file)."""
    from ub_etl_spark.operators.txlog import StatsTable

    t = StatsTable(table_dir, stats_cols=["nonexistent_col"])
    t.write_commit(spark.range(0, 10), mode="append")
    kept, total = t.pruned_files("nonexistent_col", 0, 1)
    assert kept and len(kept) == total
