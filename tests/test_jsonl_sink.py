"""JSONL Python-DataSource sink: commit visibility, overwrite, roundtrip."""

from __future__ import annotations

import json
import os

from ub_etl_spark.sources.jsonl_sink import register_jsonl_sink
from ub_etl_spark.sources.tables import load_table


def _read_all(path):
    rows = []
    for name in sorted(os.listdir(path)):
        if name.endswith(".jsonl"):
            with open(os.path.join(path, name), encoding="utf-8") as f:
                rows += [json.loads(line) for line in f]
    return rows


def test_write_commit_and_roundtrip(spark, sf_dir, tmp_path):
    register_jsonl_sink(spark)
    out = str(tmp_path / "out")
    os.makedirs(out)
    df = load_table(spark, sf_dir, "nation")
    df.write.format("jsonl_sink").option("path", out).mode("append").save()
    # _SUCCESS carries the committed row count; no staging residue
    assert os.path.exists(os.path.join(out, "_SUCCESS"))
    assert open(os.path.join(out, "_SUCCESS")).read() == str(df.count())
    assert not os.path.exists(os.path.join(out, "_staging"))
    rows = _read_all(out)
    assert len(rows) == df.count()
    got = {(r["n_nationkey"], r["n_name"]) for r in rows}
    want = {(r.n_nationkey, r.n_name) for r in df.collect()}
    assert got == want


def test_overwrite_replaces_previous_files(spark, sf_dir, tmp_path):
    register_jsonl_sink(spark)
    out = str(tmp_path / "out2")
    os.makedirs(out)
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    nation.write.format("jsonl_sink").option("path", out).mode("append").save()
    region.write.format("jsonl_sink").option("path", out).mode("overwrite").save()
    rows = _read_all(out)
    assert len(rows) == region.count()
    assert all("r_regionkey" in r for r in rows)


def test_append_preserves_previous_commits(spark, sf_dir, tmp_path):
    """Two append commits into one directory must BOTH survive — final
    part names are commit-tagged, so a second commit can never
    os.replace the first one's files."""
    register_jsonl_sink(spark)
    out = str(tmp_path / "out3")
    os.makedirs(out)
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    nation.write.format("jsonl_sink").option("path", out).mode("append").save()
    region.write.format("jsonl_sink").option("path", out).mode("append").save()
    rows = _read_all(out)
    assert len(rows) == nation.count() + region.count()
    assert any("n_nationkey" in r for r in rows)
    assert any("r_regionkey" in r for r in rows)
