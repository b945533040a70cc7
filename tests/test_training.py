"""Training-pipeline operator tests (SURVEY.md B11-B15): split stability,
text folding, vocabulary counts, embedding quantization invariants."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from ub_etl_spark.operators.training import (
    dedup_normalized_exact,
    hash_bucket,
    l2_normalize_quantize,
    ngram_counts,
    normalize_text,
    train_val_test_split,
)


def test_split_is_stable_and_row_independent(spark):
    """Membership depends only on the id: subsetting the corpus must not
    move any row between splits (the property hash-splits exist for)."""
    full = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    sub = full.filter(F.col("doc_id") % 3 == 0)
    f = {r.doc_id: r.split for r in train_val_test_split(full, "doc_id").collect()}
    s = {r.doc_id: r.split for r in train_val_test_split(sub, "doc_id").collect()}
    assert all(f[k] == v for k, v in s.items())


def test_split_fractions_approximate(spark):
    df = train_val_test_split(
        spark.range(0, 10000).withColumnRenamed("id", "doc_id"), "doc_id"
    )
    counts = {r.split: r.n for r in df.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert abs(counts["train"] / 10000 - 0.80) < 0.03
    assert abs(counts["val"] / 10000 - 0.10) < 0.02
    assert abs(counts["test"] / 10000 - 0.10) < 0.02


def test_hash_bucket_range(spark):
    df = spark.range(0, 500).select(hash_bucket(F.col("id"), 7).alias("b"))
    got = {r.b for r in df.collect()}
    assert got == set(range(7))


def test_normalize_text_folds_variants(spark):
    df = spark.createDataFrame(
        [("The  QUICK, brown fox!",), ("the quick brown fox",)], "t string"
    )
    got = {r.n for r in df.select(normalize_text(F.col("t")).alias("n")).collect()}
    assert got == {"the quick brown fox"}


def test_dedup_normalized_exact_merges_variants(spark):
    df = spark.createDataFrame(
        [
            (1, "Hello,   World!"),
            (2, "hello world"),
            (3, "a different doc"),
        ],
        "doc_id long, text string",
    )
    got = {(r.doc_id, r.n_members) for r in dedup_normalized_exact(df, "doc_id", "text").collect()}
    assert got == {(1, 2), (3, 1)}


def test_ngram_counts_bigrams(spark):
    df = spark.createDataFrame([("a b a b",), ("a b",)], "text string")
    got = {(r.ngram, r.n_occurrences) for r in ngram_counts(df, "text", n=2).collect()}
    assert got == {("a b", 3), ("b a", 1)}


def test_ngram_top_k_deterministic_ties(spark):
    df = spark.createDataFrame([("x y",), ("y z",), ("z w",)], "text string")
    top2 = [
        (r.ngram, r.n_occurrences)
        for r in ngram_counts(df, "text", n=2, top_k=2)
        .orderBy(F.desc("n_occurrences"), "ngram")
        .collect()
    ]
    # all count 1 -> lexicographically smallest two ngrams win
    assert top2 == [("x y", 1), ("y z", 1)]


def test_quantize_unit_norm_and_bounds(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(50)
    out = l2_normalize_quantize(emb, "vec_id", "embedding").collect()
    assert len(out) == 50
    for r in out:
        assert all(-128 <= q <= 127 for q in r.qvec)
        # dequantized vector must be approximately unit-norm
        deq = [q / 127.0 for q in r.qvec]
        n = math.sqrt(sum(x * x for x in deq))
        # floor() rounds toward -inf: each component may gain up to 1/127
        # magnitude, so the norm may inflate to at most 1 + sqrt(64)/127
        assert 0.8 <= n <= 1.07, n


# ---------------------------------------------------------------------------
# timeseries_gapfill (SURVEY.md B38)
# ---------------------------------------------------------------------------


def test_gapfill_fills_interior_gaps_only(spark, monkeypatch, tmp_path):
    """3-day gap between two observations: interior days are flagged and
    carry the last observed value; the series starts/ends on observed
    days (no extrapolation beyond the key's own span)."""
    from datetime import datetime

    import ub_etl_spark.queries.timeseries as ts

    events = spark.createDataFrame(
        [
            (7, datetime(2024, 1, 1, 5), 2.0),
            (7, datetime(2024, 1, 1, 9), 3.0),  # same day: sums to 5.0
            (7, datetime(2024, 1, 4, 1), 9.0),
            (8, datetime(2024, 2, 1, 0), 1.0),  # single-day key: no gaps
        ],
        "user_id long, ts timestamp, value double",
    )
    monkeypatch.setattr(ts, "T", lambda spark, sf, name: events)
    out = sorted(
        (r.user_id, str(r.d), r.filled_value, r.is_gap)
        for r in ts.timeseries_gapfill(spark, "ignored").collect()
    )
    assert out == [
        (7, "2024-01-01", 5.0, False),
        (7, "2024-01-02", 5.0, True),
        (7, "2024-01-03", 5.0, True),
        (7, "2024-01-04", 9.0, False),
        (8, "2024-02-01", 1.0, False),
    ]
