"""Randomized property tests for the reproducibility contracts of the
curation/training tier (deterministic seeds; one Spark job per property).

The contracts under test are exactly what a 100 TB pipeline relies on:
hash decisions computable by any engine, split membership immune to
corpus growth, mixing membership monotone in the target weight, and the
packer matching its sequential model on adversarial size mixes.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from ub_etl_spark.operators.curation import mix_weighted_sources, pack_sequences
from ub_etl_spark.operators.training import _KNUTH, hash_bucket, train_val_test_split


def _py_bucket(x: int, n: int) -> int:
    return ((x * _KNUTH) % 2**32) % n


def test_hash_bucket_cross_impl(spark):
    """Spark's hash_bucket equals the pure-integer model on random ids —
    the property that lets ANY engine (DuckDB oracle, a validator, a
    downstream consumer) recompute membership decisions."""
    rng = np.random.RandomState(7)
    ids = [int(x) for x in rng.randint(0, 2**31 - 1, size=2000)]
    df = spark.createDataFrame([(i,) for i in ids], "id long")
    got = {
        r.id: (r.b100, r.b8)
        for r in df.select(
            "id",
            hash_bucket(F.col("id"), 100).alias("b100"),
            hash_bucket(F.col("id"), 8).alias("b8"),
        ).collect()
    }
    for i in ids:
        assert got[i] == (_py_bucket(i, 100), _py_bucket(i, 8))


def test_split_stable_under_corpus_growth(spark):
    """Adding rows never changes existing rows' split — the core
    reproducibility contract of hash-of-id splitting."""
    base = [(i,) for i in range(0, 4000, 3)]
    extra = [(i,) for i in range(1, 4000, 3)]
    small = spark.createDataFrame(base, "doc_id long")
    big = spark.createDataFrame(base + extra, "doc_id long")
    s1 = {r.doc_id: r.split for r in train_val_test_split(small, "doc_id").collect()}
    s2 = {r.doc_id: r.split for r in train_val_test_split(big, "doc_id").collect()}
    for k, v in s1.items():
        assert s2[k] == v


def test_mix_membership_monotone_in_weight(spark):
    """Raising the target weight only ever ADDS members (hash < w is
    monotone in w) — re-balancing a mix never churns the kept set."""
    df = spark.createDataFrame([(i,) for i in range(5000)], "doc_id long")
    kept = {}
    for w in (20, 50, 80):
        kept[w] = {
            r.doc_id
            for r in mix_weighted_sources(
                df, "doc_id", F.lit(w), decorrelate=F.lit(0).cast("bigint")
            ).collect()
        }
    assert kept[20] <= kept[50] <= kept[80]
    # and the rates land near target on a uniform id space
    for w in (20, 50, 80):
        assert abs(len(kept[w]) / 5000 - w / 100) < 0.05


def test_mix_decorrelated_from_split(spark):
    """Mixing membership must be statistically independent of the split
    hash: within a mixed-down stratum, the train/val/test proportions stay
    ~80/10/10.  (An additive decorrelation constant fails this — the hash
    is affine, so adding d only rotates buckets and one stratum can lose
    its entire val band.)"""
    df = spark.createDataFrame([(i,) for i in range(20000)], "doc_id long")
    for d in (4000012, 1000003, 17000051):  # per-stratum constants
        kept = mix_weighted_sources(
            df, "doc_id", F.lit(50), decorrelate=F.lit(d).cast("bigint")
        )
        splits = {
            r.split: r.n
            for r in train_val_test_split(kept, "doc_id")
            .groupBy("split")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        total = sum(splits.values())
        assert abs(total / 20000 - 0.5) < 0.05
        assert abs(splits.get("train", 0) / total - 0.80) < 0.06, (d, splits)
        assert abs(splits.get("val", 0) / total - 0.10) < 0.05, (d, splits)
        assert abs(splits.get("test", 0) / total - 0.10) < 0.05, (d, splits)


def test_pack_matches_sequential_model_on_size_mix(spark):
    """Packer vs the sequential token-stream model on an adversarial size
    mix: empty-ish docs, budget-sized docs, and docs far over budget."""
    rng = np.random.RandomState(13)
    sizes = np.concatenate(
        [
            rng.randint(1, 5, 300),        # tiny
            rng.randint(250, 260, 50),     # ~budget
            rng.randint(600, 1200, 20),    # multi-budget straddlers
        ]
    )
    rows = [(int(i), "w " * int(s)) for i, s in enumerate(sizes)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # "w " * s splits into s 'w's plus a trailing '' token -> n_tokens = s+1;
    # the model below recomputes from the same text, so both sides agree.
    budget, n_parts = 256, 4
    got = {
        r.doc_id: (r.part, r.seq_id, r.n_tokens)
        for r in pack_sequences(df, "doc_id", "text", budget=budget, n_parts=n_parts).collect()
    }
    by_part: dict[int, list[int]] = {}
    for did, text in rows:
        by_part.setdefault(_py_bucket(did, n_parts), []).append(did)
    n_tok = {did: len(text.split(" ")) for did, text in rows}
    for part, ids in by_part.items():
        ids.sort(key=lambda d: (_py_bucket(d, 1 << 30), d))
        offset = 0
        for did in ids:
            assert got[did] == (part, offset // budget, n_tok[did])
            offset += n_tok[did]


def test_quantile_disc_two_phase_random_multisets(spark):
    """Randomized cross-check of the two-phase discrete quantile against
    the pure-python rank rule (value at rank ceil(q*n) in sorted order)
    over adversarial multisets: heavy ties, skewed magnitudes, tiny and
    large n, and bucket widths spanning one-bucket to one-value-per-
    bucket regimes.  The reference rank is computed with INTEGER ceil
    division — float ceil(m*q) can land one past the rank when m*q is
    exactly integral (the same hazard class the operator exists to
    avoid)."""
    from ub_etl_spark.operators.selection import quantile_disc_two_phase

    rng = np.random.RandomState(1234)
    qs = [("p05", 1, 20), ("p25", 1, 4), ("p50", 1, 2), ("p95", 19, 20)]
    for trial in range(6):
        n = int(rng.choice([1, 2, 7, 100, 1000]))
        # mix a skewed heavy-tail with heavy ties
        vals = np.concatenate(
            [
                rng.zipf(1.7, size=n).astype(np.int64) * 37,
                rng.choice([0, 5, 5, 5, 1000], size=n).astype(np.int64),
            ]
        )
        width = int(rng.choice([1, 13, 1000, 10**9]))
        df = spark.createDataFrame([(int(v),) for v in vals], "c long")
        row = quantile_disc_two_phase(df, "c", qs, bucket_width=width).collect()[0]
        ref = np.sort(vals)
        m = len(ref)
        for name, num, den in qs:
            expect = int(ref[-(-m * num // den) - 1])
            assert getattr(row, name) == expect, (
                f"trial {trial} n={m} width={width} {name}: "
                f"{getattr(row, name)} != {expect}"
            )
