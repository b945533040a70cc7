"""Unit/property tests for the curation + flagship tier (B21-B29).

Parity (tools/parity.py) proves cross-engine exactness; these tests pin
the semantic contracts that a hash-diff alone can't express: redaction
completeness, gate monotonicity, packing feasibility, funnel ordering,
and the GK sketch's rank-error bound.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from ub_etl_spark.operators.curation import (
    PII_RULES,
    gopher_quality,
    pack_sequences,
    redact_pii,
)
from ub_etl_spark.registry import load_all

REG = load_all()


def test_pii_redaction_complete(spark, sf_dir):
    """After redaction no rule pattern matches anywhere in the corpus,
    and every planted doc saw >= 1 match per rule."""
    df = REG["text_pii_redact"].fn(spark, sf_dir)
    leftovers = [
        F.sum(F.size(F.regexp_extract_all("redacted", F.lit(pat), 0))).alias(name)
        for name, pat, _ in PII_RULES
    ]
    mins = [F.min(f"n_{name}").alias(f"min_{name}") for name, _, _ in PII_RULES]
    row = df.agg(*leftovers, *mins).collect()[0]
    for name, _, _ in PII_RULES:
        assert row[name] == 0, f"unredacted {name} remains"
        assert row[f"min_{name}"] >= 1, f"planted {name} not counted"


def test_pii_redact_plain_text_passthrough(spark):
    """Text with no PII is unchanged by the redaction chain."""
    df = spark.createDataFrame([("no secrets here at all",)], ["t"])
    out = df.select(redact_pii(F.col("t")).alias("r")).collect()[0].r
    assert out == "no secrets here at all"


_token = st.sampled_from(["a", "b", "ab", "xyz", "a b".replace(" ", ""), "zz"])
_docs = st.lists(
    st.lists(_token, min_size=2, max_size=40).map(lambda ts: " ".join(ts)),
    min_size=1,
    max_size=8,
)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(_docs)
def test_gopher_bigram_mode_fold_property(spark, texts):
    """The r6 map-only bigram mode (array_sort + aggregate() max-run fold)
    equals the brute-force Python mode on adversarial token lists —
    heavy repeats, all-identical docs, minimum-length docs.  Guards the
    fold's run-length arithmetic (the <=> NULL seed, the run reset)."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    got = {r.doc_id: r for r in gopher_quality(df, "doc_id", "text").collect()}
    for i, t in enumerate(texts):
        toks = t.split(" ")
        bigrams = [f"{toks[j]} {toks[j + 1]}" for j in range(len(toks) - 1)]
        top = max(bigrams.count(b) for b in set(bigrams))
        assert got[i].top_bigram_ratio == pytest.approx(top / (len(toks) - 1)), (
            t,
            got[i],
        )


def test_gopher_features_match_python(spark, sf_dir):
    """Feature arithmetic agrees with a direct Python recompute."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
    feats = {r.doc_id: r for r in gopher_quality(docs, "doc_id", "text").collect()}
    for row in docs.collect():
        toks = row.text.split(" ")
        if len(toks) < 2:
            continue
        got = feats[row.doc_id]
        assert got.n_tokens == len(toks)
        assert got.dup_word_ratio == pytest.approx(1.0 - len(set(toks)) / len(toks))
        bigrams = [f"{toks[i]} {toks[i + 1]}" for i in range(len(toks) - 1)]
        top = max(bigrams.count(b) for b in set(bigrams))
        assert got.top_bigram_ratio == pytest.approx(top / (len(toks) - 1))
        assert got.mean_word_len == pytest.approx(
            sum(len(t) for t in toks) / len(toks)
        )


def test_contamination_range_and_exclusion(spark, sf_dir):
    df = REG["contamination_ngram_check"].fn(spark, sf_dir)
    rows = df.collect()
    assert all(r.doc_id % 97 != 0 for r in rows), "benchmark docs must be excluded"
    assert all(0 <= r.n_shared <= r.n_grams for r in rows)
    assert all(0.0 <= r.contamination <= 1.0 for r in rows)


def test_pack_sequences_stream_layout(spark, sf_dir):
    """Token-stream packing invariants: within a partition the start
    offsets tile the stream exactly (no gaps/overlap), each doc's seq id
    is floor(start/budget), and the first seq is 0."""
    budget = 64
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    packed = pack_sequences(docs, "doc_id", "text", budget=budget, n_parts=4)
    rows = packed.collect()
    docs_pd = {r.doc_id: r for r in rows}
    # recompute the stream order: same hash, same tiebreak
    from ub_etl_spark.operators.training import _KNUTH

    def hb(x: int, n: int) -> int:
        return ((x * _KNUTH) % 2**32) % n

    by_part: dict[int, list[int]] = {}
    for did in docs_pd:
        by_part.setdefault(hb(did, 4), []).append(did)
    for part, ids in by_part.items():
        ids.sort(key=lambda d: (hb(d, 1 << 30), d))
        offset = 0
        for did in ids:
            r = docs_pd[did]
            assert r.part == part
            assert r.seq_id == offset // budget, f"doc {did} seq mismatch"
            offset += r.n_tokens
    assert min(r.seq_id for r in rows) == 0


def test_mix_weighted_sources_rates(spark, sf_dir):
    """src0 (weight 100) keeps everything; kept fraction tracks the target
    weight; kept sets are deterministic across runs."""
    df = REG["mix_weighted_sources"].fn(spark, sf_dir)
    total = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .groupBy("source")
        .agg(F.count("*").alias("n"))
    )
    kept = df.groupBy("source").agg(F.count("*").alias("k"))
    rows = {
        r.source: (r.k, r.n)
        for r in kept.join(total, "source").collect()
    }
    k0, n0 = rows["src0"]
    assert k0 == n0, "weight-100 source must keep every row"
    for src, (k, n) in rows.items():
        pct = 100 - int(src[3:]) * 5
        assert k <= n
        # hash thresholding is exact-in-expectation; allow wide slack on
        # tiny per-source groups
        assert abs(k / n - pct / 100) <= 0.35
    again = REG["mix_weighted_sources"].fn(spark, sf_dir)
    assert sorted(r.doc_id for r in df.collect()) == sorted(
        r.doc_id for r in again.collect()
    )


def test_events_funnel_ordering(spark, sf_dir):
    rows = REG["events_funnel"].fn(spark, sf_dir).collect()
    assert rows, "funnel should complete for some users"
    for r in rows:
        assert r.t_signup < r.t_first_view < r.t_first_purchase


def test_approx_percentile_rank_error(spark, sf_dir):
    """GK guarantee: the returned element's rank is within n/accuracy of
    the target rank, per group."""
    approx = {r.event_type: r for r in REG["agg_approx_percentile"].fn(spark, sf_dir).collect()}
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    vals = {
        r.event_type: sorted(v.value for v in events.filter(F.col("event_type") == r.event_type).select("value").collect())
        for r in events.select("event_type").distinct().collect()
    }
    for etype, xs in vals.items():
        n = len(xs)
        tol = max(1, n // 10000 + 1)
        for q, field in [(0.5, "p50"), (0.95, "p95"), (0.99, "p99")]:
            got = approx[etype][field]
            import bisect

            lo = bisect.bisect_left(xs, got)
            hi = bisect.bisect_right(xs, got) - 1
            target = q * (n - 1)
            assert lo - tol <= target <= hi + tol, (
                f"{etype} {field}: rank window [{lo},{hi}] vs target {target}"
            )


def test_training_manifest_invariants(spark, sf_dir):
    """The composed manifest honors every stage's contract: no benchmark
    docs, contamination gate applied, valid splits, only quality-keep +
    canonical docs survive."""
    rows = REG["pipeline_training_manifest"].fn(spark, sf_dir).collect()
    assert rows
    assert all(r.doc_id % 97 != 0 for r in rows)
    assert all(0.0 <= r.contamination <= 0.5 for r in rows)
    assert {r.split for r in rows} <= {"train", "val", "test"}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    from ub_etl_spark.operators.curation import gopher_quality
    from ub_etl_spark.operators.training import dedup_normalized_exact

    keep = {
        r.doc_id
        for r in gopher_quality(docs, "doc_id", "text").filter(F.col("keep")).collect()
    }
    canon = {r.doc_id for r in dedup_normalized_exact(docs, "doc_id", "text").collect()}
    for r in rows:
        assert r.doc_id in keep and r.doc_id in canon


def test_interval_overlap_pairs_correct(spark, sf_dir):
    """Bucketized overlap join equals the brute-force pair set."""
    out = {
        (r.key_a, r.key_b)
        for r in REG["join_interval_overlap"].fn(spark, sf_dir).collect()
    }
    orders = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .filter(F.col("o_orderdate") >= F.lit("2001-06-01").cast("timestamp"))
        .collect()
    )
    import datetime

    iv = [
        (
            r.o_orderkey,
            r.o_custkey,
            r.o_orderdate,
            r.o_orderdate + datetime.timedelta(days=(r.o_orderkey % 5) + 1),
        )
        for r in orders
    ]
    brute = set()
    by_cust: dict[int, list] = {}
    for t in iv:
        by_cust.setdefault(t[1], []).append(t)
    for group in by_cust.values():
        for i, a in enumerate(group):
            for b in group[i + 1 :]:
                x, y = (a, b) if a[0] < b[0] else (b, a)
                if x[2] <= y[3] and y[2] <= x[3]:
                    brute.add((x[0], y[0]))
    assert out == brute


def test_tpch_q1_totals_consistent(spark, sf_dir):
    """Aggregate identities: sum_disc_price <= sum_base_price and
    sum_charge >= sum_disc_price (tax >= 0, discount >= 0)."""
    for r in REG["tpch_q1_pricing"].fn(spark, sf_dir).collect():
        assert r.sum_disc_price <= r.sum_base_price
        assert r.sum_charge >= r.sum_disc_price
        assert r.count_order > 0
