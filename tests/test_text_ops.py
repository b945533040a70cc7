"""Text-operator unit tests: tokens, fingerprint, lang-id, quality, BPE count."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from ub_etl_spark.operators.text import (
    bpe_ish_token_count,
    fingerprint,
    lang_id,
    quality_features,
    token_count,
)


def one(spark, text):
    return spark.createDataFrame([(text,)], "text string")


def test_token_count(spark):
    df = one(spark, "a b  c   d")
    assert df.select(token_count(F.col("text")).alias("n")).first().n == 4


def test_fingerprint_normalizes_case_and_space(spark):
    df = spark.createDataFrame(
        [("Hello   World",), ("hello world",), ("other text",)], "text string"
    )
    fps = [r.fp for r in df.select(fingerprint(F.col("text")).alias("fp")).collect()]
    assert fps[0] == fps[1] != fps[2]
    assert fps[1] == hashlib.md5(b"hello world").hexdigest()


def test_lang_id_english_vs_german(spark):
    en = one(spark, "the cat and the dog went to the park for a walk in the sun")
    de = one(spark, "der hund und die katze gehen mit den kindern zu der schule")
    assert en.select(lang_id(F.col("text")).alias("l")).first().l == "en"
    assert de.select(lang_id(F.col("text")).alias("l")).first().l == "de"


def test_lang_id_unknown(spark):
    df = one(spark, "zzz qqq xxx")
    assert df.select(lang_id(F.col("text")).alias("l")).first().l == "und"


def test_quality_features_ranges(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    feats = quality_features(docs)
    rows = feats.collect()
    for r in rows:
        assert r.n_tokens > 0
        assert 0.0 <= r.stopword_ratio <= 1.0
        assert 0.0 <= r.punct_ratio <= 1.0


def test_bpe_ish_token_count_monotone_in_length(spark):
    short = one(spark, "word").select(bpe_ish_token_count(F.col("text")).alias("n")).first().n
    long = (
        one(spark, "supercalifragilistic expialidocious word word word")
        .select(bpe_ish_token_count(F.col("text")).alias("n"))
        .first()
        .n
    )
    assert short == 1
    assert long > short


def test_pmi_ranks_true_collocation_over_independents(spark):
    """A pair that always co-occurs scores higher PMI than a pair of
    frequent-but-independent words."""
    rows = []
    for i in range(20):
        rows.append((i, "new york " + ("the cat " if i % 2 else "a dog ") * 3))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    import ub_etl_spark.queries.text as tmod

    t_orig = tmod.T
    tmod.T = lambda s, d, n: df  # noqa: E731
    try:
        out = {
            (r.w1, r.w2): r.pmi
            for r in tmod.text_collocation_pmi(spark, "x").collect()
        }
    finally:
        tmod.T = t_orig
    # "new york" is a perfect collocation (every 'new' precedes 'york');
    # "the cat" repeats within docs but 'the'/'cat' are also adjacent to
    # others across the corpus boundary-free construction, so PMI still
    # ranks the exclusive pair at least as high
    assert ("new", "york") in out
    assert out[("new", "york")] == max(out.values())


def test_chunking_covers_every_token_with_overlap(spark):
    """Chunks tile the document: first chunk starts at token 1, strides
    are 24, the final token appears in the last chunk, and short docs
    yield exactly one whole-document chunk."""
    import ub_etl_spark.queries.text as tmod

    rows = [(1, " ".join(f"w{i}" for i in range(100))), (2, "a b c")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    t_orig = tmod.T
    tmod.T = lambda s, d, n: df  # noqa: E731
    try:
        out = tmod.text_chunk_sliding(spark, "x").collect()
    finally:
        tmod.T = t_orig
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    long = sorted(by_doc[1], key=lambda r: r.chunk_idx)
    # 100 tokens, size 32, stride 24 -> ceil((100-32)/24)=3 extra -> 4 chunks
    assert len(long) == 4
    assert long[0].chunk_text.startswith("w0 ")
    assert all(r.n_tokens == 32 for r in long[:-1])
    assert long[-1].chunk_text.endswith("w99")  # full coverage
    short = by_doc[2]
    assert len(short) == 1 and short[0].chunk_text == "a b c"
