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
