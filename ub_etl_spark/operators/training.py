"""Training-data-pipeline operators beyond the dedup/similarity tier:
deterministic corpus splitting, normalization-based near-exact dedup,
vocabulary statistics, and embedding post-processing.

All pure DataFrame expressions (JVM codegen; no Python in the hot path).
These are the remaining standard passes of an LLM data pipeline that
SURVEY.md's B-tier didn't already cover: every one is a map-side
projection or a single hash aggregation, so they scale as one pass over
the corpus at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Knuth's multiplicative hash constant (2^32 / phi).  Used instead of
# xxhash64 so the SAME arithmetic runs on any ANSI-SQL engine (the oracle):
# deterministic, seedless, and well-mixed for sequential ids.  NOTE the
# product overflows int64 once id ~> 3.4e9 — at that scale switch to
# F.xxhash64 (engine-local but 64-bit safe); the split stays stable either
# way because assignment is per-row.
_KNUTH = 2654435761


def hash_bucket(id_col: Column, n_buckets: int = 100) -> Column:
    """Deterministic pseudo-uniform bucket in [0, n_buckets) from an id."""
    return F.pmod((id_col.cast("bigint") * F.lit(_KNUTH)) % F.lit(2**32), F.lit(n_buckets))


def sql_hash_bucket(id_expr: str, n_buckets: int = 100) -> str:
    """The oracle twin of hash_bucket (identical integer arithmetic)."""
    return f"(({id_expr} * {_KNUTH}) % 4294967296) % {n_buckets}"


# Second, independent bucket hash for decisions that must be statistically
# independent of hash_bucket on the same ids (e.g. mixing vs split).  A
# single multiplicative round has weak avalanche — even XOR-ing a salt
# into the id first leaves measurable correlation between the two bucket
# streams (observed: a 50%-mix stratum carried 4% val instead of 10%).
# This is the standard 32-bit xorshift-multiply finalizer (two rounds of
# h ^= h>>16; h *= C), whose products stay under 2^59 — safe in int64 on
# every ANSI engine (DuckDB raises on int64 overflow rather than wrapping,
# so staying in-range IS the portability requirement).
_MIX_C = 0x45D9F3B  # 73244475


def mix_bucket(id_col: Column, salt: Column, n_buckets: int = 100) -> Column:
    # pre-reduce to 32 bits so every product stays under 2^59 (< int64 max)
    h = F.pmod(id_col.cast("bigint").bitwiseXOR(salt), F.lit(2**32))
    for _ in range(2):
        h = F.pmod(
            (h.bitwiseXOR(F.shiftright(h, 16))) * F.lit(_MIX_C), F.lit(2**32)
        )
    h = h.bitwiseXOR(F.shiftright(h, 16))
    return F.pmod(h, F.lit(n_buckets))


def sql_mix_bucket(id_expr: str, salt_expr: str, n_buckets: int = 100) -> str:
    """Oracle twin of mix_bucket — identical integer arithmetic.  (The
    repeated-subexpression rendering is textual only; engines CSE it.)"""
    h = f"(xor({id_expr}, {salt_expr}) % 4294967296)"
    for _ in range(2):
        h = f"((xor({h}, ({h}) >> 16)) * {_MIX_C}) % 4294967296"
    h = f"xor({h}, ({h}) >> 16)"
    return f"({h}) % {n_buckets}"


def train_val_test_split(
    df: DataFrame,
    id_col: str,
    train_pct: int = 80,
    val_pct: int = 10,
) -> DataFrame:
    """Attach a stable train/val/test split column.

    Hash-of-id assignment — the standard reproducible split for training
    corpora: membership never changes as rows are added/removed elsewhere,
    and no shuffle/sort is involved (map-only).
    """
    b = hash_bucket(F.col(id_col))
    return df.withColumn(
        "split",
        F.when(b < train_pct, "train")
        .when(b < train_pct + val_pct, "val")
        .otherwise("test"),
    )


def normalize_text(text: Column) -> Column:
    """Aggressive fold for near-exact dedup: lowercase, strip everything
    but [a-z0-9 ], collapse runs of spaces, trim.  The cheap pass that
    catches case/punctuation/whitespace variants before MinHash runs."""
    t = F.lower(text)
    t = F.regexp_replace(t, "[^a-z0-9 ]", " ")
    t = F.regexp_replace(t, " +", " ")
    return F.trim(t)


def survivorship_dedup(
    df: DataFrame, id_col: str, source_col: str, rank: Column, text_col: str
) -> DataFrame:
    """Cross-source survivorship: one row per normalized-text group, the
    survivor being the lowest `rank` (most trusted source), tie-broken by
    id.  Same 8-byte xxhash64 shuffle key as dedup_normalized_exact; the
    pick is a single deterministic min_by over a composite long ordinal
    (rank * 2^33 + id — unique as long as ids stay under 2^33 AND ranks
    under 2^30; beyond either bound the long product wraps, so widen to
    a struct ordering or re-shift for larger spaces).  Plan note: min_by over a string value
    buffers a non-primitive, so Spark plans SortAggregate rather than
    HashAggregate — still with partial_min_by map-side combine, so the
    exchange carries one row per (partition, group); the extra cost vs a
    hash agg is an in-memory map-side sort.  Output: (id, source,
    n_members)."""
    ordinal = rank.cast("bigint") * F.lit(8589934592) + F.col(id_col)
    return (
        df.select(
            F.col(id_col),
            F.col(source_col),
            ordinal.alias("__ord"),
            F.xxhash64(normalize_text(F.col(text_col))).alias("__nh"),
        )
        .groupBy("__nh")
        .agg(
            F.min_by(id_col, F.col("__ord")).alias(id_col),
            F.min_by(source_col, F.col("__ord")).alias(source_col),
            F.count(F.lit(1)).alias("n_members"),
        )
        .select(id_col, source_col, "n_members")
    )


def dedup_normalized_exact(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup on the normalized text: keep the smallest id per
    normalized form (first-writer-wins), count the members it absorbs.

    Groups on xxhash64(normalized) — an 8-byte shuffle key instead of the
    full normalized document (measured 13.8x cost at 10x volume with
    string keys; the map-side partial agg then shuffles KBs per group
    either way, but sort/compare cost drops).  A 64-bit collision would
    silently merge two distinct normalized forms (P ~ n^2/2^65 — ~1e-11
    even at 1e8 docs); group on the string itself where that is not
    acceptable.  Output: (doc_id, n_members)."""
    key = F.xxhash64(normalize_text(F.col(text_col))).alias("__nh")
    return (
        df.select(F.col(id_col), key)
        .groupBy("__nh")
        .agg(
            F.min(id_col).alias(id_col),
            F.count(F.lit(1)).alias("n_members"),
        )
        .select(id_col, "n_members")
    )


def ngram_counts(
    df: DataFrame, text_col: str, n: int = 2, top_k: int | None = None
) -> DataFrame:
    """Corpus-level n-gram frequency table (the vocabulary-counting pass of
    tokenizer training).  explode + one hash aggregation; map-side partial
    aggregation keeps the shuffle at |vocab|, not |corpus|.
    Output: (ngram, n_occurrences), optionally top_k by count (ties broken
    by ngram for determinism)."""
    toks = F.split(F.col(text_col), " ")
    grams = (
        df.select(toks.alias("__toks"))
        .select(F.posexplode("__toks").alias("__pos", "__tok"), F.col("__toks"))
        .filter(F.col("__pos") <= F.size("__toks") - n)
        .select(
            F.concat_ws(
                " ", *[F.element_at("__toks", F.col("__pos") + j + 1) for j in range(n)]
            ).alias("ngram")
        )
    )
    counts = grams.groupBy("ngram").agg(F.count(F.lit(1)).alias("n_occurrences"))
    if top_k is not None:
        counts = counts.orderBy(F.desc("n_occurrences"), F.asc("ngram")).limit(top_k)
    return counts


def l2_normalize_quantize(
    df: DataFrame, id_col: str, vec_col: str, bits_scale: int = 127
) -> DataFrame:
    """Unit-normalize each embedding and quantize to signed-int8 range —
    the standard pre-ANN compression pass (4x smaller vectors; cosine
    becomes integer dot product).

    Expression-only: the norm is a sequential double aggregate (bit-exact
    deterministic, same fold order as the oracle's list_sum) and the
    quantized array a transform().  Both are interpreted HOFs — fine for
    a map-only pass; the Arrow pandas_udf twin (operators/vectors.
    cosine_batch style) is the pick if this ever dominates a profile.
    Output: (id, qvec array<int>, inv_norm double)."""
    v = F.col(vec_col)
    norm = F.sqrt(
        F.aggregate(
            F.transform(v, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    qvec = F.transform(
        v, lambda x: F.floor(x.cast("double") / F.col("__norm") * bits_scale).cast("int")
    )
    return (
        df.select(F.col(id_col), v.alias(vec_col))
        .withColumn("__norm", norm)
        .select(
            id_col,
            qvec.alias("qvec"),
            (F.floor(1e6 / F.col("__norm")) / 1e6).alias("inv_norm"),
        )
    )
