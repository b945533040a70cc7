"""Similarity-search tier (SURVEY.md B3/B4 + embedding near-dup).

Wraps operators/vectors.py.  Exact knn and cosine-pair queries are
oracle-checked against DuckDB's list_cosine_similarity; the LSH variant
uses engine-side hyperplanes (no portable oracle) and is recall-verified
against exact knn in tests/test_similarity.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ub_etl_spark.functions.exact import cavg, sql_cavg
from ub_etl_spark.operators import vectors as V
from ub_etl_spark.registry import register
from ub_etl_spark.sources.tables import load_table as T


# B3: brute-force exact top-k cosine
@register(
    "sim_knn_exact",
    tier="B",
    oracle="""
    SELECT query_id, neighbor_id,
           floor(score * 1000000) / 1000000 AS score,
           CAST(rank AS INTEGER) AS rank
    FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                    CAST(c.embedding AS DOUBLE[])) AS score,
             ROW_NUMBER() OVER (
               PARTITION BY q.vec_id
               ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                               CAST(c.embedding AS DOUBLE[])) DESC,
                        c.vec_id
             ) AS rank
      FROM (SELECT * FROM embeddings WHERE vec_id < 10) q
      CROSS JOIN embeddings c
      WHERE q.vec_id <> c.vec_id
    ) t WHERE rank <= 5
    """,
)
def sim_knn_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    out = V.knn_exact(q, e, k=5)
    # rank is computed on the raw score; expose a floor-6dp score so the
    # value hash is ulp-insensitive across engines
    return out.withColumn("score", F.floor(F.col("score") * 1e6) / 1e6)


# B4: approximate NN via random-hyperplane LSH buckets (rows-only).
# Operating point: 12 tables x 2 planes — per-table collision prob is high
# (few planes -> big buckets) and the table union drives pair recall to a
# measured 0.98 vs exact knn (pinned >= 0.9 in tests/test_similarity.py).
@register("sim_ann_lsh", tier="B", oracle=None)
def sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "embeddings")
    return V.knn_ann_lsh(
        e, k=5, dim=64, n_planes=2, n_tables=12, query_filter=F.col("id") < 10
    )


# B4 scale path #2: IVF — deterministic coarse quantizer (hash seeds +
# distributed Lloyd step), nprobe inverted-list probing, exact re-rank.
# Rows-only (quantizer has no SQL analogue); recall vs exact knn asserted
# in tests/test_similarity.py.  The quantizer is cached per corpus dir —
# IVF's usage shape is train-once / probe-many, and the quantizer is
# deterministic, so repeated query builds reuse the centroid matrix.
_IVF_CACHE: dict[tuple[str, int], list] = {}

# Train-once cache audit (r14 verdict task 2 — the sim_ann_pq bench
# bimodality investigation): bench.py records these counters into its
# detail sidecar so an artifact shows how many samples paid codebook /
# centroid training vs reused it.  Counters, not booleans: a cache that
# unexpectedly misses on every pass (e.g. a keying bug after a refactor)
# would read misses==passes here and name itself.
CACHE_STATS = {"ivf_hits": 0, "ivf_misses": 0, "pq_hits": 0, "pq_misses": 0}


def clear_ann_caches() -> None:
    """Drop the train-once codebook/centroid memos (counters stay).

    r15 verdict task 5: the bench's min-of-passes methodology plus a
    cross-pass Python memo gave sim_ann_ivf / sim_ann_pq a warm-only
    committed minimum no other query gets (r15 driver samples: [4.25,
    3.05, 1.32, 1.14] = 1 miss / 3 hits).  bench.py now calls this at
    the START of every pass, so each sample pays centroid/codebook
    training like every other query pays its own plan — the committed
    min is a cold number (ann_cache_stats: misses == samples).  The
    cache itself stays: train-once / probe-many is the operator's real
    usage shape (tests and ad-hoc sessions still benefit)."""
    _IVF_CACHE.clear()
    _PQ_CACHE.clear()


def _ivf_cents(spark: SparkSession, sf_dir: str, nlist: int):
    key = (sf_dir, nlist)
    if key not in _IVF_CACHE:
        CACHE_STATS["ivf_misses"] += 1
        _IVF_CACHE[key] = V.ivf_centroids(T(spark, sf_dir, "embeddings"), nlist=nlist)
    else:
        CACHE_STATS["ivf_hits"] += 1
    return _IVF_CACHE[key]


# nprobe=12/16 is an unusually high probe ratio: the synthetic embeddings
# are near-isotropic (IVF's worst case — no cluster structure to exploit),
# so hitting measured recall 0.90 (pinned >= 0.85 in tests) costs 3/4 of
# the lists.  On real clustered data the same >= 0.9 recall typically needs
# nprobe ~ nlist/8; the knob is the scale lever.
@register("sim_ann_ivf", tier="B", oracle=None)
def sim_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "embeddings")
    return V.knn_ann_ivf(
        e,
        k=5,
        nlist=16,
        nprobe=12,
        query_filter=F.col("vec_id") < 10,
        centroids=_ivf_cents(spark, sf_dir, 16),
    )


# Embedding-cosine near-dup pairs, label-blocked
@register(
    "dedup_embedding_cosine",
    tier="B",
    oracle="""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           floor(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                        CAST(b.embedding AS DOUBLE[])) * 1000000)
             / 1000000 AS cos_sim
    FROM embeddings a
    JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                 CAST(b.embedding AS DOUBLE[])) >= 0.35
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "embeddings")
    out = V.cosine_near_dup_pairs(e, threshold=0.35, block_col="label")
    return out.withColumn("cos_sim", F.floor(F.col("cos_sim") * 1e6) / 1e6)


# B49: per-label centroid of the embedding column — the cluster-profile /
# class-prototype aggregation (and the building block IVF coarse
# quantizers refresh with).  posexplode is pure codegen; the (label, pos)
# aggregation map-side-combines so the shuffle carries |labels| x dim
# rows regardless of corpus size.  Long-form output (label, pos, value)
# keeps the result hash-checkable with no array-ordering caveats;
# consumers reassemble with collect_list over pos when they need vectors.
@register(
    "embedding_centroid_per_label",
    tier="B",
    oracle=f"""
    SELECT label, CAST(i - 1 AS INTEGER) AS pos,
           {sql_cavg("CAST(embedding[i] AS DOUBLE)", "centroid_val", 6)}
    FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS g(i)
    GROUP BY label, i
    """,
)
def embedding_centroid_per_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean embedding per label.  Components quantize to 1e-6 fixed-point
    longs (float32 carries ~7 significant digits at |v| <= 1, so this is
    lossless-in-practice; engines disagree on float->DECIMAL widening,
    which is why the decimal path is NOT used here), sum exactly, divide
    once by the member count — a 1000-executor partial-aggregate tree
    reproduces the single-node centroid bit-for-bit."""
    e = T(spark, sf_dir, "embeddings")
    return (
        e.select("label", F.posexplode("embedding").alias("pos", "val"))
        .groupBy("label", "pos")
        .agg(cavg(F.col("val").cast("double"), "centroid_val", scale=6))
    )


# B69: MMR diversity re-rank of exact-knn candidates (rows-only: the
# greedy selection has no SQL analogue; determinism + diversity
# properties are pinned against a pure-python reference in
# tests/test_similarity.py).  Sequential within a query, parallel across
# queries — the applyInPandas per-group-iterative pattern.
@register("sim_rerank_mmr", tier="B", oracle=None)
def sim_rerank_mmr(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    cand = V.knn_exact(q, e, k=20).select("query_id", "neighbor_id", "score")
    return V.mmr_rerank(cand, e, k=5, lam=0.7)


# B70: hybrid search — reciprocal-rank fusion of a lexical ranking
# (distinct shared terms) and an embedding ranking (cosine), the
# standard two-tower retrieval combiner.  Both component rankings are
# deterministic (exact term counts; floor-6dp cosine; id tie-breaks), so
# the WHOLE fusion is oracle-checked — rare for a retrieval op.  Fixture
# convention: embeddings.vec_id aligns with documents.doc_id (same
# entity).  Scale shape: lexical candidates come from a term-keyed join
# (inverted-index probe, never all-pairs); the dense side here scores
# all candidates because |queries| is bounded — at corpus scale both
# sides would feed top-N candidate lists into the same fusion.
@register(
    "hybrid_search_rrf",
    tier="B",
    oracle="""
    WITH qt AS (
      SELECT doc_id AS q_id,
             unnest(list_distinct(string_split(lower(text), ' '))) AS term
      FROM documents WHERE doc_id < 3
    ), dt AS (
      SELECT doc_id,
             unnest(list_distinct(string_split(lower(text), ' '))) AS term
      FROM documents
    ), lex AS (
      SELECT q.q_id, d.doc_id, COUNT(*) AS lex_score
      FROM qt q JOIN dt d USING (term)
      WHERE d.doc_id <> q.q_id
      GROUP BY 1, 2
    ), emb AS (
      SELECT q.vec_id AS q_id, c.vec_id AS doc_id,
             floor(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                          CAST(c.embedding AS DOUBLE[]))
                   * 1000000) / 1000000 AS cos
      FROM embeddings q CROSS JOIN embeddings c
      WHERE q.vec_id < 3 AND c.vec_id <> q.vec_id
    ), scored AS (
      SELECT e.q_id, e.doc_id,
             COALESCE(l.lex_score, 0) AS lex_score, e.cos
      FROM emb e LEFT JOIN lex l ON e.q_id = l.q_id AND e.doc_id = l.doc_id
    ), ranked AS (
      SELECT *,
             ROW_NUMBER() OVER (PARTITION BY q_id
                                ORDER BY lex_score DESC, doc_id) AS lex_rank,
             ROW_NUMBER() OVER (PARTITION BY q_id
                                ORDER BY cos DESC, doc_id) AS emb_rank
      FROM scored
    )
    SELECT q_id, doc_id, CAST(lex_rank AS INTEGER) AS lex_rank,
           CAST(emb_rank AS INTEGER) AS emb_rank, rrf
    FROM (
      SELECT *, 1.0 / (60 + lex_rank) + 1.0 / (60 + emb_rank) AS rrf,
             ROW_NUMBER() OVER (PARTITION BY q_id
               ORDER BY 1.0 / (60 + lex_rank) + 1.0 / (60 + emb_rank) DESC,
                        doc_id) AS rn
      FROM ranked
    ) t WHERE rn <= 5
    """,
)
def hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    d = T(spark, sf_dir, "documents")
    e = T(spark, sf_dir, "embeddings")
    terms = d.select(
        "doc_id",
        F.explode(F.array_distinct(F.split(F.lower(F.col("text")), " "))).alias(
            "term"
        ),
    )
    qt = terms.filter(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("q_id"), "term"
    )
    lex = (
        qt.join(terms, "term")
        .filter(F.col("doc_id") != F.col("q_id"))
        .groupBy("q_id", "doc_id")
        .agg(F.count(F.lit(1)).alias("lex_score"))
    )
    q = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    emb = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            F.col("vec_id").alias("doc_id"),
            (F.floor(V.cosine(F.col("q_vec"), F.col("embedding")) * 1e6) / 1e6).alias(
                "cos"
            ),
        )
    )
    scored = emb.join(lex, ["q_id", "doc_id"], "left").withColumn(
        "lex_score", F.coalesce("lex_score", F.lit(0))
    )
    wl = W.partitionBy("q_id").orderBy(F.desc("lex_score"), F.asc("doc_id"))
    we = W.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("doc_id"))
    ranked = scored.select(
        "q_id",
        "doc_id",
        F.row_number().over(wl).alias("lex_rank"),
        F.row_number().over(we).alias("emb_rank"),
    )
    rrf = 1.0 / (F.col("lex_rank") + 60) + 1.0 / (F.col("emb_rank") + 60)
    wr = W.partitionBy("q_id").orderBy(F.desc("rrf"), F.asc("doc_id"))
    return (
        ranked.withColumn("rrf", rrf)
        .withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") <= 5)
        .select("q_id", "doc_id", "lex_rank", "emb_rank", "rrf")
    )


# B4 scale path #3: product quantization (PQ) — asymmetric-distance
# scoring over 12-byte codes + exact shortlist re-rank; completes the
# ANN trio (hyperplane LSH / IVF inverted lists / PQ compressed codes),
# and composes with IVF as IVF-PQ at 1e9+ vectors.  Rows-only (the
# quantizer has no SQL analogue); recall vs exact knn pinned in
# tests/test_similarity.py.  Codebooks cached per corpus dir — PQ's
# usage shape is train-once / encode-and-probe-many, and the trainer
# is deterministic (hash seeds + fixed-point Lloyd like IVF).
_PQ_CACHE: dict[tuple[str, int, int], list] = {}


def _pq_books(spark: SparkSession, sf_dir: str, m: int, ksub: int):
    key = (sf_dir, m, ksub)
    if key not in _PQ_CACHE:
        CACHE_STATS["pq_misses"] += 1
        _PQ_CACHE[key] = V.pq_codebooks(
            T(spark, sf_dir, "embeddings"), dim=64, m=m, ksub=ksub
        )
    else:
        CACHE_STATS["pq_hits"] += 1
    return _PQ_CACHE[key]


# m=16 subspaces x 64 centroids = 6-bit codes x 16 = 12 bytes/vector, a
# 21x compression of the 64-dim float32 column; on the near-isotropic
# synthetic embeddings (the hard case for every quantizer here, cf. the
# sim_ann_ivf nprobe note) this setting measures recall 1.0 at
# shortlist=50 (1% of the corpus) vs exact knn.
@register("sim_ann_pq", tier="B")
def sim_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "embeddings")
    return V.knn_ann_pq(
        e,
        k=5,
        dim=64,
        m=16,
        ksub=64,
        shortlist=50,
        query_filter=F.col("vec_id") < 10,
        books=_pq_books(spark, sf_dir, 16, 64),
    )
