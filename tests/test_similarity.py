"""Vector-similarity tests: exact knn sanity + ANN recall (SURVEY.md B3/B4)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from ub_etl_spark.operators.vectors import (
    cosine,
    ivf_centroids,
    knn_ann_ivf,
    knn_ann_lsh,
    knn_exact,
)


def test_cosine_expression(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [1.0, 0.0]), ([1.0, 0.0], [0.0, 1.0]), ([1.0, 1.0], [1.0, 1.0])],
        "a array<double>, b array<double>",
    )
    got = [r.c for r in df.select(cosine(F.col("a"), F.col("b")).alias("c")).collect()]
    assert math.isclose(got[0], 1.0)
    assert math.isclose(got[1], 0.0, abs_tol=1e-12)
    assert math.isclose(got[2], 1.0)


def test_knn_exact_topk(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 3)
    out = knn_exact(q, emb, k=4)
    rows = out.collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append((r.rank, r.score, r.neighbor_id))
    assert set(per_q) == {0, 1, 2}
    for qid, lst in per_q.items():
        lst.sort()
        assert [r for r, _, _ in lst] == [1, 2, 3, 4]
        scores = [s for _, s, _ in lst]
        assert scores == sorted(scores, reverse=True)
        assert all(n != qid for _, _, n in lst)


def test_ann_lsh_recall_vs_exact(spark, sf_dir):
    """Pinned recall at the REGISTERED operating point (queries/similarity.py:
    2 planes x 12 tables) vs exact knn.  Measured 0.98 at sf0.001; floor
    0.9 — the rows-only driver check carries this quantitative guarantee."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 20)
    exact = {
        (r.query_id, r.neighbor_id) for r in knn_exact(q, emb, k=5).collect()
    }
    ann = {
        (r.query_id, r.neighbor_id)
        for r in knn_ann_lsh(
            emb, k=5, dim=64, n_planes=2, n_tables=12, query_filter=F.col("id") < 20
        ).collect()
    }
    recall = len(ann & exact) / len(exact)
    print(f"ann_lsh recall@5 (planes=2, tables=12): {recall:.3f}")
    assert recall >= 0.9, f"ANN-LSH recall below pinned floor: {recall:.3f}"


def test_ann_lsh_single_table_recall(spark, sf_dir):
    """One table, two planes — the cheap low-recall point still finds a
    substantial fraction (sanity that the bucketing itself works)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 20)
    exact = {(r.query_id, r.neighbor_id) for r in knn_exact(q, emb, k=5).collect()}
    ann = {
        (r.query_id, r.neighbor_id)
        for r in knn_ann_lsh(emb, k=5, dim=64, n_planes=2, query_filter=F.col("id") < 20).collect()
    }
    recall = len(ann & exact) / len(exact)
    assert recall >= 0.2, f"single-table ANN recall collapsed: {recall}"


def test_ivf_centroids_deterministic(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    c1 = ivf_centroids(emb, nlist=4)
    c2 = ivf_centroids(emb, nlist=4)
    assert c1 == c2, "IVF quantizer must be reproducible run-to-run"
    assert len(c1) == 4 and all(len(v) == 64 for _, v in c1)


def test_ann_ivf_recall_vs_exact(spark, sf_dir):
    """Pinned recall at the REGISTERED operating point (queries/similarity.py:
    nlist=16, nprobe=12) vs exact knn.  Measured 0.90 at sf0.001 — the
    synthetic embeddings are near-isotropic, IVF's worst case — floor 0.85."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 20)
    exact = {(r.query_id, r.neighbor_id) for r in knn_exact(q, emb, k=5).collect()}
    ivf = {
        (r.query_id, r.neighbor_id)
        for r in knn_ann_ivf(
            emb, k=5, nlist=16, nprobe=12, query_filter=F.col("vec_id") < 20
        ).collect()
    }
    recall = len(ivf & exact) / len(exact)
    print(f"ann_ivf recall@5 (nlist=16, nprobe=12): {recall:.3f}")
    assert recall >= 0.85, f"IVF recall below pinned floor: {recall:.3f}"


def test_ann_ivf_full_probe_matches_exact(spark, sf_dir):
    """nprobe == nlist degenerates to brute force: recall must be 1.0 —
    mechanism check that probing/assignment lose nothing themselves."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 10)
    exact = {(r.query_id, r.neighbor_id) for r in knn_exact(q, emb, k=5).collect()}
    ivf = {
        (r.query_id, r.neighbor_id)
        for r in knn_ann_ivf(
            emb, k=5, nlist=8, nprobe=8, query_filter=F.col("vec_id") < 10
        ).collect()
    }
    assert ivf == exact, "full-probe IVF must equal exact knn"


def test_mmr_rerank_matches_python_reference_and_diversifies(spark, sf_dir):
    """MMR output equals a pure-python greedy reference per query, rank 1
    is the plain top-relevance hit, and the selected set's mean pairwise
    similarity is no higher than the naive top-k's."""
    import numpy as np

    from ub_etl_spark.operators import vectors as V
    from ub_etl_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5)
    cand = V.knn_exact(q, e, k=20).select("query_id", "neighbor_id", "score")
    got = V.mmr_rerank(cand, e, k=5, lam=0.7).collect()

    vecs = {r.vec_id: np.array(r.embedding, dtype="float64") for r in e.collect()}

    def unit(v):
        n = np.linalg.norm(v)
        return v / n if n else v

    cand_rows = cand.collect()
    by_q: dict = {}
    for r in cand_rows:
        by_q.setdefault(r.query_id, []).append((r.neighbor_id, r.score))
    for qid, items in by_q.items():
        items.sort(key=lambda t: (-t[1], t[0]))
        chosen: list[int] = []
        rel = {nid: s for nid, s in items}
        remaining = [nid for nid, _ in items]
        while remaining and len(chosen) < 5:
            if not chosen:
                best = remaining[0]
            else:
                def mmr(nid):
                    ms = max(
                        float(unit(vecs[nid]) @ unit(vecs[c])) for c in chosen
                    )
                    return 0.7 * rel[nid] - 0.3 * ms
                scores = [mmr(nid) for nid in remaining]
                best = remaining[int(np.argmax(scores))]
            chosen.append(best)
            remaining.remove(best)
        spark_order = [
            r.neighbor_id for r in sorted(
                (r for r in got if r.query_id == qid), key=lambda r: r.mmr_rank
            )
        ]
        assert spark_order == chosen, f"query {qid}"
        # diversity: mean pairwise sim of MMR picks <= naive top-5's
        def mean_pair_sim(ids):
            us = [unit(vecs[i]) for i in ids]
            sims = [float(a @ b) for i, a in enumerate(us) for b in us[i + 1:]]
            return sum(sims) / len(sims)
        naive = [nid for nid, _ in items[:5]]
        assert mean_pair_sim(chosen) <= mean_pair_sim(naive) + 1e-9


def test_ann_pq_recall_vs_exact(spark, sf_dir):
    """Pinned recall at the REGISTERED operating point (queries/similarity.py:
    m=16, ksub=64, shortlist=50) vs exact knn.  Measured 1.0 at sf0.01 on
    the near-isotropic synthetic embeddings; floor 0.9."""
    from ub_etl_spark.operators.vectors import knn_ann_pq, pq_codebooks

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 20)
    exact = {(r.query_id, r.neighbor_id) for r in knn_exact(q, emb, k=5).collect()}
    books = pq_codebooks(emb, dim=64, m=16, ksub=64)
    pq = {
        (r.query_id, r.neighbor_id)
        for r in knn_ann_pq(
            emb,
            k=5,
            dim=64,
            m=16,
            ksub=64,
            shortlist=50,
            query_filter=F.col("vec_id") < 20,
            books=books,
        ).collect()
    }
    recall = len(pq & exact) / len(exact)
    print(f"ann_pq recall@5 (m=16, ksub=64, shortlist=50): {recall:.3f}")
    assert recall >= 0.9, f"PQ recall below pinned floor: {recall:.3f}"


def test_pq_codes_shape_and_determinism(spark, sf_dir):
    """Codes are length-m int arrays within [0, ksub); training and
    encoding are bit-deterministic run-to-run (hash seeds + fixed-point
    Lloyd — the IVF determinism contract)."""
    from ub_etl_spark.operators.vectors import pq_codebooks, pq_encode

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    b1 = pq_codebooks(emb, dim=64, m=8, ksub=16)
    b2 = pq_codebooks(emb, dim=64, m=8, ksub=16)
    assert b1 == b2
    rows = (
        pq_encode(emb.limit(50), b1).select("vec_id", "pq_codes").collect()
    )
    for r in rows:
        assert len(r.pq_codes) == 8
        assert all(0 <= c < 16 for c in r.pq_codes)
    again = {
        r.vec_id: list(r.pq_codes)
        for r in pq_encode(emb.limit(50), b2).select("vec_id", "pq_codes").collect()
    }
    assert {r.vec_id: list(r.pq_codes) for r in rows} == again


def test_pq_assign_matches_naive_distance_argmin():
    """The BLAS identity form of the subspace assignment (r7:
    argmin ||c||^2 - 2<s,c>) must pick the same centroid as the naive
    squared-distance argmin it replaced, across random inputs — a pure
    numpy property, no Spark session.  Centroids are drawn continuous
    so exact distance ties (the only case where the two formulas could
    legally diverge in float) have measure zero."""
    import numpy as np

    from ub_etl_spark.operators.vectors import _pq_assign

    rng = np.random.default_rng(7)
    for _ in range(20):
        n, m, ksub, dsub = (
            int(rng.integers(1, 40)),
            int(rng.integers(1, 5)),
            int(rng.integers(2, 17)),
            int(rng.integers(1, 9)),
        )
        S = rng.normal(size=(n, m, dsub))
        B = rng.normal(size=(m, ksub, dsub))
        naive = ((S[:, :, None, :] - B[None, :, :, :]) ** 2).sum(axis=3).argmin(axis=2)
        assert (_pq_assign(S, B) == naive).all()


def test_ann_pq_batch_local_pruning_partition_invariant(spark, sf_dir):
    """The fused ADC pass prunes to a batch-local top-shortlist before
    the global window merge; because pruning uses the window's exact
    total order (approx desc, id asc), the final top-k must be invariant
    to how the corpus is partitioned.  8 shuffled partitions vs the
    single-file layout must return identical (query, neighbor, rank)."""
    from pyspark.sql import functions as F

    from ub_etl_spark.operators.vectors import knn_ann_pq, pq_codebooks

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    books = pq_codebooks(emb, dim=64, m=8, ksub=16)

    def run(df):
        return sorted(
            (r.query_id, r.neighbor_id, r.rank)
            for r in knn_ann_pq(
                df,
                k=5,
                dim=64,
                m=8,
                ksub=16,
                shortlist=20,
                query_filter=F.col("vec_id") < 5,
                books=books,
            ).collect()
        )

    assert run(emb) == run(emb.repartition(8, "vec_id"))


def test_lsh_buckets_all_matches_expression_form(spark, sf_dir):
    """The r7 single-Arrow bucket pass must agree with the per-plane
    expression formulation (lsh_bucket) on every (vector, table) cell —
    same plane family, same sign rule."""
    from ub_etl_spark.operators.vectors import lsh_bucket, lsh_buckets_all

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    base = emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("vec"))
    n_tables, n_planes, dim = 6, 2, 64
    expr = base.select(
        "id",
        *[
            lsh_bucket(F.col("vec"), dim, n_planes, plane_offset=t * n_planes).alias(f"b{t}")
            for t in range(n_tables)
        ],
    )
    ref = {r.id: [r[f"b{t}"] for t in range(n_tables)] for r in expr.collect()}
    got = {
        r.id: list(r.bks)
        for r in base.select(
            "id", lsh_buckets_all(dim, n_planes, n_tables)(F.col("vec")).alias("bks")
        ).collect()
    }
    assert got == ref
