"""Vector similarity operators over embedding columns (array<float>).

North-star surface (BASELINE.json): brute-force exact top-k as the
correctness baseline, plus a random-hyperplane LSH bucketed variant as the
scale path.  Dot products are JVM-side ``aggregate(zip_with(...))``
expression trees — sequential, deterministic, no Python per row.

Scale notes (100 TB): exact knn is O(|Q| x |C|); keep |Q| bounded (a probe
set) or use the LSH variant, which shuffles once on bucket id and only
scores within-bucket pairs.  Block keys (label) further prune candidates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType


# NB: pass a DataType instance, not a DDL string — string return types are
# parsed against the active session, which doesn't exist at import time.
@F.pandas_udf(DoubleType())
def cosine_batch(a, b):
    """Arrow-vectorized cosine over two array columns.

    Spark's array higher-order functions (aggregate/zip_with) are
    interpreted — ~100x slower than this numpy path on bulk pair scoring.
    Inputs arrive as pandas Series of numpy arrays; computed in float64 to
    match the DOUBLE[] oracle semantics.
    """
    import numpy as np
    import pandas as pd

    A = np.stack(a.to_numpy()).astype(np.float64)
    B = np.stack(b.to_numpy()).astype(np.float64)
    num = np.einsum("ij,ij->i", A, B)
    den = np.sqrt(np.einsum("ij,ij->i", A, A) * np.einsum("ij,ij->i", B, B))
    return pd.Series(num / den)

def dot(a: Column, b: Column) -> Column:
    """Deterministic (sequential) double-precision dot product."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def l2(a: Column, b: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x.cast("double") - y.cast("double")) ** 2),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def knn_exact(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    metric: str = "cosine",
) -> DataFrame:
    """Brute-force top-k neighbors for each query vector.

    Broadcast the (small) query set against the candidate corpus — one scan
    of the corpus, no shuffle of the big side; the per-query top-k is a
    ranking window on (query_id).  Ties broken by candidate id for
    determinism.  Output: (query_id, neighbor_id, score, rank).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = candidates.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                cosine_batch(F.col("q_vec"), F.col("c_vec"))
                if metric == "cosine"
                else -l2(F.col("q_vec"), F.col("c_vec"))
            ).alias("score"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def hyperplane(dim: int, plane_id: int) -> list[float]:
    """Deterministic pseudo-random hyperplane from a hash recurrence
    (no RNG dependency; reproducible across runs and engines)."""
    vals = []
    state = (plane_id * 2654435761 + 97531) & 0xFFFFFFFF
    for _ in range(dim):
        state = (1103515245 * state + 12345) & 0x7FFFFFFF
        vals.append(state / 0x7FFFFFFF - 0.5)
    return vals


def lsh_bucket(vec: Column, dim: int, n_planes: int = 8, plane_offset: int = 0) -> Column:
    """Random-hyperplane LSH bucket id: sign bits of n_planes projections.
    ``plane_offset`` selects an independent plane family (per-table seeds
    for multi-table LSH)."""
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        plane = F.array(*[F.lit(v) for v in hyperplane(dim, plane_offset + p)])
        proj = dot(vec, plane)
        bucket = bucket + F.when(proj > 0, F.shiftleft(F.lit(1).cast("long"), p)).otherwise(
            F.lit(0).cast("long")
        )
    return bucket


def lsh_buckets_all(dim: int, n_planes: int, n_tables: int):
    """Every table's LSH bucket id in ONE Arrow batch pass: returns a
    pandas UDF vec -> array<long> of n_tables bucket ids.

    Same plane family as lsh_bucket (hyperplane(dim, t*n_planes + p));
    the projections run as a single float64 einsum (deterministic
    single-threaded contraction) instead of n_tables*n_planes interpreted
    aggregate/zip_with folds.  r7 rework rationale: the expression form
    paid ~1500 F.lit py4j round trips per BUILD (~2.3s driver-side at 12
    tables x 2 planes x dim 64) before a row ever moved; this closes over
    one (dim, T*P) numpy matrix instead.  Sign flips vs the sequential
    fold are possible only at |proj| ~ ulp — recall is re-measured and
    pinned in tests/test_similarity.py + BOUNDS.json either way."""
    import numpy as np

    from pyspark.sql.types import ArrayType, LongType

    P = np.array(
        [
            hyperplane(dim, t * n_planes + p)
            for t in range(n_tables)
            for p in range(n_planes)
        ],
        dtype=np.float64,
    ).T  # (dim, n_tables * n_planes)
    weights = 1 << np.arange(n_planes, dtype=np.int64)

    @F.pandas_udf(ArrayType(LongType()))
    def buckets(vs):
        import numpy as np
        import pandas as pd

        V = np.stack(vs.to_numpy()).astype(np.float64)
        proj = np.einsum("ij,jk->ik", V, P)
        bits = (proj > 0).astype(np.int64).reshape(len(V), n_tables, n_planes)
        return pd.Series(list((bits * weights).sum(axis=2)))

    return buckets


def knn_ann_lsh(
    embeddings: DataFrame,
    k: int = 5,
    dim: int = 64,
    n_planes: int = 8,
    n_tables: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_filter: Column | None = None,
) -> DataFrame:
    """Approximate top-k: co-bucket candidates by hyperplane LSH, exact
    re-rank within bucket.  One shuffle on (table, bucket).

    Recall knobs (the classic L-tables construction): fewer planes -> bigger
    buckets -> higher per-table collision probability p = (1 - theta/pi)^
    n_planes; ``n_tables`` independent plane families union their candidate
    sets, so pair-recall ~= 1 - (1-p)^n_tables while per-table bucket size
    (and thus scoring cost) stays bounded.  A pair colliding in several
    tables reaches the output once: scoring runs map-side on the join
    output (cosine is idempotent per pair), and the dedup aggregate then
    moves only (ids, score) rows — the r7 rework; the old shape deduped
    BEFORE scoring, so its exchange carried both 64-dim vectors per
    candidate (~40x the bytes of a scored row).
    Output: (query_id, neighbor_id, score, rank)."""
    base = embeddings.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    withb = base.select(
        "id",
        "vec",
        F.posexplode(lsh_buckets_all(dim, n_planes, n_tables)(F.col("vec"))).alias(
            "tbl", "bucket"
        ),
    )
    q = withb.filter(query_filter if query_filter is not None else F.lit(True)).select(
        F.col("id").alias("query_id"), F.col("vec").alias("q_vec"), "tbl", "bucket"
    )
    c = withb.select(
        F.col("id").alias("neighbor_id"), F.col("vec").alias("c_vec"), "tbl", "bucket"
    )
    scored = (
        q.join(c, ["tbl", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_batch(F.col("q_vec"), F.col("c_vec")).alias("score"),
        )
        .groupBy("query_id", "neighbor_id")
        .agg(F.max("score").alias("score"))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivf_centroids(
    embeddings: DataFrame,
    nlist: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    lloyd_iters: int = 1,
) -> list[tuple[int, list[float]]]:
    """Train an IVF coarse quantizer: deterministic seeds + Lloyd refinement.

    Seeds are the embeddings of the nlist ids with smallest xxhash64(id) —
    reproducible across runs/partitionings, no RNG.  Each Lloyd iteration
    assigns every vector to its nearest (cosine) centroid and recomputes
    per-list means DISTRIBUTED: posexplode the vectors to (list, dim_pos)
    cells and hash-aggregate — no driver-side data pass.  Only the
    nlist x dim centroid matrix (metadata-sized) is ever collected.

    The cell means are summed in 1e-9 fixed-point longs, not double —
    double partial sums merge in shuffle-arrival order, which would make
    the "deterministic" quantizer differ run-to-run in the last ulp.
    Component magnitudes ~1 give ~1e9 per cell, so the long sum is exact
    to ~9e9 vectors per list.

    At 100 TB: train on a sampled slice (.sample(fraction)) — the quantizer
    doesn't need every vector; assignment (below) stays full-scale.
    """
    seeds = (
        embeddings.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
        .withColumn("__h", F.xxhash64(F.col("id")))
        # tie-break on the unique id: a hash collision would otherwise
        # make the seed set (hence the trained codebooks) partition-order
        # dependent, breaking the determinism contract (r3 ADVICE)
        .orderBy("__h", "id")
        .limit(nlist)
        .select("vec")
        .collect()
    )
    cents = [(i, [float(x) for x in r.vec]) for i, r in enumerate(seeds)]
    scale = 1e9
    for _ in range(lloyd_iters):
        assign = assign_ivf_list(embeddings, cents, id_col=id_col, vec_col=vec_col)
        cells = assign.select(
            "ivf_list", F.posexplode(F.col(vec_col).cast("array<double>")).alias("pos", "v")
        )
        sums = (
            cells.groupBy("ivf_list", "pos")
            .agg(
                F.sum(F.floor(F.col("v") * scale + F.lit(0.5)).cast("long")).alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
            .groupBy("ivf_list")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "s", "n"))).alias("cells"))
            .collect()
        )
        # lists that captured no vectors keep their previous centroid
        updated = {
            r.ivf_list: [c.s / scale / c.n for c in r.cells] for r in sums
        }
        cents = [(i, updated.get(i, v)) for i, v in cents]
    return cents


def assign_ivf_list(
    embeddings: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Attach ivf_list = argmax-cosine centroid id to every row.

    One Arrow-batched pandas UDF over the full corpus: the centroid matrix
    is a closure constant (nlist x dim floats), so this is a map-only stage
    — no shuffle, no join, scales linearly with the corpus.
    """
    import numpy as np

    C = np.array([v for _, v in centroids], dtype=np.float64)
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
    ids = [i for i, _ in centroids]

    from pyspark.sql.types import IntegerType

    @F.pandas_udf(IntegerType())
    def nearest(vs):
        import pandas as pd

        V = np.stack(vs.to_numpy()).astype(np.float64)
        Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
        arg = np.argmax(Vn @ Cn.T, axis=1)
        return pd.Series(np.asarray(ids, dtype=np.int32)[arg])

    return embeddings.withColumn("ivf_list", nearest(F.col(vec_col)))


def knn_ann_ivf(
    embeddings: DataFrame,
    k: int = 5,
    nlist: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_filter: Column | None = None,
    centroids: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """IVF approximate top-k: coarse-quantize the corpus into nlist inverted
    lists, probe the nprobe nearest lists per query, exact re-rank inside.

    The candidate join is an equi-join on ivf_list (shuffle-partitioned by
    list id; lists are near-balanced by construction of Lloyd means), and
    each query scores ~corpus x nprobe/nlist candidates instead of the full
    corpus.  Pass ``centroids`` (from ivf_centroids) to reuse a trained
    quantizer — the train-once / probe-many shape.
    Output: (query_id, neighbor_id, score, rank).
    """
    import numpy as np

    cents = centroids or ivf_centroids(
        embeddings, nlist=nlist, id_col=id_col, vec_col=vec_col
    )
    C = np.array([v for _, v in cents], dtype=np.float64)
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
    ids = np.asarray([i for i, _ in cents], dtype=np.int32)

    from pyspark.sql.types import ArrayType, IntegerType

    @F.pandas_udf(ArrayType(IntegerType()))
    def probe_lists(vs):
        import pandas as pd

        V = np.stack(vs.to_numpy()).astype(np.float64)
        Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
        order = np.argsort(-(Vn @ Cn.T), axis=1)[:, :nprobe]
        return pd.Series(list(ids[order]))

    corpus = assign_ivf_list(embeddings, cents, id_col=id_col, vec_col=vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"), "ivf_list"
    )
    q = embeddings.filter(query_filter if query_filter is not None else F.lit(True)).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.explode(probe_lists(F.col(vec_col))).alias("ivf_list"),
    )
    scored = (
        q.join(corpus, "ivf_list")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_batch(F.col("q_vec"), F.col("c_vec")).alias("score"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def cosine_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = "label",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine >= t).

    Blocked self-join: only pairs sharing ``block_col`` are scored, the
    standard candidate-pruning move (at 100 TB the block key is an LSH
    bucket; here the testdata ships a label column).
    """
    e = embeddings.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        *( [F.col(block_col).alias("blk")] if block_col else [F.lit(0).alias("blk")] ),
    )
    a = e.alias("a")
    b = e.alias("b")
    return (
        a.join(b, (F.col("a.blk") == F.col("b.blk")) & (F.col("a.id") < F.col("b.id")))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            cosine_batch(F.col("a.vec"), F.col("b.vec")).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def mmr_rerank(
    candidates: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    lam: float = 0.7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal-marginal-relevance re-rank of knn candidates: greedily pick
    the candidate maximizing lam*relevance - (1-lam)*max_cosine_to_already
    _selected — relevance-with-diversity, the standard retrieval re-rank.

    MMR is inherently sequential WITHIN a query (each pick depends on the
    previous picks) but embarrassingly parallel ACROSS queries, so the
    shape is applyInPandas over groupBy(query_id): each group holds one
    query's <= k_cand candidate rows (bounded, typically 10-100), and the
    greedy loop runs vectorized numpy inside the Arrow batch.  This is
    the sanctioned per-group-iterative pattern — a window/join
    formulation cannot express the data-dependent selection order.
    Ties break on neighbor_id (deterministic).  Input `candidates`:
    (query_id, neighbor_id, score) from knn_exact; `corpus` supplies the
    candidate vectors.  Output: (query_id, neighbor_id, score, mmr_rank).
    """
    import numpy as np
    import pandas as pd

    withvec = candidates.join(
        corpus.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
        ),
        "neighbor_id",
    ).select("query_id", "neighbor_id", "score", "c_vec")

    def rerank(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["score", "neighbor_id"], ascending=[False, True])
        vecs = np.stack(pdf["c_vec"].to_numpy()).astype("float64")
        norms = np.linalg.norm(vecs, axis=1)
        norms[norms == 0] = 1.0
        unit = vecs / norms[:, None]
        rel = pdf["score"].to_numpy()
        n = len(pdf)
        chosen: list[int] = []
        remaining = list(range(n))
        while remaining and len(chosen) < k:
            if not chosen:
                best = remaining[0]  # pre-sorted: top relevance, id tie-break
            else:
                sims = unit[remaining] @ unit[chosen].T
                max_sim = sims.max(axis=1)
                mmr = lam * rel[remaining] - (1.0 - lam) * max_sim
                # stable argmax: first index wins ties (sorted order above)
                best = remaining[int(np.argmax(mmr))]
            chosen.append(best)
            remaining.remove(best)
        out = pdf.iloc[chosen][["query_id", "neighbor_id", "score"]].copy()
        out["mmr_rank"] = range(1, len(chosen) + 1)
        return out

    return withvec.groupBy("query_id").applyInPandas(
        rerank, schema="query_id long, neighbor_id long, score double, mmr_rank int"
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) — the third ANN scale path beside LSH and IVF
# ---------------------------------------------------------------------------


def pq_codebooks(
    embeddings: DataFrame,
    dim: int = 64,
    m: int = 8,
    ksub: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    lloyd_iters: int = 1,
) -> list[list[list[float]]]:
    """Train PQ codebooks: m subspaces of dim/m components, ksub centroids
    each (Jegou et al., "Product Quantization for Nearest Neighbor
    Search", TPAMI 2011 — public literature).

    Deterministic like ivf_centroids: seeds are the slices of the ksub
    smallest-xxhash64(id) rows; ONE distributed Lloyd pass refines all m
    subspaces together — assignment is a single Arrow-batched UDF (the
    m x ksub x dsub codebook is closure metadata), the recompute is one
    (subspace, code, pos) hash aggregate in 1e-9 fixed-point longs (the
    ivf_centroids determinism rule).  Only codebook-sized data reaches
    the driver.  Returns codebooks[j][c] = centroid vector (len dim/m).

    At 100 TB: train on a sample; encoding (below) stays full-scale and
    map-only.
    """
    assert dim % m == 0, "m must divide dim"
    dsub = dim // m
    seeds = (
        embeddings.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
        .withColumn("__h", F.xxhash64(F.col("id")))
        # tie-break on the unique id (r3 ADVICE): hash collisions must not
        # make the codebook seeds partition-order dependent
        .orderBy("__h", "id")
        .limit(ksub)
        .select("vec")
        .collect()
    )
    books = [
        [[float(x) for x in r.vec[j * dsub : (j + 1) * dsub]] for r in seeds]
        for j in range(m)
    ]
    scale = 1e9
    for _ in range(lloyd_iters):
        coded = pq_encode(embeddings, books, id_col=id_col, vec_col=vec_col)
        cells = coded.select(
            F.posexplode(F.col("pq_codes")).alias("sub", "code"),
            F.col(vec_col).cast("array<double>").alias("v"),
        ).select(
            "sub",
            "code",
            F.posexplode(
                F.slice(F.col("v"), F.col("sub") * dsub + 1, dsub)
            ).alias("pos", "x"),
        )
        sums = (
            cells.groupBy("sub", "code", "pos")
            .agg(
                F.sum(F.floor(F.col("x") * scale + F.lit(0.5)).cast("long")).alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        upd: dict[tuple[int, int], dict[int, float]] = {}
        for r in sums:
            upd.setdefault((r.sub, r.code), {})[r.pos] = r.s / scale / r.n
        books = [
            [
                [
                    upd.get((j, c), {}).get(p, books[j][c][p])
                    for p in range(dsub)
                ]
                for c in range(ksub)
            ]
            for j in range(m)
        ]
    return books


def pq_encode(
    embeddings: DataFrame,
    books: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Attach pq_codes (array<int>, length m): per-subspace nearest
    centroid by L2.  Map-only Arrow stage; the codebook is closure
    metadata.  The 8-byte-per-vector code column is what shuffles or
    stores downstream — a 32x compression of a 64-dim float vector."""
    import numpy as np

    B = np.array(books, dtype=np.float64)  # (m, ksub, dsub)
    m, ksub, dsub = B.shape

    from pyspark.sql.types import ArrayType, IntegerType

    @F.pandas_udf(ArrayType(IntegerType()))
    def encode(vs):
        import pandas as pd

        V = np.stack(vs.to_numpy()).astype(np.float64)  # (n, dim)
        S = V.reshape(len(V), m, dsub)  # (n, m, dsub)
        codes = _pq_assign(S, B).astype(np.int32)  # (n, m)
        return pd.Series(list(codes))

    return embeddings.withColumn("pq_codes", encode(F.col(vec_col)))


def _pq_assign(S, B):
    """Per-subspace nearest-centroid codes via the BLAS identity
    argmin_c ||s - c||^2 = argmin_c (||c||^2 - 2<s, c>) — one einsum
    matmul instead of materializing the (n, m, ksub, dsub) difference
    tensor (the r6 form peaked at ~300MB temporaries per Arrow batch and
    was the slow half of both encode and codebook training)."""
    import numpy as np

    C2 = np.einsum("jcd,jcd->jc", B, B)  # (m, ksub)
    ip = np.einsum("njd,jcd->njc", S, B)  # (n, m, ksub)
    return (C2[None, :, :] - 2.0 * ip).argmin(axis=2)


def knn_ann_pq(
    embeddings: DataFrame,
    k: int = 5,
    dim: int = 64,
    m: int = 8,
    ksub: int = 16,
    shortlist: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_filter=None,
    books: list[list[list[float]]] | None = None,
) -> DataFrame:
    """PQ approximate top-k with asymmetric distance computation (ADC) +
    exact re-rank: encode the corpus once (map-only), score every
    (query, candidate) through per-query lookup tables LUT[j][code] =
    <q_subvector, centroid> — m table adds per candidate instead of a
    dim-wide dot product — keep the top ``shortlist`` per query, then
    exact-cosine re-rank only the shortlist.

    The query set is BOUNDED and collected (the knn_exact broadcast-probe
    convention); its LUT stack (|Q| x m x ksub doubles) is closure
    metadata for one fused encode+ADC mapInPandas pass over the corpus
    vectors (pq_encode stays exposed for persist-the-codes use).  Nothing
    corpus-sized is collected; the only shuffles are the per-query top-k
    windows.  Scale levers: m/ksub trade code size vs fidelity,
    ``shortlist`` trades re-rank cost vs recall; at 1e9+ vectors compose
    with IVF lists (IVF-PQ) so ADC runs per probed list only.
    Output: (query_id, neighbor_id, score, rank) like the other knn ops.
    """
    import numpy as np

    bks = books or pq_codebooks(
        embeddings, dim=dim, m=m, ksub=ksub, id_col=id_col, vec_col=vec_col
    )
    B = np.array(bks, dtype=np.float64)  # (m, ksub, dsub)
    dsub = dim // m
    qrows = (
        embeddings.filter(query_filter if query_filter is not None else F.lit(True))
        .select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qv"))
        .collect()
    )
    qids = np.array([r.qid for r in qrows], dtype=np.int64)
    Q = np.stack([np.asarray(r.qv, dtype=np.float64) for r in qrows])
    # ADC inner-product tables: LUT[q, j, c] = <Q[q] subspace j, B[j, c]>
    # ADC approximates the INNER PRODUCT (per-query monotone in cosine up
    # to candidate norms); the exact-cosine re-rank of the shortlist
    # absorbs the norm mismatch — recall pinned in tests/test_similarity
    LUT = np.einsum("qjd,jcd->qjc", Q.reshape(len(Q), m, dsub), B)

    # Fused encode+ADC (r7): ONE mapInPandas pass reads the raw vector
    # column, derives the codes in-batch (identical assignment rule to
    # pq_encode — shared _pq_assign), scores through the LUTs, and emits
    # only each batch's top-``shortlist`` rows per query under the same
    # total order the downstream window uses (approx desc, neighbor_id
    # asc) — so batch-local pruning is EXACT, not approximate.  vs the r6
    # two-stage shape (pq_encode Arrow pass -> codes -> second ADC Arrow
    # pass emitting |Q| x n rows) this removes a whole Python stage and
    # caps Arrow output at |Q| x shortlist per batch; at bench scale the
    # removed per-stage fixed costs were the dominant term (3.25s driver
    # sample -> ~1s steady), and at 100 TB the output bound is what keeps
    # the shuffle behind the window proportional to |Q|, not corpus size.
    def adc_fused(batches):
        import pandas as pd

        for pdf in batches:
            V = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            nid = pdf[id_col].to_numpy()
            codes = _pq_assign(V.reshape(len(V), m, dsub), B)  # (b, m)
            # approx[q, i] = sum_j LUT[q, j, codes[i, j]]: gather along the
            # code axis then reduce subspaces -> (|Q|, b)
            gathered = np.take_along_axis(
                LUT, np.broadcast_to(codes.T[None, :, :], (len(qids), m, len(nid))), axis=2
            )
            approx = gathered.sum(axis=1)  # (|Q|, b)
            t = min(shortlist, approx.shape[1])
            frames = []
            for qi in range(len(qids)):
                keep = nid != qids[qi]
                a, n_ = approx[qi][keep], nid[keep]
                # exact batch-local top-t under (approx desc, id asc)
                order = np.lexsort((n_, -a))[:t]
                frames.append(
                    pd.DataFrame(
                        {
                            "query_id": qids[qi],
                            "neighbor_id": n_[order],
                            "approx": a[order],
                        }
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    scored = embeddings.select(id_col, vec_col).mapInPandas(
        adc_fused, schema="query_id long, neighbor_id long, approx double"
    )
    w = W.partitionBy("query_id").orderBy(F.desc("approx"), F.asc("neighbor_id"))
    short = (
        scored.withColumn("prank", F.row_number().over(w))
        .filter(F.col("prank") <= shortlist)
        .select("query_id", "neighbor_id")
    )
    # exact re-rank of the shortlist only.  qdf is rebuilt from the rows
    # ALREADY collected for the LUTs (no second corpus scan), and the
    # bounded |Q| x shortlist side is what gets broadcast against the
    # corpus — the only join direction that survives a 100 TB corpus
    # (the r6 shape shuffled the corpus to meet the shortlist)
    qdf = embeddings.sparkSession.createDataFrame(
        [(int(r.qid), [float(x) for x in r.qv]) for r in qrows],
        "query_id long, q_vec array<double>",
    )
    cdf = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    rer = cdf.join(
        F.broadcast(short.join(qdf, "query_id")), "neighbor_id"
    ).select(
        "query_id",
        "neighbor_id",
        cosine_batch(F.col("q_vec"), F.col("c_vec")).alias("score"),
    )
    w2 = W.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return rer.withColumn("rank", F.row_number().over(w2)).filter(F.col("rank") <= k)
