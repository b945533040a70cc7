"""Text-analysis tier (SURVEY.md B5 + north-star text ops).

All on the documents table; everything here is JVM-expression-only
(split/explode/aggregate/regexp), no Python UDFs, so the ops stay inside
whole-stage codegen at 100 TB.  Wraps operators/text.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ub_etl_spark.operators.text import STOPWORDS, bpe_ish_token_count, fingerprint
from ub_etl_spark.registry import register
from ub_etl_spark.sources.tables import load_table as T


def _stop_arr(lang: str):
    return F.array(*[F.lit(w) for w in STOPWORDS[lang]])


def _sql_stoplist(lang: str) -> str:
    return "[" + ", ".join(f"'{w}'" for w in STOPWORDS[lang]) + "]"


# B5: tokenize + per-doc term stats
@register(
    "text_tokenize_stats",
    tier="B",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_uniq,
           CAST(length(text) AS BIGINT) AS len_chars,
           length(text) / len(string_split(text, ' ')) AS mean_tok_len
    FROM documents
    """,
)
def text_tokenize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_uniq"),
        F.length("text").cast("bigint").alias("len_chars"),
        (F.length("text") / F.size(toks)).alias("mean_tok_len"),
    )


# B5: tf-idf — two aggregations + a join, the classic two-pass formulation
@register(
    "text_tfidf",
    tier="B",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ), tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2
    ), df AS (
      SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY 1
    ), n AS (
      SELECT COUNT(*) AS n_docs FROM documents
    )
    SELECT doc_id, term, tf, df,
           floor(CAST(tf AS DOUBLE) * ln(CAST(n_docs AS DOUBLE) / df) * 1000000)
             / 1000000 AS tfidf
    FROM tf JOIN df USING (term) CROSS JOIN n
    """,
)
def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    # df derived FROM tf: tf holds one row per distinct (doc_id, term),
    # so document frequency is a per-term count of the compressed frame.
    # Measured r6 plan facts: Catalyst prunes this branch to exactly the
    # two-phase distinct that groupBy+countDistinct(tok) plans (the tf
    # count buffer is pruned away), so the physical cost is identical —
    # the derivation documents intent, it is not a speedup.  Pruning also
    # defeats ReuseExchange between the branches (the subtrees stop
    # canonicalizing equal), and persisting tf to force single
    # computation measured 1.1-1.4x SLOWER at bench scale (tf is the
    # largest frame in the query — recomputing the pruned branch beats
    # caching it; same finding as text_containment_dedup's gram frame).
    # r10 measured non-changes: deriving df as COUNT(*) OVER (PARTITION
    # BY term) on tf is 0.85s vs 0.74s — the full sort by term costs
    # more than the df-agg exchange it removes (and is the worse shape
    # under term skew at scale: a stopword's rows land on one task,
    # where the agg form partial-aggregates map-side); explicit
    # F.broadcast(df) measured neutral — AQE already converts the term
    # join to BHJ at bench scale.  r11 measured non-changes (the
    # map-side-tf family, trying to delete the (doc_id,term) exchange
    # outright): (a) HOF-index run-length tf — array_sort(s), boundary
    # positions via filter(transform(s,(x,i)->i), ...), pair struct via
    # indexed transform — is PATHOLOGICAL (>150s at sf0.1, killed):
    # CollapseProject substitutes the alias chain back into every
    # lambda-body reference, so array_sort(split(text)) re-evaluates
    # per lambda ELEMENT — O(L^2) re-sorts per doc (the general form of
    # the r6 "materialize the array before a HOF" rule: a projection
    # alias is NOT a materialization barrier when the consumer is
    # collapsible); (b) explode(array_distinct(s)) + per-term
    # size(filter(s, x = term)) keeps the arrays bound post-Generate
    # (no re-split) but is 1.21s vs 0.61s same-run warm min-of-3 — the
    # O(L*U) per-doc filter work exceeds the exchange it removes.  The
    # registered 3-stage plan stands; its bench cost story lives in
    # bench.py ABS_TIME_NOTES (small-oracle regime).
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            # floor-to-6dp: ln differs in the last ulp across engines
            (
                F.floor(
                    F.col("tf").cast("double")
                    * F.log(F.col("n_docs").cast("double") / F.col("df"))
                    * 1e6
                )
                / 1e6
            ).alias("tfidf"),
        )
    )


# Language-ID: stopword-hit argmax heuristic (first-match tie-break)
_LANGS = list(STOPWORDS)
_SCORE_COLS = ", ".join(
    f"CAST(len(list_filter(string_split(lower(text), ' '), x -> list_contains({_sql_stoplist(l)}, x))) AS BIGINT) AS score_{l}"
    for l in _LANGS
)
_GREATEST = "greatest(" + ", ".join(f"score_{l}" for l in _LANGS) + ")"
_PRED_CASE = (
    "CASE WHEN " + _GREATEST + " = 0 THEN 'und' "
    + " ".join(f"WHEN score_{l} = {_GREATEST} THEN '{l}'" for l in _LANGS)
    + " END"
)


@register(
    "text_lang_id",
    tier="B",
    oracle=f"""
    SELECT doc_id, lang, {", ".join(f"score_{l}" for l in _LANGS)},
           {_PRED_CASE} AS predicted
    FROM (SELECT doc_id, lang, {_SCORE_COLS} FROM documents) t
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.col("text")), " ")
    def _hits(lang: str):
        arr = _stop_arr(lang)
        # NB: the lambda must be single-argument — a second parameter would be
        # interpreted by Spark's HOF binder as the element index.
        return F.size(F.filter(toks, lambda x: F.array_contains(arr, x))).cast("bigint")

    scores = {lang: _hits(lang) for lang in _LANGS}
    scored = d.select(
        "doc_id", "lang", *[scores[lang].alias(f"score_{lang}") for lang in _LANGS]
    )
    mx = F.greatest(*[F.col(f"score_{lang}") for lang in _LANGS])
    pred = F.when(mx == 0, F.lit("und"))
    for lang in _LANGS:
        pred = pred.when(F.col(f"score_{lang}") == mx, F.lit(lang))
    return scored.select("*", pred.alias("predicted"))


# Quality scoring: length/punct/stopword features + composite score
@register(
    "text_quality_score",
    tier="B",
    oracle=f"""
    SELECT doc_id, n_tokens, mean_token_len, stopword_ratio, punct_ratio,
           0.4 * least(1.0, n_tokens / 100.0)
             + 0.3 * (1.0 - least(1.0, punct_ratio * 10.0))
             + 0.3 * least(1.0, stopword_ratio * 5.0) AS quality
    FROM (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             length(text) / len(string_split(text, ' ')) AS mean_token_len,
             len(list_filter(string_split(text, ' '),
                 x -> list_contains({_sql_stoplist('en')}, lower(x))))
               / len(string_split(text, ' ')) AS stopword_ratio,
             length(regexp_replace(text, '[^.,;:!?]', '', 'g')) / length(text) AS punct_ratio
      FROM documents
    ) t
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    en = _stop_arr("en")
    n_tok = F.size(toks)
    feats = d.select(
        "doc_id",
        n_tok.cast("bigint").alias("n_tokens"),
        (F.length("text") / n_tok).alias("mean_token_len"),
        (
            F.size(F.filter(toks, lambda x: F.array_contains(en, F.lower(x)))) / n_tok
        ).alias("stopword_ratio"),
        (F.length(F.regexp_replace("text", r"[^.,;:!?]", "")) / F.length("text")).alias(
            "punct_ratio"
        ),
    )
    quality = (
        0.4 * F.least(F.lit(1.0), F.col("n_tokens") / 100.0)
        + 0.3 * (F.lit(1.0) - F.least(F.lit(1.0), F.col("punct_ratio") * 10.0))
        + 0.3 * F.least(F.lit(1.0), F.col("stopword_ratio") * 5.0)
    )
    return feats.select("*", quality.alias("quality"))


# Document fingerprinting: md5 content hash + BPE-ish token count — a
# single shuffle-free projection (greedy-regex piece count, see
# operators/text.py bpe_ish_token_count)
@register(
    "text_fingerprint",
    tier="B",
    oracle=r"""
    SELECT doc_id,
           md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp,
           CAST(
             len(regexp_extract_all(text, '[A-Za-z0-9]{1,4}'))
             + length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g'))
           AS BIGINT) AS n_bpe_tokens
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        fingerprint(F.col("text")).alias("fp"),
        bpe_ish_token_count(F.col("text")).alias("n_bpe_tokens"),
    )


# B56: PMI-scored bigram collocations — the association-mining pass of
# vocabulary/tokenizer analysis ("new york" vs "the the").  Three
# aggregations over one tokenized scan (bigram counts, unigram counts,
# scalar totals); the unigram table joins back twice on the word —
# AQE broadcasts it while the vocab fits and shuffle-joins beyond.
# PMI arithmetic runs in doubles with one canonical operation order on
# both engines, ln floored at 6dp (the ulp-insensitive idiom tf-idf
# established); min-support 5 and a deterministic top-100.
@register(
    "text_collocation_pmi",
    tier="B",
    oracle="""
    WITH toks AS (
      SELECT string_split(text, ' ') AS t FROM documents
    ), pairs AS (
      SELECT t[i] AS w1, t[i+1] AS w2
      FROM toks, UNNEST(generate_series(1, len(t) - 1)) AS g(i)
    ), big AS (
      SELECT w1, w2, COUNT(*) AS c_ab FROM pairs GROUP BY 1, 2
    ), uni AS (
      SELECT w, COUNT(*) AS c FROM (
        SELECT unnest(string_split(text, ' ')) AS w FROM documents
      ) GROUP BY 1
    ), tot AS (
      SELECT (SELECT SUM(c) FROM uni) AS n1, (SELECT SUM(c_ab) FROM big) AS n2
    )
    SELECT w1, w2, c_ab,
           floor(ln(((CAST(c_ab AS DOUBLE) / n2)
                     / ((CAST(a.c AS DOUBLE) / n1) * (CAST(b.c AS DOUBLE) / n1))))
                 * 1000000) / 1000000 AS pmi
    FROM big JOIN uni a ON big.w1 = a.w JOIN uni b ON big.w2 = b.w
    CROSS JOIN tot
    WHERE c_ab >= 5
    ORDER BY pmi DESC, w1, w2 LIMIT 100
    """,
)
def text_collocation_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    base = d.select(toks.alias("__toks"))
    pairs = (
        base.select(F.posexplode("__toks").alias("__pos", "__tok"), F.col("__toks"))
        .filter(F.col("__pos") <= F.size("__toks") - 2)
        .select(
            F.element_at("__toks", F.col("__pos") + 1).alias("w1"),
            F.element_at("__toks", F.col("__pos") + 2).alias("w2"),
        )
    )
    big = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_ab"))
    uni = (
        base.select(F.explode("__toks").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = uni.agg(F.sum("c").alias("n1")).crossJoin(
        big.agg(F.sum("c_ab").alias("n2"))
    )
    a = uni.select(F.col("w").alias("w1"), F.col("c").alias("c_a"))
    b = uni.select(F.col("w").alias("w2"), F.col("c").alias("c_b"))
    ratio = (F.col("c_ab").cast("double") / F.col("n2")) / (
        (F.col("c_a").cast("double") / F.col("n1"))
        * (F.col("c_b").cast("double") / F.col("n1"))
    )
    return (
        big.join(a, "w1")
        .join(b, "w2")
        .crossJoin(F.broadcast(tot))
        .filter(F.col("c_ab") >= 5)
        .select(
            "w1",
            "w2",
            "c_ab",
            (F.floor(F.log(ratio) * 1e6) / 1e6).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), F.asc("w1"), F.asc("w2"))
        .limit(100)
    )


# B61: inverted-index build — term -> sorted posting list of doc ids,
# the search-index construction pass.  One distinct on (doc_id, term)
# then one aggregation; posting arrays only travel the term-keyed
# exchange.  At 100 TB stop-word terms produce |corpus|-sized postings:
# the scale levers are a document-frequency cap (drop terms above a df
# ceiling before collecting) and delta/bitmap-encoding the lists —
# named here, not needed at test scale.
@register(
    "text_inverted_index",
    tier="B",
    oracle="""
    SELECT term,
           array_to_string(list_sort(list(doc_id)), ',') AS postings,
           COUNT(*) AS df
    FROM (
      SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS term
      FROM documents
    ) t
    GROUP BY term
    """,
)
def text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    # postings serialized to a ","-joined string: the driver's pandas
    # canonicalizer cannot hash list cells (tests/test_registry.py pins
    # atomic-only outputs for every oracle'd query).
    d = T(spark, sf_dir, "documents")
    tok = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .distinct()
    )
    return tok.groupBy("term").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list("doc_id")), lambda x: x.cast("string")
            ),
            ",",
        ).alias("postings"),
        F.count(F.lit(1)).alias("df"),
    )


# B67: sliding-window document chunking — long documents become
# fixed-size overlapping token chunks (size 32, stride 24), the
# embedding/retrieval prep step between curation and encoding.  Chunk
# count and boundaries are exact integer arithmetic (ceil via integer
# DIV), the chunk extraction is slice + concat_ws — all codegen, one
# Generate, no shuffle at all: chunking parallelizes embarrassingly.
@register(
    "text_chunk_sliding",
    tier="B",
    oracle="""
    SELECT doc_id, chunk_idx,
           CAST(len(list_slice(t, chunk_idx * 24 + 1, chunk_idx * 24 + 32))
                AS INTEGER) AS n_tokens,
           array_to_string(list_slice(t, chunk_idx * 24 + 1, chunk_idx * 24 + 32),
                           ' ') AS chunk_text
    FROM (
      SELECT doc_id, t,
             UNNEST(generate_series(0,
               CASE WHEN len(t) > 32
                    THEN (len(t) - 32 + 23) // 24 ELSE 0 END)) AS chunk_idx
      FROM (SELECT doc_id, string_split(COALESCE(text, ''), ' ') AS t
            FROM documents) s
    ) g
    """,
)
def text_chunk_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    size, stride = 32, 24
    d = T(spark, sf_dir, "documents")
    # null-safe: concat_ws('') and array_to_string(NULL) disagree across
    # engines, so fold NULL text to '' before tokenizing on BOTH sides
    toks = F.split(F.coalesce(F.col("text"), F.lit("")), " ")
    base = d.select("doc_id", toks.alias("__toks"), F.size(toks).alias("__n"))
    n_extra = F.when(
        F.col("__n") > size,
        F.expr(f"(__n - {size} + {stride - 1}) DIV {stride}"),
    ).otherwise(F.lit(0))
    chunks = base.select(
        "doc_id",
        "__toks",
        F.explode(F.sequence(F.lit(0), n_extra.cast("int"))).alias("chunk_idx"),
    )
    piece = F.slice(F.col("__toks"), F.col("chunk_idx") * stride + 1, size)
    return chunks.select(
        "doc_id",
        "chunk_idx",
        F.size(piece).alias("n_tokens"),
        F.concat_ws(" ", piece).alias("chunk_text"),
    )


# B68: language-ID confusion matrix — the evaluation rollup for the B5
# classifier: labeled lang (truth) x heuristic prediction, with per-cell
# counts and the diagonal flag.  Reuses text_lang_id's exact scoring
# expression tree on both engines, then one tiny (truth, predicted) agg
# — the quality-evaluation query a curation pipeline runs after every
# classifier change.
@register(
    "text_lang_confusion",
    tier="B",
    oracle=f"""
    SELECT lang AS actual, predicted, COUNT(*) AS n,
           lang = predicted AS is_correct
    FROM (
      SELECT lang, {_PRED_CASE} AS predicted
      FROM (SELECT doc_id, lang, {_SCORE_COLS} FROM documents) t
    ) p
    GROUP BY 1, 2, 4
    """,
)
def text_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    pred = text_lang_id(spark, sf_dir).select(
        F.col("lang").alias("actual"), "predicted"
    )
    return pred.groupBy("actual", "predicted").agg(
        F.count(F.lit(1)).alias("n")
    ).select(
        "actual", "predicted", "n", (F.col("actual") == F.col("predicted")).alias("is_correct")
    )


# B82: BM25 relevance ranking — the standard lexical retrieval scorer
# (Robertson/Sparck-Jones; the ranking half every hybrid-search stack
# pairs with embeddings, upgrading B70's shared-term count).  k1=1.2,
# b=0.75.  Per-(doc, term) contributions are floored to 1e-6 and summed
# as LONGS, so the per-doc score is order-independent (a raw double sum
# over terms would hash differently across shuffle orders and engines).
# Shape: tf over the query terms only (the scan prunes to matching
# tokens), df + doc-length stats broadcast — one fact shuffle on doc_id.
_BM25_TERMS = ["data", "join", "stream"]


@register(
    "text_bm25_rank",
    tier="B",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ), dl AS (
      SELECT doc_id, COUNT(*) AS dlen FROM tok GROUP BY 1
    ), stats AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
             CAST(SUM(dlen) AS DOUBLE) / COUNT(*) AS avgdl
      FROM dl
    ), tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM tok
      WHERE term IN ('data', 'join', 'stream') GROUP BY 1, 2
    ), df AS (
      SELECT term, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df FROM tok
      WHERE term IN ('data', 'join', 'stream') GROUP BY 1
    ), contrib AS (
      SELECT tf.doc_id,
             CAST(FLOOR(
               ln(1 + (stats.n_docs - df.df + 0.5) / (df.df + 0.5))
               * (tf.tf * 2.2)
               / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dlen / stats.avgdl))
               * 1000000) AS BIGINT) AS c
      FROM tf
      JOIN df USING (term)
      JOIN dl ON dl.doc_id = tf.doc_id
      CROSS JOIN stats
    )
    SELECT doc_id, SUM(c) / 1000000.0 AS bm25
    FROM contrib GROUP BY doc_id
    ORDER BY bm25 DESC, doc_id
    LIMIT 50
    """,
)
def text_bm25_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    k1, b = 1.2, 0.75
    d = T(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dlen"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        (F.sum("dlen").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    qtok = tok.filter(F.col("term").isin(_BM25_TERMS))
    tf = qtok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = qtok.groupBy("term").agg(
        F.countDistinct("doc_id").cast("double").alias("df")
    )
    contrib = (
        tf.join(F.broadcast(df), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.floor(
                F.log(1 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
                * (F.col("tf") * (k1 + 1))
                / (
                    F.col("tf")
                    + k1 * ((1 - b) + b * F.col("dlen") / F.col("avgdl"))
                )
                * 1e6
            )
            .cast("bigint")
            .alias("c"),
        )
    )
    return (
        contrib.groupBy("doc_id")
        .agg((F.sum("c") / 1e6).alias("bm25"))
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(50)
    )


# ---------------------------------------------------------------------------
# Lexical diversity
# ---------------------------------------------------------------------------


@register(
    "text_lexical_diversity",
    tier="B",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ), tc AS (
      SELECT doc_id, term, COUNT(*) AS c FROM tok GROUP BY doc_id, term
    )
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           COUNT(*) AS n_types,
           CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
           CAST(COUNT(*) AS DOUBLE) / SUM(c) AS ttr,
           CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
             AS hapax_frac
    FROM tc GROUP BY doc_id
    """,
)
def text_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document lexical diversity: type-token ratio and hapax-
    legomenon fraction — the vocabulary-richness signals a corpus
    curation pass reads next to text_quality_gopher (template/boiler-
    plate text has low TTR; OCR noise has high hapax share).  One
    explode -> (doc, term) count -> per-doc rollup; the only shuffle is
    doc_id-keyed (term rides inside the first aggregate's key, standard
    two-level agg).  Ratios are single double divisions of exact counts.
    Scale: identical to text_tfidf's first phase; per-doc state is two
    integers."""
    d = T(spark, sf_dir, "documents")
    tc = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    hapax = F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
    return tc.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        hapax.cast("bigint").alias("n_hapax"),
        (F.count(F.lit(1)).cast("double") / F.sum("c")).alias("ttr"),
        (hapax.cast("double") / F.count(F.lit(1))).alias("hapax_frac"),
    )


# ---------------------------------------------------------------------------
# Zipf rank-frequency fit
# ---------------------------------------------------------------------------

_ZIPF_TOP = 100
_D38Z = "decimal(38,0)"


@register(
    "text_zipf_rank_fit",
    tier="B",
    oracle=f"""
    WITH tf AS (
      SELECT term, COUNT(*) AS f FROM (
        SELECT unnest(string_split(text, ' ')) AS term FROM documents
      ) GROUP BY term
    ), ranked AS (
      SELECT term, f, ROW_NUMBER() OVER (ORDER BY f DESC, term) AS r
      FROM tf
    ), pts AS (
      SELECT CAST(FLOOR(ln(CAST(r AS DOUBLE)) * 1000000) AS BIGINT) AS x,
             CAST(FLOOR(ln(CAST(f AS DOUBLE)) * 1000000) AS BIGINT) AS y
      FROM ranked WHERE r <= {_ZIPF_TOP}
    ), s AS (
      SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
             SUM(CAST(x AS {_D38Z}) * x) AS sxx,
             SUM(CAST(x AS {_D38Z}) * y) AS sxy
      FROM pts
    )
    SELECT n,
           CAST(CAST(n AS {_D38Z}) * sxy - CAST(sx AS {_D38Z}) * sy AS DOUBLE)
             / CAST(CAST(n AS {_D38Z}) * sxx - CAST(sx AS {_D38Z}) * sx
                    AS DOUBLE) AS zipf_slope,
           CAST(CAST(sy AS {_D38Z}) * sxx - CAST(sx AS {_D38Z}) * sxy AS DOUBLE)
             / CAST(CAST(n AS {_D38Z}) * sxx - CAST(sx AS {_D38Z}) * sx
                    AS DOUBLE) / 1000000.0 AS ln_c
    FROM s
    """,
)
def text_zipf_rank_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit over the corpus frequency table: regress ln(freq)
    on ln(rank) for the top-100 terms — slope near -1 says natural-
    language-like frequency decay; far off flags synthetic or templated
    corpora (a corpus-level screen next to the per-doc gates).  Composes
    the repo's exact-regression machinery (agg_linear_regression) with
    the ln-quantization rule (text_tfidf): both ln values floor to
    integer micro-units BEFORE the power sums, products promote to
    DECIMAL(38,0), each coefficient is one double division.  The term
    count aggregates map-side; the rank window runs over |vocab| rows
    (tie-broken by term) and only top-100 points reach the 1-row
    regression.  Scale: vocabulary-sized, fact-independent state."""
    d = T(spark, sf_dir, "documents")
    tf = (
        d.select(F.explode(F.split("text", " ")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    from pyspark.sql import Window as W

    ranked = tf.select(
        "f", F.row_number().over(W.orderBy(F.desc("f"), F.asc("term"))).alias("r")
    ).filter(F.col("r") <= _ZIPF_TOP)
    pts = ranked.select(
        F.floor(F.log(F.col("r").cast("double")) * 1e6).cast("bigint").alias("x"),
        F.floor(F.log(F.col("f").cast("double")) * 1e6).cast("bigint").alias("y"),
    )
    dz = lambda c: c.cast(_D38Z)  # noqa: E731
    s = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(dz(F.col("x")) * F.col("x")).alias("sxx"),
        F.sum(dz(F.col("x")) * F.col("y")).alias("sxy"),
    )
    n, sx, sy, sxx, sxy = (F.col(c) for c in ("n", "sx", "sy", "sxx", "sxy"))
    den = (dz(n) * sxx - dz(sx) * sx).cast("double")
    return s.select(
        "n",
        ((dz(n) * sxy - dz(sx) * sy).cast("double") / den).alias("zipf_slope"),
        ((dz(sy) * sxx - dz(sx) * sxy).cast("double") / den / 1e6).alias("ln_c"),
    )


# ---------------------------------------------------------------------------
# Keyphrase extraction (top-k tf-idf terms per document)
# ---------------------------------------------------------------------------


@register(
    "text_keyphrase_topk",
    tier="B",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ), tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2
    ), df AS (
      SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY 1
    ), n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT doc_id, term,
             floor(CAST(tf AS DOUBLE) * ln(CAST(n_docs AS DOUBLE) / df)
                   * 1000000) / 1000000 AS tfidf
      FROM tf JOIN df USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, tfidf, rk FROM (
      SELECT doc_id, term, tfidf,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY tfidf DESC, term) AS rk
      FROM scored
    ) WHERE rk <= 3
    """,
)
def text_keyphrase_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyphrase extraction: the top-3 tf-idf terms per document — the
    tagging/snippet primitive built on text_tfidf's exact expression
    tree (same quantized-ln score, so ranking is engine-stable: scores
    floor to 6dp BEFORE comparison and ties break on the term).  The
    per-doc rank is a WindowGroupLimit window partitioned on doc_id —
    state bounded by per-doc vocabulary, shuffle keyed like the tf
    aggregate before it (AQE reuses the exchange partitioning).  Scale:
    identical to tf-idf plus a keyed top-k; the df side joins broadcast
    while the vocabulary fits, co-keyed beyond."""
    d = T(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    # df derived FROM tf: tf holds one row per distinct (doc_id, term),
    # so document frequency is a per-term count of the compressed frame.
    # Measured r6 plan facts: Catalyst prunes this branch to exactly the
    # two-phase distinct that groupBy+countDistinct(tok) plans (the tf
    # count buffer is pruned away), so the physical cost is identical —
    # the derivation documents intent, it is not a speedup.  Pruning also
    # defeats ReuseExchange between the branches (the subtrees stop
    # canonicalizing equal), and persisting tf to force single
    # computation measured 1.1-1.4x SLOWER at bench scale (tf is the
    # largest frame in the query — recomputing the pruned branch beats
    # caching it; same finding as text_containment_dedup's gram frame).
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            (
                F.floor(
                    F.col("tf").cast("double")
                    * F.log(F.col("n_docs").cast("double") / F.col("df"))
                    * 1e6
                )
                / 1e6
            ).alias("tfidf"),
        )
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "term", "tfidf", "rk")
    )


# ---------------------------------------------------------------------------
# Unigram language-model log-probability
# ---------------------------------------------------------------------------


@register(
    "text_unigram_logprob",
    tier="B",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ), tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2
    ), cf AS (
      SELECT term, COUNT(*) AS cf FROM tok GROUP BY term
    ), g AS (
      SELECT COUNT(*) AS n_tokens, COUNT(DISTINCT term) AS vocab FROM tok
    ), scored AS (
      SELECT doc_id, tf,
             CAST(FLOOR(ln((CAST(cf AS DOUBLE) + 1.0) / (n_tokens + vocab))
                        * 1000000) AS BIGINT) AS lp_u
      FROM tf JOIN cf USING (term) CROSS JOIN g
    )
    SELECT doc_id,
           CAST(SUM(tf) AS BIGINT) AS n_tokens,
           -(SUM(tf * lp_u) / 1000000.0) / SUM(tf) AS avg_neg_logprob
    FROM scored GROUP BY doc_id
    """,
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document average negative log-probability under the corpus's
    own add-one-smoothed unigram LM — the model-free fluency/typicality
    score an LLM-data pipeline uses before it has a trained model (high
    = rare-token-heavy: OCR noise, boilerplate IDs, wrong-language
    text; the quality-gate sibling of text_quality_gopher with a
    probabilistic footing).  Perplexity = exp(this) is left to the
    consumer: exp's last ulp differs across libm implementations, while
    this output ends at exact integer arithmetic — each term's ln
    QUANTIZES to micro-units, the doc sum weights quantized longs by
    exact tf, and one division closes it.  Corpus stats (token count,
    vocab) are a 1-row broadcast; the per-term frequency join is the
    tf-idf shape.  Scale: identical to text_tfidf.

    Measured non-change (r6): deriving cf from tf (sum) and the globals
    from cf — one corpus explode instead of three — is 0.1-0.15s SLOWER
    at sf0.1 in every A/B pairing: the three explode branches here run
    CONCURRENTLY off one scan (each explode pipelines into its map-side
    partial agg, no materialization), while the derived form serializes
    tf -> cf -> g onto the critical path.  Total map CPU trades against
    stage-graph depth; at bench scale depth wins, and the explode's
    partial aggs keep shuffle volume term-bounded at any scale."""
    d = T(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    cf = tok.groupBy("term").agg(F.count(F.lit(1)).alias("cf"))
    g = tok.agg(
        F.count(F.lit(1)).alias("n_tokens"), F.countDistinct("term").alias("vocab")
    )
    lp_u = F.floor(
        F.log(
            (F.col("cf").cast("double") + 1.0) / (F.col("n_tokens") + F.col("vocab"))
        )
        * 1e6
    ).cast("bigint")
    return (
        tf.join(cf, "term")
        .crossJoin(F.broadcast(g))
        .select("doc_id", "tf", lp_u.alias("lp_u"))
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("bigint").alias("n_tokens"),
            (-(F.sum(F.col("tf") * F.col("lp_u")) / 1e6) / F.sum("tf")).alias(
                "avg_neg_logprob"
            ),
        )
    )
