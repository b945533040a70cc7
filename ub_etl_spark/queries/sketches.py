"""Mergeable-sketch queries: the at-scale architecture for approximate
distinct counts and heavy-hitter frequencies.

The point of sketches at 100 TB is MERGEABILITY: build small partial
sketches per partition/day/source (map-side), union them later without
touching raw data again.  Both queries are rows-only under the driver
gate (sketch estimates are engine-specific bit patterns); their accuracy
contracts are pinned in tests/test_sketches.py against exact answers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ub_etl_spark.registry import register
from ub_etl_spark.sources.tables import load_table as T


# Per-group HLL sketches + a union-of-sketches estimate: the standard
# "sketch per segment, merge for any rollup" distinct-count design.
# Plain approx_count_distinct answers one grouping; persisted HLL sketches
# answer every future rollup without rescanning — that is the 100 TB win.
@register("agg_hll_mergeable", tier="Q", oracle=None)
def agg_hll_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    sk = o.groupBy("o_orderstatus").agg(F.hll_sketch_agg("o_custkey").alias("sk"))
    per_status = sk.select(
        "o_orderstatus", F.hll_sketch_estimate("sk").alias("est_distinct")
    )
    overall = sk.agg(F.hll_union_agg("sk").alias("u")).select(
        F.lit("ALL").alias("o_orderstatus"),
        F.hll_sketch_estimate("u").alias("est_distinct"),
    )
    return per_status.unionByName(overall)


# Count-min sketch over document tokens, probed for a fixed term list.
# The sketch build is one distributed pass (only the KB-sized sketch
# reaches the driver — same metadata-only pattern as IVF centroids); the
# probe list is bounded, so the output frame is tiny.
PROBE_TERMS = ["spark", "window", "batch", "the", "zzz_absent_term"]


@register("agg_cms_term_counts", tier="B", oracle=None)
def agg_cms_term_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents")
    toks = d.select(F.explode(F.split("text", " ")).alias("term"))
    sk_bytes = toks.agg(
        F.count_min_sketch(
            "term", F.lit(0.0001), F.lit(0.99), F.lit(42)
        ).alias("s")
    ).head()["s"]
    # deserialize the sketch JVM-side to probe it (PySpark 4 has no Python
    # wrapper); the JVM String hashing matches the SQL aggregate's
    # UTF8String hashing, which tests/test_sketches.py verifies against
    # exact counts
    jvm = spark.sparkContext._jvm
    bis = jvm.java.io.ByteArrayInputStream(bytes(sk_bytes))
    cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(bis)
    rows = [(t, cms.estimateCount(t)) for t in PROBE_TERMS]
    # emit as a VALUES LocalRelation, not createDataFrame: a
    # python-parallelize frame costs one python worker launch per parent
    # partition at execution (measured 4-6 s behind coalesce(1), which
    # chains all 32 launches into one sequential task); the literal
    # relation is pure Catalyst and costs nothing.  Terms pass as named
    # args, not interpolated literals (quote/backslash safety).
    marks = ", ".join(
        f"(:t{i}, CAST(:n{i} AS BIGINT))" for i in range(len(rows))
    )
    args = {}
    for i, (t, n) in enumerate(rows):
        args[f"t{i}"] = t
        args[f"n{i}"] = int(n)
    return spark.sql(
        f"SELECT * FROM VALUES {marks} AS t(term, est_count)", args=args
    )


# KMV (k-minimum-values) distinct sketch built from PURE DataFrame ops —
# no JVM sketch library: hash each key to (0,1], keep each group's k
# smallest, estimate distinct = (k-1)/kth_min.  The point next to HLL
# (which wraps the datasketches aggregate) is transparent mergeability:
# the k smallest of a UNION of per-group k-smallest sets equals the k
# smallest of the union of the full sets (any global top-k element is in
# its own group's top-k), so the merged "ALL" estimate is computed from
# the per-group sketch rows alone — no second scan, and the same
# union/re-rank works across days/sources/partitions at 100 TB.
_KMV_K = 256


@register("agg_kmv_distinct", tier="B", oracle=None)
def agg_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-status + merged-ALL distinct-customer estimates via KMV
    (k=256, stderr ~ 1/sqrt(k-1) ~ 6.3%).  Groups with fewer than k
    distinct hashes report exactly (the sketch IS the value set there —
    KMV degrades to exact, unlike HLL).  Rows-only under the driver gate
    (xxhash64 has no DuckDB analogue); the relative-error and the exact
    merge-consistency property are pinned in tests/test_sketches.py and
    measured into BOUNDS.json."""
    from pyspark.sql import Window

    o = T(spark, sf_dir, "orders")
    h = (
        F.xxhash64("o_custkey").bitwiseAND(F.lit((1 << 63) - 1)).cast("double")
        / float(1 << 63)
    )
    hashed = (
        o.select("o_orderstatus", h.alias("h"))
        .groupBy("o_orderstatus", "h")
        .agg(F.lit(1).alias("_"))
        .drop("_")
    )
    w = Window.partitionBy("o_orderstatus").orderBy("h")
    kept = hashed.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= _KMV_K
    )

    def estimate(df: DataFrame, grp) -> DataFrame:
        agg = df.groupBy(grp).agg(
            F.count(F.lit(1)).alias("n_kept"), F.max("h").alias("kth")
        )
        return agg.select(
            F.col(grp).alias("o_orderstatus"),
            F.when(F.col("n_kept") < _KMV_K, F.col("n_kept").cast("double"))
            .otherwise((_KMV_K - 1) / F.col("kth"))
            .alias("est_distinct"),
        )

    per_status = estimate(kept, "o_orderstatus")
    w_all = Window.orderBy("h")
    merged = (
        kept.select("h")
        .groupBy("h")
        .agg(F.lit(1).alias("_"))
        .drop("_")
        .withColumn("rn", F.row_number().over(w_all))
        .filter(F.col("rn") <= _KMV_K)
        .withColumn("g", F.lit("ALL"))
    )
    all_row = estimate(merged, "g")
    return per_status.unionByName(all_row)


# HLL set-algebra: intersection estimate via inclusion-exclusion over
# mergeable sketches — |A∩B| ≈ est(A) + est(B) − est(A∪B).  The audience
# -overlap / cross-segment question answered from STORED per-segment
# sketches with no rescan of either side (the whole point of keeping
# sketches instead of counts: union is lossless, so any rollup of the
# sketched segments — including this difference form — needs only the
# KB-sized sketch states).  Rows-only: sketch internals have no SQL
# twin; the inclusion-exclusion error (union errors compound into the
# difference) is measured into BOUNDS.json and pinned in
# tests/test_sketches.py.
@register("agg_hll_intersection", tier="B")
def agg_hll_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    sk = (
        o.filter(F.col("o_orderpriority").isin("1-URGENT", "5-LOW"))
        .groupBy("o_orderpriority")
        .agg(F.hll_sketch_agg("o_custkey").alias("sk"))
    )
    per = sk.select(
        "o_orderpriority", F.hll_sketch_estimate("sk").alias("est")
    )
    a = per.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("est").alias("est_a")
    )
    b = per.filter(F.col("o_orderpriority") == "5-LOW").select(
        F.col("est").alias("est_b")
    )
    u = sk.agg(F.hll_union_agg("sk").alias("un")).select(
        F.hll_sketch_estimate("un").alias("est_union")
    )
    return (
        a.crossJoin(F.broadcast(b))
        .crossJoin(F.broadcast(u))
        .select(
            "est_a",
            "est_b",
            "est_union",
            (F.col("est_a") + F.col("est_b") - F.col("est_union")).alias(
                "est_intersection"
            ),
        )
    )
