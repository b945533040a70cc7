"""Sketch accuracy contracts (rows-only queries need repo-side bounds):
HLL estimates within standard error, CMS within its epsilon guarantee."""

from __future__ import annotations

from pyspark.sql import functions as F

from ub_etl_spark.queries.sketches import PROBE_TERMS, agg_cms_term_counts, agg_hll_mergeable


def test_hll_estimates_within_relative_error(spark, sf_dir):
    got = {r.o_orderstatus: r.est_distinct for r in agg_hll_mergeable(spark, sf_dir).collect()}
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    exact_per = {
        r.o_orderstatus: r.n
        for r in o.groupBy("o_orderstatus")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    exact_all = o.agg(F.countDistinct("o_custkey").alias("n")).first().n
    exact_per["ALL"] = exact_all
    assert set(got) == set(exact_per)
    for k, est in got.items():
        rel = abs(est - exact_per[k]) / max(exact_per[k], 1)
        print(f"hll {k}: est={est} exact={exact_per[k]} rel_err={rel:.4f}")
        # default lgConfigK=12 -> standard error ~1.6%; allow 3 sigma
        assert rel <= 0.05, (k, est, exact_per[k])


def test_hll_union_is_order_insensitive(spark, sf_dir):
    a = {r.o_orderstatus: r.est_distinct for r in agg_hll_mergeable(spark, sf_dir).collect()}
    b = {r.o_orderstatus: r.est_distinct for r in agg_hll_mergeable(spark, sf_dir).collect()}
    assert a == b


def test_cms_bounds(spark, sf_dir):
    got = {r.term: r.est_count for r in agg_cms_term_counts(spark, sf_dir).collect()}
    toks = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.explode(F.split("text", " ")).alias("term")
    )
    total = toks.count()
    exact = {
        r.term: r.n
        for r in toks.filter(F.col("term").isin(PROBE_TERMS))
        .groupBy("term")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for t in PROBE_TERMS:
        true = exact.get(t, 0)
        est = got[t]
        # CMS guarantee: never undercounts; overcount <= eps * N w.p. conf
        assert est >= true, (t, est, true)
        assert est <= true + 0.0001 * total + 1, (t, est, true, total)


def test_kmv_estimates_within_error_and_exact_for_small_groups(spark, sf_dir):
    from ub_etl_spark.queries.sketches import _KMV_K, agg_kmv_distinct
    from ub_etl_spark.sources.tables import load_table

    got = {r.o_orderstatus: r.est_distinct for r in agg_kmv_distinct(spark, sf_dir).collect()}
    o = load_table(spark, sf_dir, "orders")
    exact = {
        r.o_orderstatus: r.n
        for r in o.groupBy("o_orderstatus").agg(F.countDistinct("o_custkey").alias("n")).collect()
    }
    exact["ALL"] = o.agg(F.countDistinct("o_custkey")).first()[0]
    for k, true in exact.items():
        if true < _KMV_K:
            # KMV degrades to the exact value set below k
            assert got[k] == float(true), (k, got[k], true)
        else:
            # 3-sigma bound at stderr ~ 1/sqrt(k-1)
            assert abs(got[k] - true) / true <= 3.0 / (_KMV_K - 1) ** 0.5, (k, got[k], true)


def test_kmv_merge_equals_from_scratch(spark, sf_dir):
    """The merged ALL row (re-rank of per-group sketch rows) must EQUAL
    the KMV computed from scratch over the ungrouped data — the
    mergeability identity, exactly, not approximately."""
    from pyspark.sql import Window

    from ub_etl_spark.queries.sketches import _KMV_K, agg_kmv_distinct
    from ub_etl_spark.sources.tables import load_table

    got_all = {
        r.o_orderstatus: r.est_distinct for r in agg_kmv_distinct(spark, sf_dir).collect()
    }["ALL"]
    o = load_table(spark, sf_dir, "orders")
    h = (
        F.xxhash64("o_custkey").bitwiseAND(F.lit((1 << 63) - 1)).cast("double")
        / float(1 << 63)
    )
    scratch = (
        o.select(h.alias("h")).distinct()
        .withColumn("rn", F.row_number().over(Window.orderBy("h")))
        .filter(F.col("rn") <= _KMV_K)
    )
    n_kept, kth = scratch.agg(F.count("*"), F.max("h")).first()
    expect = float(n_kept) if n_kept < _KMV_K else (_KMV_K - 1) / kth
    assert got_all == expect


def test_hll_intersection_error_bound(spark, sf_dir):
    """Inclusion-exclusion intersection estimate: relative error vs the
    exact intersection stays within 15% (union errors compound into the
    difference — looser than the 5% single-sketch bound, and measured
    into BOUNDS.json)."""
    from ub_etl_spark.queries.sketches import agg_hll_intersection

    r = agg_hll_intersection(spark, sf_dir).first()
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    a = {x.o_custkey for x in o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey").distinct().collect()}
    b = {x.o_custkey for x in o.filter(F.col("o_orderpriority") == "5-LOW").select("o_custkey").distinct().collect()}
    exact = len(a & b)
    assert exact > 0
    rel = abs(r.est_intersection - exact) / exact
    print(f"hll intersection: est={r.est_intersection:.1f} exact={exact} rel_err={rel:.4f}")
    assert rel <= 0.15
    # identity: est_intersection == est_a + est_b - est_union by construction
    assert abs(r.est_intersection - (r.est_a + r.est_b - r.est_union)) < 1e-9
