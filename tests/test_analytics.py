"""Warehouse-analytics composite tests (SURVEY.md B41-B45): semantic
invariants the oracle hash alone doesn't pin — local-supplier join
restriction, cohort accounting identities, histogram completeness,
per-group rank bounds, survivorship priority order."""

from __future__ import annotations

from pyspark.sql import functions as F

from ub_etl_spark.queries.analytics import (
    agg_histogram_fixed_width,
    dedup_source_priority,
    events_retention_cohort,
    tpch_q5_local_supplier,
    window_topk_per_group,
)
from ub_etl_spark.sources.tables import load_table


def test_q5_local_supplier_nations_within_region(spark, sf_dir):
    """Every output nation must belong to the filtered region (the join
    chain region->nation->customer enforces it; a bad join key would leak
    other regions' nations)."""
    out = {r.n_name for r in tpch_q5_local_supplier(spark, sf_dir).collect()}
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia = {
        row.n_name
        for row in n.join(r, n.n_regionkey == r.r_regionkey).select("n_name").collect()
    }
    assert out and out <= asia


def test_retention_cohort_week_zero_counts_all_users(spark, sf_dir):
    """Offset 0 per cohort must count exactly the users whose first event
    falls in that week — summing offset-0 rows equals the distinct user
    count (every user is active in their own first week)."""
    df = events_retention_cohort(spark, sf_dir)
    week0 = df.filter(F.col("week_offset") == 0).agg(F.sum("n_users")).collect()[0][0]
    n_users = load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    assert week0 == n_users
    # offsets are never negative (activity cannot precede the first event)
    assert df.filter(F.col("week_offset") < 0).count() == 0


def test_histogram_buckets_partition_the_table(spark, sf_dir):
    """Bucket counts must sum to the row count (total partition, no row
    dropped or double-bucketed) and bucket ids stay in [0, 19]."""
    rows = agg_histogram_fixed_width(spark, sf_dir).collect()
    total = load_table(spark, sf_dir, "orders").count()
    assert sum(r.n_orders for r in rows) == total
    assert all(0 <= r.bucket <= 19 for r in rows)


def test_topk_per_group_rank_bounds(spark, sf_dir):
    """Each nation contributes at most 3 rows, ranks are 1..3 without
    gaps, and revenue is non-increasing in rank within a nation."""
    rows = window_topk_per_group(spark, sf_dir).collect()
    by_nation: dict[str, list] = {}
    for r in rows:
        by_nation.setdefault(r.n_name, []).append(r)
    for grp in by_nation.values():
        grp.sort(key=lambda r: r.rn)
        assert [r.rn for r in grp] == list(range(1, len(grp) + 1))
        assert len(grp) <= 3
        revs = [r.revenue for r in grp]
        assert revs == sorted(revs, reverse=True)


def test_dedup_source_priority_picks_lowest_rank(spark):
    """Within a duplicate group the survivor is the lowest source rank,
    tie-broken by doc_id; member count covers the whole group."""
    df = spark.createDataFrame(
        [
            (1, "src5", "Same   doc!"),
            (2, "src2", "same doc"),
            (3, "src2", "SAME DOC"),
            (9, "src0", "a unique doc"),
        ],
        "doc_id long, source string, text string",
    )

    from ub_etl_spark.operators.training import survivorship_dedup

    rank = F.substring("source", 4, 10).cast("bigint")
    out = survivorship_dedup(df, "doc_id", "source", rank, "text")
    got = {(r.doc_id, r.source, r.n_members) for r in out.collect()}
    # group {1,2,3}: rank 2 beats rank 5; doc 2 beats doc 3 on the tie
    assert got == {(2, "src2", 3), (9, "src0", 1)}


def test_dedup_source_priority_total_membership(spark, sf_dir):
    """Member counts sum to the corpus size (survivorship never drops or
    double-counts a record)."""
    out = dedup_source_priority(spark, sf_dir)
    total = out.agg(F.sum("n_members")).collect()[0][0]
    assert total == load_table(spark, sf_dir, "documents").count()


def test_multi_rollup_levels_are_consistent(spark, sf_dir):
    """Rollup accounting: hourly rows sum to the daily subtotal, daily
    subtotals sum to the grand total, grand total equals the table count."""
    from ub_etl_spark.queries.timeseries import timeseries_multi_rollup

    rows = timeseries_multi_rollup(spark, sf_dir).collect()
    hourly = [r for r in rows if r.gid == 0]
    daily = [r for r in rows if r.gid == 1]
    total = [r for r in rows if r.gid == 3]
    assert len(total) == 1
    assert sum(r.n_events for r in hourly) == total[0].n_events
    assert sum(r.n_events for r in daily) == total[0].n_events
    n = load_table(spark, sf_dir, "events").count()
    assert total[0].n_events == n


def test_transition_counts_total(spark, sf_dir):
    """Each user with k events contributes exactly k-1 transitions."""
    from ub_etl_spark.queries.analytics import events_transition_counts

    got = (
        events_transition_counts(spark, sf_dir)
        .agg(F.sum("n_transitions"))
        .collect()[0][0]
    )
    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").count().collect()
    assert got == sum(r["count"] - 1 for r in per_user)


def test_anomaly_mad_flags_planted_outlier(spark):
    """A planted far outlier is flagged; the tight cluster is not."""
    from ub_etl_spark.operators import asof  # noqa: F401  (import parity)

    rows = [(i, "a", 10.0 + (i % 3) * 0.1) for i in range(20)] + [(99, "a", 1e6)]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    m = df.groupBy("event_type").agg(F.percentile("value", 0.5).alias("med"))
    d = df.join(m, "event_type").select(
        "event_type", F.abs(F.col("value") - F.col("med")).alias("dev")
    )
    s = d.groupBy("event_type").agg(F.percentile("dev", 0.5).alias("mad"))
    out = (
        d.join(s, "event_type")
        .agg(
            F.sum(
                F.when(F.col("dev") > 3 * 1.4826 * F.col("mad"), 1).otherwise(0)
            ).alias("n")
        )
        .collect()[0][0]
    )
    assert out == 1


def test_centroid_shape_and_zero_mean_pair(spark):
    """Two opposite vectors under one label average to the zero vector;
    output is exactly |labels| x dim rows."""
    from ub_etl_spark.functions.exact import cavg

    df = spark.createDataFrame(
        [(1, 0, [1.5, -2.0]), (2, 0, [-1.5, 2.0]), (3, 1, [4.0, 4.0])],
        "vec_id long, label int, embedding array<float>",
    )
    out = (
        df.select("label", F.posexplode("embedding").alias("pos", "val"))
        .groupBy("label", "pos")
        .agg(cavg(F.col("val").cast("double"), "centroid_val", scale=6))
        .collect()
    )
    assert len(out) == 4
    vals = {(r.label, r.pos): r.centroid_val for r in out}
    assert vals[(0, 0)] == 0.0 and vals[(0, 1)] == 0.0
    assert vals[(1, 0)] == 4.0 and vals[(1, 1)] == 4.0


def test_incremental_batch_dedup_excludes_corpus_forms(spark):
    """Batch rows whose normalized form exists in the corpus are dropped;
    fresh forms fold to min id with the right member count."""
    from ub_etl_spark.operators.training import normalize_text

    d = spark.createDataFrame(
        [
            (10, "brand new doc"),
            (20, "Brand NEW doc!"),   # same form as 10 -> folds, id 10 wins
            (30, "already ingested"),  # exists in corpus (id 7) -> dropped
            (7, "Already ingested."),  # corpus
            (3, "other corpus doc"),   # corpus
        ],
        "doc_id long, text string",
    )
    key = F.xxhash64(normalize_text(F.col("text"))).alias("__nh")
    batch = (
        d.filter(F.col("doc_id") % 10 == 0)
        .select("doc_id", key)
        .groupBy("__nh")
        .agg(F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("n_members"))
    )
    corpus = d.filter(F.col("doc_id") % 10 != 0).select(key)
    got = {
        (r.doc_id, r.n_members)
        for r in batch.join(corpus, "__nh", "left_anti").collect()
    }
    assert got == {(10, 2)}


def test_trending_topk_per_day_bounds(spark, sf_dir):
    """At most 3 rows per day, ranks contiguous from 1, counts
    non-increasing in rank."""
    from ub_etl_spark.queries.analytics import stream_topk_trending

    rows = stream_topk_trending(spark, sf_dir).collect()
    by_day: dict = {}
    for r in rows:
        by_day.setdefault(r.day, []).append(r)
    assert by_day
    for grp in by_day.values():
        grp.sort(key=lambda r: r.rn)
        assert [r.rn for r in grp] == list(range(1, len(grp) + 1))
        assert len(grp) <= 3
        ns = [r.n for r in grp]
        assert ns == sorted(ns, reverse=True)


def test_dpp_join_prunes_partitions(spark, sf_dir):
    """The fact scan's PartitionFilters must contain a dynamicpruning
    expression (join-time directory pruning), and results must match a
    plain filtered aggregate."""
    from ub_etl_spark.queries.storage_io import storage_dpp_join

    df = storage_dpp_join(spark, sf_dir)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "dynamicpruningexpression" in plan
    got = {(r.event_type, r.n) for r in df.collect()}
    e = load_table(spark, sf_dir, "events")
    want = {
        (r.event_type, r.n)
        for r in e.filter(F.col("event_type").isin("purchase", "signup"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want


def test_resize_truncates_payload_and_scales(spark):
    """Resized payload is a prefix of the source bytes capped at the
    deterministic resized length; scale factors match dst/src."""
    from ub_etl_spark.operators.multimodal import resize_media, with_binary_payload

    df = spark.createDataFrame(
        [(1, "x" * 2000), (2, "short")], "doc_id long, text string"
    )
    out = resize_media(
        with_binary_payload(df, "doc_id", "text"), 224, 224, fake=True
    ).collect()
    rows = {r.doc_id: r for r in out}
    assert len(rows[1].payload) == 224 * 224 // 64  # capped
    assert bytes(rows[1].payload) == b"x" * (224 * 224 // 64)  # true prefix
    assert len(rows[2].payload) == 5  # under cap: untouched
    assert rows[2].scale_x == 224 / (5 % 640)


def test_bucketed_join_has_no_exchange_on_key(spark, sf_dir):
    """Both sides bucketed on the join key -> the executed plan must not
    shuffle either side; results match the plain join."""
    from ub_etl_spark.queries.storage_io import storage_bucketed_join

    df = storage_bucketed_join(spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning(l_orderkey" not in plan
    assert "Exchange hashpartitioning(o_orderkey" not in plan
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    want = {
        (r.o_orderstatus, r.n)
        for r in li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    got = {(r.o_orderstatus, r.n) for r in df.collect()}
    assert got == want


def test_scd2_point_in_time_unique_version_per_probe(spark, sf_dir):
    """Every probe row matches exactly one dim version (intervals
    partition the timeline): output count equals the probe count, and
    probe ts always falls inside its matched interval."""
    from ub_etl_spark.queries.merge import dim_scd2_point_in_time

    out = dim_scd2_point_in_time(spark, sf_dir)
    n_probe = load_table(spark, sf_dir, "orders").count()
    assert out.count() == n_probe
    assert out.select("o_orderkey").distinct().count() == n_probe
    assert out.filter(F.col("as_of_ts") < F.col("valid_from")).count() == 0


def test_bloom_prefilter_never_drops_matches_and_prunes(spark, sf_dir):
    """Bloom probe keeps every true match (no false negatives) while
    pruning a meaningful fraction of non-matching fact rows before the
    join; end-to-end results equal the plain semi join."""
    from ub_etl_spark.operators.bloom import bloom_build, bloom_might_contain

    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_orderstatus") == "F")
    )
    bitmap = bloom_build(o, F.col("o_orderkey"))
    pruned = li.filter(bloom_might_contain(bitmap, F.col("l_orderkey")))
    exact = li.join(
        o.select("o_orderkey"), li.l_orderkey == F.col("o_orderkey"), "left_semi"
    )
    n_all, n_pruned, n_exact = li.count(), pruned.count(), exact.count()
    # no false negatives: every exact match survives the bloom
    assert (
        pruned.join(
            o.select("o_orderkey"), pruned.l_orderkey == F.col("o_orderkey"), "left_semi"
        ).count()
        == n_exact
    )
    # real pruning: the bloom removed most non-matching rows
    assert n_pruned < n_all
    assert n_pruned - n_exact < 0.05 * n_all  # false-positive fraction small


def test_rolling_active_users_wau_bounds(spark, sf_dir):
    """WAU >= DAU on every day (7-day superset), and WAU never exceeds
    the distinct users active in the trailing 7 days recomputed
    directly for a sampled day."""
    from pyspark.sql import functions as F

    from ub_etl_spark.queries.timeseries import events_active_users_rolling

    rows = sorted(events_active_users_rolling(spark, sf_dir).collect(), key=lambda r: r.d)
    assert rows and all(r.wau >= r.dau for r in rows)
    mid = rows[len(rows) // 2]
    e = load_table(spark, sf_dir, "events")
    direct = (
        e.select(F.col("ts").cast("date").alias("d"), "user_id")
        .filter((F.col("d") <= F.lit(mid.d)) & (F.col("d") >= F.date_sub(F.lit(mid.d), 6)))
        .select("user_id")
        .distinct()
        .count()
    )
    assert mid.wau == direct


def test_seasonal_indices_average_near_one(spark, sf_dir):
    """Multiplicative seasonal indices average ~1 across the 12 months
    (ratios to the centered trend are mean-one by construction up to
    trend-edge effects)."""
    from ub_etl_spark.queries.timeseries import timeseries_seasonal_decompose

    rows = timeseries_seasonal_decompose(spark, sf_dir).collect()
    assert len(rows) == 12
    mean_idx = sum(r.seasonal_index for r in rows) / 12
    assert 0.9 < mean_idx < 1.1
    assert all(r.n_years >= 1 for r in rows)
