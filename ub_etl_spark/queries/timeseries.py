"""Time-series maintenance queries (SURVEY.md §2 B38).

timeseries_gapfill: per-key daily resample + forward fill — the standard
"make an irregular event stream a dense daily series" ETL step (billing,
activity rollups, feature backfills).  Spark-first shape: the date grid is
generated DISTRIBUTED per key with sequence()+explode (never a driver
loop), the observed days aggregate exactly (decimal sums), and the fill is
one window pass partitioned on the key — so the whole thing is two hash
shuffles on user_id regardless of span length, and at 100 TB the grid
explode parallelizes with the keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ub_etl_spark.functions.exact import cents, dsum, sql_cents
from ub_etl_spark.registry import register
from ub_etl_spark.sources.tables import load_table as T


@register(
    "timeseries_gapfill",
    tier="B",
    oracle="""
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS d,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS day_value
      FROM events GROUP BY 1, 2
    ), spans AS (
      SELECT user_id, MIN(d) AS d0, MAX(d) AS d1 FROM daily GROUP BY 1
    ), grid AS (
      SELECT user_id, CAST(g AS DATE) AS d
      FROM spans,
           UNNEST(generate_series(CAST(d0 AS TIMESTAMP),
                                  CAST(d1 AS TIMESTAMP),
                                  INTERVAL 1 DAY)) AS t(g)
    )
    SELECT g.user_id, g.d,
           last_value(dy.day_value IGNORE NULLS) OVER (
             PARTITION BY g.user_id ORDER BY g.d
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS filled_value,
           dy.day_value IS NULL AS is_gap
    FROM grid g
    LEFT JOIN daily dy ON g.user_id = dy.user_id AND g.d = dy.d
    """,
)
def timeseries_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense daily series per user over [first event day, last event day]:
    observed days carry their exact daily sum, missing days are flagged and
    forward-filled from the last observed value.  The fill window is
    partitioned on user_id (no global sort); the first grid day is always
    observed by construction, so filled_value is never NULL."""
    e = T(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("d"), "value"
    )
    daily = e.groupBy("user_id", "d").agg(dsum("value", "day_value"))
    spans = daily.groupBy("user_id").agg(
        F.min("d").alias("d0"), F.max("d").alias("d1")
    )
    grid = spans.select(
        "user_id",
        F.explode(F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))).alias("d"),
    )
    fill = W.partitionBy("user_id").orderBy("d").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    return (
        grid.join(daily, ["user_id", "d"], "left")
        .select(
            "user_id",
            "d",
            F.last("day_value", ignorenulls=True).over(fill).alias("filled_value"),
            F.col("day_value").isNull().alias("is_gap"),
        )
    )


# B46: hypertable-style continuous-aggregate rollup — hour AND day
# granularities materialized from ONE event scan via ROLLUP on the two
# truncations (day is functionally determined by hour, so the rollup
# lattice (day, hour) -> (day) -> () is exactly the hour/day/total
# hierarchy).  Catalyst plans a single Expand + one hash aggregation:
# the scan is never repeated per granularity, and map-side partials keep
# the shuffle at |buckets| rows — the Spark-native shape of a
# TimescaleDB continuous aggregate refresh.
@register(
    "timeseries_multi_rollup",
    tier="B",
    oracle="""
    SELECT CAST(2 * grouping(bucket_day) + grouping(bucket_hour) AS BIGINT)
             AS gid,
           bucket_day, bucket_hour, COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket_day,
             date_trunc('hour', ts) AS bucket_hour, value
      FROM events
    ) t
    GROUP BY ROLLUP(bucket_day, bucket_hour)
    """,
)
def timeseries_multi_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour + day + grand-total event rollup from a single scan.  gid
    disambiguates granularity levels (0 = hourly row, 1 = daily subtotal,
    3 = grand total) the same way both engines number grouping bits."""
    e = T(spark, sf_dir, "events").select(
        F.date_trunc("day", "ts").alias("bucket_day"),
        F.date_trunc("hour", "ts").alias("bucket_hour"),
        "value",
    )
    return (
        e.rollup("bucket_day", "bucket_hour")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", "sum_value"),
        )
        .select("gid", "bucket_day", "bucket_hour", "n_events", "sum_value")
    )


@register(
    "events_active_users_rolling",
    tier="B",
    oracle="""
    WITH daily AS (
      SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events
    ), contrib AS (
      SELECT CAST(UNNEST(generate_series(d, d + INTERVAL 6 DAY, INTERVAL 1 DAY))
                  AS DATE) AS wd,
             user_id
      FROM daily
    ), spine AS (
      SELECT DISTINCT d FROM daily
    )
    SELECT s.d,
           (SELECT COUNT(DISTINCT da.user_id) FROM daily da WHERE da.d = s.d)
             AS dau,
           COUNT(DISTINCT c.user_id) AS wau
    FROM spine s JOIN contrib c ON c.wd = s.d
    GROUP BY s.d
    """,
)
def events_active_users_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling distinct active users (DAU + trailing-7-day WAU): the
    sliding-window COUNT DISTINCT no window frame can express (distinct
    doesn't decompose over frames).  The scale shape is contribution
    explosion: each (day, user) activity row contributes itself to the
    7 window-end days it falls inside, then one exact distinct count per
    end day — O(activity x window/step), shuffled on the day key, never
    a per-day correlated re-scan (the oracle keeps that textbook form).
    Day grain dedups first so the explosion is bounded by active
    (day, user) pairs, not raw events.  Only days with activity appear
    (join, not left join, onto the spine — matching the oracle)."""
    e = T(spark, sf_dir, "events")
    daily = e.select(
        F.col("ts").cast("date").alias("d"), "user_id"
    ).distinct()
    contrib = daily.select(
        F.explode(
            F.sequence(
                F.col("d"), F.date_add(F.col("d"), 6), F.expr("INTERVAL 1 DAY")
            )
        ).alias("wd"),
        "user_id",
    )
    dau = daily.groupBy("d").agg(F.countDistinct("user_id").alias("dau"))
    wau = (
        contrib.join(daily.select("d").distinct(), contrib.wd == F.col("d"), "inner")
        .groupBy("d")
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    return dau.join(wau, "d").select("d", "dau", "wau")


@register(
    "timeseries_seasonal_decompose",
    tier="B",
    oracle=f"""
    WITH monthly AS (
      SELECT YEAR(l_shipdate) AS y, MONTH(l_shipdate) AS m,
             SUM({sql_cents("l_extendedprice")}) AS rev_c
      FROM lineitem GROUP BY YEAR(l_shipdate), MONTH(l_shipdate)
    ), trended AS (
      SELECT y, m, rev_c,
             SUM(rev_c) OVER (ORDER BY y, m
                              ROWS BETWEEN 6 PRECEDING AND 5 FOLLOWING) AS tsum,
             COUNT(*) OVER (ORDER BY y, m
                            ROWS BETWEEN 6 PRECEDING AND 5 FOLLOWING) AS tn
      FROM monthly
    ), ratios AS (
      SELECT y, m, rev_c, tsum, tn,
             CAST(FLOOR(CAST(rev_c AS DOUBLE)
                          / (CAST(tsum AS DOUBLE) / tn) * 1000000000.0)
                  AS BIGINT) AS ratio_u
      FROM trended WHERE tn = 12
    )
    SELECT m, SUM(ratio_u) / 1000000000.0 / COUNT(*) AS seasonal_index,
           COUNT(*) AS n_years
    FROM ratios GROUP BY m
    """,
)
def timeseries_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiplicative seasonal indices (classical decomposition step):
    monthly revenue over a centered 12-month trend, ratios averaged per
    calendar month.  Exactness discipline: monthly revenues are exact
    longs, the trend is one canonical double division, and each ratio
    QUANTIZES to integer nano-units before the per-month average — a
    raw double SUM of ratios would be order-dependent across engines
    and partitionings.  Edge months without a full 12-month window are
    excluded (tn = 12), not padded.  The month spine is ~84 rows, so
    the global-order window is trivially cheap after the fact
    aggregates."""
    li = T(spark, sf_dir, "lineitem")
    monthly = li.groupBy(
        F.year("l_shipdate").alias("y"), F.month("l_shipdate").alias("m")
    ).agg(F.sum(cents("l_extendedprice")).alias("rev_c"))
    w = W.orderBy("y", "m").rowsBetween(-6, 5)
    trended = monthly.select(
        "y",
        "m",
        "rev_c",
        F.sum("rev_c").over(w).alias("tsum"),
        F.count(F.lit(1)).over(w).alias("tn"),
    ).filter(F.col("tn") == 12)
    ratio_u = F.floor(
        F.col("rev_c").cast("double")
        / (F.col("tsum").cast("double") / F.col("tn"))
        * 1e9
    ).cast("long")
    return (
        trended.withColumn("ratio_u", ratio_u)
        .groupBy("m")
        .agg(
            (F.sum("ratio_u") / 1e9 / F.count(F.lit(1))).alias("seasonal_index"),
            F.count(F.lit(1)).alias("n_years"),
        )
    )


# ---------------------------------------------------------------------------
# Autocorrelation function (ACF)
# ---------------------------------------------------------------------------

_D38 = "decimal(38,0)"


@register(
    "timeseries_autocorrelation",
    tier="B",
    oracle=f"""
    WITH monthly AS (
      SELECT YEAR(l_shipdate) AS y, MONTH(l_shipdate) AS m,
             SUM({sql_cents("l_extendedprice")}) AS rev_c
      FROM lineitem GROUP BY YEAR(l_shipdate), MONTH(l_shipdate)
    ), idxd AS (
      SELECT ROW_NUMBER() OVER (ORDER BY y, m) AS idx, rev_c FROM monthly
    ), g AS (SELECT COUNT(*) AS n, SUM(rev_c) AS s FROM idxd),
    dev AS (
      SELECT idx, CAST(n AS DECIMAL(38,0)) * rev_c - CAST(s AS DECIMAL(38,0))
               AS d
      FROM idxd, g
    ), den AS (SELECT SUM(d * d) AS dd FROM dev),
    lags AS (SELECT UNNEST(RANGE(1, 13)) AS lag)
    SELECT l.lag, COUNT(*) AS n_pairs,
           CAST(SUM(a.d * b.d) AS DOUBLE) / CAST(den.dd AS DOUBLE) AS acf
    FROM lags l
    JOIN dev a ON TRUE
    JOIN dev b ON b.idx = a.idx + l.lag
    CROSS JOIN den
    GROUP BY l.lag, den.dd
    ORDER BY l.lag
    """,
)
def timeseries_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function of monthly revenue at lags 1-12 — the
    seasonality detector feeding model selection (a 12-lag peak says
    'use timeseries_seasonal_decompose').  Exactness: with n and S the
    month count and total, each deviation is the EXACT integer n*x_t - S
    (the n^2 scale factors cancel in the ratio), products promote to
    DECIMAL(38,0) (a long would overflow at cents^2 scale), and each
    acf value is ONE double division of two exact sums.  The fact scan
    aggregates to the ~84-row month spine first; every window/join after
    that runs on spine-sized data (the global row_number is the shared
    global-order watch item — trivial on a spine, stated as always).
    Lag pairing is an equi-join on (idx + lag), never 12 window passes."""
    li = T(spark, sf_dir, "lineitem")
    monthly = li.groupBy(
        F.year("l_shipdate").alias("y"), F.month("l_shipdate").alias("m")
    ).agg(F.sum(cents("l_extendedprice")).alias("rev_c"))
    idxd = monthly.select(
        F.row_number().over(W.orderBy("y", "m")).alias("idx"), "rev_c"
    )
    g = idxd.agg(F.count(F.lit(1)).alias("n"), F.sum("rev_c").alias("s"))
    dev = idxd.crossJoin(F.broadcast(g)).select(
        "idx",
        (
            F.col("n").cast(_D38) * F.col("rev_c") - F.col("s").cast(_D38)
        ).alias("d"),
    )
    den = dev.agg(F.sum(F.col("d") * F.col("d")).alias("dd"))
    lags = spark.range(1, 13).select(F.col("id").cast("int").alias("lag"))
    a = dev.select(F.col("idx").alias("ai"), F.col("d").alias("ad"))
    b = dev.select(F.col("idx").alias("bi"), F.col("d").alias("bd"))
    return (
        F.broadcast(lags)
        .crossJoin(a)
        .join(b, F.col("bi") == F.col("ai") + F.col("lag"))
        .crossJoin(F.broadcast(den))
        .groupBy("lag", "dd")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            (
                F.sum(F.col("ad") * F.col("bd")).cast("double")
                / F.col("dd").cast("double")
            ).alias("acf"),
        )
        .select("lag", "n_pairs", "acf")
        .orderBy("lag")
    )


# ---------------------------------------------------------------------------
# CUSUM changepoint scan
# ---------------------------------------------------------------------------


@register(
    "timeseries_cusum_changepoint",
    tier="B",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS c
      FROM orders GROUP BY 1
    ), g AS (SELECT COUNT(*) AS n, SUM(c) AS s FROM daily),
    cus AS (
      SELECT d, c,
             SUM(n * c - s) OVER (ORDER BY d) AS cusum_n
      FROM daily, g
    ), mx AS (SELECT MAX(ABS(cusum_n)) AS peak FROM cus)
    SELECT cus.d, cus.c,
           CAST(cusum_n AS DOUBLE) / (SELECT n FROM g) AS cusum,
           ABS(cusum_n) = mx.peak AS is_changepoint
    FROM cus, mx
    ORDER BY cus.d
    """,
)
def timeseries_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint scan over daily order counts: the cumulative sum
    of mean-centered counts peaks where the series' level shifts (the
    classic single-changepoint estimator).  Deviations stay exact
    integers via the n*c - S scaling (one global 2-value aggregate
    broadcast back); the cumulative window runs over the ~|days| spine
    AFTER the fact collapses to per-day counts; the peak day(s) flag via
    a 1-row max broadcast.  Only the final normalization divides.  The
    global-order cumulative window is spine-sized (shared watch item of
    every sweep-line query here, cf. orders_open_backlog_daily)."""
    o = T(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.count(F.lit(1)).alias("c")
    )
    g = daily.agg(F.count(F.lit(1)).alias("n"), F.sum("c").alias("s"))
    cus = daily.crossJoin(F.broadcast(g)).select(
        "d",
        "c",
        "n",
        F.sum(F.col("n") * F.col("c") - F.col("s"))
        .over(W.orderBy("d"))
        .alias("cusum_n"),
    )
    mx = cus.agg(F.max(F.abs(F.col("cusum_n"))).alias("peak"))
    return (
        cus.crossJoin(F.broadcast(mx))
        .select(
            "d",
            "c",
            (F.col("cusum_n").cast("double") / F.col("n")).alias("cusum"),
            (F.abs(F.col("cusum_n")) == F.col("peak")).alias("is_changepoint"),
        )
        .orderBy("d")
    )


# ---------------------------------------------------------------------------
# Rolling median
# ---------------------------------------------------------------------------


@register(
    "timeseries_rolling_median",
    tier="B",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(date_diff('day', DATE '1970-01-01',
                            CAST(o_orderdate AS DATE)) AS BIGINT) AS di,
             CAST(FLOOR((SUM(CAST(o_totalprice AS DECIMAL(18,2)))) * 100 + 0.5)
                  AS BIGINT) AS rev_c
      FROM orders GROUP BY 1, 2
    )
    SELECT d, rev_c AS day_rev_cents,
           CAST(2 * MEDIAN(rev_c) OVER (ORDER BY di
                               RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
                AS BIGINT) AS med7_x2_cents
    FROM daily
    ORDER BY d
    """,
)
def timeseries_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day rolling MEDIAN of daily revenue — the robust
    smoother no plain window frame aggregate (sum/avg) can replace, and
    the one rolling statistic that needs an order statistic per frame.
    The fact collapses to the ~|days| spine (exact decimal day sums
    quantized to long cents) before a value-based RANGE frame computes
    percentile(0.5) per day — tie-safe on the integer day key where a
    ROWS frame would be order-sensitive on gap days.  Both engines
    interpolate even-count medians exactly on half-integer cents (the
    udaf_grouped_agg precedent).  Scale: the window runs over days, not
    orders; for per-key rolling medians partition the same window by the
    key.  The day aggregation shuffles |days| rows; the spine window is
    the usual global-order watch item, trivial at spine size.  Outputs
    stay in the exact-long domain (day cents; 2x the rolling median,
    an exact integer) per the repo determinism rule — /100.0 and /200.0
    recover currency units at presentation time."""
    o = T(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderdate").cast("date").alias("d"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date"))
        .cast("bigint")
        .alias("di"),
    ).agg(
        F.floor(F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("rev_c")
    )
    w = W.orderBy("di").rangeBetween(-6, 0)
    return daily.select(
        "d",
        F.col("rev_c").alias("day_rev_cents"),
        # round() guards the stray-ulp truncation hazard (the doubled
        # median is exactly integral for cent inputs, but percentile
        # computes in doubles — see events_anomaly_mad)
        F.round(2 * F.expr("percentile(rev_c, 0.5)").over(w))
        .cast("long")
        .alias("med7_x2_cents"),
    ).orderBy("d")


# ---------------------------------------------------------------------------
# DAU/WAU stickiness
# ---------------------------------------------------------------------------


@register(
    "events_stickiness_weekly",
    tier="B",
    oracle="""
    WITH du AS (
      SELECT DISTINCT CAST(date_trunc('week', ts) AS DATE) AS wk,
             CAST(ts AS DATE) AS d, user_id
      FROM events
    ), dau AS (
      SELECT wk, d, COUNT(*) AS dau FROM du GROUP BY wk, d
    ), wau AS (
      SELECT wk, COUNT(DISTINCT user_id) AS wau FROM du GROUP BY wk
    )
    SELECT dau.wk, CAST(SUM(dau.dau) AS BIGINT) AS user_days,
           COUNT(*) AS n_days,
           ANY_VALUE(wau.wau) AS wau,
           CAST(SUM(dau.dau) AS DOUBLE) / COUNT(*) / ANY_VALUE(wau.wau)
             AS stickiness
    FROM dau JOIN wau ON dau.wk = wau.wk
    GROUP BY dau.wk
    ORDER BY dau.wk
    """,
)
def events_stickiness_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly stickiness (avg DAU / WAU): the engagement-intensity ratio
    (daily habit vs weekly reach).  ONE (week, day, user) distinct pass
    feeds both aggregates — DAU per day and WAU per week — so the raw
    event scan happens once; the join keys on the ~|weeks| spine.
    stickiness = exact user-day count / day count / distinct-user count,
    divided left-to-right in one shared textual order.  Scale: the
    distinct pass shuffles on (day, user) grain (bounded by activity,
    not events); WAU's exact distinct swaps to HLL at extreme reach
    (agg_hll_mergeable), like every exact-distinct here."""
    e = T(spark, sf_dir, "events")
    du = e.select(
        F.date_trunc("week", F.col("ts")).cast("date").alias("wk"),
        F.col("ts").cast("date").alias("d"),
        "user_id",
    ).distinct()
    dau = du.groupBy("wk", "d").agg(F.count(F.lit(1)).alias("dau"))
    wau = du.groupBy("wk").agg(F.countDistinct("user_id").alias("wau")).select(
        F.col("wk").alias("w_wk"), "wau"
    )
    return (
        dau.join(wau, dau.wk == F.col("w_wk"))
        .groupBy("wk")
        .agg(
            F.sum("dau").alias("user_days"),
            F.count(F.lit(1)).alias("n_days"),
            F.any_value("wau").alias("wau"),
            (
                F.sum("dau").cast("double")
                / F.count(F.lit(1))
                / F.any_value("wau")
            ).alias("stickiness"),
        )
        .orderBy("wk")
    )
