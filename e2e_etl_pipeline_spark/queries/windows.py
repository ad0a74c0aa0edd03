"""B.5 — window functions.

q_window_topk_per_group is the *correct* re-expression of the reference's
"latest file" lookup (A8, config.py:81-99), replacing its reverse-lexicographic
ddmmyyyy sort bug (SURVEY.md §1.3) with an explicit deterministic ordering.

Scale note: every window here partitions by a key with bounded group size
(custkey, nationkey, user_id) — one shuffle on the partition key, then a
per-group sort that fits in memory. None of these windows is unpartitioned
(a global window would serialize onto one task and is banned in this engine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from e2e_etl_pipeline_spark.catalog import load_table
from e2e_etl_pipeline_spark.registry import register


@register(
    "q_window_topk_per_group",
    oracle="""
    SELECT c_custkey, o_orderkey, round(o_totalprice, 2) AS total, rn
    FROM (
      SELECT
        c_custkey, o_orderkey, o_totalprice,
        row_number() OVER (PARTITION BY c_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders JOIN customer ON o_custkey = c_custkey
    )
    WHERE rn <= 3
    """,
)
def q_window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer (A8's top-1-per-partition, done right)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("c_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("total"), "rn")
    )


@register(
    "q_window_rank",
    oracle="""
    SELECT
      s_nationkey,
      s_suppkey,
      rank()       OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC) AS bal_rank,
      dense_rank() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC) AS bal_dense_rank,
      ntile(4)     OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey) AS bal_quartile
    FROM supplier
    """,
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank share ties deterministically; ntile carries a unique
    tiebreaker (s_suppkey) because its bucketing is order-sensitive."""
    s = load_table(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy(F.desc("s_acctbal"))
    w_unique = Window.partitionBy("s_nationkey").orderBy(F.desc("s_acctbal"), F.asc("s_suppkey"))
    return s.select(
        "s_nationkey",
        "s_suppkey",
        F.rank().over(w).alias("bal_rank"),
        F.dense_rank().over(w).alias("bal_dense_rank"),
        F.ntile(4).over(w_unique).alias("bal_quartile"),
    )


@register(
    "q_window_lag",
    oracle="""
    SELECT
      user_id,
      event_id,
      lag(event_type)  OVER (PARTITION BY user_id
                             ORDER BY ts NULLS LAST, event_id) AS prev_type,
      lead(event_type) OVER (PARTITION BY user_id
                             ORDER BY ts NULLS LAST, event_id) AS next_type,
      CAST(date_diff('second',
                     lag(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts NULLS LAST, event_id),
                     ts) AS BIGINT)                            AS secs_since_prev
    FROM events
    """,
)
def q_window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead — the reference's "did the scroll make progress?" test
    (A31, extract_data.py:234-237) is exactly a lag comparison."""
    e = load_table(spark, sf_dir, "events")
    # NULLS LAST pinned (Spark ASC default is NULLS FIRST, DuckDB's window
    # default NULLS LAST — one NULL ts would shift every neighbor pair)
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc_nulls_last(), F.asc_nulls_last("event_id")
    )
    prev_ts = F.lag("ts").over(w)
    return e.select(
        "user_id",
        "event_id",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
        (F.col("ts").cast("long") - prev_ts.cast("long")).alias("secs_since_prev"),
    )


@register(
    "q_window_running_sum",
    oracle="""
    SELECT
      o_custkey,
      o_orderkey,
      round(sum(o_totalprice) OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
    FROM orders
    """,
)
def q_window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative sum with an explicit rows frame. The frame order carries a
    unique key (o_orderkey) so prefix sums are reproducible; rounding happens
    after the window so each prefix is rounded exactly once."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    )


@register(
    "q_window_moving_avg",
    oracle="""
    SELECT
      user_id,
      event_id,
      round(CAST(sum(CAST(value AS DECIMAL(14,2))) OVER w AS DOUBLE)
            / count(value) OVER w, 4) AS moving_avg_3
    FROM events
    WINDOW w AS (
        PARTITION BY user_id ORDER BY ts NULLS LAST, event_id
        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
)
def q_window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving average over a 3-row sliding frame per user."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc_nulls_last(), F.asc_nulls_last("event_id"))
        .rowsBetween(-2, 0)
    )
    # Exact-DECIMAL frame sum / count instead of avg(double): DuckDB
    # evaluates sliding frames with a segment tree (tree-order FP adds)
    # vs Spark's in-order accumulation — full-precision values could
    # split a 4dp boundary (round-4 review; q_rolling_corr discipline).
    dec = F.col("value").cast("decimal(14,2)")
    return e.select(
        "user_id",
        "event_id",
        F.round(
            F.try_divide(
                F.sum(dec).over(w).cast("double"), F.count("value").over(w)
            ),
            4,
        ).alias("moving_avg_3"),
    )


@register(
    "q_window_analytics",
    oracle="""
    SELECT
      s_nationkey,
      s_suppkey,
      first_value(s_suppkey) OVER w                                  AS richest,
      last_value(s_suppkey) OVER (PARTITION BY s_nationkey
        ORDER BY s_acctbal DESC, s_suppkey
        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)    AS poorest,
      nth_value(s_suppkey, 2) OVER (PARTITION BY s_nationkey
        ORDER BY s_acctbal DESC, s_suppkey
        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)    AS runner_up,
      round(percent_rank() OVER w, 4)                                AS pct_rank,
      round(cume_dist() OVER w, 4)                                   AS cum_dist
    FROM supplier
    WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey)
    """,
)
def q_window_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window family: first/last/nth value + percent_rank/cume_dist.
    last_value and nth_value get the full-partition frame explicitly (the
    default frame stops at CURRENT ROW in both engines)."""
    s = load_table(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy(F.desc("s_acctbal"), F.asc("s_suppkey"))
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return s.select(
        "s_nationkey",
        "s_suppkey",
        F.first("s_suppkey").over(w).alias("richest"),
        F.last("s_suppkey").over(w_full).alias("poorest"),
        F.nth_value("s_suppkey", 2).over(w_full).alias("runner_up"),
        F.round(F.percent_rank().over(w), 4).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 4).alias("cum_dist"),
    )


@register(
    "q_window_range_frame",
    oracle="""
    SELECT
      user_id,
      event_id,
      count(*) OVER (
        PARTITION BY user_id
        ORDER BY CAST(floor(epoch(ts)) AS BIGINT) NULLS LAST
        RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS n_last_hour
    FROM events
    """,
)
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over event-time seconds: how many events this user fired
    in the trailing hour — the time-based frame variant of B.5.

    Spark's timestamp→long cast floors to whole seconds; DuckDB's
    CAST(DOUBLE AS BIGINT) rounds, so the oracle floors explicitly."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").cast("long").asc_nulls_last())
        .rangeBetween(-3600, 0)
    )
    return e.select(
        "user_id",
        "event_id",
        F.count(F.lit(1)).over(w).alias("n_last_hour"),
    )


@register(
    "q_window_median",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS n_orders
      FROM orders GROUP BY 1
    )
    SELECT day, n_orders,
           CAST(median(n_orders) OVER (
             ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS med7
    FROM daily
    """,
)
def q_window_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling EXACT median of daily order volume over a trailing 7-row
    frame — the robust-smoothing companion to q_window_moving_avg (means
    are skew-sensitive; ops dashboards want medians).

    Spark has no median window function, so the frame's values are
    collected (bounded: ≤ 7 longs), sorted, and interpolated exactly like
    DuckDB's quantile_cont(0.5): middle element when odd, mean of the two
    middles when even. Counts are integers, so the .5 interpolation is
    exact in double — no FP-tie risk.

    Scale: the window runs over the DAILY aggregate (|days| rows), never
    the fact table; the fact scan reduces map-side first. A single-series
    global window is one partition by design — the pre-aggregated frame
    is tiny at any SF (shard by series key when there are many series)."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    w = Window.orderBy("day").rowsBetween(-6, 0)
    arr = F.array_sort(F.collect_list("n_orders").over(w))
    n = F.size(arr)
    mid = F.element_at(arr, ((n + 1) / 2).cast("int")).cast("double")
    even = (
        F.element_at(arr, (n / 2).cast("int"))
        + F.element_at(arr, (n / 2).cast("int") + 1)
    ).cast("double") / 2.0
    return daily.select(
        "day",
        "n_orders",
        F.when(n % 2 == 1, mid).otherwise(even).alias("med7"),
    )


@register(
    "q_rolling_corr",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             sum(CASE WHEN event_type = 'click'
                      THEN CAST(value AS DECIMAL(14,2))
                      ELSE CAST(0 AS DECIMAL(14,2)) END) AS clicks,
             sum(CASE WHEN event_type = 'purchase'
                      THEN CAST(value AS DECIMAL(14,2))
                      ELSE CAST(0 AS DECIMAL(14,2)) END) AS purchases
      FROM events
      WHERE ts IS NOT NULL  -- NULL day: not in the series; window
                            -- placement of a NULL key is plan-unstable
      GROUP BY 1
    ),
    win AS (
      SELECT day,
             count(*)                     OVER w AS n,
             sum(clicks)                  OVER w AS sx,
             sum(purchases)               OVER w AS sy,
             sum(clicks * purchases)      OVER w AS sxy,
             sum(clicks * clicks)         OVER w AS sxx,
             sum(purchases * purchases)   OVER w AS syy
      FROM daily
      WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    )
    SELECT day,
           round(CAST(7 * sxy - sx * sy AS DOUBLE)
                 / nullif(sqrt(CAST(7 * sxx - sx * sx AS DOUBLE)
                               * CAST(7 * syy - sy * sy AS DOUBLE)), 0), 4)
             AS corr_7d
    FROM win WHERE n = 7
    """,
)
def q_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day rolling correlation between the daily click and purchase
    value series — the co-movement monitor that flags when two metrics
    decouple (a point correlation can't show when it broke).

    Computed from exact-DECIMAL sufficient statistics (windowed sums) with
    one closed-form double expression at the end, not engine-native
    corr(): (a) sums of decimals are order-independent, so segment-tree
    (DuckDB) vs sliding-frame (Spark) evaluation can't split a bit;
    (b) a zero-variance frame (e.g. a 7-day window with no clicks, seen
    under the sparse fuzz variant) yields NULL via try_divide ≡ DuckDB's
    NULL-on-zero double division — Spark's ANSI corr() raises instead.

    Scale: the corpus reduces once to |days| rows; the window runs
    post-reduction. Rows without a full 7-day frame drop on both sides."""
    ev = load_table(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    dec = F.col("value").cast("decimal(14,2)")
    zero = F.lit(0).cast("decimal(14,2)")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(F.when(F.col("event_type") == "click", dec).otherwise(zero)).alias(
            "clicks"
        ),
        F.sum(
            F.when(F.col("event_type") == "purchase", dec).otherwise(zero)
        ).alias("purchases"),
    )
    w = Window.orderBy("day").rowsBetween(-6, 0)
    c, p = F.col("clicks"), F.col("purchases")
    win = daily.select(
        "day",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum(c).over(w).alias("sx"),
        F.sum(p).over(w).alias("sy"),
        F.sum(c * p).over(w).alias("sxy"),
        F.sum(c * c).over(w).alias("sxx"),
        F.sum(p * p).over(w).alias("syy"),
    ).where(F.col("n") == 7)
    num = (F.lit(7) * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    denx = (F.lit(7) * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    deny = (F.lit(7) * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return win.select(
        "day",
        F.round(F.try_divide(num, F.sqrt(denx * deny)), 4).alias("corr_7d"),
    )
