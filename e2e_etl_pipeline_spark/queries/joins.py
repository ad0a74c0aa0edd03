"""B.3 — the join surface.

The reference's only join-shaped operation is a dict lookup with a default
(A29, config.py:47-53). The engine generalizes to the full relational join
matrix. Scale notes per query in docstrings; the recurring principles:

  * Dimension tables (region/nation/supplier/part/customer at TPC-H ratios)
    are broadcast — no shuffle of the fact table for the probe side.
  * Fact-fact joins shuffle on the join key; AQE handles skew splitting.
  * Semi/anti joins never materialize right-side payload columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from e2e_etl_pipeline_spark.catalog import load_table
from e2e_etl_pipeline_spark.functions.money import money_sum
from e2e_etl_pipeline_spark.registry import register


@register(
    "q_join_inner",
    oracle="""
    SELECT
      c.c_mktsegment,
      count(*)                     AS n_orders,
      CAST(round(sum(CAST(o.o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE)
                                    AS segment_revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join; Catalyst picks the physical strategy (AQE may turn
    the shuffle join into a broadcast at runtime once customer's post-filter
    size is known)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            money_sum("o_totalprice").alias("segment_revenue"),
        )
    )


@register(
    "q_join_broadcast",
    oracle="""
    SELECT r.r_name, count(*) AS n_customers,
           round(CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
                 / count(*), 4) AS avg_bal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A29's tiny lookup tables as explicit broadcast joins.

    nation⋈region is resolved entirely on the small side first; the fact
    scan streams past two broadcast hash joins with zero shuffle — the plan
    that survives a 100× fact-table scale-up unchanged.
    """
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    dim = F.broadcast(n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey))
    return (
        c.join(dim, c.c_nationkey == dim.n_nationkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            # exact-DECIMAL sum / count, not avg(double): money means are
            # partition-order dependent at 4dp boundaries (registry rule)
            F.round(
                F.sum(F.col("c_acctbal").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1)),
                4,
            ).alias("avg_bal"),
        )
    )


@register(
    "q_join_left",
    oracle="""
    SELECT
      c.c_custkey,
      count(o.o_orderkey)                        AS n_orders,
      CAST(round(coalesce(sum(CAST(o.o_totalprice AS DECIMAL(18,6))),
                          0), 2) AS DOUBLE)       AS revenue
    FROM customer c
    LEFT JOIN (SELECT * FROM orders WHERE o_orderstatus = 'P') o
      ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey
    """,
)
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with no matching orders."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(
                F.coalesce(
                    F.sum(F.col("o_totalprice").cast("decimal(18,6)")),
                    F.lit(0).cast("decimal(18,6)"),
                ),
                2,
            )
            .cast("double")
            .alias("revenue"),
        )
    )


@register(
    "q_join_full",
    oracle="""
    WITH negbal AS (
      SELECT c_custkey, round(c_acctbal, 2) AS bal
      FROM customer WHERE c_acctbal < 0
    ),
    big AS (
      SELECT o_custkey, count(*) AS n_big
      FROM orders WHERE o_totalprice > 400000 GROUP BY o_custkey
    )
    SELECT
      coalesce(negbal.c_custkey, big.o_custkey) AS custkey,
      negbal.bal                                AS bal,
      big.n_big                                 AS n_big
    FROM negbal FULL OUTER JOIN big ON negbal.c_custkey = big.o_custkey
    """,
)
def q_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two partially-overlapping keyed sets."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    negbal = c.filter(F.col("c_acctbal") < 0).select(
        "c_custkey", F.round("c_acctbal", 2).alias("bal")
    )
    big = (
        o.filter(F.col("o_totalprice") > 400000)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_big"))
    )
    return negbal.join(big, negbal.c_custkey == big.o_custkey, "full").select(
        F.coalesce(negbal.c_custkey, big.o_custkey).alias("custkey"),
        F.col("bal"),
        F.col("n_big"),
    )


@register(
    "q_join_semi",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
            AND o.o_totalprice > 300000
    )
    """,
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi: existence probe; right side carries no payload columns."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_totalprice") > 300000)
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "q_join_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P'
    )
    """,
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join: customers with NO pending order (NOT EXISTS)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "q_join_cross_count",
    oracle="""
    SELECT r.r_name, count(*) AS n_pairs
    FROM region r CROSS JOIN nation n
    GROUP BY r.r_name
    """,
)
def q_join_cross_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join (needed by the B.8 similarity path); kept dim×dim here —
    a fact-side cross join is never the scale plan."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return r.crossJoin(n).groupBy("r_name").agg(F.count(F.lit(1)).alias("n_pairs"))


@register(
    "q_join_range",
    oracle="""
    SELECT
      o.o_orderpriority,
      count(*) AS n_shipped_in_90d
    FROM lineitem l
    JOIN orders o
      ON l.l_orderkey = o.o_orderkey
     AND l.l_shipdate >= o.o_orderdate
     AND l.l_shipdate <  o.o_orderdate + INTERVAL 90 DAY
    GROUP BY o.o_orderpriority
    """,
)
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta join: equi key + range predicate. The equi component keeps it a
    hash/SMJ join (the range is a post-join filter), so it scales like a
    normal key join rather than a banded cross product."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    cond = (
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate >= o.o_orderdate)
        & (li.l_shipdate < o.o_orderdate + F.expr("INTERVAL 90 DAYS"))
    )
    return (
        li.join(o, cond)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_shipped_in_90d"))
    )


@register(
    "q_join_self",
    oracle="""
    SELECT o1.o_custkey AS custkey, count(*) AS n_pairs
    FROM orders o1
    JOIN orders o2
      ON o1.o_custkey = o2.o_custkey AND o1.o_orderkey < o2.o_orderkey
    WHERE o1.o_orderstatus = 'F' AND o2.o_orderstatus = 'F'
    GROUP BY o1.o_custkey
    """,
)
def q_join_self(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-join via aliases: same-customer order pairs."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    o1 = o.alias("o1")
    o2 = o.alias("o2")
    return (
        o1.join(
            o2,
            (F.col("o1.o_custkey") == F.col("o2.o_custkey"))
            & (F.col("o1.o_orderkey") < F.col("o2.o_orderkey")),
        )
        .groupBy(F.col("o1.o_custkey").alias("custkey"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@register(
    "q_join_star",
    oracle="""
    SELECT
      n.n_name,
      CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))
                     * (1 - CAST(l.l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS revenue
    FROM region r
    JOIN nation n   ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
    """,
)
def q_join_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped multi-way star join (SURVEY.md §5.2 item 6).

    Broadcast hints go ONLY on the fixed-cardinality dims (region = 5 rows,
    nation = 25 rows at every scale factor). customer and supplier grow
    linearly with SF — a forced broadcast OOMs executors at 100× — so their
    joins are left unhinted: AQE broadcasts them while they fit under the
    threshold and falls back to shuffle joins beyond that, which is exactly
    the scale-safe behavior. The region filter still prunes the dimension
    chain before it touches the facts.
    """
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")

    dim = c.join(
        F.broadcast(n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)),
        c.c_nationkey == F.col("n_nationkey"),
    )
    # Resolve orders against the (region-pruned) customer dimension BEFORE
    # touching lineitem: only orders of ASIA customers inside the date
    # window reach the fact join, so the biggest shuffle probes a ~5×
    # smaller build side. (Per-orderkey pre-aggregation is NOT valid here —
    # the supplier join predicate depends on each line's l_suppkey.)
    od = o.join(dim, F.col("o_custkey") == dim.c_custkey)
    return (
        li.join(od, li.l_orderkey == F.col("o_orderkey"))
        .join(s,
              (F.col("s_suppkey") == li.l_suppkey)
              & (F.col("s_nationkey") == F.col("c_nationkey")))
        .groupBy("n_name")
        .agg(
            # Exact decimal sum → tie-free rounding (see q_agg_groupby).
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(12,2)")
                    * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)"))
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
    )


@register(
    "q_join_lateral",
    oracle="""
    SELECT c.c_custkey,
           o.o_orderkey                 AS latest_orderkey,
           round(o.o_totalprice, 2)     AS latest_total
    FROM customer c,
    LATERAL (SELECT o_orderkey, o_totalprice
             FROM orders o
             WHERE o.o_custkey = c.c_custkey
             ORDER BY o_orderdate DESC, o_orderkey
             LIMIT 1) o
    """,
)
def q_join_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery: each customer's single latest order
    (greatest-1-per-group expressed as SQL the way an analyst writes it).
    Catalyst decorrelates the per-row subquery into a join + windowed
    rank — same physical shape as q_window_topk_per_group — rather than
    executing |customer| probes. Deterministic via the (o_orderdate DESC,
    o_orderkey) unique order; customers with no orders drop (inner
    lateral), matching the oracle.

    The correlation keys are pre-normalized to BIGINT in the views: the
    LIMIT-1 decorrelation only fires when the predicate is a BARE
    same-type attribute equality — with a physically-int32 o_custkey (the
    'physical' type-drift variant) the implicit cast around the outer
    reference made Spark silently apply the LIMIT globally (1 row instead
    of 1500 — a wrong-results hazard, found round 8; an inline CAST in
    the predicate does NOT fix it, only pre-normalizing the relation
    does)."""
    load_table(spark, sf_dir, "customer").withColumn(
        "c_custkey", F.col("c_custkey").cast("bigint")
    ).createOrReplaceTempView("customer")
    load_table(spark, sf_dir, "orders").withColumn(
        "o_custkey", F.col("o_custkey").cast("bigint")
    ).createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c.c_custkey,
               o.o_orderkey                 AS latest_orderkey,
               round(o.o_totalprice, 2)     AS latest_total
        FROM customer c,
        LATERAL (SELECT o_orderkey, o_totalprice
                 FROM orders o
                 WHERE o.o_custkey = c.c_custkey
                 ORDER BY o_orderdate DESC, o_orderkey
                 LIMIT 1) o
        """
    )


@register(
    "q_join_nullsafe",
    oracle="""
    WITH keyed AS (
      SELECT CASE WHEN CAST(json_extract_string(props, '$.k') AS INTEGER) = 50
                  THEN NULL
                  ELSE CAST(json_extract_string(props, '$.k') AS INTEGER) % 10
             END AS k_bucket
      FROM events
    ),
    lookup(lkey, label) AS (
      VALUES (NULL, 'missing'), (0, 'b0'), (1, 'b1'), (2, 'b2'), (3, 'b3'),
             (4, 'b4'), (5, 'b5'), (6, 'b6'), (7, 'b7'), (8, 'b8'), (9, 'b9')
    )
    SELECT l.label, count(*) AS n_events
    FROM keyed k JOIN lookup l ON k.k_bucket IS NOT DISTINCT FROM l.lkey
    GROUP BY l.label
    """,
)
def q_join_nullsafe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (``<=>`` / IS NOT DISTINCT FROM): events whose
    derived key is NULL still match the dimension's NULL row instead of
    silently dropping — the semantics every enrich join against a lookup
    with a 'missing' bucket needs (a plain ``=`` would lose the NULL
    group).

    Scale: ``<=>`` is a hash-join key like any other (NULL hashes to a
    bucket instead of disqualifying the row) — broadcast here, and the
    plan stays a BroadcastHashJoin, not a nested loop."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").try_cast("int")
    keyed = e.select(
        F.when(k == 50, F.lit(None).cast("int")).otherwise(k % 10).alias(
            "k_bucket"
        )
    )
    lookup = spark.sql(
        """
        SELECT * FROM VALUES
          (CAST(NULL AS INT), 'missing'), (0, 'b0'), (1, 'b1'), (2, 'b2'),
          (3, 'b3'), (4, 'b4'), (5, 'b5'), (6, 'b6'), (7, 'b7'), (8, 'b8'),
          (9, 'b9') AS t(lkey, label)
        """
    )
    return (
        keyed.join(
            F.broadcast(lookup), F.expr("k_bucket <=> lkey"), "inner"
        )
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


@register(
    "q_join_bloom",
    oracle="""
    SELECT
      count(*) AS n_lines,
      CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                     * (1 - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE)
        AS urgent_revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderpriority = '1-URGENT'
    """,
)
def q_join_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime bloom-filter semi-join reduction: a selective dimension-side
    predicate (1 of 5 priorities) is compiled into a bloom filter that
    pre-filters the fact scan BEFORE the shuffle, so ~80% of lineitem rows
    never enter the exchange. Catalyst's InjectRuntimeFilter does the
    rewrite; the query only states the join (tests/test_plans.py asserts
    ``might_contain`` lands in the optimized plan).

    Scale: at 100 TB this is the difference between shuffling the full
    fact table and shuffling only the matching ~20% — the bloom filter
    itself is a few MB broadcast to every scan task. The thresholds are
    lowered here because the local testdata is below the defaults
    (creation side < 10 MB is already true; the 10 GB application-side
    floor only makes sense on a real cluster); production keeps the
    defaults so tiny joins skip the extra aggregate. Money math runs in
    DECIMAL until the final round (registry hash-stability rules).
    """
    prev = {
        "spark.sql.autoBroadcastJoinThreshold": spark.conf.get(
            "spark.sql.autoBroadcastJoinThreshold"
        ),
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": spark.conf.get(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
        ),
    }
    # The optimizer reads these confs at action time, so the query must
    # EXECUTE (localCheckpoint below) before they are restored.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "0",
    )
    try:
        # localCheckpoint executes under the scoped confs.
        out = bloom_join_frame(spark, sf_dir).localCheckpoint()
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)
    return out


def bloom_join_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The un-checkpointed q_join_bloom plan (tests assert ``might_contain``
    lands in its optimized plan under the scoped confs)."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    revenue = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(4,2)")
    )
    return l.join(o, l.l_orderkey == o.o_orderkey).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.round(F.sum(revenue), 2).cast("double").alias("urgent_revenue"),
    )
