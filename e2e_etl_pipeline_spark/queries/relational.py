"""B.1/B.2/B.6 — scans, projection/filter/predicates, sorts/limits/set-ops.

Generalizes reference operators A5-A8 (sources), A11-A12 (projection with
missing-value defaults), A25 (sort), A23 (union) — citations in SURVEY.md §2.
All plans are closed-form column expressions: Catalyst pushes the filters and
the column pruning into the parquet scan (verified via .explain — see
tests/test_plans.py), so at 100 TB each of these reads only the columns and
row groups it needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from e2e_etl_pipeline_spark.catalog import load_table
from e2e_etl_pipeline_spark.functions.money import money_sum
from e2e_etl_pipeline_spark.registry import register


# --------------------------------------------------------------------------
# Flagship: TPC-H-Q1-shaped pricing summary (SURVEY.md §7 Phase 0).
# Direct generalization of the reference's only aggregates — global count/max
# (A26/A27, DataExtract/extract_data.py:137,223) — to grouped sum/avg/count.
# --------------------------------------------------------------------------
@register(
    "q_agg_groupby",
    oracle="""
    SELECT
      l_returnflag,
      l_linestatus,
      round(sum(l_quantity), 2)                                            AS sum_qty,
      CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE)
                                                                           AS sum_base_price,
      CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                     * (1 - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE)
                                                                           AS sum_disc_price,
      CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                     * (1 - CAST(l_discount AS DECIMAL(4,2)))
                     * (1 + CAST(l_tax AS DECIMAL(4,2)))), 2) AS DOUBLE)   AS sum_charge,
      round(avg(l_quantity), 4)                                            AS avg_qty,
      round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(*), 4)
                                                                           AS avg_price,
      round(CAST(sum(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / count(*), 4)
                                                                           AS avg_disc,
      count(*)                                                             AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_agg_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Money sums run in DECIMAL so both engines aggregate exactly (a double
    sum of 4/6-decimal products lands on …x50 rounding ties ~1%/group);
    averages divide the exact decimal sum as identical doubles. l_quantity is
    integral so its double sum is already exact."""
    li = load_table(spark, sf_dir, "lineitem")
    price_dec = F.col("l_extendedprice").cast("decimal(12,2)")
    disc_dec = F.col("l_discount").cast("decimal(4,2)")
    tax_dec = F.col("l_tax").cast("decimal(4,2)")
    disc_price = price_dec * (F.lit(1) - disc_dec)
    n = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum(price_dec), 2).cast("double").alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).cast("double").alias("sum_disc_price"),
            F.round(F.sum(disc_price * (F.lit(1) + tax_dec)), 2).cast("double").alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.sum(price_dec).cast("double") / n, 4).alias("avg_price"),
            F.round(F.sum(disc_dec).cast("double") / n, 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# B.2 projection / filter / predicates
# --------------------------------------------------------------------------
@register(
    "q_project_alias",
    oracle="""
    SELECT
      l_orderkey                                        AS order_id,
      l_linenumber                                      AS line_no,
      CAST(round(CAST(l_extendedprice AS DECIMAL(12,2))
                 * (1 - CAST(l_discount AS DECIMAL(4,2))), 2) AS DOUBLE) AS revenue
    FROM lineitem
    """,
)
def q_project_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11 generalized: projection + computed column + alias.

    price*(1-disc) is a 4-decimal-digit value rounded to 2 — exactly the
    shape where double rounding ties (…x50) flip per engine, so the money
    math runs in DECIMAL (exact, identical everywhere) and only the final
    rounded value is cast back to double (registry hash-stability rules).
    """
    li = load_table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(4,2)")
    )
    return li.select(
        F.col("l_orderkey").alias("order_id"),
        F.col("l_linenumber").alias("line_no"),
        F.round(revenue, 2).cast("double").alias("revenue"),
    )


@register(
    "q_filter_compound",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount
    FROM lineitem
    WHERE l_quantity BETWEEN 10 AND 20
      AND l_discount > 0.05
      AND l_shipdate >= TIMESTAMP '1997-01-01'
    """,
)
def q_filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound AND/OR/NOT predicate, pushed to the parquet scan."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_quantity").between(10, 20)
        & (F.col("l_discount") > 0.05)
        & (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")


@register(
    "q_filter_like",
    oracle="""
    SELECT p_partkey, p_name, p_brand
    FROM part
    WHERE p_name LIKE '%gear%' AND regexp_matches(p_brand, 'Brand#1[0-9]')
    """,
)
def q_filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A19/A22 as predicates: LIKE + regexp filter."""
    p = load_table(spark, sf_dir, "part")
    return p.filter(
        F.col("p_name").like("%gear%") & F.col("p_brand").rlike("Brand#1[0-9]")
    ).select("p_partkey", "p_name", "p_brand")


@register(
    "q_filter_in",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_orderstatus
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH') AND o_orderstatus IN ('F', 'P')
    """,
)
def q_filter_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list membership predicate (A22 generalized)."""
    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        & F.col("o_orderstatus").isin("F", "P")
    ).select("o_orderkey", "o_orderpriority", "o_orderstatus")


@register(
    "q_null_handling",
    oracle="""
    SELECT
      c_custkey,
      nullif(c_mktsegment, 'BUILDING')                                 AS seg_or_null,
      coalesce(nullif(c_mktsegment, 'BUILDING'), '(unsegmented)')      AS seg_defaulted,
      (nullif(c_mktsegment, 'BUILDING') IS NULL)                       AS is_building,
      CASE WHEN c_acctbal < 0 THEN NULL ELSE round(c_acctbal, 2) END   AS bal_nonneg
    FROM customer
    """,
)
def q_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12 generalized: NULL predicates + coalesce defaults.

    The reference fills missing values with empty strings at every selector
    (DataTransform/transform_data.py:98,107,193,197,201); the engine keeps
    typed NULLs internally and defaults only at the edge (SURVEY.md §1.2).
    """
    c = load_table(spark, sf_dir, "customer")
    seg_or_null = F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))
    return c.select(
        "c_custkey",
        seg_or_null.alias("seg_or_null"),
        F.coalesce(seg_or_null, F.lit("(unsegmented)")).alias("seg_defaulted"),
        seg_or_null.isNull().alias("is_building"),
        F.when(F.col("c_acctbal") < 0, F.lit(None)).otherwise(F.round("c_acctbal", 2)).alias("bal_nonneg"),
    )


@register(
    "q_case_when",
    oracle="""
    SELECT
      CASE
        WHEN o_totalprice > 350000 THEN 'large'
        WHEN o_totalprice > 150000 THEN 'medium'
        ELSE 'small'
      END                         AS price_band,
      count(*)                    AS n_orders,
      CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE)
                                  AS total
    FROM orders
    GROUP BY 1
    """,
)
def q_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A15/A21's conditional branching as CASE WHEN (SURVEY.md §2 B.2)."""
    o = load_table(spark, sf_dir, "orders")
    band = (
        F.when(F.col("o_totalprice") > 350000, "large")
        .when(F.col("o_totalprice") > 150000, "medium")
        .otherwise("small")
    )
    return o.groupBy(band.alias("price_band")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        money_sum("o_totalprice").alias("total"),
    )


@register(
    "q_cast",
    oracle="""
    SELECT
      CAST(l_orderkey AS VARCHAR)          AS orderkey_str,
      -- trunc() pins double->int to Spark's truncate-toward-zero: DuckDB's
      -- bare CAST ROUNDS half-to-even, so a regenerated fractional
      -- l_quantity (integral today) would otherwise split the engines.
      CAST(trunc(l_quantity) AS INTEGER)   AS qty_int,
      CAST(l_shipdate AS DATE)             AS ship_date,
      CAST(l_linenumber AS BIGINT)         AS line_no_big
    FROM lineitem
    """,
)
def q_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A22/A25's int() casts generalized to the full coercion matrix.

    Spark's double→int cast truncates toward zero; the oracle pins
    DuckDB's rounding CAST to the same semantics with trunc(), so the
    key stays in parity even if a regenerated l_quantity turns
    fractional (integral 1..50 today).
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_orderkey").cast("string").alias("orderkey_str"),
        F.col("l_quantity").cast("int").alias("qty_int"),
        F.col("l_shipdate").cast("date").alias("ship_date"),
        F.col("l_linenumber").cast("bigint").alias("line_no_big"),
    )


# --------------------------------------------------------------------------
# B.6 sorts / limits / set operations
# --------------------------------------------------------------------------
@register(
    "q_sort_multi",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey
    FROM nation
    ORDER BY n_regionkey DESC, n_name ASC
    """,
)
def q_sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A25 (numeric-key sort) generalized to multi-key asc/desc."""
    n = load_table(spark, sf_dir, "nation")
    return n.select("n_nationkey", "n_name", "n_regionkey").orderBy(
        F.desc("n_regionkey"), F.asc("n_name")
    )


@register(
    "q_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS total
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 25
    """,
)
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 (top-1 file) generalized to top-k with a *unique* total order.

    o_orderkey tiebreak keeps the limit deterministic across engines
    (registry hash-stability rule). Spark executes this as TakeOrderedAndProject
    — per-partition top-k then a k-row merge on the driver; no global sort at
    any scale.
    """
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select("o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("total"))
        .limit(25)
    )


@register(
    "q_union_all",
    oracle="""
    SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus = 'P'
    UNION ALL
    SELECT o_orderkey, o_orderstatus FROM orders WHERE o_totalprice > 400000
    """,
)
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A23 (page-batch append) as unionByName; duplicates preserved."""
    o = load_table(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_orderstatus"]
    left = o.filter(F.col("o_orderstatus") == "P").select(*cols)
    right = o.filter(F.col("o_totalprice") > 400000).select(*cols)
    return left.unionByName(right)


@register(
    "q_union_distinct",
    oracle="""
    SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus = 'P'
    UNION
    SELECT o_orderkey, o_orderstatus FROM orders WHERE o_totalprice > 400000
    """,
)
def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION with duplicate elimination (set semantics)."""
    o = load_table(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_orderstatus"]
    left = o.filter(F.col("o_orderstatus") == "P").select(*cols)
    right = o.filter(F.col("o_totalprice") > 400000).select(*cols)
    return left.unionByName(right).distinct()


@register(
    "q_intersect",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_acctbal > 5000
    INTERSECT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT of two key sets (customers that do have orders)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    rich = c.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return rich.intersect(urgent)


@register(
    "q_except",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_acctbal > 5000
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT of two key sets (customers without orders)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    rich = c.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("c_custkey")
    )
    # subtract() IS SQL EXCEPT (distinct, removes any value present on
    # the right); exceptAll().distinct() would keep a value whose left
    # multiplicity merely exceeds the right's (round-4 review) — equal
    # here only because c_custkey is unique on the left.
    return rich.subtract(urgent)


@register(
    "q_except_all",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def q_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — true multiset difference: a customer with 5 open
    orders and 2 urgent ones survives with multiplicity 3, which the
    DISTINCT variant (q_except) cannot express. The driver's hash is
    multiplicity-sensitive, so this checks bag semantics exactly.
    Scale: Spark plans exceptAll as a counted aggregate + generate
    (one shuffle on the key), never a row-by-row pairing."""
    o = load_table(spark, sf_dir, "orders")
    open_o = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    return open_o.exceptAll(urgent)


@register(
    "q_intersect_all",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT ALL
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def q_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — multiset intersection (min of per-side
    multiplicities per key), the bag-semantics sibling of q_intersect."""
    o = load_table(spark, sf_dir, "orders")
    open_o = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    return open_o.intersectAll(urgent)


# --------------------------------------------------------------------------
# B.1 JSON column parse (events.props holds JSON-in-string, e.g. '{"k": 87}')
# --------------------------------------------------------------------------
@register(
    "q_json_extract",
    oracle="""
    SELECT
      CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_value,
      count(*)                                           AS n_events,
      CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)
                                                         AS sum_value
    FROM events
    GROUP BY 1
    """,
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B.1: JSON-in-string extraction (TD: events.props, SURVEY.md §1.2)."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").try_cast("int")
    return e.groupBy(k.alias("k_value")).agg(
        F.count(F.lit(1)).alias("n_events"),
        money_sum("value").alias("sum_value"),
    )


@register(
    "q_union_by_name",
    oracle="""
    SELECT o_orderkey,
           CAST(o_totalprice AS DOUBLE) AS o_totalprice,
           o_orderstatus,
           src
    FROM (
      SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice,
             o_orderstatus, 'full' AS src
      FROM orders WHERE o_orderkey % 10 = 0
      UNION ALL BY NAME
      SELECT o_orderstatus, o_orderkey, 'slim' AS src
      FROM orders WHERE o_orderkey % 10 = 1
    )
    """,
)
def q_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-aligned union (unionByName, allowMissingColumns): frames with
    different column ORDER and a missing column combine by name, absent
    columns null-filled — the schema-drift-tolerant append every
    multi-source ingestion needs (positional UNION would silently pair
    mismatched columns).

    Scale: union is a zero-shuffle plan concatenation; each branch keeps
    its own pushed filter and pruned schema.
    """
    o = load_table(spark, sf_dir, "orders")
    full = o.where(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey",
        F.round("o_totalprice", 2).alias("o_totalprice"),
        "o_orderstatus",
        F.lit("full").alias("src"),
    )
    slim = o.where(F.col("o_orderkey") % 10 == 1).select(
        "o_orderstatus", "o_orderkey", F.lit("slim").alias("src")
    )
    return full.unionByName(slim, allowMissingColumns=True)


@register(
    "q_json_flatten",
    oracle="""
    WITH tag_rows AS (
      SELECT event_type,
             CAST(value AS DECIMAL(12,2)) AS v,
             unnest([event_type, json_extract_string(props, '$.k')]) AS tag
      FROM events
    )
    SELECT event_type, tag, count(*) AS n,
           CAST(round(sum(v), 2) AS DOUBLE) AS sum_v
    FROM tag_rows
    GROUP BY event_type, tag
    """,
)
def q_json_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-JSON shredding: serialize each event into a nested document
    (object + inner object + tag array), parse it back with a full
    from_json schema, explode the array, and aggregate over fields pulled
    from every nesting level — the standard "semi-structured in, columns
    out" path (q_json_extract covers the single-path scalar case).

    The oracle computes the same result from the relational columns
    directly, so the gate proves the serialize→parse→explode pipeline is
    lossless (a formatting or type-coercion bug in the roundtrip shows up
    as a value mismatch).

    Scale: from_json/explode are codegen'd row-local ops — no shuffle
    until the final partial-agg'd groupBy; document bodies never move.
    Schema is explicit (never schema-inference on a 100 TB corpus);
    corrupt records would surface as nulls under mode=PERMISSIVE and get
    counted, not dropped silently."""
    ev = load_table(spark, sf_dir, "events")
    doc = F.to_json(
        F.struct(
            F.col("user_id").alias("user"),
            F.struct(
                F.col("event_type").alias("type"),
                F.col("value").alias("v"),
            ).alias("meta"),
            F.array(
                F.col("event_type"), F.get_json_object("props", "$.k")
            ).alias("tags"),
        )
    )
    schema = "user long, meta struct<type:string,v:double>, tags array<string>"
    parsed = ev.select(F.from_json(doc, schema).alias("j"))
    flat = parsed.select(
        F.col("j.meta.type").alias("event_type"),
        F.col("j.meta.v").cast("decimal(12,2)").alias("v"),
        F.explode("j.tags").alias("tag"),
    )
    return flat.groupBy("event_type", "tag").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("v"), 2).cast("double").alias("sum_v"),
    )


@register(
    "q_variant_shred",
    oracle="""
    WITH shredded AS (
      SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
      FROM events
    )
    SELECT count(*)                 AS n_events,
           count(DISTINCT k)        AS n_distinct_k,
           min(k)                   AS min_k,
           max(k)                   AS max_k,
           round(avg(k), 4)         AS avg_k
    FROM shredded
    """,
)
def q_variant_shred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured shredding through Spark 4's VARIANT type:
    ``parse_json`` decodes the JSON string ONCE into the binary variant
    encoding, and ``variant_get`` does typed path extraction from it —
    the at-scale JSON pattern (parse once per row, not once per path
    access; the binary form also enables future shredded-column pushdown)
    vs q_json_extract's direct string-path probe.

    Scale: both steps are scan-stage expressions; the aggregate reduces
    map-side. At many paths per row the variant decode amortizes across
    every ``variant_get``, which the per-path string parser cannot."""
    e = load_table(spark, sf_dir, "events")
    shredded = e.select(
        F.expr("variant_get(parse_json(props), '$.k', 'int')").alias("k")
    )
    return shredded.agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("k").alias("n_distinct_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
        F.round(F.avg("k"), 4).alias("avg_k"),
    )


@register(
    "q_json_malformed",
    oracle="""
    WITH dirty AS (
      SELECT
        event_type,
        CASE WHEN event_id % 10 = 3 THEN 'x' || props ELSE props END AS props
      FROM events
    )
    SELECT
      event_type,
      count(*)                                              AS n_rows,
      CAST(sum(CASE WHEN props IS NULL THEN 0
                    WHEN json_valid(props) THEN 0 ELSE 1 END) AS BIGINT) AS n_corrupt,
      CAST(sum(CASE WHEN json_valid(props)
               THEN CAST(props ->> 'k' AS BIGINT) ELSE 0 END) AS BIGINT) AS k_total
    FROM dirty
    GROUP BY event_type
    """,
)
def q_json_malformed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-record tolerance — the PERMISSIVE-mode ingest contract: a
    feed where 10% of JSON payloads are corrupt (deterministically
    injected: a leading garbage byte) must not fail the pipeline; bad rows
    are counted per group and excluded from the extracted aggregate.

    Spark semantics: PERMISSIVE ``from_json`` routes unparseable input
    into the declared ``columnNameOfCorruptRecord`` field (the parsed
    fields come back NULL, the raw payload lands in ``_corrupt``), so
    corruption detection is a null-check on that field — scan-stage
    expressions only, no job failure, no Python. The
    oracle mirrors with DuckDB ``json_valid``. A NULL payload is MISSING,
    not corrupt, in both engines (PERMISSIVE ``from_json(NULL)`` yields a
    null row with no corrupt-record, and the oracle short-circuits
    ``props IS NULL`` before ``json_valid`` — which would otherwise return
    NULL and fall into the corrupt branch). At 100 TB this is how a
    dirty feed quarantines: the same null-flag routes rows to a dead-letter
    sink instead of killing a 1000-executor job (the reference's parser
    crashes the batch on the first malformed document —
    transform_data.py:268-271 does no error handling; this is the
    engine-grade generalization)."""
    ev = load_table(spark, sf_dir, "events")
    dirty = ev.select(
        "event_type",
        F.when(
            F.col("event_id") % 10 == 3, F.concat(F.lit("x"), F.col("props"))
        )
        .otherwise(F.col("props"))
        .alias("props"),
    )
    parsed = dirty.withColumn(
        "j",
        F.from_json(
            "props",
            "k BIGINT, _corrupt STRING",
            {"columnNameOfCorruptRecord": "_corrupt"},
        ),
    )
    bad = F.col("j._corrupt").isNotNull()
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(bad, 1).otherwise(0)).alias("n_corrupt"),
        F.sum(F.when(~bad, F.col("j.k")).otherwise(0)).alias("k_total"),
    )
