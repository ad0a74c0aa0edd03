"""Behavioral tests for the prep family (queries/prep.py): properties the
oracle hash-compare can't express — range invariants, sampling bounds,
quantization error bounds, and stream/batch equivalence."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from e2e_etl_pipeline_spark.registry import QUERIES, load_all

load_all()


def test_scd2_ranges_are_disjoint_and_single_current(spark, sf_dir):
    hist = QUERIES["q_scd2"](spark, sf_dir)
    # Exactly one open (is_current) version per user.
    bad_current = (
        hist.groupBy("user_id")
        .agg(F.sum("is_current").alias("n_open"))
        .where(F.col("n_open") != 1)
    )
    assert bad_current.count() == 0
    # valid_from < valid_to for every closed version (half-open ranges).
    assert hist.where(
        F.col("valid_to").isNotNull() & (F.col("valid_from") >= F.col("valid_to"))
    ).count() == 0
    # Consecutive versions chain: next valid_from == this valid_to.
    nxt = hist.alias("a").join(
        hist.alias("b"),
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("a.valid_to") == F.col("b.valid_from")),
        "left",
    )
    closed = nxt.where(F.col("a.valid_to").isNotNull())
    assert closed.where(F.col("b.user_id").isNull()).count() == 0


def test_stratified_sample_rates_and_determinism(spark, sf_dir):
    sample = QUERIES["q_sample_stratified"](spark, sf_dir)
    from e2e_etl_pipeline_spark.catalog import load_table

    cust = load_table(spark, sf_dir, "customer")
    rates = (
        sample.groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_sampled"))
        .join(
            cust.groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("n_total")),
            "c_mktsegment",
        )
        .select(
            "c_mktsegment",
            (F.col("n_sampled") / F.col("n_total")).alias("rate"),
        )
        .collect()
    )
    for row in rates:
        want = 0.5 if row.c_mktsegment == "BUILDING" else 26 / 256
        # md5-byte gating is binomial; allow a generous band at small SF.
        assert abs(row.rate - want) < 0.25, (row.c_mktsegment, row.rate)
    # Hash-gated sampling is exactly reproducible run-to-run.
    a = {r.c_custkey for r in sample.collect()}
    b = {r.c_custkey for r in QUERIES["q_sample_stratified"](spark, sf_dir).collect()}
    assert a == b and a


def test_quantize_error_bounded_by_half_step(spark, sf_dir):
    q = QUERIES["q_embedding_quantize"](spark, sf_dir)
    # absmax int8 quantization: reconstruction error <= scale/2 per element
    # (1e-6 slack: both outputs are rounded at 6dp, which can nudge the
    # comparison by up to ~7.5e-7).
    viol = q.where(F.col("max_err") > F.col("scale") / 2 + 1e-6)
    assert viol.count() == 0
    assert q.where(F.col("q_l1") <= 0).count() == 0


def test_unpivot_shape(spark, sf_dir):
    from e2e_etl_pipeline_spark.catalog import load_table

    long = QUERIES["q_unpivot"](spark, sf_dir)
    n_prio = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderpriority")
        .distinct()
        .count()
    )
    assert long.count() == 3 * n_prio
    assert {r.metric for r in long.select("metric").distinct().collect()} == {
        "n_orders",
        "sum_price",
        "avg_price",
    }


def test_profile_counts_consistent(spark, sf_dir):
    from e2e_etl_pipeline_spark.catalog import load_table

    prof = {r.column_name: r for r in QUERIES["q_profile"](spark, sf_dir).collect()}
    n = load_table(spark, sf_dir, "orders").count()
    assert set(prof) == {
        "o_orderstatus",
        "o_orderpriority",
        "o_custkey",
        "o_totalprice",
    }
    for row in prof.values():
        assert row.n_rows == n
        assert 0 <= row.n_nulls <= n
        assert 1 <= row.n_distinct <= n


@pytest.mark.slow
def test_stream_join_matches_batch_interval_join(spark, sf_dir):
    from e2e_etl_pipeline_spark.catalog import load_table

    streamed = QUERIES["q_stream_join"](spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    c = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_event_id"),
        F.col("user_id").alias("c_user_id"),
        F.col("ts").alias("c_ts"),
    )
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_event_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("p_ts"),
    )
    batch = c.join(
        p,
        (F.col("c_user_id") == F.col("p_user_id"))
        & (F.col("p_ts") >= F.col("c_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("p_ts") <= F.col("c_ts")),
    ).select("c_event_id", "p_event_id")
    got = {(r.c_event_id, r.p_event_id) for r in streamed.collect()}
    want = {(r.c_event_id, r.p_event_id) for r in batch.collect()}
    assert got == want


def test_salted_join_equals_plain_join_property(spark):
    """salted_join must be byte-identical to the plain join on arbitrary
    (skewed) key distributions, including keys missing from either side."""
    from e2e_etl_pipeline_spark.operators.skew import salted_join

    # Heavily skewed fact: one hot key (90%), plus keys with no dim match.
    fact_rows = [(1, i) for i in range(90)] + [(2, i) for i in range(9)] + [(99, 0)]
    dim_rows = [(1, "hot"), (2, "warm"), (3, "unmatched-dim")]
    fact = spark.createDataFrame(fact_rows, "k long, payload long").repartition(7)
    dim = spark.createDataFrame(dim_rows, "k long, label string")
    got = {
        (r.k, r.payload, r.label)
        for r in salted_join(fact, dim, "k", n_salts=4).collect()
    }
    want = {
        (r.k, r.payload, r.label) for r in fact.join(dim, "k").collect()
    }
    assert got == want and len(want) == 99


def test_chunking_covers_every_token(spark, sf_dir):
    """Chunk lengths with stride 40 must tile each document exactly:
    sum(n_tokens) - overlaps == word count, and chunk_ids are dense."""
    from e2e_etl_pipeline_spark.catalog import load_table

    chunks = QUERIES["q_text_chunk"](spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.expr(r"filter(split(text, '\\s+'), t -> t != '')")).alias("n_words"),
    )
    per_doc = chunks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.max("chunk_id").alias("max_chunk"),
        F.max(F.lit(40) * F.col("chunk_id") + F.col("n_tokens")).alias("covered"),
    )
    j = per_doc.join(docs, "doc_id")
    # dense chunk ids 0..n-1
    assert j.where(F.col("max_chunk") != F.col("n_chunks") - 1).count() == 0
    # last chunk reaches exactly the last token (empty docs emit 1 zero-token chunk)
    assert j.where(
        (F.col("n_words") > 0) & (F.col("covered") != F.col("n_words"))
    ).count() == 0


def test_packing_bins_sequential_and_bounded(spark, sf_dir):
    """Within each lang shard: bin ids are dense from 0, and every bin
    except possibly the last holds >= capacity tokens only via its final
    straddling doc (i.e. bins are filled sequentially, never skipped)."""
    packed = QUERIES["q_pack_contexts"](spark, sf_dir)
    per_lang = packed.groupBy("lang").agg(
        F.min("bin_id").alias("lo"),
        F.max("bin_id").alias("hi"),
        F.count(F.lit(1)).alias("n_bins"),
    )
    bad = per_lang.where(
        (F.col("lo") != 0) | (F.col("n_bins") != F.col("hi") + 1)
    )
    assert bad.count() == 0


def test_distributed_ntile_matches_sql_ntile(spark):
    """operators/ranks.py must reproduce SQL NTILE exactly — asc and desc
    orders, a non-divisible n, chained calls, and n < k — on data spread
    across many partitions."""
    from pyspark.sql import Window

    from e2e_etl_pipeline_spark.operators.ranks import (
        distributed_ntile,
        distributed_rank,
    )

    rows = [(i, (i * 37) % 101, (i * 53) % 97) for i in range(257)]
    df = spark.createDataFrame(rows, "id long, a long, b long").repartition(16)

    got = distributed_ntile(df, 7, [F.col("a"), F.col("id")], "q")
    want = df.select(
        "id", F.ntile(7).over(Window.orderBy("a", "id")).alias("q")
    )
    assert {(r.id, r.q) for r in got.select("id", "q").collect()} == {
        (r.id, r.q) for r in want.collect()
    }

    got_desc = distributed_ntile(df, 5, [F.desc("b"), F.asc("id")], "q")
    want_desc = df.select(
        "id",
        F.ntile(5).over(Window.orderBy(F.desc("b"), F.asc("id"))).alias("q"),
    )
    assert {(r.id, r.q) for r in got_desc.select("id", "q").collect()} == {
        (r.id, r.q) for r in want_desc.collect()
    }

    # Chained calls keep earlier buckets intact.
    chained = distributed_ntile(got, 4, [F.col("b"), F.col("id")], "q2")
    assert set(chained.columns) == {"id", "a", "b", "q", "q2"}
    assert chained.count() == 257

    # n < k: every row gets its own bucket 1..n.
    tiny = spark.createDataFrame([(1,), (2,), (3,)], "id long")
    got_tiny = distributed_ntile(tiny, 10, [F.col("id")], "q")
    assert sorted((r.id, r.q) for r in got_tiny.collect()) == [
        (1, 1),
        (2, 2),
        (3, 3),
    ]

    # distributed_rank is a dense 1..n total order.
    ranked = distributed_rank(df, [F.col("a"), F.col("id")], "rk")
    rks = sorted(r.rk for r in ranked.select("rk").collect())
    assert rks == list(range(1, 258))


def test_distributed_cumsum_equals_plain_window(spark):
    from pyspark.sql import Window as W

    from e2e_etl_pipeline_spark.operators.ranks import distributed_cumsum

    df = spark.createDataFrame(
        [(i, i % 7, (i * 3) % 5) for i in range(500)], "k int, a int, b int"
    )
    got = {
        (r.k, r.cum_a, r.cum_b)
        for r in distributed_cumsum(df, ["k"], {"cum_a": "a", "cum_b": "b"}).collect()
    }
    w = W.orderBy("k").rowsBetween(W.unboundedPreceding, 0)
    want = {
        (r.k, r.cum_a, r.cum_b)
        for r in df.select(
            "k", F.sum("a").over(w).alias("cum_a"), F.sum("b").over(w).alias("cum_b")
        ).collect()
    }
    assert got == want


def test_bounded_rank_matches_row_number(spark):
    """operators/ranks.bounded_rank (predecessor-count broadcast join for
    CONSTANT-bounded frames) must reproduce row_number over the same
    unique total order — desc+asc composite keys, NULLs ordering LAST in
    both directions (the registry's cross-engine pin), multi-partition
    input — and must plan no Window at all."""
    from pyspark.sql import Window

    from e2e_etl_pipeline_spark.operators.ranks import bounded_rank

    rows = [(i, (i * 37) % 11, f"t{i:03d}") for i in range(60)]
    # NULL score and NULL token rows: both must rank AFTER non-NULLs
    rows += [(60, None, "t999"), (61, 5, None)]
    df = spark.createDataFrame(rows, "id long, score long, tok string").repartition(8)

    got = bounded_rank(df, [("score", "desc"), ("tok", "asc"), ("id", "asc")], "rn")
    w = Window.orderBy(
        F.desc_nulls_last("score"), F.asc_nulls_last("tok"), F.asc_nulls_last("id")
    )
    want = df.withColumn("rn", F.row_number().over(w).cast("long"))
    assert {tuple(r) for r in got.collect()} == {tuple(r) for r in want.collect()}
    assert "Window" not in got._jdf.queryExecution().executedPlan().toString()


def test_bounded_rank_raises_on_tied_order_spec(spark):
    """A non-unique order_spec silently degraded to rank() and collapsed
    fully-duplicate rows before round 11 (advice item); the execution-time
    tie probe must now raise on the first action — including the
    full-duplicate-row case — while construction stays exception-free."""
    import pytest

    from e2e_etl_pipeline_spark.operators.ranks import bounded_rank

    tied = spark.createDataFrame(
        [(3, "a"), (3, "a"), (1, "b")], "score long, tok string"
    )
    plan = bounded_rank(tied, [("score", "desc"), ("tok", "asc")], "rn")
    with pytest.raises(Exception, match="unique total order"):
        plan.collect()
