"""Behavioral invariants for the temporal/analytics family
(queries/temporal.py) — properties that would hold even if the Spark and
DuckDB implementations shared the same mistake (the oracle gate can't
catch both-engines-wrong)."""

from __future__ import annotations

import pyspark.sql.functions as F

from e2e_etl_pipeline_spark.catalog import load_table
from e2e_etl_pipeline_spark.registry import QUERIES, load_all

load_all()


def test_funnel_counts_are_monotone_nonincreasing(spark, sf_dir):
    row = QUERIES["q_funnel"](spark, sf_dir).collect()[0]
    assert row.n_signup >= row.n_view >= row.n_click >= row.n_purchase >= 0
    # Stage 1 is simply "has a signup event" — cross-check directly.
    ev = load_table(spark, sf_dir, "events")
    n_signup_users = (
        ev.where(F.col("event_type") == "signup").select("user_id").distinct().count()
    )
    assert row.n_signup == n_signup_users


def test_retention_day0_equals_cohort_sizes(spark, sf_dir):
    ret = QUERIES["q_retention_cohort"](spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    # offset 0 means "active on the cohort day" — true for every user by
    # construction, so day-0 counts must equal cohort sizes exactly.
    cohort_sizes = {
        r.cohort_day: r.n
        for r in ev.groupBy("user_id")
        .agg(F.min(F.to_date("ts")).alias("cohort_day"))
        .groupBy("cohort_day")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    day0 = {r.cohort_day: r.n_active for r in ret.where("offset_days = 0").collect()}
    assert day0 == cohort_sizes
    # Retention never exceeds the cohort size at any offset.
    for r in ret.collect():
        assert 0 < r.n_active <= cohort_sizes[r.cohort_day]
        assert 0 <= r.offset_days <= 7


def test_skew_profile_shares_are_consistent(spark, sf_dir):
    rows = QUERIES["q_skew_profile"](spark, sf_dir).collect()
    assert len(rows) == 10
    li_count = load_table(spark, sf_dir, "lineitem").count()
    for r in rows:
        assert abs(r.share - r.n_rows / li_count) < 1e-6
    counts = [r.n_rows for r in rows]
    assert counts == sorted(counts, reverse=True)


def test_sessionize_conserves_events_and_respects_gap(spark, sf_dir):
    sess = QUERIES["q_sessionize"](spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    agg = sess.agg(
        F.sum("n_events").alias("total"),
        F.min("n_events").alias("min_n"),
        F.min("duration_seconds").alias("min_dur"),
        F.max("session_seq").alias("max_seq"),
    ).collect()[0]
    # Conservation: every event lands in exactly one session.
    assert agg.total == ev.count()
    assert agg.min_n >= 1 and agg.min_dur >= 0 and agg.max_seq >= 1
    # Gap semantics: consecutive sessions of one user start > 1800 s after
    # the previous session's start (the previous session ended at or after
    # its own start, and a new one only opens on a >1800 s gap).
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("session_seq")
    gaps = (
        sess.withColumn(
            "prev_start", F.lag("session_start_epoch").over(w)
        )
        .where(F.col("prev_start").isNotNull())
        .where(
            F.col("session_start_epoch") - F.col("prev_start") <= 1800
        )
    )
    assert gaps.count() == 0


def test_pareto_set_is_minimal_and_covering(spark, sf_dir):
    rows = QUERIES["q_pareto_topshare"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        # Covers the threshold, and is a strict subset unless spend is
        # nearly uniform (then n_top can equal n_customers).
        assert r.covered_share >= 0.8 or r.n_top == r.n_customers
        assert 1 <= r.n_top <= r.n_customers


def test_mannwhitney_u_within_bounds(spark, sf_dir):
    # 0 <= U <= n_a * n_b always; equality ends only under total separation.
    row = QUERIES["q_mannwhitney"](spark, sf_dir).collect()
    if row:  # empty cohorts yield no row
        r = row[0]
        assert 0.0 <= r.u_stat <= r.n_a * r.n_b


def test_asof_nearest_directions_and_ties(spark, tmp_path):
    """Planted nearest-match scenarios: forward wins when strictly closer,
    equal whole-second distance breaks backward, a same-second purchase is
    a gap-0 backward match, and a user with no purchases matches nothing."""
    from datetime import datetime, timezone

    def t(s):
        return datetime.fromtimestamp(s, tz=timezone.utc).replace(tzinfo=None)

    rows = [
        # user 1: purchase@100, click@103, purchase@105 → fwd (gap 2) beats back (3)
        (1, t(100), 1, "purchase", 10.0, None),
        (2, t(103), 1, "click", None, None),
        (3, t(105), 1, "purchase", 20.0, None),
        # user 1: click@98 → nothing behind, purchase@100 ahead → fwd +2
        (4, t(98), 1, "click", None, None),
        # user 2: tie (2s each way) → backward wins
        (5, t(10), 2, "purchase", 1.0, None),
        (6, t(12), 2, "click", None, None),
        (7, t(14), 2, "purchase", 2.0, None),
        # user 2: click exactly AT a purchase second → gap-0 backward
        (8, t(14), 2, "click", None, None),
        # user 3: click with no purchases at all
        (9, t(50), 3, "click", None, None),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))
    out = {
        r.event_id: r
        for r in QUERIES["q_join_asof_nearest"](spark, str(tmp_path)).collect()
    }
    assert (out[2].nearest_value, out[2].gap_seconds, out[2].direction) == (20.0, 2, "fwd")
    assert (out[4].nearest_value, out[4].gap_seconds, out[4].direction) == (10.0, 2, "fwd")
    assert (out[6].nearest_value, out[6].gap_seconds, out[6].direction) == (1.0, -2, "back")
    assert (out[8].nearest_value, out[8].gap_seconds, out[8].direction) == (2.0, 0, "back")
    assert (out[9].nearest_value, out[9].gap_seconds, out[9].direction) == (None, None, None)
