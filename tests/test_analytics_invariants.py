"""Behavioral invariants for the experiment/curation analytics keys —
properties the DuckDB hash-parity check cannot articulate (monotonicity,
bounds, conservation), asserted on the sf0.001 fixtures.
"""

from __future__ import annotations

from e2e_etl_pipeline_spark.registry import QUERIES, load_all

load_all()


def test_survival_curve_is_monotone_from_one(spark, sf_dir):
    rows = sorted(
        QUERIES["q_survival_km"](spark, sf_dir).collect(), key=lambda r: r["t"]
    )
    assert rows, "empty survival curve"
    assert rows[0]["survival"] <= 1.0 + 1e-9
    for a, b in zip(rows, rows[1:]):
        assert b["survival"] <= a["survival"] + 1e-9  # non-increasing
        assert b["n_risk"] <= a["n_risk"]  # at-risk set only shrinks


def test_market_basket_bounds(spark, sf_dir):
    for r in QUERIES["q_market_basket"](spark, sf_dir).collect():
        assert 0.0 <= r["jaccard"] <= 1.0
        assert r["lift"] > 0.0
        assert r["n_both"] > 0


def test_decile_lift_cumulative_share_reaches_one(spark, sf_dir):
    rows = sorted(
        QUERIES["q_decile_lift"](spark, sf_dir).collect(),
        key=lambda r: r["decile"],
    )
    assert len(rows) == 10
    shares = [r["cum_share"] for r in rows]
    assert shares == sorted(shares)  # cumulative share is monotone
    assert abs(shares[-1] - 1.0) < 1e-6
    # deciles ranked by spend: the first decile carries the largest share
    assert rows[0]["spend_share"] >= rows[-1]["spend_share"]


def test_benford_frequencies_sum_to_one(spark, sf_dir):
    rows = QUERIES["q_benford"](spark, sf_dir).collect()
    assert {r["digit"] for r in rows} <= set(range(1, 10))
    assert abs(sum(r["obs_freq"] for r in rows) - 1.0) < 1e-3


def test_interval_merge_conservation(spark, sf_dir):
    # Each island covers at least one 600 s interval and islands never
    # overlap, so covered time >= 600 * 1 and >= longest island.
    for r in QUERIES["q_interval_merge"](spark, sf_dir).collect():
        assert r["covered_seconds"] >= 600
        assert r["longest_seconds"] <= r["covered_seconds"]
        assert r["n_islands"] >= 1


def test_json_malformed_quarantine_is_exactly_the_injected_set(spark, sf_dir):
    """Every injected-corrupt row (event_id % 10 == 3) is quarantined and
    nothing else is: total corrupt across groups == count of the injection
    predicate, and no job failure on a 10%-dirty feed."""
    import pyspark.sql.functions as F

    from e2e_etl_pipeline_spark.catalog import load_table
    from e2e_etl_pipeline_spark.registry import QUERIES, load_all

    load_all()
    out = QUERIES["q_json_malformed"](spark, sf_dir)
    total_corrupt = out.agg(F.sum("n_corrupt")).collect()[0][0]
    expected = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_id") % 10 == 3)
        .count()
    )
    assert total_corrupt == expected > 0


def test_ols_matches_numpy_polyfit(spark, sf_dir):
    """Both-engines-wrong guard: the closed-form OLS must agree with an
    independent numpy least-squares fit on the same slice."""
    import numpy as np

    from e2e_etl_pipeline_spark.catalog import load_table
    from e2e_etl_pipeline_spark.registry import QUERIES, load_all

    load_all()
    rows = {r.l_returnflag: r for r in QUERIES["q_regression_ols"](spark, sf_dir).collect()}
    pdf = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_quantity", "l_extendedprice")
        .toPandas()
    )
    for flag, grp in pdf.groupby("l_returnflag"):
        slope, intercept = np.polyfit(grp.l_quantity, grp.l_extendedprice, 1)
        assert abs(rows[flag].slope - slope) < 1e-2
        assert abs(rows[flag].intercept - intercept) < 1e-1
        assert 0.0 <= rows[flag].r2 <= 1.0


def test_skyline_operator_matches_bruteforce(spark):
    """skyline() must equal the O(n^2) dominance definition, retain tied
    duplicate points, and work in 3 dimensions."""
    import itertools
    import random

    from e2e_etl_pipeline_spark.operators.skyline import skyline

    rng = random.Random(7)
    pts = [(i, rng.randint(0, 20), rng.randint(0, 20), rng.randint(0, 20))
           for i in range(200)]
    pts += [(900, 0, 0, 20), (901, 0, 0, 20)]  # tied optimal duplicates
    df = spark.createDataFrame(pts, "id long, x long, y long, z long").repartition(5)
    got = {r.id for r in skyline(df, minimize=["x", "y"], maximize=["z"]).collect()}

    def dominated(a, b):  # b dominates a
        at_least = b[1] <= a[1] and b[2] <= a[2] and b[3] >= a[3]
        strict = b[1] < a[1] or b[2] < a[2] or b[3] > a[3]
        return at_least and strict

    brute = {a[0] for a in pts if not any(dominated(a, b) for b in pts)}
    assert got == brute
    assert {900, 901} <= got


def test_skyline_retains_incomparable_null_rows(spark):
    """SQL NULL-comparison semantics: a row with a NULL objective is
    incomparable — it stays in the result and never dominates others."""
    from e2e_etl_pipeline_spark.operators.skyline import skyline

    pts = [(1, 5, 5), (2, 1, 9), (3, None, 4), (4, 6, 4)]
    df = spark.createDataFrame(pts, "id long, x long, y long").repartition(2)
    got = {r.id for r in skyline(df, minimize=["x"], maximize=["y"]).collect()}
    assert got == {2, 3}  # 2 dominates 1 and 4; NULL row 3 is incomparable
