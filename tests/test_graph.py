"""Behavioral invariants for the iterative graph operators (queries/graph.py).

Oracle parity for q_pagerank is covered by test_oracle_parity; these pin the
mathematical properties the oracle can't articulate: fixed points, mass
conservation, and teleport floors.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from e2e_etl_pipeline_spark.queries.graph import DAMPING, _iterate, q_pagerank


def test_symmetric_two_cycle_is_a_fixed_point(spark):
    # a<->b with probability 1 each way: the uniform vector is stationary
    # under the damped update (0.15/2 + 0.85*0.5 == 0.5), so 10 iterations
    # must return exactly the initial ranks up to float noise.
    edges = spark.createDataFrame(
        [("a", "b", 1.0), ("b", "a", 1.0)], ["src", "dst", "p"]
    )
    ranks = spark.createDataFrame([("a", 0.5), ("b", 0.5)], ["node", "rank"])
    out = {r["node"]: r["rank"] for r in _iterate(edges, ranks, 2).collect()}
    assert out["a"] == pytest.approx(0.5, abs=1e-12)
    assert out["b"] == pytest.approx(0.5, abs=1e-12)


def test_sink_chain_ranks_order_and_floor(spark):
    # a -> b -> c, plus the zero self-loop q_pagerank adds to EVERY node
    # (that loop is what keeps no-inflow nodes like `a` in the spine):
    # rank must be monotone along the chain, and every node keeps at least
    # the teleport floor.
    edges = spark.createDataFrame(
        [("a", "b", 1.0), ("b", "c", 1.0)]
        + [(n, n, 0.0) for n in ("a", "b", "c")],
        ["src", "dst", "p"],
    )
    third = 1.0 / 3.0
    ranks = spark.createDataFrame(
        [("a", third), ("b", third), ("c", third)], ["node", "rank"]
    )
    out = {r["node"]: r["rank"] for r in _iterate(edges, ranks, 3).collect()}
    floor = (1.0 - DAMPING) / 3
    assert set(out) == {"a", "b", "c"}
    assert out["a"] == pytest.approx(floor, abs=1e-12)  # no in-edges
    assert out["a"] < out["b"] < out["c"]
    assert all(v >= floor - 1e-12 for v in out.values())


def test_pagerank_mass_is_conserved(spark, sf_dir):
    # Every event type both emits and receives transitions in the testdata,
    # so no dangling mass leaks: ranks must sum to 1.
    total = q_pagerank(spark, sf_dir).agg(F.sum("rank")).collect()[0][0]
    assert total == pytest.approx(1.0, abs=1e-4)


def test_bfs_loop_and_recursive_sql_agree(spark, sf_dir):
    # The driver-loop BFS and the native recursive-CTE BFS are the same
    # algorithm in two execution styles; their results must be identical.
    from e2e_etl_pipeline_spark.queries.graph import q_bfs_hops, q_bfs_recursive_sql

    loop = {(r["node"], r["hops"]) for r in q_bfs_hops(spark, sf_dir).collect()}
    rec = {
        (r["node"], r["hops"])
        for r in q_bfs_recursive_sql(spark, sf_dir).collect()
    }
    assert loop == rec and loop
