"""Graph / iterative operators: PageRank over the event-transition graph.

The reference has no graph surface; this generalizes the same journey-mining
seed as q_event_transitions (per-user event sequences,
DataExtract/extract_data.py:199-246's scroll-ordered event harvesting) into
the canonical iterative-dataflow operator. It demonstrates the pattern every
iterative Spark algorithm follows — a loop of join + aggregate over a cached,
pre-partitioned edge relation — and, unusually for an iterative algorithm, it
is fully oracle-checked: DuckDB expresses the same power iteration as a
recursive CTE with aggregation in the recursive member.

Scale: the edge relation is computed once, repartitioned on its join key
(src) and cached; each of the K iterations then shuffles only the rank
vector (|nodes| rows), never the edges. On a billion-edge graph the same
plan holds — edges stay put, ranks move — plus periodic
``localCheckpoint()`` to truncate lineage (at 5 nodes × 10 iterations the
lineage is trivially small, so the call is documented rather than paid).
Dangling-mass semantics: nodes with no out-edges keep a zero-weight
self-loop so they stay in the spine; their rank mass is NOT redistributed
(per-edge formulation, identical in both dialects).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from e2e_etl_pipeline_spark.catalog import load_table
from e2e_etl_pipeline_spark.registry import register

DAMPING = 0.85
ITERATIONS = 10


# The ONE transition-sequence construction every graph key derives from:
# per-user (prev_type -> event_type) adjacency via lag over (ts, event_id).
# _SEQ_CTE is the oracle-side rendering; _transition_seq the Spark side.
# A semantic change (ordering, NULL policy) must happen HERE, not in one
# of the four consumers.
_SEQ_CTE = """seq AS (
      SELECT
        event_type,
        lag(event_type) OVER (PARTITION BY user_id
                              ORDER BY ts NULLS LAST, event_id)
          AS prev_type
      FROM events
    )"""


def _transition_seq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, prev_type) rows with prev_type non-NULL — one row per
    consecutive same-user event pair.

    NULLS LAST is pinned explicitly: Spark ASC defaults to NULLS FIRST
    while DuckDB windows default to NULLS LAST, so one NULL ts in a
    regenerated testdata would otherwise diverge every graph key's edge
    list (the round-3 windows.py/aggregates.py fix, applied here too)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.asc_nulls_last("ts"), F.asc_nulls_last("event_id")
    )
    return ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).where(F.col("prev_type").isNotNull())



@register(
    "q_pagerank",
    oracle=f"""
    WITH RECURSIVE
    {_SEQ_CTE},
    trans AS (
      SELECT prev_type AS src, event_type AS dst, count(*) AS n
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY prev_type, event_type
    ),
    nodes AS (SELECT DISTINCT event_type AS node FROM events),
    edges AS (
      SELECT src, dst,
             CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY src) AS p
      FROM trans
      UNION ALL
      SELECT node, node, 0.0 FROM nodes
    ),
    pr(iter, node, rank) AS (
      SELECT 0, node, 1.0 / (SELECT count(*) FROM nodes) FROM nodes
      UNION ALL
      SELECT pr.iter + 1, e.dst,
             {1.0 - DAMPING} / (SELECT count(*) FROM nodes)
               + {DAMPING} * sum(e.p * pr.rank)
      FROM pr JOIN edges e ON e.src = pr.node
      WHERE pr.iter < {ITERATIONS}
      GROUP BY pr.iter, e.dst
    )
    SELECT node, round(rank, 6) AS rank
    FROM pr WHERE iter = {ITERATIONS}
    """,
)
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (damping 0.85, 10 power iterations) over the directed
    event-type transition graph: edge src→dst weighted by row-normalized
    transition probability, teleport (1-d)/N, dangling mass dropped.

    The single driver-side action is ``nodes.count()`` on the |event_type|
    dimension — loop *setup*, not per-iteration work; the iteration itself
    is pure join+agg dataflow. Ranks round to 6dp at the end only."""
    ev = load_table(spark, sf_dir, "events")
    seq = _transition_seq(spark, sf_dir)
    trans = seq.groupBy(
        F.col("prev_type").alias("src"), F.col("event_type").alias("dst")
    ).agg(F.count(F.lit(1)).alias("n"))
    w_src = Window.partitionBy("src")
    nodes = ev.select(F.col("event_type").alias("node")).distinct()
    edges = (
        trans.select(
            "src",
            "dst",
            (F.col("n").cast("double") / F.sum("n").over(w_src)).alias("p"),
        )
        .unionByName(
            nodes.select(
                F.col("node").alias("src"),
                F.col("node").alias("dst"),
                F.lit(0.0).alias("p"),
            )
        )
        # Partition once on the per-iteration join key and pin the result:
        # the K iterations below reuse this layout, shuffling only ranks.
        .repartition("src")
        .cache()
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        # Empty graph: no nodes, no ranks — mirror the recursive oracle's
        # empty result instead of dividing the teleport mass by zero.
        edges.unpersist()
        return nodes.select(
            "node", F.lit(None).cast("double").alias("rank")
        )
    ranks = nodes.select("node", (F.lit(1.0) / F.lit(n_nodes)).alias("rank"))
    # The rank vector is |event_type| rows; 32-way shuffles would spend the
    # whole loop launching empty tasks. Scope the partition count to the
    # problem for the iteration phase, then restore (a real billion-node run
    # would size this to the cluster instead).
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        ranks = _iterate(edges, ranks, n_nodes)
        # Materialize the final iteration INSIDE the scope: the returned
        # frame is otherwise planned lazily at collect time, after the
        # finally has restored the session default — only the mid-loop
        # checkpoints (iters 3/6/9) would see the 4-partition setting.
        ranks = ranks.select(
            "node", F.round("rank", 6).alias("rank")
        ).localCheckpoint(eager=True)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    # The checkpoint above severed lineage, so the session-lifetime edge
    # cache can be released instead of pinning one InMemoryRelation per
    # driver-verified graph key.
    edges.unpersist()
    return ranks


def _iterate(edges: DataFrame, ranks: DataFrame, n_nodes: int) -> DataFrame:
    for i in range(ITERATIONS):
        # Broadcast the rank vector: |nodes| rows vs |edges| — the edge
        # relation never moves. (A billion-NODE graph would instead
        # shuffle-join ranks against the src-partitioned edge cache.)
        ranks = (
            edges.join(F.broadcast(ranks), edges.src == ranks.node)
            .groupBy(F.col("dst").alias("node"))
            .agg(
                (
                    F.lit((1.0 - DAMPING) / n_nodes)
                    + F.lit(DAMPING) * F.sum(F.col("p") * F.col("rank"))
                ).alias("rank")
            )
        )
        # Truncate lineage every few rounds: without this the logical plan
        # doubles per iteration and Catalyst re-analysis dominates runtime
        # long before the data does.
        if (i + 1) % 3 == 0:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


MAX_HOPS = 4


@register(
    "q_bfs_hops",
    oracle=f"""
    WITH RECURSIVE
    {_SEQ_CTE},
    edges AS (
      SELECT DISTINCT prev_type AS src, event_type AS dst
      FROM seq WHERE prev_type IS NOT NULL
    ),
    walk(node, hop) AS (
      SELECT (SELECT min(event_type) FROM events), 0
      UNION
      SELECT e.dst, w.hop + 1
      FROM walk w JOIN edges e ON e.src = w.node
      WHERE w.hop < {MAX_HOPS}
    )
    SELECT node, CAST(min(hop) AS BIGINT) AS hops
    FROM walk GROUP BY node
    """,
)
def q_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Level-synchronous BFS: minimum hop count from the lexicographically
    smallest event type to every reachable node of the transition graph,
    bounded at MAX_HOPS levels — shortest-path labeling, the second member
    of the iterative-dataflow family (q_pagerank's power iteration is the
    first). Oracle: recursive CTE whose UNION-dedup on (node, hop) pairs
    bounds the walk; min(hop) at the end is the BFS distance.

    Scale: per level one join of the (≤|nodes|-row) frontier against the
    cached src-partitioned edge relation plus a distinct — frontiers move,
    edges never do. The driver-side ``min()`` is loop setup (seed choice),
    not per-iteration work."""
    ev = load_table(spark, sf_dir, "events")
    seq = _transition_seq(spark, sf_dir)
    edges = (
        seq.select(
            F.col("prev_type").alias("src"), F.col("event_type").alias("dst")
        )
        .distinct()
        .repartition("src")
        .cache()
    )
    start = ev.agg(F.min("event_type")).collect()[0][0]
    level = spark.range(1).select(
        F.lit(start).alias("node"), F.lit(0).alias("hop")
    )
    walk = level
    for _ in range(MAX_HOPS):
        level = (
            edges.join(F.broadcast(level), edges.src == level.node)
            .select("dst", (F.col("hop") + 1).alias("hop"))
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("hop").alias("hop"))
        )
        walk = walk.unionByName(level)
    out = walk.groupBy("node").agg(
        F.min("hop").cast("bigint").alias("hops")
    ).localCheckpoint(eager=True)  # materialize, then release the cache
    edges.unpersist()
    return out


_BFS_RECURSIVE_SQL = f"""
    WITH RECURSIVE
    {_SEQ_CTE},
    edges AS (
      SELECT DISTINCT prev_type AS src, event_type AS dst
      FROM seq WHERE prev_type IS NOT NULL
    ),
    walk(node, hop) AS (
      SELECT (SELECT min(event_type) FROM events), 0
      UNION ALL
      SELECT e.dst, w.hop + 1
      FROM walk w JOIN edges e ON e.src = w.node
      WHERE w.hop < {MAX_HOPS}
    )
    SELECT node, CAST(min(hop) AS BIGINT) AS hops
    FROM walk GROUP BY node
"""


@register("q_bfs_recursive_sql", oracle=_BFS_RECURSIVE_SQL)
def q_bfs_recursive_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME BFS as q_bfs_hops, expressed natively through Spark 4's
    recursive CTE support — the IDENTICAL SQL text runs on both engines
    (Spark accepts only UNION ALL in the recursive member, which here
    enumerates hop-bounded walks; min(hop) per node collapses path
    multiplicity, so the answer matches the driver-loop variant exactly).

    Scale: UNION ALL recursion enumerates paths — exponential on dense
    cyclic graphs — so it is only safe under a strict depth bound like
    this one (Spark additionally guards with cteRecursionLevelLimit).
    The level-synchronous driver loop with per-level dedup (q_bfs_hops)
    is the unbounded-graph scale path; this key exists to pin the native
    recursive planner against it."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_BFS_RECURSIVE_SQL)


@register(
    "q_triangle_count",
    oracle=f"""
    WITH {_SEQ_CTE},
    und AS (
      SELECT DISTINCT least(prev_type, event_type)    AS a,
                      greatest(prev_type, event_type) AS b
      FROM seq
      WHERE prev_type IS NOT NULL AND prev_type <> event_type
    )
    SELECT (SELECT count(DISTINCT event_type) FROM events) AS n_nodes,
           (SELECT count(*) FROM und)                      AS n_edges,
           count(*)                                        AS n_triangles
    FROM und e1
    JOIN und e2 ON e2.a = e1.b
    JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
    """,
)
def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count of the undirected transition graph (a<b<c edge
    orientation, so each triangle counts exactly once) — the clustering
    primitive behind graph cohesion metrics.

    Scale: the canonical ordered-edge trick makes this two equi-joins on
    an edge list that is already deduped and oriented — never an
    all-pairs expansion; on a skewed real graph the standard refinement
    (orient edges from lower- to higher-degree endpoints) bounds each
    join's fan-out by sqrt(|E|)."""
    ev = load_table(spark, sf_dir, "events")
    seq = _transition_seq(spark, sf_dir).where(
        F.col("prev_type") != F.col("event_type")
    )
    und = (
        seq.select(
            F.least("prev_type", "event_type").alias("a"),
            F.greatest("prev_type", "event_type").alias("b"),
        )
        .distinct()
        .cache()
    )
    e1 = und.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = und.select(F.col("a").alias("y"), F.col("b").alias("z"))
    e3 = und.select(F.col("a").alias("x"), F.col("b").alias("z"))
    tri = e1.join(e2, "y").join(e3, ["x", "z"]).agg(
        F.count(F.lit(1)).alias("n_triangles")
    )
    nodes = ev.agg(F.countDistinct("event_type").alias("n_nodes"))
    edges = und.agg(F.count(F.lit(1)).alias("n_edges"))
    out = (
        nodes.crossJoin(F.broadcast(edges))
        .crossJoin(F.broadcast(tri))
        .select("n_nodes", "n_edges", "n_triangles")
        .localCheckpoint(eager=True)  # materialize, then release the cache
    )
    und.unpersist()
    return out
