"""Vector/ML primitives over the embeddings table: class centroids
(mean-pooling) and one exact k-means Lloyd iteration.

These generalize the B.8 similarity seeds into the two aggregate shapes a
vector pipeline needs beyond search: supervised class prototypes (centroid
tables feed nearest-class-mean classifiers and drift monitors) and the
assign-then-recompute step every clustering/IVF-training loop runs. The
reference has no vector surface; both keys are fully oracle-checked
(DuckDB list lambdas ≡ Spark higher-order functions, the parity
q_similarity_topk established).

Scale: centroids/means shuffle (key, dim, value) triples after per-row
posexplode — k·d cells per partition post-combine, never raw vectors; the
Lloyd assignment broadcasts the k seed centroids against the corpus scan
(k ≪ |corpus|), exactly how IVF coarse quantizers are trained
(operators/similarity.ivf_topk consumes such centroids).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from e2e_etl_pipeline_spark.catalog import load_table
from e2e_etl_pipeline_spark.registry import register

K_SEEDS = 8
DIM = 64


@register(
    "q_embedding_centroids",
    oracle="""
    SELECT label,
           CAST(dim AS BIGINT)                  AS dim,
           round(avg(CAST(v AS DOUBLE)), 6)     AS centroid
    FROM (
      SELECT label,
             generate_subscripts(embedding, 1) AS dim,
             unnest(embedding)                 AS v
      FROM embeddings
    )
    GROUP BY label, dim
    """,
)
def q_embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label mean embedding (class prototypes): mean-pool every
    dimension within a label. posexplode is 0-based, DuckDB subscripts
    1-based — aligned with pos+1."""
    em = load_table(spark, sf_dir, "embeddings")
    cells = em.select("label", F.posexplode("embedding").alias("pos", "v"))
    return cells.groupBy(
        "label", (F.col("pos") + 1).cast("bigint").alias("dim")
    ).agg(F.round(F.avg(F.col("v").cast("double")), 6).alias("centroid"))


@register(
    "q_kmeans_step",
    oracle=f"""
    WITH seeds AS (
      SELECT vec_id AS cid, embedding AS cv
      FROM embeddings WHERE vec_id < {K_SEEDS}
    ),
    dists AS (
      SELECT e.vec_id, s.cid,
             list_sum(list_transform(range(1, {DIM + 1}),
               i -> (CAST(e.embedding[i] AS DOUBLE) - CAST(s.cv[i] AS DOUBLE))
                  * (CAST(e.embedding[i] AS DOUBLE) - CAST(s.cv[i] AS DOUBLE))))
               AS sq
      FROM embeddings e CROSS JOIN seeds s
    ),
    assigned AS (
      SELECT vec_id, cid
      FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                                         ORDER BY sq, cid) AS rn
            FROM dists)
      WHERE rn = 1
    ),
    members AS (SELECT cid, count(*) AS n_members FROM assigned GROUP BY cid),
    cells AS (
      SELECT a.cid,
             generate_subscripts(e.embedding, 1) AS dim,
             unnest(e.embedding)                 AS v
      FROM assigned a JOIN embeddings e USING (vec_id)
    )
    SELECT c.cid                                AS cluster_id,
           CAST(c.dim AS BIGINT)                AS dim,
           round(avg(CAST(c.v AS DOUBLE)), 6)   AS centroid,
           any_value(m.n_members)               AS n_members
    FROM cells c JOIN members m USING (cid)
    GROUP BY c.cid, c.dim
    """,
)
def q_kmeans_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One exact Lloyd iteration with the first K_SEEDS vectors as seed
    centroids: assign every vector to its nearest centroid (squared L2,
    centroid-id tiebreak), then recompute per-cluster means and sizes.

    Scale: the k×corpus distance evaluation broadcasts k centroid rows —
    no corpus shuffle for assignment; the mean-recompute shuffles k·d
    (cluster, dim, partial-sum) cells after map-side combine. Iterating
    this to convergence is the same loop with the output fed back as
    ``seeds`` (and a localCheckpoint per round, the q_pagerank pattern)."""
    em = load_table(spark, sf_dir, "embeddings")
    seeds = em.where(F.col("vec_id") < K_SEEDS).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )
    diff_sq = F.zip_with(
        F.col("embedding"),
        F.col("cv"),
        lambda x, y: (x.cast("double") - y.cast("double"))
        * (x.cast("double") - y.cast("double")),
    )
    dists = em.crossJoin(F.broadcast(seeds)).select(
        "vec_id",
        "cid",
        F.aggregate(diff_sq, F.lit(0.0), lambda acc, x: acc + x).alias("sq"),
    )
    w = Window.partitionBy("vec_id").orderBy("sq", "cid")
    assigned = (
        dists.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("vec_id", "cid")
    )
    members = assigned.groupBy("cid").agg(F.count(F.lit(1)).alias("n_members"))
    cells = assigned.join(em, "vec_id").select(
        "cid", F.posexplode("embedding").alias("pos", "v")
    )
    return (
        cells.groupBy(F.col("cid"), (F.col("pos") + 1).cast("bigint").alias("dim"))
        .agg(F.round(F.avg(F.col("v").cast("double")), 6).alias("centroid"))
        .join(F.broadcast(members), "cid")
        .select(
            F.col("cid").alias("cluster_id"), "dim", "centroid", "n_members"
        )
    )


@register(
    "q_regression_ols",
    oracle="""
    SELECT
      l_returnflag,
      count(*)                                            AS n,
      round(regr_slope(l_extendedprice, l_quantity), 4)   AS slope,
      round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
      round(regr_r2(l_extendedprice, l_quantity), 4)      AS r2
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_regression_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group ordinary-least-squares fit (price ~ quantity) from
    sufficient statistics: slope = covar_pop/var_pop, intercept from the
    means, r² = corr². The oracle uses DuckDB's native ``regr_*``
    aggregate family, which computes the identical closed forms.

    Scale story: OLS over any corpus size is ONE map-side-combinable
    aggregation — the five sufficient statistics (n, Σx, Σy, Σxy, Σx²)
    fold per-partition and merge associatively, exactly how Spark plans
    covar_pop/var_pop/corr — so a 100 TB regression is a single partial+
    final agg with a |groups|-row shuffle. No gradient loop, no driver
    math, no second pass. (The iterative counterpart for non-closed-form
    models is q_kmeans_step's broadcast-assign/partial-update shape.)
    """
    li = load_table(spark, sf_dir, "lineitem")
    x, y = F.col("l_quantity"), F.col("l_extendedprice")
    slope = F.covar_pop(y, x) / F.var_pop(x)
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(slope, 4).alias("slope"),
        F.round(F.avg(y) - slope * F.avg(x), 4).alias("intercept"),
        F.round(F.pow(F.corr(y, x), 2), 4).alias("r2"),
    )
