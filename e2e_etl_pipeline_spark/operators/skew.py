"""Skew-mitigation operators.

AQE's skew-join splitting handles most skew automatically
(session.py enables it). For aggregation, note the honest scoping: with
algebraic aggregates (sum/count/min/max) Spark's map-side partial
aggregation already bounds what any reducer receives (≤ one partial row
per key per map task), so salting buys little there — it exists for the
cases partials DON'T compress: per-key state that grows with rows
(collect_list/set, exact distinct sets, percentile buffers) or any
pipeline stage where partial aggregation is unavailable. The helper
demonstrates the two-stage shape on algebraic sums because those are
oracle-checkable; swap the partial for the state-heavy aggregate to get
the real benefit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    sums: dict[str, Column],
    n_salts: int = 16,
) -> DataFrame:
    """groupBy(key).agg(sum…) computed skew-safely via an N-way salt.

    ``sums`` maps output alias → column expression to sum. Adds a uniform
    salt derived from a hash of the full row's natural distribution
    (spark_partition_id is enough: it's uncorrelated with the grouping key),
    aggregates on (key, salt), then reduces the ≤N partial rows per key.
    """
    salted = df.withColumn("_salt", F.spark_partition_id() % n_salts)
    partial = salted.groupBy(*key_cols, "_salt").agg(
        *[F.sum(expr).alias(f"_p_{alias}") for alias, expr in sums.items()],
        F.count(F.lit(1)).alias("_p_cnt"),
    )
    return partial.groupBy(*key_cols).agg(
        *[F.sum(f"_p_{alias}").alias(alias) for alias in sums],
        F.sum("_p_cnt").alias("n_rows"),
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
) -> DataFrame:
    """Skew-safe equi-join: the big side's hot keys are split across
    ``n_salts`` sub-partitions and the small side is replicated once per
    salt, so no single reducer receives a whole hot key's rows.

    For genuinely small dims, broadcast is strictly better (no shuffle at
    all); salting is for the middle regime — a dim too large to broadcast
    joined to a fact whose key histogram is dominated by a few values,
    where a plain shuffle join sends every hot-key row to one task. AQE's
    skewJoin handles sort-merge skew automatically when statistics see it;
    explicit salting is deterministic and works for any join the optimizer
    can't split. Cost: small side × n_salts replication — choose n_salts
    around the hot-key concentration factor, not larger.

    The salt on the big side comes from spark_partition_id() — uniform,
    deterministic within a scan, and uncorrelated with the key — so the
    result set is byte-identical to the unsalted join.
    """
    big_s = big.withColumn("_salt", F.spark_partition_id() % n_salts)
    small_r = small.select(
        "*",
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("_salt"),
    )
    return big_s.join(small_r, [key, "_salt"]).drop("_salt")
