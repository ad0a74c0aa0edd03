"""Distributed-exact global rank / NTILE construction.

SQL ``NTILE(k) OVER (ORDER BY ...)`` plans an unpartitioned Window — every
row funnels through ONE partition, the classic single-node tail that stops
scaling the moment the ranked frame outgrows one executor. This module
factors the distributed-exact replacement proven by q_ntile_bins
(queries/prep.py, plan-asserted SinglePartition-free in tests/test_plans.py)
into a reusable operator:

1. ``repartitionByRange`` on the sort key — a sampled range exchange, so
   partition p holds a contiguous, disjoint key range;
2. ``row_number`` windowed PER PARTITION (parallel — no partition holds more
   than ~n/P rows);
3. global rank = per-partition rank + the partition's cumulative row offset,
   where the offsets come from one P-row count aggregation (P = shuffle
   partitions, collected to the driver — 32 longs, not data);
4. the NTILE bucket is a closed-form expression of (rank, n, k): the first
   ``n % k`` buckets get ``ceil(n/k)`` rows, the rest ``floor(n/k)`` —
   identical to SQL NTILE over the same total order.

The ranged frame is ``localCheckpoint``-ed because the RangePartitioner
re-samples boundaries per job: without freezing it, the count pass and the
rank pass could see different partitionings and the offsets would label the
wrong rows (see the verify skill's gotcha list).

At 100 TB the cost is one range exchange + one parallel window + one P-row
driver round-trip per call — no stage ever holds more than a partition's
share of rows.
"""

from __future__ import annotations

from typing import Sequence, Union

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from e2e_etl_pipeline_spark.catalog import inline_frame

_PID = "__rank_pid"
_OFF = "__rank_off"

OrderCol = Union[str, Column]


def _ranged_with_offsets(
    df: DataFrame, order_cols: Sequence[OrderCol]
) -> tuple[DataFrame, DataFrame, int]:
    """Shared first half of both rank constructions: the frozen range
    exchange plus each partition's cumulative row offset.

    Returns ``(ranged, off_df, n)`` — the checkpointed range-partitioned
    frame (with ``_PID`` attached), the P-row broadcastable offset table,
    and the total row count. The ``localCheckpoint`` freezes the SAMPLED
    range boundaries: RangePartitioner reseeds per job, so without it the
    count pass and the rank pass could see different partitionings and the
    offsets would label the wrong rows.
    """
    spark = df.sparkSession
    n_part = max(int(spark.conf.get("spark.sql.shuffle.partitions", "32")), 1)
    ranged = (
        df.repartitionByRange(n_part, *order_cols)
        .withColumn(_PID, F.spark_partition_id())
        .localCheckpoint()
    )
    part_counts = sorted(
        (r[_PID], r.cnt)
        for r in ranged.groupBy(_PID).agg(F.count(F.lit(1)).alias("cnt")).collect()
    )
    offsets, acc = [], 0
    for pid, cnt in part_counts:
        offsets.append({_PID: pid, _OFF: acc})
        acc += cnt
    # inline_frame, not createDataFrame: the offset table is scanned by
    # every downstream job, and a pickled-Python-RDD literal costs a
    # Python-worker round-trip per scan (~3.3 s warm, catalog.py) on this
    # operator's hot path — inline(array(struct(...))) stays JVM-side.
    off_df = inline_frame(
        spark, offsets or [{_PID: 0, _OFF: 0}], [_PID, _OFF]
    ).select(
        F.col(_PID).cast("int").alias(_PID),
        F.col(_OFF).cast("long").alias(_OFF),
    )
    return ranged, off_df, acc


def distributed_rank(
    df: DataFrame, order_cols: Sequence[OrderCol], out_col: str
) -> DataFrame:
    """Exact ``row_number() OVER (ORDER BY order_cols)`` without a
    single-partition sort. ``order_cols`` MUST be a unique total order
    (include a tiebreak key) or ranks are nondeterministic across engines,
    and should pin null ordering explicitly (``asc_nulls_last`` /
    ``desc_nulls_last``) whenever a key column is nullable: Spark's bare
    ASC is NULLS FIRST while DuckDB windows default to NULLS LAST, so an
    unpinned nullable key diverges the bucket assignment cross-engine.

    Returns ``df``'s columns plus ``out_col`` (long, 1-based).
    """
    ranged, off_df, _ = _ranged_with_offsets(df, order_cols)
    w = Window.partitionBy(_PID).orderBy(*order_cols)
    rank = (F.col(_OFF) + F.row_number().over(w)).alias(out_col)
    return ranged.join(F.broadcast(off_df), _PID).select(*df.columns, rank)


def distributed_ntile(
    df: DataFrame, k: int, order_cols: Sequence[OrderCol], out_col: str
) -> DataFrame:
    """Exact ``NTILE(k) OVER (ORDER BY order_cols)`` without a
    single-partition sort; see module docstring for the construction.
    ``order_cols`` MUST be a unique total order (include a tiebreak key)
    and should pin null ordering explicitly on nullable keys (see
    ``distributed_rank``).

    Returns ``df``'s columns plus ``out_col`` (int, 1..k). Calls are
    chainable — each re-ranges on its own key — so multi-score bucketing
    (e.g. RFM's three quintiles) needs no join-back.
    """
    ranged, off_df, n = _ranged_with_offsets(df, order_cols)

    n_big = n % k
    # max(..., 1): when n == 0 there are no rows to evaluate the expression
    # on, and when n < k every row lands in the first branch (cut == n) —
    # but a literal 0 divisor would error under ANSI before that reasoning
    # applies, so both divisors are floored at 1.
    size_big = max(-(-n // k), 1)  # ceil(n/k)
    size_small = max(n // k, 1)
    cut = n_big * size_big
    w = Window.partitionBy(_PID).orderBy(*order_cols)
    rank = F.col(_OFF) + F.row_number().over(w)
    bucket = (
        F.when(rank <= cut, F.floor((rank - 1) / size_big) + 1)
        .otherwise(F.floor((rank - 1 - cut) / size_small) + n_big + 1)
        .cast("int")
        .alias(out_col)
    )
    return ranged.join(F.broadcast(off_df), _PID).select(*df.columns, bucket)


def distributed_cumsum(
    df: DataFrame,
    order_cols: Sequence[OrderCol],
    sum_cols: dict[str, OrderCol],
) -> DataFrame:
    """Exact running sums over a global order without a single-partition
    window — the cumulative-sum sibling of ``distributed_rank``: frozen
    range exchange, per-partition window cumsum, plus each partition's
    exclusive prefix total (one P-row driver round-trip per call).

    ``order_cols`` MUST be a unique total order (see distributed_rank's
    null-pinning note). ``sum_cols`` maps output name → input column;
    inputs should be integral/decimal so partial sums merge exactly — a
    double weight would reintroduce the accumulation-order hazard this
    operator exists to avoid.

    Returns ``df``'s columns plus one running-total column per entry
    (inclusive of the current row).
    """
    spark = df.sparkSession
    n_part = max(int(spark.conf.get("spark.sql.shuffle.partitions", "32")), 1)
    ranged = (
        df.repartitionByRange(n_part, *order_cols)
        .withColumn(_PID, F.spark_partition_id())
        .localCheckpoint()
    )
    names = list(sum_cols)
    per_part = {
        r[_PID]: r
        for r in ranged.groupBy(_PID)
        .agg(*[F.sum(sum_cols[k]).alias(k) for k in names])
        .collect()
    }
    offsets, acc = [], {k: 0 for k in names}
    for pid in sorted(per_part):
        offsets.append({_PID: pid, **{f"_off_{k}": acc[k] for k in names}})
        for k in names:
            acc[k] += per_part[pid][k] or 0
    off_df = inline_frame(
        spark,
        offsets or [{_PID: 0, **{f"_off_{k}": 0 for k in names}}],
        [_PID, *[f"_off_{k}" for k in names]],
    )
    w = (
        Window.partitionBy(_PID)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cums = [
        (F.col(f"_off_{k}") + F.sum(sum_cols[k]).over(w)).alias(k)
        for k in names
    ]
    return ranged.join(F.broadcast(off_df), _PID).select(*df.columns, *cums)
