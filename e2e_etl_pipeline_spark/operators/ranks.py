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
3. global rank = per-partition rank + the partition's cumulative row offset.
   The offsets are computed IN-PLAN (round-7 verdict: construction must be
   job-free): a P-row per-partition count aggregate, cross-joined with its
   own broadcast copy and re-grouped — sum(cnt WHERE other_pid < pid) is the
   exclusive prefix, sum(cnt) the total. P² ≈ 1k tiny rows; crucially NO
   global window and NO ungrouped aggregate, so the plan stays
   SinglePartition-free (the q_ntile_bins plan assertion);
4. the NTILE bucket is a closed-form expression of (rank, n, k): the first
   ``n % k`` buckets get ``ceil(n/k)`` rows, the rest ``floor(n/k)`` —
   identical to SQL NTILE over the same total order. ``n`` rides the
   offset table as a column, so the arithmetic is integer-exact in-plan.

The ranged frame is ``localCheckpoint(eager=False)``-ed because the
RangePartitioner re-samples boundaries per job: without freezing it, the
count pass and the rank pass could see different partitionings and the
offsets would label the wrong rows (see the verify skill's gotcha list).
Known construction cost (documented, allowlisted in
tests/test_construction_lazy.py): under AQE even a lazy checkpoint
materializes the upstream stages when the plan converts to an RDD, so
building a rank-family query runs the range exchange (~2 jobs) eagerly.
The boundary freeze is correctness-critical — swapping to persist() would
gate correctness on exchange-reuse behavior — so the jobs stay.

At 100 TB the cost is one range exchange + one parallel window + one P-row
metadata join per call — no stage ever holds more than a partition's share
of rows, and nothing round-trips the driver.
"""

from __future__ import annotations

from typing import Sequence, Union

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "__rank_pid"
_OFF = "__rank_off"
_N = "__rank_n"

OrderCol = Union[str, Column]


def _ranged_with_offsets(
    df: DataFrame, order_cols: Sequence[OrderCol], sum_cols: dict[str, OrderCol] | None = None
) -> tuple[DataFrame, DataFrame]:
    """Shared first half of the rank constructions: the frozen range
    exchange plus each partition's exclusive prefix totals, all lazy.

    Returns ``(ranged, off_df)`` — the lazily-checkpointed range-partitioned
    frame (with ``_PID`` attached) and a P-row broadcastable offset table
    carrying, per partition: ``_OFF`` (exclusive prefix row count), ``_N``
    (total row count), and for each ``sum_cols`` entry ``_off_<name>``
    (exclusive prefix of that column's per-partition sum).
    """
    spark = df.sparkSession
    n_part = max(int(spark.conf.get("spark.sql.shuffle.partitions", "32")), 1)
    ranged = (
        df.repartitionByRange(n_part, *order_cols)
        .withColumn(_PID, F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    names = list(sum_cols or {})
    counts = ranged.groupBy(_PID).agg(
        F.count(F.lit(1)).alias("__cnt"),
        *[F.sum((sum_cols or {})[k]).alias(f"__sum_{k}") for k in names],
    )
    other = counts.select(
        F.col(_PID).alias("__bpid"),
        F.col("__cnt").alias("__bcnt"),
        *[F.col(f"__sum_{k}").alias(f"__bsum_{k}") for k in names],
    )
    is_prev = F.col("__bpid") < F.col(_PID)
    # P×P broadcast nested-loop join over metadata-sized frames (P = shuffle
    # partitions): exclusive prefix + total in one keyed aggregate — no
    # collect, no ungrouped agg, no global window.
    off_df = (
        counts.crossJoin(F.broadcast(other))
        .groupBy(_PID)
        .agg(
            F.sum(F.when(is_prev, F.col("__bcnt")).otherwise(F.lit(0)))
            .cast("long")
            .alias(_OFF),
            F.sum("__bcnt").cast("long").alias(_N),
            *[
                F.sum(
                    F.when(is_prev, F.coalesce(F.col(f"__bsum_{k}"), F.lit(0)))
                    .otherwise(F.lit(0))
                ).alias(f"_off_{k}")
                for k in names
            ],
        )
    )
    return ranged, off_df


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
    ranged, off_df = _ranged_with_offsets(df, order_cols)
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
    ranged, off_df = _ranged_with_offsets(df, order_cols)
    n = F.col(_N)
    n_big = n % k
    # greatest(..., 1): when n == 0 there are no rows to evaluate the
    # expression on, and when n < k every row lands in the first branch
    # (cut == n) — but a 0 divisor would error under ANSI before that
    # reasoning applies, so both divisors are floored at 1. Integer `div`
    # keeps the bucket math exact (no FP grid).
    size_big = F.greatest(
        F.expr(f"CAST(({_N} + {k - 1}) div {k} AS BIGINT)"), F.lit(1)
    )
    size_small = F.greatest(
        F.expr(f"CAST({_N} div {k} AS BIGINT)"), F.lit(1)
    )
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
    exclusive prefix total (computed in-plan over the P-row metadata
    frame — no driver round-trip).

    ``order_cols`` MUST be a unique total order (see distributed_rank's
    null-pinning note). ``sum_cols`` maps output name → input column;
    inputs should be integral/decimal so partial sums merge exactly — a
    double weight would reintroduce the accumulation-order hazard this
    operator exists to avoid.

    Returns ``df``'s columns plus one running-total column per entry
    (inclusive of the current row).
    """
    ranged, off_df = _ranged_with_offsets(df, order_cols, sum_cols=sum_cols)
    names = list(sum_cols)
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


def bounded_rank(
    df: DataFrame, order_spec: Sequence[tuple[str, str]], out_col: str
) -> DataFrame:
    """Exact ``row_number() OVER (ORDER BY ...)`` for a frame whose row
    count is bounded by a CONSTANT (a post-``limit`` top-k, a fixed
    cutoff list) — rank = 1 + number of strict predecessors, computed by
    a broadcast theta self-join + keyed aggregate instead of a window.

    Why not a window: an unpartitioned Window funnels through ONE
    partition and WARNs; a literal partition key does not help (Catalyst
    constant-folds foldable partition expressions away — verified on
    Spark 4.1); and ``distributed_rank``'s range-exchange machinery
    checkpoints sampled boundaries, which truncates the visible plan and
    runs jobs at construction — overkill for a frame of ≤ a few thousand
    rows. The predecessor-count join is O(N²) in the CONSTANT bound
    (trivial for N ≤ ~10⁴), stays lazy, keeps upstream plan nodes
    (TakeOrderedAndProject) visible/assertable, and every a-side
    partition works independently against the broadcast copy — no
    single-partition stage anywhere. For unbounded frames use
    ``distributed_rank``.

    ``order_spec`` is a list of ``(column_name, "asc"|"desc")``; NULLS
    order LAST in BOTH directions (the registry's cross-engine pin —
    DuckDB's window default). The spec MUST be a unique total order:
    with ties, predecessor-count would give rank() (gaps, equal rows
    equal), not row_number(), and the final groupBy on every input
    column would silently collapse fully-duplicate rows. Both hazards
    are guarded AT EXECUTION TIME (round-10 advice): a 1-row broadcast
    probe counts tied order-key tuples and an ``assert_true`` folded
    into ``out_col`` raises on the first action if any exist —
    construction stays lazy, current unique-order callers pay one extra
    scalar aggregate over the constant-bounded frame.

    Returns ``df``'s columns plus ``out_col`` (long, 1-based).
    """
    b = df.select(
        F.lit(1).alias("__br_one"),
        *[F.col(c).alias(f"__br_{c}") for c, _ in order_spec],
    )
    eqs: list[Column] = []
    before: Column | None = None
    for c, direction in order_spec:
        a_c, b_c = F.col(c), F.col(f"__br_{c}")
        if direction == "asc":
            strict = (b_c < a_c) | (b_c.isNotNull() & a_c.isNull())
        elif direction == "desc":
            strict = (b_c > a_c) | (b_c.isNotNull() & a_c.isNull())
        else:  # pragma: no cover - caller bug
            raise ValueError(f"order_spec direction must be asc|desc: {direction}")
        term = strict
        for eq in eqs:
            term = eq & term
        before = term if before is None else (before | term)
        eqs.append(b_c.eqNullSafe(a_c))
    # Tie probe: ties on the full order-key tuple (which full-duplicate
    # rows necessarily are) break the row_number contract — detect them
    # with a scalar aggregate over the already-bounded frame and raise at
    # execution via assert_true (NULL when clean; coalesce keeps the rank
    # unchanged). struct() keeps NULL-bearing tuples countable —
    # count_distinct over bare columns would drop them.
    tie_probe = b.agg(
        (
            F.count(F.lit(1))
            - F.count_distinct(F.struct(*[F.col(f"__br_{c}") for c, _ in order_spec]))
        ).alias("__br_nties")
    )
    joined = df.join(F.broadcast(b), before, "left")
    ranked = joined.groupBy(*df.columns).agg(
        (F.count("__br_one") + F.lit(1)).cast("long").alias(out_col)
    )
    guard = F.assert_true(
        F.col("__br_nties") == 0,
        F.lit(
            "bounded_rank: order_spec is not a unique total order "
            "(tied order-key tuples detected) — add a unique id tiebreak"
        ),
    )
    return ranked.crossJoin(F.broadcast(tie_probe)).select(
        *[c for c in ranked.columns if c != out_col],
        (F.col(out_col) + F.coalesce(guard.cast("long"), F.lit(0))).alias(out_col),
    )
