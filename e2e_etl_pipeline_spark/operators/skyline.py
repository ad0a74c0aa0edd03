"""Distributed skyline (Pareto frontier) computation.

A point is on the skyline iff no other point is at least as good on every
dimension and strictly better on one. The naive formulation is an O(n^2)
self-join — unusable at scale. The distributed identity that fixes it:

    skyline(S) = skyline( union of skyline(partition_i) )

(a point dominated anywhere is dominated by some point that survives its
own partition's local skyline, since dominance is transitive). So:

  1. mapInPandas: prune each partition to its local skyline — one pass,
     no shuffle, output size ~O(log^d n_p) for random data.
  2. The candidate union (small at any input scale) is pruned globally by
     a broadcast self anti-join whose dominance predicate is a pure
     column expression — JVM-side, no Python in the final pass.

All comparisons run on exact types (DECIMAL / integer), so two engines
agree bit-for-bit on the frontier — see queries/extras.py::q_skyline's
DuckDB NOT EXISTS oracle.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dominates(b: str, a: str, minimize: Sequence[str], maximize: Sequence[str]) -> Column:
    """Column predicate: row-set ``b`` dominates row-set ``a``."""
    at_least = [F.col(f"{b}.{c}") <= F.col(f"{a}.{c}") for c in minimize] + [
        F.col(f"{b}.{c}") >= F.col(f"{a}.{c}") for c in maximize
    ]
    strictly = [F.col(f"{b}.{c}") < F.col(f"{a}.{c}") for c in minimize] + [
        F.col(f"{b}.{c}") > F.col(f"{a}.{c}") for c in maximize
    ]
    cond = at_least[0]
    for c in at_least[1:]:
        cond = cond & c
    s = strictly[0]
    for c in strictly[1:]:
        s = s | c
    return cond & s


def skyline(df: DataFrame, minimize: Sequence[str], maximize: Sequence[str]) -> DataFrame:
    """Exact Pareto frontier of ``df`` over the given objective columns.

    Points with identical objective vectors do not dominate each other and
    are all retained. Output schema equals the input schema.
    """
    dims = list(minimize) + list(maximize)
    sign = {c: 1 for c in minimize} | {c: -1 for c in maximize}

    def local_prune(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        chunks = [c for c in batches if len(c)]
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True)
        # Rows with a NULL objective are incomparable: SQL NULL comparison
        # semantics (the oracle's NOT EXISTS and the global anti-join) keep
        # them and never let them dominate. Pass them through unpruned —
        # the arithmetic below would raise on None.
        null_mask = pdf[dims].isna().any(axis=1)
        null_rows = pdf[null_mask]
        pdf = pdf[~null_mask].reset_index(drop=True)
        if pdf.empty:
            if len(null_rows):
                yield null_rows
            return
        # orient every dimension as "smaller is better", sort by the first,
        # then single-pass prune with a running frontier list.
        work = pdf.assign(**{c: pdf[c] * sign[c] for c in dims})
        order = work.sort_values(dims, kind="mergesort").index
        frontier: list[tuple] = []
        keep: list[int] = []
        for idx in order:
            vec = tuple(work.loc[idx, c] for c in dims)
            dominated = any(
                all(f[i] <= vec[i] for i in range(len(dims)))
                and any(f[i] < vec[i] for i in range(len(dims)))
                for f in frontier
            )
            if not dominated:
                frontier.append(vec)
                keep.append(idx)
        out = pdf.loc[keep]
        yield pd.concat([out, null_rows], ignore_index=True) if len(null_rows) else out

    # Both sides of the anti-join consume the candidates; localCheckpoint
    # materializes the (tiny) frontier union once so the expensive upstream
    # scan/aggregate does not run twice — same pattern as q_ntile_bins.
    candidates = df.mapInPandas(local_prune, schema=df.schema).localCheckpoint()
    a, b = candidates.alias("a"), candidates.alias("b")
    return (
        a.join(
            F.broadcast(b),
            _dominates("b", "a", minimize, maximize),
            "left_anti",
        ).select("a.*")
    )
