"""Bounded-memory frequency sketches (Misra-Gries heavy hitters).

The 100 TB problem: "which tokens exceed x% of the corpus" via an exact
(token, count) aggregate shuffles the full vocabulary — fine for words,
ruinous for n-grams/URLs whose distinct count rivals the corpus size. The
Misra-Gries summary keeps a FIXED k counters per partition (undercount at
most n_p/(k+1)), and the union of per-partition summaries is guaranteed to
contain every item with global frequency > n/k (pigeonhole: an item below
the per-partition threshold everywhere is below it globally). So the plan
is:

  1. mapInPandas: stream each partition through a k-counter MG summary,
     emitting <= k (item, weight) rows per partition — constant memory,
     one pass, no shuffle.
  2. The candidate set (<= k x partitions rows, tiny at any scale) is
     exact-counted with ONE broadcast semi join back over the data; false
     positives fall out, and the guarantee means there are no false
     negatives. The result is EXACT, which is what makes it
     oracle-checkable (queries/corpus.py::q_heavy_hitters) even though a
     sketch did the pruning.

Generalizes the reference's max/count reporting (DataTransform/
transform_data.py:214-226) to cardinalities where exact grouping stops
fitting; no counterpart exists in the reference itself.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def misra_gries_candidates(items: DataFrame, col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries summaries of ``items[col]``.

    Returns a DataFrame (item string, weight long) with <= k rows per input
    partition; ``weight`` is the residual MG counter (a lower bound on the
    partition-local count, undercounting by at most n_p/(k+1)). Summaries
    from all partitions are emitted unioned — callers group/semi-join to
    form the candidate set. Deterministic for a fixed partitioning; callers
    MUST NOT treat the raw weights as exact counts.
    """

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        for pdf in batches:
            for item in pdf[col]:
                if item is None:
                    continue
                if item in counters:
                    counters[item] += 1
                elif len(counters) < k:
                    counters[item] = 1
                else:
                    # decrement-all step; drop zeroed counters
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        if counters:
            yield pd.DataFrame(
                {"item": list(counters.keys()), "weight": list(counters.values())}
            )

    return items.select(F.col(col).cast("string").alias(col)).mapInPandas(
        summarize, schema="item string, weight long"
    )
