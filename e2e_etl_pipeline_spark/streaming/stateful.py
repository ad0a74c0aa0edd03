"""Custom stateful streaming operator: per-key progress detection.

Re-expresses the reference's stale-progress termination loop (A31,
DataExtract/extract_data.py:221-243) as an applyInPandasWithState operator:
per key, track the max index seen (the high-watermark) and how many
consecutive batches made no progress; emit a row whenever state changes,
flagging keys that have gone stale.

This is the (c)-tier custom-operator path from the build contract — used
only because no built-in expresses "N consecutive batches without progress".
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType(
    [
        T.StructField("max_idx", T.LongType()),
        T.StructField("stale_rounds", T.IntegerType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("max_idx", T.LongType()),
        T.StructField("stale_rounds", T.IntegerType()),
        T.StructField("is_stale", T.BooleanType()),
    ]
)

MAX_STALE_ROUNDS = 5  # extract_data.py:205 — stop after 5 stale rounds


def _track_progress(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        max_idx, stale = state.get
    else:
        max_idx, stale = -1, 0  # the reference's max(..., default=-1) idiom

    batch_max = -1
    for pdf in pdfs:
        # dropna first: a chunk whose idx values are ALL NULL arrives as
        # an all-NaN float column, and int(NaN) raises — a NULL idx is
        # "no progress", not a crashed query (ninth review pass).
        idx = pdf["idx"].dropna()
        if len(idx):
            batch_max = max(batch_max, int(idx.max()))

    if batch_max > max_idx:
        max_idx, stale = batch_max, 0
    else:
        stale += 1

    state.update((max_idx, stale))
    yield pd.DataFrame(
        {
            "key": [key[0]],
            "max_idx": [max_idx],
            "stale_rounds": [stale],
            "is_stale": [stale >= MAX_STALE_ROUNDS],
        }
    )


def progress_tracker(stream: DataFrame) -> DataFrame:
    """Input schema: (key string, idx long). Output: OUTPUT_SCHEMA rows per
    key per micro-batch. Works in update output mode."""
    return stream.groupBy("key").applyInPandasWithState(
        _track_progress,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
