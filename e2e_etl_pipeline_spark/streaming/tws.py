"""Arbitrary-state streaming via Spark 4's transformWithStateInPandas.

The second-generation stateful API (SPIP: state data source, TTL, timers,
composite state) alongside the applyInPandasWithState operator in
stateful.py — the engine demonstrates both so a user can migrate. The
operator here maintains per-key extrema/count state, all order-insensitive
accumulators (count/max/min), so the emitted result over a static snapshot
is bit-stable regardless of partitioning or row order — which is what lets
the registered key (q_stream_tws) carry a full DuckDB oracle rather than a
rows-only check.

Scale: state is three scalars per key in the state store (RocksDB on a real
cluster), partitioned by grouping key; each micro-batch shuffles only the
(key, value) projection. TTL (ttlDurationMs) is the unbounded-keyspace
eviction story, asserted separately in tests/test_streaming.py for the
applyInPandasWithState twin.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("max_value", T.DoubleType()),
        T.StructField("min_value", T.DoubleType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("max_value", T.DoubleType()),
        T.StructField("min_value", T.DoubleType()),
    ]
)


class ExtremaProcessor(StatefulProcessor):
    """Per-key running count/max/min — order-insensitive accumulators."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("extrema", STATE_SCHEMA)

    def handleInputRows(
        self, key: tuple[Any, ...], rows: Iterator[pd.DataFrame], timerValues: Any
    ) -> Iterator[pd.DataFrame]:
        prev = self._state.get() if self._state.exists() else None
        n, mx, mn = prev if prev is not None else (0, None, None)
        for pdf in rows:
            if len(pdf):
                # n_events counts ARRIVALS (every row, NULL value or not);
                # the extrema skip NULLs explicitly — an all-NULL chunk
                # would otherwise seed mx/mn with NaN, and Python's
                # max(nan, x) returns nan forever (ninth review pass).
                n += len(pdf)
                vals = pdf["value"].dropna()
                if len(vals):
                    bmx = float(vals.max())
                    bmn = float(vals.min())
                    mx = bmx if mx is None else max(mx, bmx)
                    mn = bmn if mn is None else min(mn, bmn)
        self._state.update((n, mx, mn))
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "n_events": [n],
                "max_value": [mx],
                "min_value": [mn],
            }
        )

    def close(self) -> None:
        pass


def extrema_tracker(stream: DataFrame) -> DataFrame:
    """Input schema: (key string, value double). Emits the updated per-key
    state each micro-batch (update mode)."""
    return stream.groupBy("key").transformWithStateInPandas(
        statefulProcessor=ExtremaProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
