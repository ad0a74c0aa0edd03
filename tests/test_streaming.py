"""Streaming behavioral tests (SURVEY.md §5.2 item 5): watermark late-data
dropping across micro-batches, streaming dedup, and the stateful
progress-tracker operator that mirrors the reference's stale-scroll loop
(A31, DataExtract/extract_data.py:221-243).
"""

from __future__ import annotations

import os
import shutil
import tempfile
import time
import uuid

import pytest
from pyspark.sql import functions as F

from e2e_etl_pipeline_spark.streaming.stateful import progress_tracker
from e2e_etl_pipeline_spark.streaming.windows import session_agg, tumbling_agg


def _write_batch(spark, path: str, rows, schema: str) -> None:
    from datetime import datetime

    rows = [
        tuple(
            datetime.fromisoformat(v) if isinstance(v, str) and v[:2] == "20" else v
            for v in row
        )
        for row in rows
    ]
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(path)


def _run_available(stream_df, sink: str, mode: str):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(sink)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def test_watermark_drops_late_rows(spark):
    """Append-mode tumbling agg with a 10-minute watermark: a row arriving in
    a later batch, older than (max_ts - watermark), must NOT create output."""
    src = tempfile.mkdtemp(prefix="e2e_stream_src_")
    chk = tempfile.mkdtemp(prefix="e2e_stream_chk_")
    schema = "ts timestamp, user_id long, value double"
    collected: list = []

    def sink(batch_df, _batch_id):
        collected.extend(batch_df.collect())

    def run_once(agg):
        # foreachBatch is the restartable sink (memory sink cannot recover
        # from a checkpoint across starts)
        q = (
            agg.writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", chk)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    try:
        _write_batch(
            spark,
            src,
            [("2024-01-01 10:05:00", 1, 1.0), ("2024-01-01 12:00:00", 1, 1.0)],
            schema,
        )
        stream = spark.readStream.schema(schema).parquet(src)
        agg = (
            stream.withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "1 hour"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("window.start").alias("ws"), "n")
        )
        run_once(agg)
        # Batch 2: one in-time row (13:00) + one very late row (10:10, far
        # behind the 12:00 max) — the late row's hour-10 window is already
        # closed and emitted; it must be dropped, not re-emitted.
        _write_batch(
            spark,
            src,
            [("2024-01-01 13:00:00", 1, 1.0), ("2024-01-01 10:10:00", 1, 1.0)],
            schema,
        )
        run_once(agg)
        emitted = {(str(r.ws), r.n) for r in collected}
        # hour-10 window emitted exactly once with ONE row (the late arrival
        # never incremented it)
        assert ("2024-01-01 10:00:00", 1) in emitted
        assert ("2024-01-01 10:00:00", 2) not in emitted
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(chk, ignore_errors=True)


def test_streaming_dedup_within_watermark(spark):
    """withWatermark + dropDuplicates on event_id: the duplicate in a later
    micro-batch is suppressed."""
    src = tempfile.mkdtemp(prefix="e2e_dedup_src_")
    chk = tempfile.mkdtemp(prefix="e2e_dedup_chk_")
    sink = f"dd_test_{uuid.uuid4().hex[:8]}"
    schema = "ts timestamp, event_id long"
    try:
        _write_batch(spark, src, [("2024-01-01 10:00:00", 100)], schema)
        _write_batch(spark, src, [("2024-01-01 10:01:00", 100), ("2024-01-01 10:02:00", 101)], schema)
        stream = spark.readStream.schema(schema).parquet(src)
        deduped = stream.withWatermark("ts", "1 hour").dropDuplicates(["event_id"])
        q = (
            deduped.writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .option("checkpointLocation", chk)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        ids = sorted(r.event_id for r in spark.table(sink).collect())
        assert ids == [100, 101]
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(chk, ignore_errors=True)


def test_progress_tracker_stale_detection(spark):
    """A31 semantics: max-index watermark advances → stale counter resets;
    no progress for MAX_STALE_ROUNDS batches → is_stale flips."""
    src = tempfile.mkdtemp(prefix="e2e_state_src_")
    chk = tempfile.mkdtemp(prefix="e2e_state_chk_")
    schema = "key string, idx long"
    collected: list = []

    def sink(batch_df, _batch_id):
        collected.extend(batch_df.collect())

    try:
        batches = [
            [("jjit", 5)],          # progress → max 5, stale 0
            [("jjit", 3)],          # no progress → stale 1
            [("jjit", 9)],          # progress → max 9, stale 0
        ]
        stream = spark.readStream.schema(schema).parquet(src)
        tracked = progress_tracker(stream)
        for batch in batches:
            _write_batch(spark, src, batch, schema)
            q = (
                tracked.writeStream.foreachBatch(sink)
                .outputMode("update")
                .option("checkpointLocation", chk)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        rows = [(r.max_idx, r.stale_rounds, r.is_stale) for r in collected]
        assert (5, 0, False) in rows
        assert (5, 1, False) in rows
        assert (9, 0, False) in rows
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(chk, ignore_errors=True)


def test_sliding_window_streaming_matches_batch(spark):
    """sliding_agg under readStream (complete mode) must equal the same
    builder over the same data in batch mode — the batch-equivalence claim
    the oracle checks rest on (streaming_q.py docstring)."""
    from datetime import datetime

    from e2e_etl_pipeline_spark.streaming.windows import sliding_agg

    src = tempfile.mkdtemp(prefix="e2e_slide_src_")
    sink = f"sl_{uuid.uuid4().hex[:8]}"
    schema = "ts timestamp, value double"
    rows = [
        ("2024-01-01 10:05:00", 1.0),
        ("2024-01-01 10:20:00", 2.0),
        ("2024-01-01 11:40:00", 4.0),
    ]
    try:
        _write_batch(spark, src, rows, schema)
        batch_df = spark.createDataFrame(
            [(datetime.fromisoformat(t), v) for t, v in rows], schema
        )
        expected = {
            (str(r.window_start), r.n_events, r.sum_value)
            for r in sliding_agg(batch_df, "1 hour", "15 minutes").collect()
        }
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            sliding_agg(stream.withWatermark("ts", "1 hour"), "1 hour", "15 minutes")
            .writeStream.format("memory")
            .queryName(sink)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = {
            (str(r.window_start), r.n_events, r.sum_value)
            for r in spark.table(sink).collect()
        }
        assert got == expected
        assert len(got) == 9  # 5 overlapping windows for the 10:05/10:20 pair + 4 for 11:40
    finally:
        shutil.rmtree(src, ignore_errors=True)


def test_session_window_streaming_matches_batch(spark):
    """session_agg under readStream (complete mode) equals batch."""
    from datetime import datetime

    src = tempfile.mkdtemp(prefix="e2e_sess_src_")
    sink = f"se_{uuid.uuid4().hex[:8]}"
    schema = "ts timestamp, user_id long"
    rows = [
        ("2024-01-01 10:00:00", 1),
        ("2024-01-01 10:10:00", 1),
        ("2024-01-01 11:30:00", 1),
        ("2024-01-01 10:00:00", 2),
    ]
    try:
        _write_batch(spark, src, rows, schema)
        batch_df = spark.createDataFrame(
            [(datetime.fromisoformat(t), u) for t, u in rows], schema
        )
        expected = {
            (r.user_id, str(r.session_start), r.n_events)
            for r in session_agg(batch_df, "30 minutes").collect()
        }
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            session_agg(stream.withWatermark("ts", "1 hour"), "30 minutes")
            .writeStream.format("memory")
            .queryName(sink)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = {
            (r.user_id, str(r.session_start), r.n_events)
            for r in spark.table(sink).collect()
        }
        assert got == expected
    finally:
        shutil.rmtree(src, ignore_errors=True)


def test_session_window_batch_semantics(spark):
    """session_agg: 30-minute gap splits sessions (batch mode, same builder
    the streaming path uses)."""
    from datetime import datetime

    rows = [
        (datetime.fromisoformat("2024-01-01 10:00:00"), 1),
        (datetime.fromisoformat("2024-01-01 10:10:00"), 1),  # same session
        (datetime.fromisoformat("2024-01-01 11:30:00"), 1),  # > 30 min gap → new
        (datetime.fromisoformat("2024-01-01 10:00:00"), 2),
    ]
    df = spark.createDataFrame(rows, "ts timestamp, user_id long")
    out = session_agg(df, "30 minutes")
    got = {(r.user_id, str(r.session_start), r.n_events) for r in out.collect()}
    assert got == {
        (1, "2024-01-01 10:00:00", 2),
        (1, "2024-01-01 11:30:00", 1),
        (2, "2024-01-01 10:00:00", 1),
    }


def test_foreach_batch_incremental_merge(spark):
    """Streaming upsert: CDC batches applied via foreachBatch keep the
    target table at latest-value-per-key across micro-batches (the
    MERGE INTO pattern; streaming/merge.py)."""
    from e2e_etl_pipeline_spark.streaming.merge import merge_into_parquet_target

    src = tempfile.mkdtemp(prefix="e2e_merge_src_")
    chk = tempfile.mkdtemp(prefix="e2e_merge_chk_")
    tgt = tempfile.mkdtemp(prefix="e2e_merge_tgt_") + "/table"
    schema = "ts timestamp, k long, v string"
    try:
        stream = spark.readStream.schema(schema).parquet(src)
        def run_once():
            q = (
                stream.writeStream.foreachBatch(
                    lambda df, _id: merge_into_parquet_target(df, tgt, "k", "ts")
                )
                .option("checkpointLocation", chk)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

        _write_batch(
            spark,
            src,
            [("2024-01-01 10:00:00", 1, "a"), ("2024-01-01 10:01:00", 2, "b")],
            schema,
        )
        run_once()
        # Batch 2 updates key 2 (twice — latest must win) and inserts key 3.
        _write_batch(
            spark,
            src,
            [
                ("2024-01-01 11:00:00", 2, "stale"),
                ("2024-01-01 11:05:00", 2, "B"),
                ("2024-01-01 11:02:00", 3, "c"),
            ],
            schema,
        )
        run_once()
        got = {(r.k, r.v) for r in spark.read.parquet(tgt).collect()}
        assert got == {(1, "a"), (2, "B"), (3, "c")}
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(chk, ignore_errors=True)
        shutil.rmtree(os.path.dirname(tgt), ignore_errors=True)


def _protobuf_available() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    not _protobuf_available(),
    reason="transformWithState's state server needs google.protobuf in the "
    "Python workers; absent in this container (see streaming/tws.py)",
)
def test_transform_with_state_extrema(spark, sf_dir):
    from e2e_etl_pipeline_spark.queries.streaming_q import q_stream_tws

    out = {r["key"]: r for r in q_stream_tws(spark, sf_dir).collect()}
    assert out, "no per-key state emitted"
    for r in out.values():
        assert r["n_events"] > 0
        assert r["min_value"] <= r["max_value"]
