"""foreachBatch incremental merge: the streaming-upsert pattern.

A CDC-style stream is applied to a maintained target table one micro-batch
at a time. Each batch upserts on the key: new keys insert, existing keys
take the batch's latest value. With plain parquet (this sandbox) the target
is maintained by read→merge→rewrite with an atomic directory swap; at
production scale the same ``foreachBatch`` body issues a Delta/Iceberg
``MERGE INTO``, which rewrites only the touched files — the swap below is
the format-agnostic stand-in, not the 100 TB plan. The merge itself is the
same full-outer-join shape as the batch ``q_upsert`` key.

Within one micro-batch, rows sharing a key are reduced to the latest under
a TOTAL order (order_col desc, remaining columns desc) before the merge
(CDC batches can carry multiple updates for one key, including
same-timestamp pairs). Matched keys take the batch row WHOLESALE — an
explicit NULL in an update lands as NULL.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def latest_per_key(batch_df: DataFrame, key: str, order_col: str) -> DataFrame:
    """Reduce a micro-batch to one row per key: max(order_col) wins; the
    remaining columns (desc) break order_col ties so the winner is a TOTAL
    order — same-timestamp double updates pick the same row on every run,
    partitioning, or restart."""
    from pyspark.sql import Window

    tiebreak = [
        F.col(c).desc() for c in batch_df.columns if c not in (key, order_col)
    ]
    w = Window.partitionBy(key).orderBy(F.col(order_col).desc(), *tiebreak)
    return (
        batch_df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def merge_into_parquet_target(
    batch_df: DataFrame, target_dir: str, key: str, order_col: str
) -> None:
    """Upsert one micro-batch into a parquet target directory.

    foreachBatch body: ``lambda df, _id: merge_into_parquet_target(df, ...)``.
    """
    spark = batch_df.sparkSession
    tmp, old = f"{target_dir}__new", f"{target_dir}__old"
    # Crash recovery: a previous run may have died between the two renames,
    # leaving the accumulated table stranded in __old with no live target —
    # restore it BEFORE deciding the "target absent" branch, or this batch
    # would silently reset the table to itself. Stale __new/__old leftovers
    # from a crash after a completed swap are garbage; clear them so the
    # renames below cannot hit ENOTEMPTY.
    if os.path.isdir(old) and not os.path.isdir(target_dir):
        os.rename(old, target_dir)
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(old, ignore_errors=True)

    batch = latest_per_key(batch_df, key, order_col)
    if os.path.isdir(target_dir) and any(
        f.endswith(".parquet") for f in os.listdir(target_dir)
    ):
        # Whole-ROW replacement (anti-join + union), not per-column
        # coalesce: an update carrying NULL in a column must SET it NULL,
        # and coalesce would silently keep the stale target value.
        target = spark.read.parquet(target_dir)
        keys = batch.select(key)
        merged = target.join(F.broadcast(keys), key, "left_anti").unionByName(
            batch
        )
    else:
        merged = batch
    # Rewriting the directory we just read is unsafe mid-job: materialize to
    # a sibling, then swap (two renames; the recovery preamble above covers
    # the crash window between them — at production scale this whole body is
    # a Delta/Iceberg MERGE whose commit is truly atomic).
    merged.write.mode("overwrite").parquet(tmp)
    if os.path.isdir(target_dir):
        os.rename(target_dir, old)
    os.rename(tmp, target_dir)
    shutil.rmtree(old, ignore_errors=True)
