"""foreachBatch incremental merge: the streaming-upsert pattern.

A CDC-style stream is applied to a maintained target table one micro-batch
at a time. Each batch upserts on the key: new keys insert, existing keys
take the batch's latest value. With plain parquet (this sandbox) the target
is maintained by read→merge→rewrite with an atomic directory swap; at
production scale the same ``foreachBatch`` body issues a Delta/Iceberg
``MERGE INTO``, which rewrites only the touched files — the swap below is
the format-agnostic stand-in, not the 100 TB plan. The merge itself is the
same full-outer-join shape as the batch ``q_upsert`` key.

Within one micro-batch, rows sharing a key are reduced to the latest by a
deterministic tiebreak column before the join (CDC batches can carry
multiple updates for one key).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def latest_per_key(batch_df: DataFrame, key: str, order_col: str) -> DataFrame:
    """Reduce a micro-batch to one row per key: max(order_col) wins."""
    from pyspark.sql import Window

    w = Window.partitionBy(key).orderBy(F.col(order_col).desc())
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
    batch = latest_per_key(batch_df, key, order_col)
    if os.path.isdir(target_dir) and any(
        f.endswith(".parquet") for f in os.listdir(target_dir)
    ):
        target = spark.read.parquet(target_dir)
        b = batch.select([F.col(c).alias(f"_b_{c}") for c in batch.columns])
        joined = target.join(
            b, target[key] == b[f"_b_{key}"], "full_outer"
        )
        merged = joined.select(
            *[
                F.coalesce(F.col(f"_b_{c}"), F.col(c)).alias(c)
                for c in batch.columns
            ]
        )
    else:
        merged = batch
    # Rewriting the directory we just read is unsafe mid-job: materialize to
    # a sibling, then swap atomically.
    tmp = f"{target_dir}__new"
    merged.write.mode("overwrite").parquet(tmp)
    old = f"{target_dir}__old"
    if os.path.isdir(target_dir):
        os.rename(target_dir, old)
    os.rename(tmp, target_dir)
    shutil.rmtree(old, ignore_errors=True)
