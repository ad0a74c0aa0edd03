"""Structured Streaming surface (SURVEY.md §2 B.9).

The semantic seed is the reference's incremental-collection loop (A31,
DataExtract/extract_data.py:221-243): micro-batch collection + keyed dedup +
monotone high-watermark + idle-timeout stop. Here that becomes:
readStream → withWatermark → windowed/sessionized aggregation or
dropDuplicates → writeStream, plus applyInPandasWithState for the custom
progress-detection operator.
"""

from e2e_etl_pipeline_spark.streaming.windows import (  # noqa: F401
    session_agg,
    sliding_agg,
    tumbling_agg,
)
