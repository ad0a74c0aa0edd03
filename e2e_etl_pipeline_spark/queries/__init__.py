"""Query modules. Importing this package populates the registry.

Module map (SURVEY.md §2 Part B):
  relational   — B.1 scans, B.2 projection/filter, B.6 sort/limit/set-ops
  joins        — B.3 join surface
  aggregates   — B.4 aggregation surface
  windows      — B.5 window functions
  scalars      — B.7 scalar function families incl. the salary-parse composite
  llm          — B.8 dedup / similarity / text-analysis / multimodal
  streaming_q  — B.9 structured-streaming semantics (batch-equivalent oracles)
  pipeline_q   — A1-A8 pipeline parity (sources/sinks/partition pruning)
  udf_surface  — B.10 UDF / pandas-UDF / applyInPandas surface
  temporal     — beyond-plan temporal/incremental ops (as-of join, gap fill,
                 hypertable rollup, MERGE upsert, top-k join-agg, histogram)
  prep         — dataset prep/profiling (unpivot, SCD2, stratified hash
                 sample, column profile, int8 embedding quantization,
                 stream-stream join)
  corpus       — corpus statistics (vocabulary build, unigram-LM document
                 scoring, language-balanced sampling)
  graph        — iterative graph dataflow (PageRank, BFS — loop and
                 recursive-CTE styles, triangle count)
  ml           — vector-ML steps (k-means assignment/update, per-label
                 centroids, embedding stats)
  tpch         — TPC-H composite analytics suite adapted to the testdata
                 schema (Q3-Q22 shapes: selective multi-join reporting,
                 EXISTS/NOT EXISTS, ratio-of-sums, group-by-having)
"""

# Import order == registration order == the order the external driver
# verifies keys under its budget. Round 1's driver run covered exactly the
# first 50 registered keys (aggregates/extras/joins/llm); modules whose keys
# have NOT yet received a driver verdict therefore register first here
# (incl. the round-2 temporal/prep modules, ahead of round-1-green extras),
# and previously-verified modules last. Keep this ordering until every key
# has a driver-green round on record.
#
# Round-3 note: after the round-2 driver run lands, read CORRECTNESS_r02
# and rotate again — the late-round-2 keys appended past position 50
# (q_sessionize, q_layout_zorder, q_targeted_delete, q_text_normalize,
# q_dedup_incremental, and the temporal/prep/corpus/graph/ml/tpch waves)
# are the ones most likely still unverified.
from e2e_etl_pipeline_spark.queries import (  # noqa: F401
    relational,
    scalars,
    windows,
    streaming_q,
    udf_surface,
    pipeline_q,
    temporal,
    prep,
    corpus,
    graph,
    ml,
    tpch,
    extras,
    aggregates,
    joins,
    llm,
)
