"""Query CONSTRUCTION must be lazy: calling a registered query callable
builds a DataFrame plan — it must not run Spark jobs (round-7 verdict
task: a driver that constructs all 290+ queries to enumerate schemas
should pay py4j cost only, not cluster time).

Exceptions are documented per mechanism in EAGER_ALLOWED below. The test
fails when a key OUTSIDE the allowlist triggers a job (a regression) and
when an allowlisted key stops triggering jobs (stale allowlist — shrink
it so the gate stays tight).
"""

from __future__ import annotations

import pytest

# Keys allowed to run jobs at construction, by mechanism:
#   io      — the query's contract IS a write + read-back round-trip
#             (sinks, staging, DDL, layout rewrites); the write is a job.
#   iter    — iterative algorithms with a per-round driver sync
#             (convergence check / merge pick): label propagation,
#             PageRank, BFS, BPE training.
#   rank    — the distributed-rank family freezes sampled range boundaries
#             with localCheckpoint (operators/ranks.py module docstring):
#             under AQE even a lazy checkpoint materializes the upstream
#             stages at RDD-conversion time (~2 jobs per ranged frame).
#   stream  — runs a bounded micro-batch (memory sink) at build time.
EAGER_ALLOWED = {
    # io
    "q_binary_file_source",
    "q_cache_reuse",
    "q_compact_files",
    "q_csv_malformed",
    "q_csv_roundtrip",
    "q_join_bloom",
    "q_join_bucketed",
    "q_join_dpp",
    "q_json_roundtrip",
    "q_layout_sorted_write",
    "q_layout_zorder",
    "q_metadata_columns",
    "q_observe_metrics",
    "q_orc_roundtrip",
    "q_partitioned_write",
    "q_schema_evolution",
    "q_shuffle_order",
    "q_sql_ddl",
    "q_targeted_delete",
    "q_text_source",
    "q_write_audit_publish",
    "q_xml_roundtrip",
    # iter
    "q_bfs_hops",
    "q_bpe_encode",
    "q_bpe_train",
    "q_dedup_cluster_cc",
    "q_dedup_corpus",
    "q_pagerank",
    "q_triangle_count",
    # rank
    "q_decile_lift",
    "q_ks_test",
    "q_mannwhitney",
    "q_ntile_bins",
    "q_rfm",
    "q_skyline",
    "q_spearman",
    "q_token_shards",
    # stream
    "q_stream_restart",
}


@pytest.mark.slow
def test_query_construction_runs_no_jobs(spark, sf_dir):
    from e2e_etl_pipeline_spark.catalog import TABLES, load_table
    from e2e_etl_pipeline_spark.registry import QUERIES, load_all

    load_all()
    sc = spark.sparkContext
    # Warm the per-path schema cache: the FIRST read of each table pays
    # one 1-task schema-inference job (catalog._dataset_schema); that is
    # a per-process constant, not a per-query cost.
    for t in TABLES:
        load_table(spark, sf_dir, t)

    tracker = sc.statusTracker()
    for key, fn in QUERIES.items():
        sc.setJobGroup(f"construct-{key}", key)
        try:
            fn(spark, sf_dir)
        finally:
            sc.setJobGroup("construct-idle", "idle")
    # The status tracker is fed by the async listener bus; drain it before
    # reading or just-submitted jobs can be invisible (flaky misses /
    # flaky stale-allowlist failures).
    sc._jsc.sc().listenerBus().waitUntilEmpty(30_000)
    eager: dict[str, int] = {}
    for key in QUERIES:
        jobs = tracker.getJobIdsForGroup(f"construct-{key}")
        if jobs:
            eager[key] = len(jobs)

    unexpected = sorted(set(eager) - EAGER_ALLOWED)
    assert not unexpected, (
        "queries now running Spark jobs at CONSTRUCTION time (regression — "
        f"make them lazy or document them in EAGER_ALLOWED): "
        f"{ {k: eager[k] for k in unexpected} }"
    )
    stale = sorted(EAGER_ALLOWED - set(eager))
    assert not stale, (
        f"allowlist entries no longer eager — remove them so the gate "
        f"stays tight: {stale}"
    )
