"""Registry construction contract: one pass that constructs every
registered query and checks two gates on the result.

1. Laziness — calling a registered query callable builds a DataFrame plan;
   it must not run Spark jobs (round-7 verdict task: a driver that
   constructs all 290+ queries to enumerate schemas should pay py4j cost
   only, not cluster time). Exceptions are documented per mechanism in
   EAGER_ALLOWED. A key OUTSIDE the allowlist triggering a job hard-fails
   (regression); an allowlisted key that stops triggering jobs only WARNS
   (round-8 advice: a Spark/AQE upgrade that makes localCheckpoint lazy
   would flip the whole rank family at once — an environment improvement,
   not a defect).

2. Driver-edge output types — no key may ship a DECIMAL output column
   (round 9: DuckDB's pandas bridge ships DECIMAL as float64 "950.0",
   Spark's as Decimal "950.00" — identical values, exact-hash mismatch;
   this alone was the r6-r8 q_offers_pipeline red). The two round-9
   diagnostic probes that shipped DECIMAL on purpose were retired in
   round 10 once the driver confirmed the class, so DECIMAL_EDGE_ALLOWED
   is now empty: every key must cast to DOUBLE in both dialects at the
   final SELECT.
"""

from __future__ import annotations

import warnings

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
    "q_zipf_slope",
    # stream
    "q_stream_restart",
}

# Keys sanctioned to ship DECIMAL output columns. Empty since round 10:
# the round-9 diagnostic probes that deliberately shipped DECIMAL (to make
# the driver exhibit the decimal-transport hash split) were retired after
# CORRECTNESS_r09 confirmed the class; the local comparator
# (testing.values_match) now also treats a Decimal-vs-float pairing as a
# mismatch, driver-faithfully.
DECIMAL_EDGE_ALLOWED: set[str] = set()


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
    decimal_edge: dict[str, list[str]] = {}
    for key, fn in QUERIES.items():
        sc.setJobGroup(f"construct-{key}", key)
        try:
            df = fn(spark, sf_dir)
        finally:
            sc.setJobGroup("construct-idle", "idle")
        # simpleString substring, not a top-level isinstance: a decimal
        # NESTED in a struct/array/map output column transports through
        # the same diverging pandas bridges (review find, round 9).
        decs = [
            f.name
            for f in df.schema.fields
            if "decimal(" in f.dataType.simpleString()
        ]
        if decs:
            decimal_edge[key] = decs
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
    if stale:
        # Warning, not failure: construction going lazier than documented
        # is the GOOD direction (round-8 advice) — tidy the allowlist at
        # the next touch rather than hard-failing an environment upgrade.
        warnings.warn(
            f"EAGER_ALLOWED entries no longer eager — shrink the allowlist "
            f"at the next edit: {stale}",
            stacklevel=1,
        )

    # Gate 2: driver-edge output types (module docstring).
    bad_decimal = sorted(set(decimal_edge) - DECIMAL_EDGE_ALLOWED)
    assert not bad_decimal, (
        "queries shipping DECIMAL output columns at the driver edge — cast "
        "to DOUBLE in both dialects (registry.py rules, round-9 root "
        f"cause): { {k: decimal_edge[k] for k in bad_decimal} }"
    )
    stale_decimal = sorted(DECIMAL_EDGE_ALLOWED - set(decimal_edge))
    assert not stale_decimal, (
        f"DECIMAL_EDGE_ALLOWED entries no longer ship decimal — the "
        f"diagnostic probes changed shape: {stale_decimal}"
    )
