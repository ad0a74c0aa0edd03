"""Benchmark runner (driver contract: prints ONE JSON line).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints
``{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}``.

Each query is executed with a count()-style materialization (no driver
collect of the full result) and timed wall-clock. A warmup pass of the
flagship query amortizes JVM/codegen startup out of the numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time


HEADLINE = [
    "q_agg_groupby",       # TPC-H Q1 shape — scan+agg throughput
    "q_join_star",         # 5-way join chain — join planning + shuffle
    "q_join_broadcast",    # broadcast dim join
    "q_window_topk_per_group",  # window + rank
    "q_agg_count_distinct",
    "q_topk",
    "q_dedup_exact",
    "q_text_wordcount",
    "q_vector_norm",
    "q_similarity_topk",
    "q_stream_tumbling",
    "q_salary_parse",
]


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from e2e_etl_pipeline_spark.registry import QUERIES, load_all
    from e2e_etl_pipeline_spark.session import get_session

    load_all()
    spark = get_session("bench")

    # Tolerate any SPARK_GRAFT_SF_DIR shape: an incidental "sf" substring
    # (e.g. /data/transfer/x) must degrade to sf=-1.0, not crash before
    # the one-JSON-line contract is met.
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = -1.0

    timings: dict[str, float] = {}
    for key in HEADLINE:
        fn = QUERIES.get(key)
        if fn is None:
            continue
        # Warm this query immediately before timing it: pays JVM startup and
        # whole-stage-codegen compilation (one-time costs, irrelevant to
        # steady-state throughput) without risking codegen-cache eviction by
        # the other benchmark queries.
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        # Best of two timed runs: a single sample is hostage to scheduler
        # noise (a one-run outlier produced round 2's phantom 2.3×
        # count-distinct "regression"); the minimum is the standard
        # steady-state throughput estimator.
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            # noop sink: full execution, zero serialization to the driver.
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        timings[key] = round(best, 3)

    total = round(sum(timings.values()), 3)

    # Host-speed yardstick (BASELINE.md): VM generations for this repo have
    # varied ~1.6× on identical plans, so BENCH deltas are only meaningful
    # normalized by host speed. One extra JSON key; the driver's parser
    # ignores keys it doesn't know.
    # Min of three samples: a single sample can absorb a scheduler
    # interruption and swing ~40% between consecutive runs (round-5
    # measurement), which poisons cross-round normalization; the minimum
    # is the least-interrupted estimate of true host speed.
    samples = []
    for _ in range(3):
        t0 = time.time()
        sum(range(10**7))
        samples.append((time.time() - t0) * 1000)
    host_ms = round(min(samples), 1)

    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "host_yardstick_ms": host_ms,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
