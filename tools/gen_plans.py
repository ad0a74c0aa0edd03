"""Regenerate PLANS.md: `explain("formatted")` snapshots for a
representative query per family, annotated with what each plan proves
(pushdown, broadcast selection, top-k pushdown, shuffle reuse).

Run: PYTHONPATH=. python tools/gen_plans.py [sf_dir]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from e2e_etl_pipeline_spark.registry import QUERIES, load_all  # noqa: E402
from e2e_etl_pipeline_spark.session import get_session  # noqa: E402

# key → what the reader should look for in this plan
SHOWCASE = [
    ("q_topk", "TakeOrderedAndProject (no global sort); filter + column "
               "pruning pushed into the parquet scan (PushedFilters, "
               "narrow ReadSchema)"),
    ("q_join_star", "dimension chain resolved as BroadcastHashJoins; "
                    "customer deliberately unhinted so AQE chooses "
                    "(broadcast while it fits, shuffle beyond)"),
    ("q_join_bucketed", "no 'Exchange hashpartitioning' anywhere — the "
                        "bucketed layout pre-shuffled at write time; at "
                        "this SF AQE additionally turns the joins into "
                        "broadcasts (BroadcastExchange is not a shuffle)"),
    ("q_agg_groupby", "partial (map-side) aggregation before the single "
                      "exchange; DECIMAL sums for bit-stable money"),
    ("q_window_topk_per_group", "rank window followed by filter pushdown "
                                "(running-rank early-out)"),
    ("q_unigram_logprob", "ReusedExchange: corpus counts derive from the "
                          "same (doc,token) tf shuffle the score join "
                          "consumes — explode computed once"),
    ("q_vocab_topk", "aggregation reduces to vocabulary size before "
                     "TakeOrderedAndProject; window sees only the top-k"),
    ("q_dedup_exact", "dedup groups on xxhash64 digest — document bodies "
                      "never enter the exchange"),
    ("q_agg_count_distinct", "two-stage exact multi-distinct: NO Expand "
                             "node (the default multi-countDistinct plan "
                             "triples pre-shuffle rows); each column dedups "
                             "behind partial aggregation, counts join on "
                             "the tiny group key"),
    ("q_ntile_bins", "distributed-exact global NTILE: range exchange + "
                     "per-partition row_number (Window partitioned by pid, "
                     "no SinglePartition anywhere) + broadcast offset join; "
                     "final agg shuffles 10 rows"),
    ("q_anomaly_zscore", "group stats broadcast back over the fact scan; "
                         "outlier filter runs inside codegen"),
    ("q_tpch_q21", "EXISTS/NOT-EXISTS rewritten as one per-order "
                   "aggregate: a single lineitem scan feeds the blame "
                   "assignment; TakeOrderedAndProject caps the output"),
    ("q_incremental_agg", "base + delta slices partial-aggregate on their "
                          "own pruned scans; the merge shuffles per-month "
                          "partials, never facts"),
    ("q_training_pipeline", "four pipeline stages (quality filter, digest "
                            "dedup, shingle decontamination, balanced "
                            "sample) fused into ONE plan; no exchange "
                            "carries the text column — digests, scores and "
                            "token counts are computed in the scan stage"),
    ("q_sessionize", "one exchange on user_id feeds BOTH window passes and "
                     "the final session aggregate — the sort order is "
                     "computed once and reused; no range self-join"),
    ("q_kmeans_step", "k seed centroids broadcast against the corpus scan "
                      "(BroadcastNestedLoopJoin) — assignment never "
                      "shuffles vectors; the mean-recompute exchanges "
                      "k·d (cluster, dim) cells after partial agg"),
    ("q_pagerank", "final iteration of the power loop: the cached "
                   "src-partitioned edge relation joins a broadcast rank "
                   "vector; per-iteration state is |nodes| rows, and "
                   "localCheckpoint truncation keeps the plan this size "
                   "at any iteration count"),
    ("q_bpe_encode", "tokenizer-training apply step: the encoded "
                     "vocabulary (tiny) broadcasts against the token "
                     "stream; the merge loop itself never appears — it "
                     "ran vocab-side before this plan"),
    ("q_sql_udf", "SQL-language UDFs inlined at resolution: pure "
                  "WholeStageCodegen project over the scan, filter "
                  "pushed, no Python eval node anywhere"),
    ("q_heavy_hitters", "Misra-Gries pruning: the mapInPandas summary "
                        "emits <= 32 rows per partition, so the exact "
                        "recount groups a broadcast-semi-joined sliver "
                        "of the token stream — never the full "
                        "vocabulary"),
    ("q_skyline", "per-partition local frontier (mapInPandas, no "
                  "exchange) then a broadcast anti-join on the pure "
                  "column dominance predicate — the O(n^2) self-join "
                  "the NOT EXISTS oracle implies never materializes"),
    ("q_tpch_q2", "correlated min decorrelated: pair-grain aggregate of "
                  "the fact table feeds both the candidate and min-cost "
                  "sides; part's size+type predicates push to its scan; "
                  "nation broadcasts"),
    ("q_rfm", "three chained distributed-exact NTILEs (operators/ranks.py): "
              "the visible plan is the third — row_number partitioned by "
              "the range-partition id, broadcast offset join, NO "
              "SinglePartition anywhere; the first two sit behind the "
              "helper's checkpoints with the same shape"),
    ("q_concurrent_sessions", "day-sharded sweep line: the delta-stream "
                              "running sum windows PER DAY (windowspec "
                              "carries the day key); the only "
                              "SinglePartition exchanges feed the "
                              "|days|-row carry table and the final "
                              "struct-max scalar"),
    ("q_span_corruption", "T5 span-corruption pairs as ONE shuffle-free "
                          "projection chain — higher-order array lambdas "
                          "only, no Exchange/Sort; the corpus never "
                          "leaves its scan partitions"),
    ("q_dedup_url", "URL canonicalization inside the scan stage (stateless "
                    "regex projection); exactly one exchange — the "
                    "groupBy on canon_url — with partial_min/count "
                    "map-side so the shuffle carries (url, id, count) "
                    "tuples"),
    ("q_quality_gopher", "Gopher rule filtering is ONE scan-stage "
                         "projection: higher-order token lambdas + "
                         "divisionless integer thresholds, no Exchange, "
                         "no Python — a pure map pass at any corpus size"),
    ("q_dedup_substring", "duplicated-substring coverage: positional-gram "
                          "shuffle keyed on the gram (partial counts "
                          "map-side), then a per-DOCUMENT window (no "
                          "SinglePartition) for gaps-and-islands span "
                          "merging"),
    ("q_dedup_embedding_bound", "the exact all-pairs verification side is "
                                "quadratic ON PURPOSE (bounded bench "
                                "corpus) — since round 11 it runs as "
                                "blocked NumPy sub-matrices behind a "
                                "FlatMapGroupsInArrow over hash-block "
                                "pairs, bit-identical to the old "
                                "nested-loop + HOF cosine; the certified "
                                "LSH path joins on (table, bucket) — "
                                "note the equi-join, not a cross product"),
    ("q_token_shards", "global fixed-token-budget sharding with NO "
                       "SinglePartition stage: distributed_cumsum's range "
                       "exchange + per-partition window (__rank_pid spec) "
                       "+ broadcast P-row offsets replace the global "
                       "ORDER BY window"),
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    load_all()
    spark = get_session("plans")
    out = [
        "# Physical-plan showcase (generated)",
        "",
        f"`explain(\"formatted\")` for one representative query per family at"
        f" `{sf_dir}`, local[{spark.sparkContext.defaultParallelism}]."
        " Regenerate: `PYTHONPATH=. python tools/gen_plans.py`."
        " Machine-checked versions of these properties live in"
        " `tests/test_plans.py` and `tests/test_corpus.py`; this file is the"
        " human-readable evidence.",
        "",
    ]
    for key, note in SHOWCASE:
        df = QUERIES[key](spark, sf_dir)
        df.collect()  # let AQE finalize so the printed plan is the real one
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue().rstrip()
        out += [f"## {key}", "", f"*What to look for:* {note}", "",
                "```", plan, "```", ""]
    path = os.path.join(REPO, "PLANS.md")
    with open(path, "w") as f:
        f.write("\n".join(out))
    print(f"wrote {path}: {len(SHOWCASE)} plans")


if __name__ == "__main__":
    main()
