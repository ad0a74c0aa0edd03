"""Dump the EXECUTED (final adaptive) plan for query keys.

Run: PYTHONPATH=. python tools/dump_executed_plan.py <out_dir> <suffix> <key>...

Unlike dump_plan.py (construction-time initial plan), this executes each
query against the noop sink first and then dumps queryExecution.executedPlan
— the AQE-final plan with ReusedExchange / AQEShuffleRead / runtime join
rewrites visible. Evidence for claims that rest on AQE runtime behavior
(round-11 verdict: "dump the executed plan next time a claim rests on AQE
runtime behavior").
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from e2e_etl_pipeline_spark.registry import QUERIES, load_all  # noqa: E402
from e2e_etl_pipeline_spark.session import get_session  # noqa: E402


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    keys = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)
    load_all()
    spark = get_session("dump_executed_plan")
    for key in keys:
        df = QUERIES[key](spark, sf_dir)
        spark.sparkContext.setJobDescription(f"executed-plan: {key}")
        # Action on THIS DataFrame's own QueryExecution: a .write builds a
        # separate QueryExecution, leaving df's AdaptiveSparkPlan
        # isFinalPlan=false (found live — the first dump of this tool
        # printed the un-finalized plan). collect() finalizes df's QE;
        # only use this tool on small-output keys.
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        path = os.path.join(out_dir, f"{key}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
