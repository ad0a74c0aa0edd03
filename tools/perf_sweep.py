"""Time every registered query at a given SF with the noop sink (guide §1.4).

Run: PYTHONPATH=. python tools/perf_sweep.py [sf_dir] [out.json] [key ...]

One warmup + one timed run per key (the sweep ranks operators; the bench
proper re-measures anything worth touching with best-of-2). Also records
plan-shape stats: Exchange count, join strategies, Python eval nodes.
"""

from __future__ import annotations

import io
import json
import os
import re
import sys
import time
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from e2e_etl_pipeline_spark.registry import QUERIES, load_all  # noqa: E402
from e2e_etl_pipeline_spark.session import get_session  # noqa: E402


def plan_stats(plan: str) -> dict:
    return {
        "exchanges": len(re.findall(r"\bExchange\b", plan))
        - len(re.findall(r"\bReusedExchange\b", plan)),
        "reused_exchanges": len(re.findall(r"\bReusedExchange\b", plan)),
        "single_partition": len(re.findall(r"SinglePartition", plan)),
        "bhj": len(re.findall(r"BroadcastHashJoin", plan)),
        "smj": len(re.findall(r"SortMergeJoin", plan)),
        "shj": len(re.findall(r"ShuffledHashJoin", plan)),
        "bnlj": len(re.findall(r"BroadcastNestedLoopJoin", plan)),
        "cartesian": len(re.findall(r"CartesianProduct", plan)),
        "py_eval": len(re.findall(r"BatchEvalPython|ArrowEvalPython", plan)),
        "map_in_py": len(re.findall(r"MapInArrow|MapInPandas|FlatMapGroupsInPandas", plan)),
        "window": len(re.findall(r"\bWindow\b", plan)),
        "sort": len(re.findall(r"\bSort \[", plan)),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/perf_sweep.json"
    only = set(sys.argv[3:])
    load_all()
    spark = get_session("perf_sweep")
    results: dict[str, dict] = {}
    keys = [k for k in QUERIES if not only or k in only]
    for i, key in enumerate(keys):
        fn = QUERIES[key]
        spark.sparkContext.setJobDescription(f"sweep: {key}")
        try:
            t0 = time.time()
            df = fn(spark, sf_dir)
            t_construct = time.time() - t0
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t_warm = time.time() - t0
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            t_run = time.time() - t0
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            st = plan_stats(buf.getvalue())
            results[key] = {
                "construct": round(t_construct, 3),
                "warm": round(t_warm, 3),
                "run": round(t_run, 3),
                **st,
            }
        except Exception as e:  # noqa: BLE001
            results[key] = {"error": f"{type(e).__name__}: {e}"[:300]}
        print(
            f"[{i + 1}/{len(keys)}] {key}: "
            + (
                f"{results[key].get('run', '?')}s (warm {results[key].get('warm', '?')}s)"
                if "error" not in results[key]
                else "ERROR " + results[key]["error"][:80]
            ),
            flush=True,
        )
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    ok = {k: v for k, v in results.items() if "run" in v}
    print(f"\nwrote {out_path}; total timed: {sum(v['run'] for v in ok.values()):.1f}s")
    for k, v in sorted(ok.items(), key=lambda kv: -kv[1]["run"])[:40]:
        print(f"{v['run']:8.3f}s  warm {v['warm']:7.3f}s  ex {v['exchanges']:2d}  py {v['py_eval']}  {k}")


if __name__ == "__main__":
    main()
