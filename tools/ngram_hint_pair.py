"""Quiet A/B pair for q_dedup_ngram's SHUFFLE_HASH hint (VERDICT r11 item 1).

Times the registered query as-is ("hint") against the identical construction
with DataFrame.hint monkeypatched to a no-op ("nohint" — planner default,
sort-merge), interleaved hint/nohint x3 on one session so host drift hits
both variants equally. min-of-3 per variant per layout.

Run: PYTHONPATH=. python tools/ngram_hint_pair.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import DataFrame  # noqa: E402

from e2e_etl_pipeline_spark.registry import QUERIES, load_all  # noqa: E402
from e2e_etl_pipeline_spark.session import get_session  # noqa: E402

LAYOUTS = {
    "standard": "/root/testdata/sf0.1",
    "restaged": None,  # resolved from bench._restage below
}


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ngram_hint_pair.json"
    sys.path.insert(0, REPO)
    import bench

    LAYOUTS["restaged"] = bench._restage("/root/testdata/sf0.1")
    load_all()
    fn = QUERIES["q_dedup_ngram"]
    spark = get_session("ngram_hint_pair")
    real_hint = DataFrame.hint

    def build(variant: str, sf_dir: str) -> DataFrame:
        if variant == "nohint":
            DataFrame.hint = lambda self, *a, **kw: self
        try:
            return fn(spark, sf_dir)
        finally:
            DataFrame.hint = real_hint

    results: dict[str, dict] = {}
    for layout, sf_dir in LAYOUTS.items():
        # warm both variants once (codegen/scan caches), then interleave
        for variant in ("hint", "nohint"):
            build(variant, sf_dir).write.format("noop").mode("overwrite").save()
        runs: dict[str, list[float]] = {"hint": [], "nohint": []}
        for _ in range(3):
            for variant in ("hint", "nohint"):
                spark.sparkContext.setJobDescription(
                    f"ngram pair: {layout}/{variant}"
                )
                t0 = time.time()
                build(variant, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                runs[variant].append(round(time.time() - t0, 3))
        results[layout] = {
            v: {"min": min(r), "runs": r} for v, r in runs.items()
        }
        print(layout, results[layout], flush=True)
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
