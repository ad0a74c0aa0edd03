"""Dump `explain("formatted")` for the given query keys to files.

Run: PYTHONPATH=. python tools/dump_plan.py <out_dir> <suffix> <key> [key ...]
Writes <out_dir>/<key>_<suffix>.txt for each key (construction-only; no
execution, so the plan is the AQE initial plan — the shape evidence).
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


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    keys = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)
    load_all()
    spark = get_session("dump_plan")
    for key in keys:
        df = QUERIES[key](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{key}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
