"""Regenerate COVERAGE.md from the live registry.

Usage: PYTHONPATH=. python tools/gen_coverage.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from e2e_etl_pipeline_spark.registry import ORACLES, QUERIES, load_all  # noqa: E402


def main() -> None:
    load_all()
    rows = []
    for key in sorted(QUERIES):
        check = "oracle" if key in ORACLES else "rows-only"
        doc = (QUERIES[key].__doc__ or "").strip().splitlines()
        summary = doc[0].strip() if doc else ""
        rows.append((key, check, summary))
    n_oracle = sum(1 for _, c, _ in rows if c == "oracle")
    out = [
        "## Query-key coverage (generated)",
        "",
        f"{len(rows)} keys, {n_oracle} oracle-checked, "
        f"{len(rows) - n_oracle} rows-only (pytest-covered)",
        "",
        "| key | check | summary |",
        "|---|---|---|",
    ]
    for key, check, summary in rows:
        out.append(f"| `{key}` | {check} | {summary} |")
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "COVERAGE.md")
    with open(path, "w") as f:
        f.write("\n".join(out) + "\n")
    print(f"wrote {path}: {len(rows)} keys, {n_oracle} oracles")


if __name__ == "__main__":
    main()
