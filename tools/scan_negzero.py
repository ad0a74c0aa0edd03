"""Scan every oracle's DuckDB output for IEEE negative zero.

Why: DuckDB's round() (C nearbyint) preserves the sign bit of a
tiny-negative double — round(-8e-6, 4) = -0.0 — while Spark's round
(java BigDecimal, which has no signed zero) always returns +0.0. The
two are == equal but hash differently under the driver's bit-exact
value compare, so ANY oracle that can round a negative-capable double
to zero is a latent hash split. The sf0.1 bit-exact sweep caught two
live instances (q_array_funcs.first_val, q_embedding_dimstats.mean_v);
this scan finds the rest without spinning up Spark: a -0.0 in an
ORACLE output is a guaranteed mismatch against Spark's +0.0 on the
same data. Fix = append `+ 0.0` to the rounded expression in the
oracle (IEEE: -0.0 + 0.0 = +0.0; every other finite value unchanged).

Spark-side -0.0 (unrounded pass-through doubles) is symmetric — both
engines compute the identical expression on identical input bits — so
only the oracle side needs scanning.

Usage:
    PYTHONPATH=. python tools/scan_negzero.py [sf_dir ...]
defaults to /root/testdata/sf0.01 /root/testdata/sf0.1 plus the
/tmp/sf_values variant (signed amounts — where the negatives live)
when present.
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from e2e_etl_pipeline_spark.registry import ORACLES, load_all  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def scan(sf_dir: str) -> list[tuple[str, str]]:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    hits: list[tuple[str, str]] = []
    for key, sql in sorted(ORACLES.items()):
        try:
            df = con.execute(sql).df()
        except Exception as exc:  # noqa: BLE001 — a variant may not support every key
            print(f"  [skip {key}: {type(exc).__name__}]")
            continue
        for col in df.columns:
            vals = df[col].to_numpy()
            if vals.dtype != np.float64:
                continue
            neg0 = (vals == 0.0) & np.signbit(vals)
            if neg0.any():
                hits.append((key, col))
                print(f"  NEGZERO {key}.{col}: {int(neg0.sum())} cells")
    return hits


def main() -> int:
    load_all()
    dirs = sys.argv[1:] or [
        d
        for d in (
            "/root/testdata/sf0.01",
            "/root/testdata/sf0.1",
            "/tmp/sf_values",
        )
        if os.path.isdir(d)
    ]
    bad = False
    for d in dirs:
        print(f"== {d}")
        hits = scan(d)
        bad = bad or bool(hits)
        print(f"   {len(hits)} negative-zero columns")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
