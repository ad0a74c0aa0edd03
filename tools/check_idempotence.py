"""Idempotence torture: run every registered query TWICE in one session
and require bit-exact equality of the two results (same canonicalization
as the oracle gate, strict cells for oracle-checked keys).

A key that differs between same-session runs is nondeterministic under
its own partitioning/caching — it WILL eventually hash-mismatch under the
driver even if the oracle agrees today (rand(), unpinned LIMIT order,
re-sampled range partitioning, stale cache reuse are the usual causes).

Usage:
    PYTHONPATH=. python tools/check_idempotence.py [sf_dir] [key ...]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    from e2e_etl_pipeline_spark.registry import ORACLES, QUERIES, load_all
    from e2e_etl_pipeline_spark.session import get_session
    from e2e_etl_pipeline_spark.testing import canonical, values_match

    load_all()
    spark = get_session("check_idempotence")
    keys = [k for k in QUERIES if not only or k in only]
    unknown = only - set(keys)
    if unknown:
        print(f"unknown keys: {sorted(unknown)}")
        return 2

    bad = []
    for key in keys:
        try:
            a = QUERIES[key](spark, sf_dir).toPandas()
            b = QUERIES[key](spark, sf_dir).toPandas()
            # Same comparator stack as the oracle gate (testing.canonical +
            # values_match(exact=True)) so this gate can never diverge from
            # check_oracles' semantics (round-7 review).
            strict = key in ORACLES
            ca = canonical(a, strict_cells=strict)
            cb = canonical(b, strict_cells=strict)
            same = list(ca.columns) == list(cb.columns) and values_match(
                ca, cb, exact=True
            )
        except Exception as e:  # noqa: BLE001 — report, keep sweeping
            print(f"ERROR {key}: {type(e).__name__}: {e}")
            bad.append(key)
            continue
        if same:
            print(f"pass {key}: {len(ca)} rows bit-identical")
        else:
            print(f"FAIL {key}: two same-session runs differ")
            bad.append(key)
    print(f"\n{len(keys) - len(bad)} idempotent, {len(bad)} bad")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
