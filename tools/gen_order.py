"""Regenerate the driver-verification key ordering from CORRECTNESS files.

The external driver verifies keys in registration order under a ~50-key
budget, so each round the registry should put never-driver-verified
oracle-checked keys first (prior fails leading — they need re-verdicts),
then rows-only keys lacking a non-vacuous driver record (never ran, or the
latest record shows 0 rows — round-5 verdict: without this rule those keys
can never reach the budget), then driver-green keys ordered OLDEST verdict
first (the leftover budget re-verifies the keys that survived the fewest
testdata regenerations), then rows-only keys that already ran with rows
dead last (the driver can only record `err: no_oracle` for those).

Usage:
    PYTHONPATH=. python tools/gen_order.py r4 [priority_key ...]

Writes e2e_etl_pipeline_spark/queries/_order_<round>.py with FIRST/LAST
lists; point queries/__init__.py's import at the new module afterwards.
Extra argv keys are pinned to the very front of FIRST (use for keys whose
oracles were just fixed, or that failed last round).
"""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "rX"
    priority = list(sys.argv[2:])

    from e2e_etl_pipeline_spark.registry import ORACLES, QUERIES, load_all

    load_all()
    keys = list(QUERIES)

    # Track the LATEST verdict per key (files sort by round number): a green
    # in round N is cleared by a fail in round N+1 and vice versa. For
    # rows-only keys the driver records err == "no_oracle" plus spark_rows;
    # a rows-only key with NO record ever, or whose latest record has
    # spark_rows == 0 (a vacuous run), still needs driver exposure.
    latest: dict[str, bool] = {}
    latest_round: dict[str, int] = {}
    rows_only_latest_rows: dict[str, int] = {}
    rows_only_zero_streak: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(os.path.basename(path).split("_r")[1].split(".")[0])
        for k, v in json.load(open(path)).items():
            if v.get("err") == "no_oracle":
                n = int(v.get("spark_rows") or 0)
                rows_only_latest_rows[k] = n
                # Consecutive trailing 0-row runs: a rows-only key whose
                # query legitimately returns 0 rows would otherwise stay
                # "needy" forever and squat the driver budget's FIRST slots
                # (advisor finding, round 6) — after 2 consecutive 0-row
                # driver runs we accept the emptiness as by-design.
                rows_only_zero_streak[k] = (
                    0 if n > 0 else rows_only_zero_streak.get(k, 0) + 1
                )
                continue
            latest[k] = v.get("hash_match") is True
            latest_round[k] = rnd
    green = {k for k, ok in latest.items() if ok}
    # A key whose latest verdict is a fail is priority by default.
    for k, ok in latest.items():
        if not ok and k not in priority:
            priority.append(k)

    # Dedup argv repeats and exclude priority keys from EVERY other bucket:
    # a just-fixed key is usually driver-green (or rows-only), and emitting
    # it twice would trip queries/__init__._reorder's length assert at
    # import time, crashing the whole package (eighth review pass).
    priority = list(dict.fromkeys(k for k in priority if k in QUERIES))
    pset = set(priority)
    unverified = [
        k for k in keys if k not in green and k in ORACLES and k not in pset
    ]
    rows_only = [k for k in keys if k not in ORACLES and k not in pset]
    # Rows-only keys with no non-vacuous driver record ever (never ran, or
    # latest record shows 0 rows) go right after the never-verified
    # oracle-checked block so they can reach the driver budget at least
    # once; the rest (already ran with rows, or 0-row twice in a row —
    # empty-by-design) stay dead last.
    rows_only_needy = [
        k
        for k in rows_only
        if rows_only_latest_rows.get(k, 0) == 0
        and rows_only_zero_streak.get(k, 0) < 2
    ]
    rows_only_done = [k for k in rows_only if k not in set(rows_only_needy)]
    first = priority + unverified + rows_only_needy
    # Driver-green keys ordered OLDEST verdict first: once the backlog is
    # exhausted, the leftover driver budget re-verifies the keys that have
    # survived the fewest testdata regenerations (highest staleness risk).
    # Ties broken by registration order for determinism.
    idx = {k: i for i, k in enumerate(keys)}
    last = sorted(
        (k for k in keys if k in green and k in ORACLES and k not in pset),
        key=lambda k: (latest_round.get(k, 0), idx[k]),
    ) + rows_only_done
    assert set(first) | set(last) == set(keys)
    assert len(first) + len(last) == len(keys), "a key was emitted twice"

    def fmt(lst: list[str]) -> str:
        return "[\n" + "".join(f'    "{k}",\n' for k in lst) + "]"

    body = f'''"""Round-{tag} driver-verification ordering (generated by tools/gen_order.py).

FIRST = prior driver fails + never-driver-verified oracle-checked keys +
rows-only keys lacking a non-vacuous driver record (the driver's ~50-key
budget should land entirely here); keys added after generation register
between FIRST and LAST automatically (see queries/__init__.py); LAST =
driver-green keys then rows-only keys that already ran with rows.
"""

FIRST = {fmt(first)}

LAST = {fmt(last)}
'''
    out = os.path.join(REPO, "e2e_etl_pipeline_spark", "queries", f"_order_{tag}.py")
    with open(out, "w") as f:
        f.write(body)
    print(
        f"wrote {out}: FIRST={len(first)} (priority={len(priority)}), "
        f"LAST={len(last)}; first 50: {first[:50]}"
    )


if __name__ == "__main__":
    main()
