"""Local replica of the driver's correctness gate.

Runs every registered query (``e2e_etl_pipeline_spark.registry.QUERIES``)
against its DuckDB oracle on the same parquet tables and reports, per key:
row-count match, schema (column-name) match, and an order-insensitive value
comparison (exact for non-floats, 1e-9-relative for floats). Keys without an
oracle get the weaker rows-only check, mirroring the driver contract
(/root/repo/__spark_entry__.py).

Usage:  python tools/check_oracles.py [sf_dir] [key ...] [--plain] [--exact]
                                      [--hostile]

--plain runs on an externally-built driver-conditions session (non-UTC tz,
none of the engine factory's confs). --exact compares float columns
bit-for-bit instead of at 1e-9 tolerance — the closest local proxy for the
driver's exact value hash; a key that is tolerance-green but exact-red is a
driver-hash risk. --hostile runs on an adversarial-partitioning session
(local[3], shuffle.partitions=7, 64 KiB advisory/open-cost sizes, non-UTC
tz): any key whose values depend on task count, shuffle fan-out, or
partition-local accumulation order fails here before it fails on a
different driver host. Combine with --exact for the strongest form.
"""

from __future__ import annotations

import functools
import os
import sys
import time
import traceback

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Single source of truth for the comparison semantics (dtype gate, exact
# mode, cell canonicalization) — shared with the pytest parity suite so the
# two gates can never diverge. strict_cells mirrors the driver's
# canonicalizer, which dies on unhashable array/map/struct cells.
from e2e_etl_pipeline_spark.testing import canonical as _canonical
from e2e_etl_pipeline_spark.testing import values_match

canonical = functools.partial(_canonical, strict_cells=True)


def main() -> int:
    args = [a for a in sys.argv[1:] if a not in ("--plain", "--exact", "--hostile")]
    plain = "--plain" in sys.argv[1:]
    exact = "--exact" in sys.argv[1:]
    hostile = "--hostile" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    from e2e_etl_pipeline_spark.catalog import TABLES
    from e2e_etl_pipeline_spark.registry import ORACLES, QUERIES, load_all
    from e2e_etl_pipeline_spark.session import get_session

    load_all()
    # Fail loudly on a typo'd / stale / stray-flag key argument: silently
    # matching nothing would print "0 pass, 0 fail" and exit 0 — a green
    # gate that verified nothing (eighth review pass).
    unknown = only - set(QUERIES)
    if unknown:
        print(f"unknown keys (not registered): {sorted(unknown)}")
        return 2
    if hostile:
        # Adversarial-partitioning sweep: few cores, prime shuffle fan-out,
        # tiny advisory sizes so AQE coalesces differently, non-UTC tz.
        # Results must be bit-identical to every other layout — a key that
        # is green on local[8]/200 but red here depends on task count or
        # partition-local accumulation order.
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[3]")
            .config("spark.sql.shuffle.partitions", "7")
            .config("spark.sql.session.timeZone", "America/New_York")
            .config("spark.sql.files.maxPartitionBytes", "65536")
            .config("spark.sql.files.openCostInBytes", "0")
            .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "65536")
            .config("spark.default.parallelism", "3")
            .config("spark.ui.showConsoleProgress", "false")
            .appName("check_oracles_hostile")
            .getOrCreate()
        )
        # getOrCreate silently returns any pre-existing session with ITS
        # confs, in which case this sweep would quietly test nothing
        # adversarial — fail loudly instead (round-5 advice).
        assert spark.sparkContext.master == "local[3]", (
            f"hostile sweep got a pre-existing session "
            f"(master={spark.sparkContext.master}); run it in a fresh process"
        )
        assert spark.conf.get("spark.sql.shuffle.partitions") == "7"
    elif plain:
        # Driver-conditions sweep: an externally-built session with NONE of
        # the engine factory's confs and a deliberately non-UTC timezone.
        # Every query must still pass — the registry wrapper alone carries
        # package shipping + UTC pinning (the verify-skill contract).
        #
        # Axis knobs (round-6 verdict #7): CHECK_ORACLES_TZ overrides the
        # session timezone (e.g. Australia/Lord_Howe — a 30-minute-DST zone
        # stresses the UTC pin harder than New York), and
        # CHECK_ORACLES_EXTRA_CONF takes comma-separated key=value Spark
        # confs (arrow fallback, codegen, …) so each sweep axis is one env
        # var, not a code edit.
        from pyspark.sql import SparkSession

        builder = (
            SparkSession.builder.master("local[8]")
            .config(
                "spark.sql.session.timeZone",
                os.environ.get("CHECK_ORACLES_TZ", "America/New_York"),
            )
            .config("spark.ui.showConsoleProgress", "false")
            .appName("check_oracles_plain")
        )
        for kv in filter(None, os.environ.get("CHECK_ORACLES_EXTRA_CONF", "").split(",")):
            k, _, v = kv.partition("=")
            builder = builder.config(k.strip(), v.strip())
        spark = builder.getOrCreate()
        # Same pre-existing-session hazard as the hostile branch.
        assert spark.sparkContext.master == "local[8]", (
            f"plain sweep got a pre-existing session "
            f"(master={spark.sparkContext.master}); run it in a fresh process"
        )
    else:
        spark = get_session("check_oracles")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    n_pass = n_fail = 0
    failures: list[str] = []
    for key, fn in sorted(QUERIES.items()):
        if only and key not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception:
            print(f"FAIL {key}: spark query raised")
            traceback.print_exc()
            n_fail += 1
            failures.append(key)
            continue
        elapsed = time.time() - t0
        if key not in ORACLES:
            print(f"pass {key}: rows-only ({len(sdf)} rows, {elapsed:.1f}s)")
            n_pass += 1
            continue
        try:
            odf = con.execute(ORACLES[key]).fetchdf()
        except Exception:
            print(f"FAIL {key}: oracle SQL raised")
            traceback.print_exc()
            n_fail += 1
            failures.append(key)
            continue
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rows {len(sdf)} != {len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"cols {sorted(sdf.columns)} != {sorted(odf.columns)}")
        if not problems:
            try:
                ca, cb = canonical(sdf), canonical(odf)
            except TypeError as exc:
                print(f"FAIL {key}: {exc} ({elapsed:.1f}s)")
                n_fail += 1
                failures.append(key)
                continue
            if not values_match(ca, cb, exact=exact):
                problems.append("values differ")
                diff_preview = []
                for c in ca.columns:
                    if not values_match(ca[[c]], cb[[c]], exact=exact):
                        diff_preview.append(c)
                problems.append(f"differing cols: {diff_preview}")
        if problems:
            print(f"FAIL {key}: {'; '.join(problems)} ({elapsed:.1f}s)")
            n_fail += 1
            failures.append(key)
        else:
            print(f"pass {key}: {len(sdf)} rows ({elapsed:.1f}s)")
            n_pass += 1

    print(f"\n{n_pass} pass, {n_fail} fail" + (f": {failures}" if failures else ""))
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
