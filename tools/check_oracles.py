"""Local replica of the driver's correctness gate.

Runs every registered query (``e2e_etl_pipeline_spark.registry.QUERIES``)
against its DuckDB oracle on the same parquet tables and reports, per key:
row-count match, schema (column-name) match, and an order-insensitive value
comparison (exact for non-floats, 1e-9-relative for floats). Keys without an
oracle get the weaker rows-only check, mirroring the driver contract
(/root/repo/__spark_entry__.py).

Usage:  python tools/check_oracles.py [sf_dir] [key ...] [--plain] [--exact]

--plain runs on an externally-built driver-conditions session (non-UTC tz,
none of the engine factory's confs). --exact compares float columns
bit-for-bit instead of at 1e-9 tolerance — the closest local proxy for the
driver's exact value hash; a key that is tolerance-green but exact-red is a
driver-hash risk.
"""

from __future__ import annotations

import sys
import time
import traceback

import duckdb
import numpy as np
import pandas as pd


def canonical(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name and rows by value for order-insensitive compare."""
    df = df.reindex(sorted(df.columns), axis=1)
    # Normalize cell values to comparable primitives.
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            s = s.dt.tz_localize(None) if getattr(s.dt, "tz", None) is not None else s
            s = s.astype("datetime64[us]")
        elif s.dtype == object:
            # Match the driver: its canonicalizer sorts raw cells and dies on
            # unhashable lists, so an array/map/struct output column in an
            # oracle-checked query is a FAIL here, not something to paper over.
            bad = s.map(lambda v: isinstance(v, (list, np.ndarray, dict))).any()
            if bad:
                raise TypeError(
                    f"column {c!r} holds array/map/struct cells; "
                    "oracle-checked queries must emit scalar columns only"
                )
        out[c] = s
    df = pd.DataFrame(out)
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="last")
    return df.reset_index(drop=True)


def _dtype_kind(s: pd.Series) -> str:
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_float_dtype(s):
        return "float"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    return "other"


def values_match(a: pd.DataFrame, b: pd.DataFrame, exact: bool = False) -> bool:
    if a.shape != b.shape:
        return False
    for c in a.columns:
        x, y = a[c], b[c]
        # Driver-faithful dtype gate: the driver's hash renders 195 and
        # 195.0 differently, so an int-vs-float (or bool-vs-numeric) dtype
        # split between Spark and the oracle is a FAIL even when every
        # value is numerically identical. Round 2 shipped q_json_malformed
        # red precisely because the old coercing compare masked this class.
        kx, ky = _dtype_kind(x), _dtype_kind(y)
        if kx != ky and {kx, ky} <= {"int", "float", "bool"}:
            return False
        if pd.api.types.is_float_dtype(x) or pd.api.types.is_float_dtype(y):
            xv = pd.to_numeric(x, errors="coerce").to_numpy(dtype=float)
            yv = pd.to_numeric(y, errors="coerce").to_numpy(dtype=float)
            if exact:
                if not ((xv == yv) | (np.isnan(xv) & np.isnan(yv))).all():
                    return False
            elif not np.allclose(xv, yv, rtol=1e-9, atol=1e-9, equal_nan=True):
                return False
        else:
            if not x.astype(str).fillna("<null>").equals(y.astype(str).fillna("<null>")):
                return False
    return True


def main() -> int:
    args = [a for a in sys.argv[1:] if a not in ("--plain", "--exact")]
    plain = "--plain" in sys.argv[1:]
    exact = "--exact" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    from e2e_etl_pipeline_spark.catalog import TABLES
    from e2e_etl_pipeline_spark.registry import ORACLES, QUERIES, load_all
    from e2e_etl_pipeline_spark.session import get_session

    load_all()
    if plain:
        # Driver-conditions sweep: an externally-built session with NONE of
        # the engine factory's confs and a deliberately non-UTC timezone.
        # Every query must still pass — the registry wrapper alone carries
        # package shipping + UTC pinning (the verify-skill contract).
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .config("spark.sql.session.timeZone", "America/New_York")
            .config("spark.ui.showConsoleProgress", "false")
            .appName("check_oracles_plain")
            .getOrCreate()
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
