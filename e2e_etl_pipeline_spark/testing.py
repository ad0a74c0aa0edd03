"""Order-insensitive DataFrame comparison used by the local oracle harness
(tools/check_oracles.py) and the pytest parity suite (tests/test_oracle_parity.py).

Mirrors the driver's check: row count + column names + order-insensitive
value comparison (exact for non-floats, tight-tolerance for floats — the
queries themselves are responsible for rounding so that the driver's exact
hash also matches; see the hash-stability rules in registry.py).
"""

from __future__ import annotations

import datetime
import decimal

import numpy as np
import pandas as pd


def _canon_scalar(v):
    """Object-cell canonicalization: NA scalars → None; date/datetime →
    pd.Timestamp (normalized so both engines' temporal transport shapes
    render identically). Containers pass through untouched."""
    if isinstance(v, (list, tuple, np.ndarray, dict)):
        return v
    if pd.isna(v):
        return None
    if isinstance(v, datetime.date) and not isinstance(v, datetime.datetime):
        return pd.Timestamp(v)
    if isinstance(v, datetime.datetime):
        return pd.Timestamp(v)
    return v


def canonical(df: pd.DataFrame, strict_cells: bool = False) -> pd.DataFrame:
    """Sort columns by name and rows by value.

    strict_cells=True mirrors the external driver's canonicalizer, which
    sorts/hashes raw cells and dies on unhashable lists: an array/map/struct
    cell in an oracle-checked output is then an error, not something to
    paper over (the tools/check_oracles.py contract). The default tuple-izes
    such cells for convenience in unit tests.
    """
    df = df.reindex(sorted(df.columns), axis=1)
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            if getattr(s.dt, "tz", None) is not None:
                s = s.dt.tz_localize(None)
            # Harmonize with the object/date path below: DuckDB returns a
            # DATE column as datetime64 (NaT nulls) once it contains a
            # NULL but as object(datetime.date) otherwise, while Spark
            # always ships object(date/None) — one canonical shape
            # (object of Timestamp-or-None) or the two engines' NULL
            # renderings ("NaT" vs "None") split on transport dtype alone.
            s = s.astype("datetime64[us]")
            s = s.map(lambda v: None if pd.isna(v) else pd.Timestamp(v)).astype(
                object
            )
        elif s.dtype == object:
            if strict_cells:
                bad = s.map(lambda v: isinstance(v, (list, np.ndarray, dict))).any()
                if bad:
                    raise TypeError(
                        f"column {c!r} holds array/map/struct cells; "
                        "oracle-checked queries must emit scalar columns only"
                    )
            else:
                s = s.map(
                    lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v
                )
            # NA-scalar + date normalization (strict and lenient modes
            # alike): NULL temporal cells arrive as None from Spark's
            # toPandas but NaT from DuckDB's df(), and non-null dates as
            # datetime.date vs (sometimes) Timestamp — pandas transport
            # artifacts, not engine divergences; canonicalize to
            # Timestamp-or-None so sort/compare/render agree.
            s = s.map(_canon_scalar).astype(object)
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
    if s.dtype == object and any(
        isinstance(v, decimal.Decimal) for v in s if v is not None
    ):
        return "decimal"
    return "other"


def values_match(a: pd.DataFrame, b: pd.DataFrame, exact: bool = False) -> bool:
    """exact=True compares float columns bit-for-bit — the closest local
    proxy for the driver's exact value hash; default is 1e-9 tolerance."""
    if a.shape != b.shape:
        return False
    for c in a.columns:
        x, y = a[c], b[c]
        # Driver-faithful dtype gate (round-2 lesson, q_json_malformed): the
        # driver's exact hash renders 195 and 195.0 differently, so an
        # int-vs-float/bool split between engines is a mismatch even when
        # every value is numerically identical. "decimal" is a first-class
        # kind here since round 10: the r6-r8 offers reds were exactly
        # Spark Decimal("950.00") vs DuckDB-fetchdf float64 950.0 —
        # identical values, different exact-hash renderings (round-9 root
        # cause). The round-9 diagnostic probes that needed this pairing to
        # stay locally green are retired, so the comparator now reproduces
        # the driver's behavior for Decimal columns too: any numeric-kind
        # split (int/float/bool/decimal) is a mismatch.
        kx, ky = _dtype_kind(x), _dtype_kind(y)
        if kx != ky and {kx, ky} <= {"int", "float", "bool", "decimal"}:
            return False
        if pd.api.types.is_float_dtype(x) or pd.api.types.is_float_dtype(y):
            xv = pd.to_numeric(x, errors="coerce").to_numpy(dtype=float)
            yv = pd.to_numeric(y, errors="coerce").to_numpy(dtype=float)
            if exact:
                # Bit-level: == alone would call -0.0 equal to +0.0, but a
                # string-rendering hash distinguishes them (DuckDB's C round
                # preserves the sign of -0.0; Spark's BigDecimal round
                # cannot represent it).
                same = (xv == yv) & (np.signbit(xv) == np.signbit(yv))
                if not (same | (np.isnan(xv) & np.isnan(yv))).all():
                    return False
            elif not np.allclose(xv, yv, rtol=1e-9, atol=1e-9, equal_nan=True):
                return False
        else:
            if not x.astype(str).fillna("<null>").equals(y.astype(str).fillna("<null>")):
                return False
    return True


def compare_frames(sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    """Return a list of problems ([] = match), mirroring the driver's gate."""
    problems: list[str] = []
    if len(sdf) != len(odf):
        problems.append(f"row count {len(sdf)} != {len(odf)}")
    if sorted(sdf.columns) != sorted(odf.columns):
        problems.append(f"columns {sorted(sdf.columns)} != {sorted(odf.columns)}")
    if not problems:
        ca, cb = canonical(sdf), canonical(odf)
        bad = [c for c in ca.columns if not values_match(ca[[c]], cb[[c]])]
        if bad:
            problems.append(f"values differ in columns: {bad}")
    return problems
