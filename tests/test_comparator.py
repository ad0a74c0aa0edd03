"""Local-comparator contract: testing.values_match must reproduce the
driver's exact-hash behavior for every numeric transport shape — in
particular the DECIMAL class that was locally-green/driver-red for three
rounds (round-9 root cause: DuckDB's pandas bridge ships DECIMAL(12,2) as
float64 "950.0" while Spark's toPandas ships object-of-Decimal "950.00" —
identical values, different exact-hash renderings). Round-10 closes the
blind spot: a Decimal-vs-float pairing is a mismatch, always (the round-9
diagnostic probes that needed the leniency are retired).

Pure pandas — no SparkSession, so this runs in every environment.
"""

from __future__ import annotations

from decimal import Decimal

import pandas as pd

from e2e_etl_pipeline_spark.testing import compare_frames, values_match


def _df(values, dtype=None):
    s = pd.Series(values, dtype=dtype) if dtype else pd.Series(values)
    return pd.DataFrame({"v": s})


def test_decimal_vs_float_is_a_mismatch():
    spark_side = _df([Decimal("950.00"), Decimal("1050.00")])
    duckdb_side = _df([950.0, 1050.0])
    assert spark_side["v"].dtype == object
    assert not values_match(spark_side, duckdb_side)
    assert not values_match(spark_side, duckdb_side, exact=True)
    # and through the full gate, which is what check_oracles reports
    assert compare_frames(spark_side, duckdb_side)


def test_decimal_vs_int_is_a_mismatch():
    assert not values_match(_df([Decimal("950")]), _df([950]))


def test_decimal_vs_decimal_equal_renderings_match():
    a = _df([Decimal("950.00"), None])
    b = _df([Decimal("950.00"), None])
    assert values_match(a, b, exact=True)
    assert not compare_frames(a, b)


def test_decimal_vs_decimal_different_scale_is_a_mismatch():
    # the driver hashes rendered values: "950.0" != "950.00"
    assert not values_match(_df([Decimal("950.0")]), _df([Decimal("950.00")]))


def test_int_vs_float_split_still_trips():
    # the original round-2 dtype gate stays intact
    assert not values_match(_df([195], dtype="int64"), _df([195.0]))


def test_float_vs_float_still_matches():
    assert values_match(_df([950.0]), _df([950.0]), exact=True)


def test_all_null_object_column_is_not_decimal_kind():
    a = _df([None, None])
    b = _df([None, None])
    assert values_match(a, b, exact=True)
