"""The primary correctness gate, run locally: every registered query with an
oracle must match DuckDB on the same parquet (row count + columns +
order-insensitive values) — the same comparison the driver performs at
sf0.01 (SURVEY.md §5.2 item 1). Rows-only keys must at least execute and
return a stable, non-error result.
"""

from __future__ import annotations

import pytest

from e2e_etl_pipeline_spark.registry import ORACLES, QUERIES, load_all
from e2e_etl_pipeline_spark.testing import compare_frames

load_all()

ORACLE_KEYS = sorted(k for k in QUERIES if k in ORACLES)
ROWS_ONLY_KEYS = sorted(k for k in QUERIES if k not in ORACLES)


@pytest.mark.parametrize("key", ORACLE_KEYS)
def test_oracle_parity(key, spark, sf_dir, duck):
    sdf = QUERIES[key](spark, sf_dir).toPandas()
    odf = duck.execute(ORACLES[key]).fetchdf()
    problems = compare_frames(sdf, odf)
    assert not problems, f"{key}: {problems}"


@pytest.mark.parametrize("key", ROWS_ONLY_KEYS)
def test_rows_only_executes(key, spark, sf_dir):
    df = QUERIES[key](spark, sf_dir)
    n = df.count()
    assert n >= 0
    assert df.schema.fieldNames(), f"{key}: empty schema"
