"""End-to-end pipeline parity for the acquisition + raw-zone path
(A1-A8): synthetic fetch → hive-partitioned write over two ingest dates →
latest-partition pruned read → DOM parse → typed offers. Verifies the
§1.3 fix: "latest" is a DATE comparison, never a filename sort.
"""

from __future__ import annotations

import datetime as dt
import shutil
import tempfile

from pyspark.sql import functions as F

from e2e_etl_pipeline_spark.pipeline.offers import parse_offers
from e2e_etl_pipeline_spark.sources.acquire import fetched_documents
from e2e_etl_pipeline_spark.sources.raw_zone import read_latest, write_raw

TARGETS = [("jjit", "waw", "junior"), ("ppl", "gd", "senior")]


def test_raw_zone_roundtrip_and_latest(spark):
    path = tempfile.mkdtemp(prefix="e2e_raw_zone_")
    try:
        # Two ingests; the ddmmyyyy byte-sort bug would order these wrongly
        # (31012024 > 01082024 lexicographically, but Jan 31 < Aug 1).
        d_old = dt.date(2024, 1, 31)
        d_new = dt.date(2024, 8, 1)
        write_raw(fetched_documents(spark, TARGETS, d_old), path)
        write_raw(fetched_documents(spark, TARGETS, d_new), path)

        latest = read_latest(spark, path)
        dates = {r.ingest_date for r in latest.select("ingest_date").distinct().collect()}
        assert dates == {d_new}

        scoped = read_latest(spark, path, site="jjit", region="waw")
        assert scoped.count() == 1

        # partition pruning: site/region land in PartitionFilters, not data
        plan = scoped._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan

        offers = parse_offers(
            latest.select("doc_id", "site", "html")
        )
        got = offers.select("site", "position", "minimum", "maximum", "currency").collect()
        assert len(got) == 6  # 3 offers per site
        by_site = {r.site for r in got}
        assert by_site == {"jjit", "ppl"}
        for r in got:
            assert r.currency == "PLN"
            assert r.minimum is not None and r.minimum <= r.maximum
    finally:
        shutil.rmtree(path, ignore_errors=True)
