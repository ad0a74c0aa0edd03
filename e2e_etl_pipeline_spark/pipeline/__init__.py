"""End-to-end pipeline parity with the reference (SURVEY.md §3, §7 Phase 3):
acquire → raw zone → parse → normalize → staging sink, re-expressed as lazy
DataFrame stages."""

from e2e_etl_pipeline_spark.pipeline.offers import (  # noqa: F401
    OFFER_SCHEMA,
    parse_offers,
    offers_to_staging_csv,
)
