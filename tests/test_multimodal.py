"""Multimodal column plumbing: binary payloads + typed metadata through
mapInPandas, with the stub decoder's deterministic features asserted
against a driver-side recomputation (the stub contract: swapping in a real
codec changes decode_media_stub only).
"""

from __future__ import annotations

from e2e_etl_pipeline_spark.operators.multimodal import (
    attach_fake_media,
    decode_media_stub,
    extract_media_features,
)


def test_media_features_match_stub(spark):
    rows = [(0, "hello world"), (1, "xyz"), (2, "")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    media = attach_fake_media(docs)
    feats = {r.doc_id: r for r in extract_media_features(media).collect()}
    assert set(feats) == {0, 1, 2}
    for doc_id, text in rows:
        expected = decode_media_stub(text.encode("utf-8"))
        got = feats[doc_id]
        assert got.fake_width == expected["fake_width"]
        assert got.fake_height == expected["fake_height"]
        assert got.byte_sum_mod == expected["byte_sum_mod"]
        assert got.byte_len == len(text.encode("utf-8"))
    # media_type routing by doc_id % 3
    assert feats[0].media_type == "image/png"
    assert feats[1].media_type == "audio/wav"
    assert feats[2].media_type == "video/mp4"


def test_payload_is_binary_and_roundtrips(spark):
    docs = spark.createDataFrame([(7, "żółć😀")], "doc_id long, text string")
    row = attach_fake_media(docs).collect()[0]
    assert isinstance(row.payload, (bytes, bytearray))
    assert bytes(row.payload).decode("utf-8") == "żółć😀"
