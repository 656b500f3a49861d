"""Multimodal plumbing: binary payload layout, metadata extraction,
Arrow-batched decode (fake decoder), strict stub boundary."""

from __future__ import annotations

import pytest

from spark_streaming_twitch_analytics_spark.operators import multimodal


def test_attach_and_metadata(spark, docs):
    meta = multimodal.binary_metadata(multimodal.attach_payload(docs.limit(20)))
    rows = meta.collect()
    assert {r["modality"] for r in rows} <= {"image", "audio", "video"}
    for r in rows:
        assert r["n_bytes"] > 0 and len(r["digest"]) == 32


def test_decode_features_deterministic(spark, docs):
    df = multimodal.attach_payload(docs.limit(10))
    a = {r["doc_id"]: r["features"] for r in multimodal.decode_features(df).collect()}
    b = {r["doc_id"]: r["features"] for r in multimodal.decode_features(df).collect()}
    assert a == b
    assert all(len(v) == multimodal.FEATURE_DIM for v in a.values())
    assert all(0.0 <= x <= 1.0 for v in a.values() for x in v)


def test_strict_decoder_marks_real_codec_boundary(spark, docs):
    df = multimodal.attach_payload(docs.limit(2))
    with pytest.raises(Exception) as exc:
        multimodal.decode_features(df, decoder=multimodal.strict_decoder).collect()
    assert "NotImplementedError" in str(exc.value) or "real media decoding" in str(
        exc.value
    )


def test_payload_matches_source_bytes(spark):
    df = spark.createDataFrame([(1, "hello")], "doc_id long, text string")
    row = multimodal.attach_payload(df).select("payload").head()
    assert bytes(row["payload"]) == b"hello"
