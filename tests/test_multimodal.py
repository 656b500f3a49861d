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


def test_frame_sample_fan_out(spark, docs):
    df = multimodal.attach_payload(docs.limit(30))
    frames = multimodal.sample_frames(df, n_frames=4).collect()
    by_doc: dict[int, list] = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, rows in by_doc.items():
        expect = 4 if rows[0]["modality"] == "video" else 1
        assert len(rows) == expect
        assert sorted(r["frame_idx"] for r in rows) == list(range(expect))
        assert len({r["frame_digest"] for r in rows}) == expect


def test_frame_digest_deterministic(spark):
    import hashlib

    df = spark.createDataFrame([(2, "clip")], "doc_id long, text string")  # 2%3→video
    rows = multimodal.sample_frames(multimodal.attach_payload(df), n_frames=2).collect()
    assert rows[0]["frame_digest"] == hashlib.md5(b"clip#0").hexdigest()
    assert rows[1]["frame_digest"] == hashlib.md5(b"clip#1").hexdigest()


def test_resize_features_dim_and_determinism(spark, docs):
    df = multimodal.attach_payload(docs.limit(10))
    a = {r["doc_id"]: r["resized"] for r in multimodal.resize_features(df, 4).collect()}
    b = {r["doc_id"]: r["resized"] for r in multimodal.resize_features(df, 4).collect()}
    assert a == b
    assert all(len(v) == 4 for v in a.values())
    # endpoints of the resample equal the endpoints of the decoded vector
    full = {r["doc_id"]: r["features"] for r in multimodal.decode_features(df).collect()}
    for k, v in a.items():
        assert abs(v[0] - full[k][0]) < 1e-6 and abs(v[-1] - full[k][-1]) < 1e-6
