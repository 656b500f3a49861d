"""Multimodal plumbing: binary payload layout, metadata extraction,
Arrow-batched decode (fake decoder), strict stub boundary."""

from __future__ import annotations

import numpy as np
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


def _round_half_up(x: float, nd: int) -> float:
    """Spark's F.round is HALF_UP on the decimal rendering; Python's
    round() is half-even — they differ exactly at the .5 boundary."""
    import decimal

    return float(
        decimal.Decimal(repr(x)).quantize(
            decimal.Decimal(1).scaleb(-nd), rounding=decimal.ROUND_HALF_UP
        )
    )


def _closed_form_features(text: str):
    """The payload generator's closed form: payload = utf8(text),
    features = md5(payload)[:8] bytes / 255 (operators/multimodal.py
    fake_decoder). Recomputed here independently so the two rows-only
    registry queries get VALUE checks, not just row counts."""
    import hashlib

    h = hashlib.md5(text.encode("utf-8")).digest()
    return [b / 255.0 for b in h[: multimodal.FEATURE_DIM]]


def test_multimodal_decode_registry_query_self_oracle(spark):
    """Value-level oracle for the `multimodal_decode` registry query
    (rows-only under the driver): expected feat_sum per doc from the
    generator's closed form must hash-match the Spark result exactly."""
    import hashlib

    from spark_streaming_twitch_analytics_spark import registry

    sf = "/root/testdata/sf0.001"
    docs_pd = spark.read.parquet(f"{sf}/documents.parquet").select(
        "doc_id", "text"
    ).toPandas()
    expect = {}
    for doc_id, text in zip(docs_pd["doc_id"], docs_pd["text"]):
        feats = _closed_form_features(text)
        s = 0.0
        for x in feats:  # same fold order as F.aggregate's sequential sum
            s += x
        mod = ["image", "audio", "video"][doc_id % 3]
        expect[int(doc_id)] = (mod, _round_half_up(s, 6))

    got = registry.get("multimodal_decode").fn(spark, sf).collect()
    assert len(got) == len(expect)
    for r in got:
        mod, fsum = expect[r["doc_id"]]
        assert r["modality"] == mod and r["feat_sum"] == fsum, r["doc_id"]

    h_exp = hashlib.md5(str(sorted(expect.items())).encode()).hexdigest()
    h_got = hashlib.md5(
        str(sorted((r["doc_id"], (r["modality"], r["feat_sum"])) for r in got)).encode()
    ).hexdigest()
    assert h_exp == h_got


def test_multimodal_resize_registry_query_self_oracle(spark):
    """Same closed-form value check for `multimodal_resize`: expected =
    np.interp resample of the md5 feature vector to 4 points, rounded 8dp
    (the operator's exact arithmetic, recomputed independently)."""
    import numpy as np

    from spark_streaming_twitch_analytics_spark import registry

    sf = "/root/testdata/sf0.001"
    docs_pd = spark.read.parquet(f"{sf}/documents.parquet").select(
        "doc_id", "text"
    ).toPandas()
    expect = {}
    for doc_id, text in zip(docs_pd["doc_id"], docs_pd["text"]):
        v = np.array(_closed_form_features(text))
        src = np.linspace(0.0, 1.0, num=len(v))
        dst = np.linspace(0.0, 1.0, num=4)
        expect[int(doc_id)] = np.round(np.interp(dst, src, v), 8).tolist()

    got = registry.get("multimodal_resize").fn(spark, sf).collect()
    assert len(got) == len(expect)
    for r in got:
        # the registry query projects resized_sum = round(fold-sum, 6);
        # reproduce the identical sequential fold over the 8dp values
        s = 0.0
        for x in expect[r["doc_id"]]:
            s += x
        assert r["resized_sum"] == _round_half_up(s, 6), r["doc_id"]


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


# ---------------------------------------------------------------------------
# Optional real decoder (Pillow) — same skipif pattern as the protobuf-gated
# transformWithStateInPandas tests (tests/test_stateful.py): passes where the
# dependency exists, skips cleanly in this container.
# ---------------------------------------------------------------------------

_HAS_PILLOW = True
try:  # pragma: no cover - availability probe only
    import PIL  # noqa: F401
except ImportError:
    _HAS_PILLOW = False


@pytest.mark.skipif(not _HAS_PILLOW, reason="Pillow not installed in container")
def test_pillow_decoder_real_image_roundtrip(spark):
    """With Pillow present, pillow_decoder decodes REAL image bytes
    through the same decode_features plumbing as the fake decoder."""
    import io

    from PIL import Image

    buf = io.BytesIO()
    # 8x1 grayscale ramp: decoded features must equal pixel/255 exactly
    Image.frombytes("L", (8, 1), bytes([0, 36, 73, 109, 146, 182, 219, 255])).save(
        buf, format="PNG"
    )
    png = buf.getvalue()
    df = spark.createDataFrame(
        [(1, png, "image")], "doc_id long, payload binary, modality string"
    )
    rows = multimodal.decode_features(
        df, decoder=multimodal.pillow_decoder
    ).collect()
    assert len(rows) == 1
    feats = rows[0]["features"]
    assert len(feats) == multimodal.FEATURE_DIM
    assert abs(feats[0] - 0.0) < 1e-9 and abs(feats[-1] - 1.0) < 1e-9
    assert all(0.0 <= x <= 1.0 for x in feats)


@pytest.mark.skipif(_HAS_PILLOW, reason="only meaningful without Pillow")
def test_pillow_decoder_contract_without_pillow():
    """Without Pillow, pillow_decoder raises the same honest
    NotImplementedError contract as strict_decoder."""
    with pytest.raises(NotImplementedError, match="Pillow"):
        multimodal.pillow_decoder(b"\x89PNG fake")


def test_pillow_skip_contract_is_pinned():
    """Environment contract (VERDICT r7 task 6, retiring the install
    attempts): Pillow is not installable in this container, the vendored
    stdlib PNG/RIFF codecs are the certified executed path, and the
    Pillow pair above is COMPLEMENTARY — exactly one runs in any
    environment. Pinning the skip conditions and reason strings here
    turns any future environment change (Pillow appearing, gates
    edited) into a visible test diff instead of a silent skip-count
    shift."""
    ra = [m for m in test_pillow_decoder_real_image_roundtrip.pytestmark if m.name == "skipif"]
    rb = [m for m in test_pillow_decoder_contract_without_pillow.pytestmark if m.name == "skipif"]
    assert len(ra) == 1 and len(rb) == 1
    assert ra[0].kwargs["reason"] == "Pillow not installed in container"
    assert rb[0].kwargs["reason"] == "only meaningful without Pillow"
    # complementary conditions: exactly one of the pair executes
    assert ra[0].args == (not _HAS_PILLOW,)
    assert rb[0].args == (_HAS_PILLOW,)


# ---------------------------------------------------------------------------
# Vendored stdlib PNG codec: the real-decoder path that runs in EVERY
# environment (no Pillow gate). Wire format is genuine PNG.
# ---------------------------------------------------------------------------


def test_png_codec_roundtrip_exact():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(5, 11), dtype=np.uint8)
    png = multimodal.png_encode_gray(img)
    assert png[:8] == b"\x89PNG\r\n\x1a\n"  # real signature
    back = multimodal.png_decode_gray(png)
    assert back.dtype == np.uint8 and (back == img).all()


def test_png_decoder_handles_all_scanline_filters():
    """Hand-built IDAT exercising filters Sub/Up/Average/Paeth (our
    writer only emits None, so a spec-compliant external PNG is the
    case these paths exist for). Expected values derived by hand from
    the PNG spec's reconstruction functions."""
    import struct
    import zlib

    w = h = 4
    raw = (
        b"\x01" + bytes([10, 10, 10, 10])  # Sub    -> 10 20 30 40
        + b"\x02" + bytes([1, 1, 1, 1])    # Up     -> 11 21 31 41
        + b"\x03" + bytes([5, 5, 5, 5])    # Average-> 10 20 30 40
        + b"\x04" + bytes([3, 3, 3, 3])    # Paeth  -> 13 23 33 43
    )

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    out = multimodal.png_decode_gray(png)
    expected = np.array(
        [
            [10, 20, 30, 40],
            [11, 21, 31, 41],
            [10, 20, 30, 40],
            [13, 23, 33, 43],
        ],
        dtype=np.uint8,
    )
    assert (out == expected).all()


def test_real_image_decoder_ramp_through_decode_features(spark):
    """The REAL-codec path (image_decoder: Pillow or the stdlib PNG
    reader) through the same decode_features plumbing as the fake
    decoder — ungated, so it executes in every environment."""
    ramp = bytes([0, 36, 73, 109, 146, 182, 219, 255])
    png = multimodal.png_encode_gray(
        np.frombuffer(ramp, dtype=np.uint8).reshape(1, -1)
    )
    df = spark.createDataFrame(
        [(1, png, "image")], "doc_id long, payload binary, modality string"
    )
    rows = multimodal.decode_features(df, decoder=multimodal.image_decoder).collect()
    assert len(rows) == 1
    feats = rows[0]["features"]
    assert len(feats) == multimodal.FEATURE_DIM
    assert [round(f * 255) for f in feats] == list(ramp)


def test_png_roundtrip_features_matches_md5_pixels(spark, docs):
    out = {
        r["doc_id"]: (r["n_features"], r["pixel_sum"])
        for r in multimodal.png_roundtrip_features(docs.limit(20)).collect()
    }
    import hashlib

    for r in docs.limit(20).collect():
        pix = hashlib.md5(r["text"].encode()).digest()[: multimodal.FEATURE_DIM]
        assert out[r["doc_id"]] == (multimodal.FEATURE_DIM, sum(pix))


def _encode_png_with_filters(img: np.ndarray, filters: list[int]) -> bytes:
    """Forward-filter a grayscale image with an explicit per-row filter
    type (our writer only emits None; real encoders pick per-row) and
    wrap it in genuine PNG chunks — the adversarial input for the
    decoder's unfilter paths."""
    import struct
    import zlib

    h, w = img.shape
    raw = bytearray()
    prev = np.zeros(w, dtype=np.int64)
    for y in range(h):
        row = img[y].astype(np.int64)
        ft = filters[y % len(filters)]
        raw.append(ft)
        for x in range(w):
            a = int(row[x - 1]) if x else 0
            b = int(prev[x])
            c = int(prev[x - 1]) if x else 0
            if ft == 0:
                s = row[x]
            elif ft == 1:
                s = row[x] - a
            elif ft == 2:
                s = row[x] - b
            elif ft == 3:
                s = row[x] - (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else b if pb <= pc else c
                s = row[x] - pred
            raw.append(int(s) & 0xFF)
        prev = row

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_png_decoder_real_size_mixed_filters():
    """64x64 image with every scanline filter in rotation — exercises the
    vectorized unfilter rows (None/Sub/Up) and the spec-forced sequential
    ones (Average/Paeth) at a realistic size, through both the raw codec
    and the image_decoder dispatch (VERDICT r6 task 4)."""
    rng = np.random.default_rng(64)
    img = rng.integers(0, 256, size=(64, 64), dtype=np.uint8)
    png = _encode_png_with_filters(img, filters=[0, 1, 2, 3, 4])
    back = multimodal.png_decode_gray(png)
    assert back.shape == (64, 64) and (back == img).all()

    feats = multimodal.image_decoder(png)
    assert len(feats) == multimodal.FEATURE_DIM
    # image_decoder (stdlib branch) = column mean -> linear resample -> /255
    row = img.astype(np.float64).mean(axis=0)
    expected = np.interp(
        np.linspace(0.0, 1.0, multimodal.FEATURE_DIM),
        np.linspace(0.0, 1.0, len(row)),
        row,
    ) / 255.0
    try:
        import PIL  # noqa: F401
    except ImportError:
        assert np.allclose(feats, expected)
    else:  # Pillow branch: different resample kernel — near, not bit-equal
        assert np.allclose(feats, expected, atol=0.2)


def test_wav_codec_roundtrip_exact():
    rng = np.random.default_rng(11)
    smp = rng.integers(0, 256, size=97, dtype=np.uint8)
    wav = multimodal.wav_encode_pcm8(smp, rate=44100)
    assert wav[:4] == b"RIFF" and wav[8:12] == b"WAVE"  # real container
    back, rate = multimodal.wav_decode_pcm8(wav)
    assert rate == 44100 and back.dtype == np.uint8 and (back == smp).all()


def test_wav_decoder_rejects_non_mono_or_16bit():
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(b"\x00\x01" * 8)
    with pytest.raises(ValueError, match="mono 8-bit"):
        multimodal.wav_decode_pcm8(buf.getvalue())


def test_audio_decoder_through_decode_features(spark):
    """The REAL audio path (wave-module container) through the same
    decode_features plumbing as the image decoders."""
    ramp = bytes([0, 36, 73, 109, 146, 182, 219, 255])
    wav = multimodal.wav_encode_pcm8(np.frombuffer(ramp, dtype=np.uint8))
    df = spark.createDataFrame(
        [(1, wav, "audio")], "doc_id long, payload binary, modality string"
    )
    rows = multimodal.decode_features(df, decoder=multimodal.audio_decoder).collect()
    assert len(rows) == 1
    feats = rows[0]["features"]
    assert len(feats) == multimodal.FEATURE_DIM
    assert [round(f * 255) for f in feats] == list(ramp)


def test_wav_roundtrip_features_matches_md5_samples(spark, docs):
    import hashlib

    out = {
        r["doc_id"]: (r["n_features"], r["sample_sum"], r["sample_rate"])
        for r in multimodal.wav_roundtrip_features(docs.limit(20)).collect()
    }
    src = {r["doc_id"]: r["text"] for r in docs.limit(20).collect()}
    assert out.keys() == src.keys()
    for doc_id, text in src.items():
        smp = hashlib.md5(text.encode("utf-8")).digest()[8:16]
        assert out[doc_id] == (8, sum(smp), multimodal.WAV_RATE)


def test_audio_frame_features_matches_numpy(spark, docs):
    """Frame features through the REAL WAV codec equal the direct numpy
    reduction over the md5-derived samples (energy/ZCR/peak, centered
    at the PCM8 midpoint)."""
    import hashlib

    out = {
        (r["doc_id"], r["frame_idx"]): (
            r["n_samples"],
            r["energy"],
            r["zero_crossings"],
            r["peak"],
        )
        for r in multimodal.audio_frame_features(docs.limit(20)).collect()
    }
    src = {r["doc_id"]: r["text"] for r in docs.limit(20).collect()}
    assert len(out) == 2 * len(src)  # 8 samples → two 4-sample frames
    for doc_id, text in src.items():
        smp = np.frombuffer(
            hashlib.md5(text.encode("utf-8")).digest()[8:16], dtype=np.uint8
        )
        centered = smp.astype(np.int64) - 128
        for fi in range(2):
            fr = centered[fi * 4 : (fi + 1) * 4]
            nonneg = fr >= 0
            assert out[(doc_id, fi)] == (
                4,
                int((fr * fr).sum()),
                int((nonneg[1:] != nonneg[:-1]).sum()),
                int(np.abs(fr).max()),
            )


def test_audio_frame_features_zcr_convention(spark):
    """Pin the zero-crossing convention: sign = (sample >= 128), crossing
    counted per adjacent pair WITHIN a frame only (no cross-frame pair)."""
    import hashlib

    # find a text whose md5 bytes 8..16 alternate around 128 at the
    # frame boundary — the boundary pair must NOT be counted
    for i in range(10_000):
        t = f"probe-{i}"
        smp = hashlib.md5(t.encode()).digest()[8:16]
        if (smp[3] >= 128) != (smp[4] >= 128):
            break
    else:
        raise AssertionError("no boundary-crossing probe found")
    df = spark.createDataFrame([(1, t)], "doc_id long, text string")
    rows = multimodal.audio_frame_features(df).collect()
    total_zcr = sum(r["zero_crossings"] for r in rows)
    centered = np.frombuffer(smp, dtype=np.uint8).astype(np.int64) - 128
    nonneg = centered >= 0
    full_stream_zcr = int((nonneg[1:] != nonneg[:-1]).sum())
    # the boundary crossing exists in the full stream but not per-frame
    assert total_zcr == full_stream_zcr - 1


def test_dft8_power_matches_numpy_rfft():
    """The naive table-driven DFT must agree with numpy's FFT to within
    float tolerance on arbitrary sample vectors (the table constants and
    summation order are exact; rfft differs only in op order)."""
    rng = np.random.default_rng(5)
    for _ in range(50):
        c = rng.integers(-128, 128, size=8).astype(np.int64)
        mine = multimodal.dft8_power(c)
        ref = np.abs(np.fft.rfft(c)) ** 2
        assert np.allclose(mine, ref, rtol=1e-12, atol=1e-9)


def test_audio_spectrum_features_parseval(spark, docs):
    """Parseval check through the full Spark pass: Σ|X_k|² over the full
    two-sided spectrum equals 8·Σx². Bins 1..3 appear twice (conjugate
    pairs); bins 0 and 4 once."""
    import hashlib

    rows = multimodal.audio_spectrum_features(docs.limit(10)).collect()
    by_doc: dict[int, dict[int, float]] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], {})[r["bin"]] = r["power"]
    src = {r["doc_id"]: r["text"] for r in docs.limit(10).collect()}
    for doc_id, text in src.items():
        smp = np.frombuffer(
            hashlib.md5(text.encode("utf-8")).digest()[8:16], dtype=np.uint8
        ).astype(np.int64) - 128
        p = by_doc[doc_id]
        assert sorted(p) == [0, 1, 2, 3, 4]
        two_sided = p[0] + p[4] + 2 * (p[1] + p[2] + p[3])
        assert abs(two_sided - 8.0 * float((smp * smp).sum())) < 1e-6


def test_image_stats_matches_numpy(spark, docs):
    import hashlib

    out = {
        r["doc_id"]: (r["total_variation"], r["px_min"], r["px_max"])
        for r in multimodal.image_stats_features(docs.limit(20)).collect()
    }
    for r in docs.limit(20).collect():
        pix = np.frombuffer(
            hashlib.md5(r["text"].encode("utf-8")).digest()[:8], dtype=np.uint8
        ).astype(np.int64)
        assert out[r["doc_id"]] == (
            int(np.abs(np.diff(pix)).sum()),
            int(pix.min()),
            int(pix.max()),
        )


def test_image_resize_nearest_neighbor_semantics(spark):
    """4x4 -> 6x6 NN: floor index map replicates rows/cols 0,0,1,2,2,3;
    every output pixel must be an exact source byte routed through the
    REAL PNG encode/decode."""
    import hashlib

    import numpy as np

    df = spark.createDataFrame([(7, "resize me")], "doc_id long, text string")
    row = multimodal.image_resize_features(df).collect()[0]
    src = np.frombuffer(
        hashlib.md5(b"resize me").digest(), dtype=np.uint8
    ).reshape(4, 4).astype(int)
    idx = [0, 0, 1, 2, 2, 3]
    expect = [int(src[r][c]) for r in idx for c in idx]
    # the grid travels as row-major lowercase hex (2 chars / pixel) —
    # the canonicalizer-safe atomic shape the driver contract requires
    assert row["resized_hex"] == "".join(f"{v:02x}" for v in expect)
    assert row["px_sum"] == sum(expect)
    # and a downsample: 4x4 -> 2x2 picks rows/cols 0, 2
    down = multimodal.image_resize_features(df, out_h=2, out_w=2).collect()[0]
    assert down["resized_hex"] == "".join(
        f"{int(src[r][c]):02x}" for r in (0, 2) for c in (0, 2)
    )
