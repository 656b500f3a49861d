"""Multimodal column plumbing (SURVEY §7 phase 4 extension).

Images/audio/video are opaque ``binary`` payloads + typed metadata
columns. The Spark-side contract — schema, Arrow batch shape,
partition-friendly layout — is real and tested; the *decoder* is a
pluggable function because codec libraries aren't in this container
(and at 100 TB you'd swap in a GPU-backed decoder anyway).

- :func:`attach_payload` builds the binary layout from any source column.
- :func:`binary_metadata` extracts metadata with built-ins only (length,
  digest, magic-byte sniff) — oracle-checkable.
- :func:`decode_features` runs a decoder over ``mapInPandas`` with a
  bounded Arrow batch size; the default decoder is a deterministic fake
  (md5-seeded feature vector). ``strict=True`` swaps in the
  NotImplementedError stub to mark the real-codec boundary.
- :func:`sample_frames` is the video path: 1 row → N frame rows
  (mapInPandas fan-out, the batch shape a real ffmpeg frame sampler
  would use); frame digests are deterministic so the fan-out is
  DuckDB-oracle-checkable.
- :func:`resize_features` is decode → fixed-target linear resample
  (the image-resize plumbing: decode once, emit the target-dim vector).
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 8

# magic prefixes for the payload "format" sniff (first bytes of payload)
_MAGIC = {"j": "jpeg_like", "p": "png_like", "w": "wav_like"}


def attach_payload(df: DataFrame, source_col: str = "text") -> DataFrame:
    """Opaque binary payload + declared modality. Payload bytes here are
    the utf-8 of the source column (the container has no media); layout,
    sizes, and hashes behave exactly as real blobs would."""
    return df.withColumn("payload", F.encode(F.col(source_col), "utf-8")).withColumn(
        "modality",
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ),
    )


def binary_metadata(df: DataFrame) -> DataFrame:
    """Metadata over the binary column with built-ins only: byte length,
    md5 digest, first-byte format sniff."""
    first = F.substring(F.col("payload").cast("string"), 1, 1)
    sniff = F.lit("unknown")
    for ch, fmt in _MAGIC.items():
        sniff = F.when(first == ch, F.lit(fmt)).otherwise(sniff)
    return df.select(
        "doc_id",
        "modality",
        F.length("payload").alias("n_bytes"),
        F.md5("payload").alias("digest"),
        sniff.alias("sniffed_format"),
    )


def fake_decoder(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a real image/audio decoder: an
    md5-seeded feature vector. Swap for torchvision/librosa in prod."""
    h = hashlib.md5(payload).digest()
    return np.frombuffer(h[:FEATURE_DIM], dtype=np.uint8).astype(np.float64) / 255.0


def strict_decoder(payload: bytes) -> np.ndarray:
    raise NotImplementedError(
        "real media decoding needs codec libraries not present in this "
        "container; wire a Pillow/librosa/ffmpeg-backed decoder here "
        "(pillow_decoder below is the image-backed one, used when Pillow "
        "is importable)"
    )


def pillow_decoder(payload: bytes) -> np.ndarray:
    """REAL image decode, available when Pillow is importable (optional
    dependency — absent from this container, so its tests skipif; on a
    cluster with Pillow installed it drops straight into
    :func:`decode_features` / :func:`resize_features`). Decodes the
    payload, converts to grayscale, bilinear-resizes to FEATURE_DIM×1,
    and returns the normalized pixel row — the minimal real decode →
    fixed-width-feature contract the fake decoder stands in for."""
    try:
        import io

        from PIL import Image
    except ImportError as exc:  # pragma: no cover - exercised via skipif
        raise NotImplementedError(
            "pillow_decoder requires Pillow (`pip install Pillow` on the "
            "cluster image); this container does not ship it"
        ) from exc
    img = Image.open(io.BytesIO(bytes(payload))).convert("L")
    img = img.resize((FEATURE_DIM, 1), resample=Image.BILINEAR)
    return np.asarray(img, dtype=np.float64).ravel() / 255.0


def decode_features(
    df: DataFrame,
    decoder: Callable[[bytes], np.ndarray] = fake_decoder,
    batch_rows: int = 1024,
) -> DataFrame:
    """Arrow-batched decode: mapInPandas so each task decodes a bounded
    batch (memory-safe for large blobs) and emits a feature vector."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                feats = [decoder(p).tolist() for p in chunk["payload"]]
                yield pd.DataFrame(
                    {
                        "doc_id": chunk["doc_id"].values,
                        "modality": chunk["modality"].values,
                        "features": feats,
                    }
                )

    return df.select("doc_id", "modality", "payload").mapInPandas(
        run, schema="doc_id long, modality string, features array<double>"
    )


def sample_frames(df: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame sampling for video payloads: each ``video`` row fans out to
    ``n_frames`` frame rows; image/audio emit a single frame. A real
    implementation seeks N keyframes with ffmpeg; the deterministic fake
    digests ``payload + b'#' + frame_idx`` so the 1→N batch shape —
    the part Spark owns — is exercised and oracle-checked. mapInPandas
    keeps the fan-out executor-side (no explode of materialized blobs:
    frames are produced from the payload inside the task, which is the
    memory shape you want when one 4K video decodes to many frames)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            mods: list[str] = []
            idxs: list[int] = []
            digs: list[str] = []
            for doc_id, mod, payload in zip(
                pdf["doc_id"], pdf["modality"], pdf["payload"]
            ):
                k = n_frames if mod == "video" else 1
                for i in range(k):
                    ids.append(doc_id)
                    mods.append(mod)
                    idxs.append(i)
                    digs.append(
                        hashlib.md5(
                            bytes(payload) + b"#" + str(i).encode()
                        ).hexdigest()
                    )
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "modality": mods,
                    "frame_idx": pd.array(idxs, dtype="int32"),
                    "frame_digest": digs,
                }
            )

    return df.select("doc_id", "modality", "payload").mapInPandas(
        run,
        schema="doc_id long, modality string, frame_idx int, frame_digest string",
    )


def resize_features(
    df: DataFrame,
    out_dim: int = 4,
    decoder: Callable[[bytes], np.ndarray] = fake_decoder,
) -> DataFrame:
    """Resize plumbing: decode then linearly resample the feature vector
    to ``out_dim`` (stand-in for bilinear image resize — same decode→
    transform→emit batch shape, one Arrow pass, no intermediate blob
    column). Swap ``decoder`` for a Pillow-backed resize in prod."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for payload in pdf["payload"]:
                v = decoder(bytes(payload))
                src = np.linspace(0.0, 1.0, num=len(v))
                dst = np.linspace(0.0, 1.0, num=out_dim)
                out.append(np.round(np.interp(dst, src, v), 8).tolist())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "modality": pdf["modality"].values,
                    "resized": out,
                }
            )

    return df.select("doc_id", "modality", "payload").mapInPandas(
        run, schema="doc_id long, modality string, resized array<double>"
    )
