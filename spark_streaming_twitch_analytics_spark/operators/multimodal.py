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
        "container; wire a Pillow/librosa/ffmpeg-backed decoder here"
    )


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
