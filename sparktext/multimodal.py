"""Multimodal column handling (driver-mandated extension).

Images/audio/video ride through the pipeline as opaque ``binary`` columns
plus typed metadata — the Spark-side plumbing (schemas, Arrow batch
shapes, partitioning, UDF signatures) is real and tested; the actual
media DECODE is stubbed behind ``decoder=`` (the sandbox has no
image/audio libraries): the default ``deterministic_fake_decoder``
produces a seeded, content-addressed fake so tests are reproducible, and
a real deployment passes e.g. a Pillow/ffmpeg-backed callable with the
same signature.

Operators:
- :func:`attach_media_meta` — parse magic bytes -> (media_type, byte_len,
  content sha) as JVM expressions (no UDF; real, not stubbed).
- :func:`extract_features` — mapInPandas over Arrow batches: decode ->
  fixed-size float feature vector per row. Batch-shaped like a real
  image featurizer (N binary payloads in, N fixed-dim vectors out).
- :func:`frame_sample` — video-style: one row per sampled frame index,
  preserving (doc_id, frame_no) ordering; the fan-out/partitioning
  pattern for frame-level processing.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: magic-byte prefixes -> media type (hex string prefix match)
_MAGIC = [
    ("89504e47", "image/png"),
    ("ffd8ff", "image/jpeg"),
    ("47494638", "image/gif"),
    ("52494646", "audio/wav"),  # RIFF (also webp/avi; fine for a sniffer)
    ("494433", "audio/mp3"),
    ("000000", "video/mp4"),  # ftyp boxes start 00 00 00 xx
]


def attach_media_meta(df: DataFrame, media_col: str = "payload") -> DataFrame:
    """Typed metadata for an opaque binary column — pure JVM expressions."""
    hexpr = F.lower(F.hex(F.substring(F.col(media_col), 1, 4)))
    mt = F.lit("application/octet-stream")
    for prefix, name in reversed(_MAGIC):
        mt = F.when(hexpr.startswith(prefix.lower()), name).otherwise(mt)
    return df.withColumn("media_type", mt).withColumn(
        "media_bytes", F.length(F.col(media_col)).cast("long")
    ).withColumn("media_sha", F.sha2(F.col(media_col), 256))


def deterministic_fake_decoder(payloads: pd.Series, dim: int) -> np.ndarray:
    """STUB decode (no media libs in this container): a content-addressed
    deterministic pseudo-feature matrix (sha256-seeded), shaped exactly
    like a real featurizer's output: (len(payloads), dim) float32."""
    out = np.zeros((len(payloads), dim), dtype=np.float32)
    for i, p in enumerate(payloads):
        if p is None:
            continue
        seed = int.from_bytes(hashlib.sha256(bytes(p)).digest()[:8], "big")
        rng = np.random.default_rng(seed)
        out[i] = rng.standard_normal(dim).astype(np.float32)
    return out


def real_decoder_stub(payloads: pd.Series, dim: int) -> np.ndarray:
    """Where a real image/audio decode would plug in."""
    raise NotImplementedError(
        "media decode requires Pillow/torchaudio/ffmpeg — not available in "
        "this container; pass decoder=deterministic_fake_decoder for tests "
        "or a real callable with signature (pd.Series, int) -> np.ndarray"
    )


def extract_features(
    df: DataFrame,
    media_col: str = "payload",
    id_col: str = "doc_id",
    dim: int = 16,
    decoder: Callable[[pd.Series, int], np.ndarray] = deterministic_fake_decoder,
) -> DataFrame:
    """binary payloads -> array<float> feature vectors (Arrow-batched)."""

    def worker(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = decoder(pdf[media_col], dim)
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy(), "features": list(feats)}
            )

    return df.select(id_col, media_col).mapInPandas(
        worker, schema=f"{id_col} long, features array<float>"
    )


def frame_sample(
    df: DataFrame,
    every_n: int = 10,
    n_frames_col: str = "n_frames",
    id_col: str = "doc_id",
) -> DataFrame:
    """Video frame sampling plumbing: fan one row out to one row per
    sampled frame index (0, every_n, 2*every_n, ... < n_frames), JVM-side
    via sequence+explode. Downstream frame decode would be a mapInPandas
    over (id, frame_no, payload) exactly like :func:`extract_features`."""
    idxs = F.sequence(
        F.lit(0), F.greatest(F.col(n_frames_col) - 1, F.lit(0)), F.lit(every_n)
    )
    return df.withColumn("frame_no", F.explode(idxs)).filter(
        F.col(n_frames_col) > 0
    )
