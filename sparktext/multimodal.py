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
    ("50360a", "image/x-portable-pixmap"),  # "P6\n"
    ("503620", "image/x-portable-pixmap"),  # "P6 "
    ("424d", "image/bmp"),
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
    """Where a compressed-format (JPEG/PNG/audio) decode would plug in."""
    raise NotImplementedError(
        "JPEG/PNG/audio decode requires Pillow/torchaudio/ffmpeg — not "
        "available in this container; uncompressed images decode for real "
        "via image_decoder (PPM/BMP, pure numpy); pass "
        "decoder=deterministic_fake_decoder for other formats in tests"
    )


# ----------------------------- real decode: uncompressed image formats ----
# PPM (P6) and 24-bit BMP are fully specified public formats decodable
# with nothing but numpy — so this part of the multimodal path is REAL
# end-to-end, not a stub: bytes -> (H, W, 3) pixels -> feature vector.


def decode_ppm(data: bytes) -> np.ndarray:
    """P6 binary PPM -> (H, W, 3) uint8. Minimal spec parser: header is
    'P6', whitespace-separated width/height/maxval, '#' comments."""
    if not data.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":  # comment to EOL
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    if w <= 0 or h <= 0:
        # 0-pixel images would NaN the channel means and h=0 would
        # ZeroDivisionError the aspect ratio downstream — one hostile row
        # must degrade to the zero-vector flag, not crash the Spark task.
        raise ValueError(f"degenerate PPM dimensions {w}x{h}")
    px = np.frombuffer(data, dtype=np.uint8, count=w * h * 3, offset=pos)
    return px.reshape(h, w, 3)


def decode_bmp(data: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP (BITMAPINFOHEADER) -> (H, W, 3) uint8 RGB.
    Rows are 4-byte padded and stored bottom-up; pixels are BGR."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    offset = int.from_bytes(data[10:14], "little")
    w = int.from_bytes(data[18:22], "little", signed=True)
    h = int.from_bytes(data[22:26], "little", signed=True)
    bpp = int.from_bytes(data[28:30], "little")
    compression = int.from_bytes(data[30:34], "little")
    if bpp != 24 or compression != 0:
        raise ValueError(f"only uncompressed 24-bit BMP supported (bpp={bpp})")
    bottom_up = h > 0
    h = abs(h)
    if w <= 0 or h == 0:
        raise ValueError(f"degenerate BMP dimensions {w}x{h}")
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=offset)
    img = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        img = img[::-1]
    return img[:, :, ::-1]  # BGR -> RGB


def _image_features(img: np.ndarray, dim: int) -> np.ndarray:
    """Real, deterministic image features: per-channel mean/std, log-area,
    aspect ratio, and a 2x2 grayscale grid — padded/truncated to dim."""
    f = np.asarray(img, dtype=np.float64)
    h, w = f.shape[0], f.shape[1]
    gray = f.mean(axis=2)
    grid = [
        gray[: h // 2 or 1, : w // 2 or 1].mean(),
        gray[: h // 2 or 1, w // 2 :].mean() if w > 1 else gray.mean(),
        gray[h // 2 :, : w // 2 or 1].mean() if h > 1 else gray.mean(),
        gray[h // 2 :, w // 2 :].mean() if h > 1 and w > 1 else gray.mean(),
    ]
    feats = np.array(
        [*f.mean(axis=(0, 1)), *f.std(axis=(0, 1)),
         np.log1p(h * w), w / h, *grid],
        dtype=np.float32,
    )
    if feats.size >= dim:
        return feats[:dim]
    return np.pad(feats, (0, dim - feats.size))


def image_decoder(payloads: pd.Series, dim: int) -> np.ndarray:
    """REAL decoder for uncompressed images (PPM P6 / 24-bit BMP): decode
    pixels with numpy and compute image-statistics features. Rows that
    are not decodable images yield a zero vector (kept, flagged by the
    all-zero pattern, so a mixed corpus still processes end-to-end)."""
    out = np.zeros((len(payloads), dim), dtype=np.float32)
    for i, p in enumerate(payloads):
        if p is None:
            continue
        b = bytes(p)
        try:
            if b.startswith(b"P6"):
                out[i] = _image_features(decode_ppm(b), dim)
            elif b.startswith(b"BM"):
                out[i] = _image_features(decode_bmp(b), dim)
        except (ValueError, IndexError, OverflowError, ZeroDivisionError):
            # Any malformed payload degrades to the zero-vector flag —
            # a hostile row must never crash the whole Spark task.
            pass
    return out


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
