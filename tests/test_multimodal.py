"""Multimodal plumbing: real schemas/batching, stubbed decode."""

import pytest


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [
        (0, bytes.fromhex("89504e470d0a1a0a") + b"fakepng"),
        (1, bytes.fromhex("ffd8ffe0") + b"fakejpeg"),
        (2, bytes.fromhex("494433") + b"fakemp3"),
        (3, b"plainbytes"),
        (4, None),
    ]
    return spark.createDataFrame(rows, "doc_id long, payload binary")


def test_attach_media_meta(media_df):
    from sparktext.multimodal import attach_media_meta

    rows = {r["doc_id"]: r for r in attach_media_meta(media_df).collect()}
    assert rows[0]["media_type"] == "image/png"
    assert rows[1]["media_type"] == "image/jpeg"
    assert rows[2]["media_type"] == "audio/mp3"
    assert rows[3]["media_type"] == "application/octet-stream"
    assert rows[0]["media_bytes"] == 15
    import hashlib

    assert rows[3]["media_sha"] == hashlib.sha256(b"plainbytes").hexdigest()


def test_extract_features_deterministic(media_df):
    from sparktext.multimodal import extract_features

    a = {r["doc_id"]: r["features"] for r in extract_features(media_df, dim=8).collect()}
    b = {r["doc_id"]: r["features"] for r in extract_features(media_df, dim=8).collect()}
    assert a == b  # content-addressed, reproducible
    assert len(a[0]) == 8
    assert a[0] != a[1]  # different payloads -> different features
    assert all(v == 0.0 for v in a[4])  # null payload -> zero vector


def test_real_decoder_is_stubbed(media_df):
    from sparktext.multimodal import extract_features, real_decoder_stub

    with pytest.raises(Exception) as ei:
        extract_features(media_df, dim=4, decoder=real_decoder_stub).collect()
    assert "NotImplementedError" in str(ei.value) or "media decode" in str(ei.value)


def test_frame_sample(spark):
    from sparktext.multimodal import frame_sample

    df = spark.createDataFrame(
        [(0, 25), (1, 10), (2, 1), (3, 0)], "doc_id long, n_frames int"
    )
    rows = frame_sample(df, every_n=10).collect()
    got = {}
    for r in rows:
        got.setdefault(r["doc_id"], []).append(r["frame_no"])
    assert got[0] == [0, 10, 20]
    assert got[1] == [0]  # sequence(0, 9, 10) -> [0]
    assert got[2] == [0]
    assert 3 not in got


def _ppm_bytes(w, h, rgb):
    import numpy as np

    px = np.zeros((h, w, 3), dtype=np.uint8)
    px[:, :] = rgb
    return b"P6\n# test image\n%d %d\n255\n" % (w, h) + px.tobytes()


def _bmp_bytes(w, h, rgb):
    import numpy as np

    stride = (w * 3 + 3) & ~3
    px = np.zeros((h, stride), dtype=np.uint8)
    row = np.tile(np.array(rgb[::-1], dtype=np.uint8), w)  # BGR
    px[:, : w * 3] = row
    body = px[::-1].tobytes()  # bottom-up
    offset = 14 + 40
    header = (b"BM" + (offset + len(body)).to_bytes(4, "little")
              + b"\x00\x00\x00\x00" + offset.to_bytes(4, "little"))
    info = (
        (40).to_bytes(4, "little") + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True) + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little") + (0).to_bytes(4, "little")
        + len(body).to_bytes(4, "little") + b"\x00" * 16
    )
    return header + info + body


def test_real_image_decode_roundtrip():
    """PPM/BMP decode is REAL: pixels come back exactly."""
    import numpy as np

    from sparktext.multimodal import decode_bmp, decode_ppm

    img = decode_ppm(_ppm_bytes(5, 3, (10, 200, 30)))
    assert img.shape == (3, 5, 3) and (img == (10, 200, 30)).all()
    img2 = decode_bmp(_bmp_bytes(5, 3, (10, 200, 30)))
    assert img2.shape == (3, 5, 3) and (img2 == (10, 200, 30)).all()


def test_extract_features_real_decoder(spark):
    """End-to-end: binary payloads -> real pixel-statistics features."""
    from sparktext.multimodal import attach_media_meta, extract_features, image_decoder

    rows = [(0, bytearray(_ppm_bytes(8, 4, (255, 0, 0)))),
            (1, bytearray(_bmp_bytes(4, 4, (0, 0, 255)))),
            (2, bytearray(b"not an image"))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    meta = {r["doc_id"]: r["media_type"] for r in attach_media_meta(df).collect()}
    assert meta[0] == "image/x-portable-pixmap"
    assert meta[1] == "image/bmp"

    feats = {r["doc_id"]: r["features"]
             for r in extract_features(df, dim=12, decoder=image_decoder).collect()}
    # PPM: pure red -> channel means (255, 0, 0)
    assert feats[0][:3] == [255.0, 0.0, 0.0]
    # BMP: pure blue -> channel means (0, 0, 255)
    assert feats[1][:3] == [0.0, 0.0, 255.0]
    # non-image -> zero vector, row preserved
    assert all(v == 0.0 for v in feats[2])


def test_degenerate_images_degrade_to_zero_vector():
    """Hostile rows (0-height BMP, 0x0 PPM) must yield the zero-vector
    flag, not crash the task (ZeroDivisionError / NaN means)."""
    import numpy as np
    import pandas as pd

    from sparktext.multimodal import image_decoder

    bad_bmp = bytearray(b"BM" + b"\x00" * 60)
    bad_bmp[10:14] = (54).to_bytes(4, "little")
    bad_bmp[18:22] = (4).to_bytes(4, "little")   # w=4
    bad_bmp[22:26] = (0).to_bytes(4, "little")   # h=0
    bad_bmp[28:30] = (24).to_bytes(2, "little")
    bad_ppm = b"P6\n0 0\n255\n"
    truncated = b"P6\n"
    out = image_decoder(pd.Series([bytes(bad_bmp), bad_ppm, truncated, None]), 8)
    assert out.shape == (4, 8)
    assert np.isfinite(out).all()
    assert (out == 0).all()


# ---------------------------- round 4: PNG + WAV real decode ----------


def _encode_png(img, color_type=2, filters=None):
    """Minimal PNG writer for tests: 8-bit, chosen per-row filter types
    (0=None, 1=Sub, 2=Up, 3=Average, 4=Paeth) applied per the spec so
    the decoder's unfilter paths are each exercised."""
    import struct
    import zlib

    import numpy as np

    h, w, ch = img.shape[0], img.shape[1], img.shape[2]
    raw = bytearray()
    prev = np.zeros(w * ch, dtype=np.int32)
    for y in range(h):
        line = img[y].reshape(-1).astype(np.int32)
        f = (filters or [0] * h)[y]
        if f == 0:
            filt = line % 256
        elif f == 1:
            shifted = np.concatenate([np.zeros(ch, dtype=np.int32), line[:-ch]])
            filt = (line - shifted) % 256
        elif f == 2:
            filt = (line - prev) % 256
        elif f in (3, 4):
            # forward filter needs the RECONSTRUCTED previous pixel,
            # which for a lossless encode is just the original line
            filt = np.zeros_like(line)
            for x in range(w * ch):
                a = int(line[x - ch]) if x >= ch else 0
                b = int(prev[x])
                if f == 3:
                    pred = (a + b) >> 1
                else:
                    c = int(prev[x - ch]) if x >= ch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                filt[x] = (int(line[x]) - pred) % 256
        else:
            raise ValueError(f)
        raw.append(f)
        raw.extend(filt.astype(np.uint8).tobytes())
        prev = line
    def chunk(typ, body):
        return (struct.pack(">I", len(body)) + typ + body
                + struct.pack(">I", zlib.crc32(typ + body)))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))


def _encode_wav(samples16, rate, n_ch=1):
    import struct

    data = b"".join(struct.pack("<h", s) for s in samples16)
    fmt = struct.pack("<HHIIHH", 1, n_ch, rate, rate * 2 * n_ch, 2 * n_ch, 16)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_png_decode_matches_pixels_all_filters():
    import numpy as np

    from sparktext.multimodal import decode_png

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(6, 5, 3), dtype=np.uint8)
    for filters in ([0] * 6, [1] * 6, [0, 2, 2, 1, 0, 2],
                    [3] * 6, [4] * 6, [0, 3, 4, 4, 3, 2]):
        data = _encode_png(img, filters=filters)
        out = decode_png(data)
        assert out.shape == (6, 5, 3)
        assert (out == img).all(), filters


def test_png_decode_rgba_and_gray():
    import numpy as np

    from sparktext.multimodal import decode_png

    rgba = np.dstack([np.full((3, 4), v, np.uint8) for v in (10, 20, 30, 255)])
    out = decode_png(_encode_png(rgba, color_type=6))
    assert out.shape == (3, 4, 3) and (out[0, 0] == [10, 20, 30]).all()
    gray = np.full((2, 2, 1), 77, np.uint8)
    out = decode_png(_encode_png(gray, color_type=0))
    assert out.shape == (2, 2, 3) and (out == 77).all()


def test_wav_decode_roundtrip_and_features():
    import numpy as np

    from sparktext.multimodal import _audio_features, decode_wav

    t = np.arange(800)
    sine = (np.sin(2 * np.pi * 440 * t / 8000) * 30000).astype(np.int16)
    samples, rate = decode_wav(_encode_wav(sine, 8000))
    assert rate == 8000 and samples.shape == (800, 1)
    assert np.allclose(samples[:, 0], sine / 32768.0, atol=1e-6)
    feats = _audio_features(samples, rate, 16)
    assert feats.shape == (16,)
    assert feats[1] > 0.5  # RMS of a near-full-scale sine ~ 0.65
    # the 440 Hz tone concentrates energy in ONE spectral band
    assert max(feats[6:10]) > 0.9


def test_media_decoder_mixed_corpus(spark):
    """PNG + WAV + PPM + hostile rows through the Spark mapInPandas
    plumbing with the REAL dispatching decoder."""
    import numpy as np

    from sparktext.multimodal import attach_media_meta, extract_features, media_decoder

    img = np.full((4, 4, 3), 200, np.uint8)
    ppm = b"P6\n4 4\n255\n" + img.tobytes()
    png = _encode_png(img)
    wav = _encode_wav((np.sin(np.arange(400)) * 20000).astype(np.int16), 4000)
    rows = [
        (0, bytearray(png)), (1, bytearray(wav)), (2, bytearray(ppm)),
        (3, bytearray(b"\x89PNG\r\n\x1a\njunk")),  # truncated PNG
        (4, bytearray(b"RIFFxxxxWAVE")),            # truncated WAV
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    meta = {r["doc_id"]: r["media_type"] for r in attach_media_meta(df).collect()}
    assert meta[0] == "image/png" and meta[1] == "audio/wav"
    feats = {
        r["doc_id"]: r["features"]
        for r in extract_features(df, dim=16, decoder=media_decoder).collect()
    }
    # PNG and PPM hold identical pixels -> identical image features
    assert feats[0] == feats[2]
    assert any(v != 0 for v in feats[1])
    assert all(v == 0 for v in feats[3])
    assert all(v == 0 for v in feats[4])
    assert all(v == 0 for v in feats[5])


def test_png_paeth_rgba_and_slow_filter_cap():
    """Paeth/Average on RGBA decodes bit-identically through the
    list-scan path, and a slow-filtered image above the pixel budget is
    refused (worker-stall guard) while a same-size fast-filtered one
    decodes fine."""
    import numpy as np
    import pytest

    from sparktext import multimodal as mm

    rng = np.random.default_rng(11)
    rgba = rng.integers(0, 256, size=(5, 4, 4), dtype=np.uint8)
    out = mm.decode_png(_encode_png(rgba, color_type=6, filters=[4, 3, 4, 3, 4]))
    assert (out == rgba[:, :, :3]).all()

    big = rng.integers(0, 256, size=(3, 40, 3), dtype=np.uint8)
    data_slow = _encode_png(big, filters=[4, 4, 4])
    data_fast = _encode_png(big, filters=[1, 2, 0])
    orig = mm.PNG_MAX_SLOW_FILTER_PIXELS
    mm.PNG_MAX_SLOW_FILTER_PIXELS = 100
    try:
        with pytest.raises(ValueError, match="capped"):
            mm.decode_png(data_slow)
        assert (mm.decode_png(data_fast) == big).all()
    finally:
        mm.PNG_MAX_SLOW_FILTER_PIXELS = orig
