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
