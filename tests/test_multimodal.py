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
