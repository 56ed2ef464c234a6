import numpy as np
import pandas as pd
import pytest

from sparktext import codec

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    HAVE_HYPOTHESIS = False

rng = np.random.default_rng(42)


def test_varint_roundtrip_fixed():
    vals = np.array([0, 1, 127, 128, 300, 2**21, 2**35, 2**63 - 1], dtype=np.uint64)
    assert (codec.varint_decode(codec.varint_encode(vals), len(vals)) == vals).all()


def test_varint_roundtrip_random():
    for _ in range(20):
        n = int(rng.integers(0, 500))
        vals = rng.integers(0, 2**40, size=n).astype(np.uint64)
        got = codec.varint_decode(codec.varint_encode(vals))
        assert (got == vals).all()


def test_for_pack_roundtrip():
    for maxv in [1, 2, 7, 255, 2**16, 2**31]:
        vals = rng.integers(0, maxv, size=257).astype(np.uint64)
        bits, data = codec.for_pack(vals)
        got = codec.for_unpack(data, bits, len(vals))
        assert (got == vals).all()


def test_for_pack_empty_and_zero():
    bits, data = codec.for_pack(np.array([], dtype=np.uint64))
    assert codec.for_unpack(data, bits, 0).size == 0
    bits, data = codec.for_pack(np.array([0, 0, 0], dtype=np.uint64))
    assert (codec.for_unpack(data, bits, 3) == 0).all()


if HAVE_HYPOTHESIS:

    @settings(max_examples=50, deadline=None)
    @given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=300))
    def test_varint_roundtrip_property(vals):
        arr = np.array(vals, dtype=np.uint64)
        assert (codec.varint_decode(codec.varint_encode(arr)) == arr).all()


def _roundtrip_blocks(n_docs, max_gap=1000, max_tf=30):
    gaps = rng.integers(1, max_gap, size=n_docs)
    doc_ids = np.cumsum(gaps).astype(np.int64)
    tfs = rng.integers(1, max_tf, size=n_docs).astype(np.int64)
    norms = rng.integers(0, 256, size=n_docs).astype(np.uint8)
    rows = codec.encode_blocks(doc_ids, tfs, norms)
    assert all(r["count"] <= codec.BLOCK_SIZE for r in rows)
    d_all, t_all, n_all = [], [], []
    for r in rows:
        d, t, n = codec.decode_block(r)
        d_all.append(d)
        t_all.append(t)
        n_all.append(n)
    assert (np.concatenate(d_all) == doc_ids).all()
    assert (np.concatenate(t_all) == tfs).all()
    assert (np.concatenate(n_all) == norms).all()
    return rows


def test_block_roundtrip_sizes():
    for n in [1, 2, 127, 128, 129, 500, 1024]:
        _roundtrip_blocks(n)


def test_block_stats():
    doc_ids = np.array([5, 9, 10, 300], dtype=np.int64)
    tfs = np.array([1, 7, 2, 3], dtype=np.int64)
    norms = np.array([4, 2, 9, 200], dtype=np.uint8)
    (row,) = codec.encode_blocks(doc_ids, tfs, norms)
    assert row["first_doc"] == 5 and row["last_doc"] == 300
    assert row["max_tf"] == 7 and row["sum_tf"] == 13
    assert row["min_norm_id"] == 2 and row["count"] == 4


def test_decode_blocks_pdf():
    rows = _roundtrip_blocks(300)
    pdf = pd.DataFrame(rows)
    pdf["segment_id"] = 3
    pdf["term"] = "apple"
    flat = codec.decode_blocks_pdf(pdf)
    assert len(flat) == 300
    assert (flat["segment_id"] == 3).all()
    assert (flat["term"] == "apple").all()
    assert flat["doc_id"].is_monotonic_increasing


def test_decode_blocks_pdf_property():
    """Batch decode (vectorized across blocks) == per-block decode for
    randomized multi-term batches in arbitrary row order."""
    import numpy as np
    import pandas as pd

    from sparktext import codec

    rng = np.random.default_rng(42)
    rows = []
    for t in range(12):
        n = int(rng.integers(1, 400))
        ids = np.unique(rng.integers(0, 10_000_000, size=n).astype(np.int64))
        tfs = rng.integers(1, 1000, size=ids.size).astype(np.int64)
        nms = rng.integers(0, 256, size=ids.size).astype(np.uint8)
        for r in codec.encode_blocks(ids, tfs, nms):
            r["segment_id"] = t % 3
            r["term"] = f"t{t}"
            rows.append(r)
    pdf = pd.DataFrame(rows).sample(frac=1.0, random_state=7).reset_index(drop=True)
    out = codec.decode_blocks_pdf(pdf.drop(columns=["last_doc"]))
    i = 0
    for row in pdf.to_dict("records"):
        d, tf, nm = codec.decode_block(row)
        c = row["count"]
        seg = out.iloc[i : i + c]
        assert (seg["doc_id"].to_numpy() == d).all()
        assert (seg["tf"].to_numpy() == tf).all()
        assert (seg["norm_id"].to_numpy() == nm).all()
        assert (seg["term"] == row["term"]).all()
        i += c
    assert i == len(out)


def test_empty_query_and_unknown_terms(spark):
    from tests.conftest import MICRO_DOCS, MICRO_SCHEMA

    from sparktext.build import build_index
    from sparktext.query import matched_docs, parse_query

    corpus = spark.createDataFrame(list(MICRO_DOCS), MICRO_SCHEMA)
    idx = build_index(spark, corpus, num_segments=2)
    assert matched_docs(idx, parse_query("")).count() == 0
    assert matched_docs(idx, parse_query("zzznotaword")).count() == 0
    assert matched_docs(idx, parse_query("+zzznotaword apple")).count() == 0
    # must_not of an unknown term is a no-op, not an error
    assert matched_docs(idx, parse_query("apple -zzznotaword")).count() > 0
