"""Posting-list block codec (SURVEY.md A5, §4.2).

Layout replicates the public tantivy/Lucene posting shape: postings for one
(segment, term) are split into blocks of up to 128 docs; within a block,
sorted doc ids are delta-encoded (gap-1, since ids are strictly increasing)
and FOR-bitpacked; term frequencies are varint-encoded (tf-1, since tf>=1);
per-doc fieldnorm ids ride along as raw bytes (Lucene "impacts" style) so
BM25 scoring needs NO join against a doc-meta table. Each block row carries
``max_tf``/``min_norm_id`` — the block-max statistics that feed block-max
WAND pruning (B10).

All encode/decode is numpy-vectorized (bounded byte-width loops only) and
runs inside Arrow-batched pandas UDFs — no per-row Python at the Spark
level (BASELINE.json input_hint).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

BLOCK_SIZE = 128

#: Spark schema (DDL) of one encoded posting block row.
BLOCK_SCHEMA = (
    "segment_id int, term string, block_id int, count int, "
    "first_doc long, last_doc long, max_tf int, sum_tf long, min_norm_id int, "
    "doc_bits int, doc_bytes binary, tf_bytes binary, norm_bytes binary"
)


# ---------------------------------------------------------------- varint ---


def _varint_encode_offsets(vals: np.ndarray) -> tuple[bytes, np.ndarray]:
    """LEB128 varint encode a uint64 array; also return per-value byte
    offsets (len n+1) so callers can slice the stream into sub-ranges —
    this lets a whole posting list be encoded ONCE and split into 128-doc
    blocks by pure byte slicing (one numpy pass instead of one per block).
    """
    if vals.size == 0:
        return b"", np.zeros(1, dtype=np.int64)
    nbytes = np.ones(vals.size, dtype=np.int64)
    v = vals >> np.uint64(7)
    while v.any():
        nbytes += (v > 0).astype(np.int64)
        v = v >> np.uint64(7)
    offsets = np.zeros(vals.size + 1, dtype=np.int64)
    np.cumsum(nbytes, out=offsets[1:])
    out = np.zeros(int(offsets[-1]), dtype=np.uint8)
    starts = offsets[:-1]
    for b in range(int(nbytes.max())):
        mask = nbytes > b
        byte = ((vals[mask] >> np.uint64(7 * b)) & np.uint64(0x7F)).astype(np.uint8)
        cont = ((nbytes[mask] > b + 1).astype(np.uint8)) << 7
        out[starts[mask] + b] = byte | cont
    return out.tobytes(), offsets


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128 varint encode a uint64 array (vectorized, <=10 byte passes)."""
    data, _ = _varint_encode_offsets(np.asarray(values, dtype=np.uint64))
    return data


def varint_decode(data: bytes, count: int | None = None) -> np.ndarray:
    """Decode LEB128 varints -> uint64 array (vectorized)."""
    arr = np.frombuffer(data, dtype=np.uint8)
    if arr.size == 0:
        return np.empty(0, dtype=np.uint64)
    ends = np.nonzero((arr & 0x80) == 0)[0]
    starts = np.concatenate(([0], ends[:-1] + 1))
    vals = np.zeros(ends.size, dtype=np.uint64)
    width = int((ends - starts).max()) + 1
    for j in range(width):
        pos = starts + j
        mask = pos <= ends
        vals[mask] |= (arr[pos[mask]].astype(np.uint64) & np.uint64(0x7F)) << np.uint64(7 * j)
    if count is not None and ends.size != count:
        raise ValueError(f"varint stream held {ends.size} values, expected {count}")
    return vals


# ------------------------------------------------------------ FOR bitpack ---


def for_pack(values: np.ndarray) -> tuple[int, bytes]:
    """Frame-of-reference bitpack: uint array -> (bit_width, bytes)."""
    vals = np.asarray(values, dtype=np.uint64)
    if vals.size == 0:
        return 0, b""
    bits = max(1, int(vals.max()).bit_length())
    shifts = np.arange(bits, dtype=np.uint64)
    bitmat = ((vals[:, None] >> shifts) & np.uint64(1)).astype(np.uint8)
    return bits, np.packbits(bitmat.ravel()).tobytes()


def for_unpack(data: bytes, bits: int, count: int) -> np.ndarray:
    """Inverse of :func:`for_pack`."""
    if count == 0:
        return np.empty(0, dtype=np.uint64)
    bitarr = np.unpackbits(np.frombuffer(data, dtype=np.uint8), count=count * bits)
    bitmat = bitarr.reshape(count, bits).astype(np.uint64)
    shifts = np.arange(bits, dtype=np.uint64)
    return (bitmat << shifts).sum(axis=1).astype(np.uint64)


# ----------------------------------------------------------------- blocks ---


def encode_blocks(
    doc_ids: np.ndarray, tfs: np.ndarray, norm_ids: np.ndarray
) -> list[dict]:
    """Encode one (segment, term) posting list into <=128-doc block rows.

    ``doc_ids`` must be strictly increasing; ``tfs`` >= 1; ``norm_ids``
    uint8. Returns dict rows matching :data:`BLOCK_SCHEMA` (minus
    segment_id/term, which the caller owns).
    """
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    norm_ids = np.asarray(norm_ids, dtype=np.uint8)
    # A duplicate / unsorted doc_id would make (diff-1) wrap to a huge
    # uint64 and silently write a corrupt index — fail loudly instead
    # (duplicate caller-supplied doc_ids are the realistic trigger).
    if doc_ids.size > 1 and not np.all(np.diff(doc_ids) > 0):
        bad = int(np.argmin(np.diff(doc_ids) > 0))
        raise ValueError(
            "encode_blocks requires strictly increasing doc_ids; "
            f"violation near index {bad}: {doc_ids[bad]} -> {doc_ids[bad + 1]} "
            "(duplicate doc_id in the corpus?)"
        )
    # One varint pass over the WHOLE list, sliced per block by byte
    # offsets; gaps likewise from one global diff. Per-block numpy-call
    # overhead was the encode hot spot on high-df terms (thousands of
    # 128-doc blocks per posting list).
    n = doc_ids.size
    tf_stream, tf_off = _varint_encode_offsets((tfs - 1).astype(np.uint64))
    norm_stream = norm_ids.tobytes()
    all_gaps = (np.diff(doc_ids) - 1).astype(np.uint64) if n > 1 else np.empty(0, np.uint64)
    rows = []
    for b, i in enumerate(range(0, n, BLOCK_SIZE)):
        j = min(i + BLOCK_SIZE, n)
        t = tfs[i:j]
        doc_bits, doc_bytes = for_pack(all_gaps[i : j - 1])
        rows.append(
            {
                "block_id": b,
                "count": int(j - i),
                "first_doc": int(doc_ids[i]),
                "last_doc": int(doc_ids[j - 1]),
                "max_tf": int(t.max()),
                "sum_tf": int(t.sum()),
                "min_norm_id": int(norm_ids[i:j].min()),
                "doc_bits": doc_bits,
                "doc_bytes": doc_bytes,
                "tf_bytes": tf_stream[tf_off[i] : tf_off[j]],
                "norm_bytes": norm_stream[i:j],
            }
        )
    return rows


def decode_block(row) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode one block row (dict-like) -> (doc_ids, tfs, norm_ids)."""
    count = int(row["count"])
    first = int(row["first_doc"])
    gaps = for_unpack(row["doc_bytes"], int(row["doc_bits"]), count - 1)
    doc_ids = np.empty(count, dtype=np.int64)
    doc_ids[0] = first
    if count > 1:
        doc_ids[1:] = first + np.cumsum(gaps.astype(np.int64) + 1)
    tfs = (varint_decode(row["tf_bytes"], count) + 1).astype(np.int64)
    norm_ids = np.frombuffer(row["norm_bytes"], dtype=np.uint8).astype(np.int64)
    return doc_ids, tfs, norm_ids


def decode_blocks_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    """Decode a batch of block rows -> flat (segment_id, term, doc_id, tf,
    norm_id) pandas frame. Used inside mapInPandas at query time.

    Vectorized ACROSS blocks: tf varints decode as one concatenated
    stream (self-delimiting), norm bytes as one buffer, and doc ids come
    from a single reset-cumsum over all gap deltas (the per-block reset
    value is first_doc minus the running sum of previous blocks'
    last_doc). Only the FOR bit-unpack stays per block (block-local bit
    widths). The per-block python-dict loop this replaces dominated
    query-time decode (~2x on 3M-posting batches).
    """
    if len(pdf) == 0:
        return pd.DataFrame(
            {
                "segment_id": pd.Series(dtype="int32"),
                "term": pd.Series(dtype="object"),
                "doc_id": pd.Series(dtype="int64"),
                "tf": pd.Series(dtype="int64"),
                "norm_id": pd.Series(dtype="int64"),
            }
        )
    counts = pdf["count"].to_numpy().astype(np.int64)
    total = int(counts.sum())
    tfs = (varint_decode(b"".join(pdf["tf_bytes"]), total) + 1).astype(np.int64)
    norms = np.frombuffer(b"".join(pdf["norm_bytes"]), dtype=np.uint8).astype(np.int64)

    firsts = pdf["first_doc"].to_numpy().astype(np.int64)
    doc_bits = pdf["doc_bits"].to_numpy()
    doc_bytes = pdf["doc_bytes"].to_numpy()
    starts = np.zeros(len(pdf), dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    deltas = np.zeros(total, dtype=np.int64)
    for i in range(len(pdf)):
        c = int(counts[i])
        if c > 1:
            gaps = for_unpack(doc_bytes[i], int(doc_bits[i]), c - 1)
            deltas[starts[i] + 1 : starts[i] + c] = gaps.astype(np.int64) + 1
    # Running cumsum just before block b equals block b-1's last doc id
    # (= first_{b-1} + its interior gap sum), so the reset delta at each
    # block start is first_b - last_{b-1} (0 before the first block).
    interior = np.add.reduceat(deltas, starts)  # deltas[starts] still 0
    lasts = firsts + interior
    deltas[starts] = firsts
    deltas[starts[1:]] -= lasts[:-1]
    doc_ids = np.cumsum(deltas)

    return pd.DataFrame(
        {
            "segment_id": np.repeat(pdf["segment_id"].to_numpy(), counts),
            "term": np.repeat(pdf["term"].to_numpy(), counts),
            "doc_id": doc_ids,
            "tf": tfs,
            "norm_id": norms,
        }
    )
