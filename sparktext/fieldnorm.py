"""Lossy 1-byte fieldnorm quantization (SURVEY.md A7 / §4.5).

tantivy stores, per document and text field, the token count quantized
through a fixed 256-entry monotone table (``src/fieldnorm/code.rs`` in the
upstream crate — unavailable locally, see SURVEY.md §0); BM25's length
normalization reads the *decoded* (quantized) length, never the true one.
This module is the single source of truth for that table across the whole
engine: the index build (norm_id per doc), the BM25 scorer (decoded length),
and the DuckDB oracle SQL (the table is inlined into the oracle query as a
VALUES list) all derive from :data:`FIELDNORM_TABLE`.

Scheme (documented reconstruction, SURVEY.md §4.5): token counts 0..=40 are
exact; above 40 the representable values grow geometrically — ids come in
runs of 8 whose per-id increment doubles each run (+2, +4, +8, ...), i.e. a
3-bit-mantissa floating-point ladder like Lucene's SmallFloat. The table is
strictly monotone; encode maps a length to the largest table entry <= len;
decode(encode(x)) is idempotent and <= x.

If rank-identity against the real reference ever fails, look HERE first
(SURVEY.md §7 "hard parts"), then the tokenizer, then the idf formula.
"""

from __future__ import annotations

import numpy as np

_EXACT_MAX = 40  # token counts 0..=40 encode losslessly
_RUN = 8  # ids per geometric run above the exact range


def _build_table() -> np.ndarray:
    values = list(range(_EXACT_MAX + 1))
    delta = 2
    last = _EXACT_MAX
    while len(values) < 256:
        for _ in range(_RUN):
            last += delta
            values.append(last)
            if len(values) == 256:
                break
        delta *= 2
    return np.asarray(values, dtype=np.int64)


#: 256 strictly-increasing representable token counts; index == norm_id.
FIELDNORM_TABLE: np.ndarray = _build_table()

MAX_FIELDNORM = int(FIELDNORM_TABLE[-1])


def fieldnorm_to_id(lengths) -> np.ndarray:
    """Encode token counts -> uint8 norm ids (vectorized).

    Largest table entry <= length; lengths beyond the table clamp to 255.
    """
    arr = np.asarray(lengths, dtype=np.int64)
    ids = np.searchsorted(FIELDNORM_TABLE, arr, side="right") - 1
    return np.clip(ids, 0, 255).astype(np.uint8)


def id_to_fieldnorm(ids) -> np.ndarray:
    """Decode uint8 norm ids -> quantized token counts (vectorized)."""
    arr = np.asarray(ids, dtype=np.int64)
    return FIELDNORM_TABLE[arr]


def quantize(lengths) -> np.ndarray:
    """decode(encode(length)) — the length BM25 actually sees."""
    return id_to_fieldnorm(fieldnorm_to_id(lengths))


def norm_values_sql(alias: str = "norm_vals") -> str:
    """DuckDB CTE body inlining the table, for oracle SQL parity.

    Returns e.g. ``norm_vals(v) AS (VALUES (0),(1),...)`` — the oracle
    computes the quantized length as ``(SELECT max(v) FROM norm_vals
    WHERE v <= doc_len)`` which is exactly decode(encode(doc_len)).
    """
    vals = ",".join(f"({int(v)})" for v in FIELDNORM_TABLE)
    return f"{alias}(v) AS (VALUES {vals})"
