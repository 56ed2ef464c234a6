"""Vectorized tokenizer pipeline (SURVEY.md A1/A2).

Replicates tantivy's *default* analyzer semantics (public behavior of
``SimpleTokenizer -> RemoveLongFilter(40) -> LowerCaser``):

1. split on every non-alphanumeric codepoint (Rust ``char::is_alphanumeric``;
   note: underscore is NOT alphanumeric, unlike regex ``\\w``),
2. remove tokens whose UTF-8 byte length is >= 40,
3. lowercase.

Order matters: lowercasing happens AFTER splitting (lowercasing can change
codepoint classes, e.g. 'İ' -> 'i' + combining dot). Everything here is
pandas/numpy batch work — no Spark-level per-row Python (BASELINE.json
input_hint).

Optional filters (A2) are pluggable via ``TokenizerPipeline``; the default
pipeline is the one BM25 scoring parity depends on.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import numpy as np
import pandas as pd

# Python re's \w == [letters, digits, underscore, some marks]; strip the
# underscore to match Rust char::is_alphanumeric. Unicode-aware by default.
TOKEN_RE = re.compile(r"[^\W_]+", re.UNICODE)

#: RemoveLongFilter limit: tokens with utf-8 byte length >= this are dropped.
LONG_TOKEN_LIMIT = 40

# A small multilingual stopword set for the optional StopWordFilter (A2).
ENGLISH_STOPWORDS = frozenset(
    "a an and are as at be but by for if in into is it no not of on or such "
    "that the their then there these they this to was will with".split()
)


def tokenize_text(text: str) -> list[str]:
    """Single-string tokenize (tests / query parsing)."""
    toks = TOKEN_RE.findall(text or "")
    return [t.lower() for t in toks if len(t.encode("utf-8")) < LONG_TOKEN_LIMIT]


def tokenize_series(texts: pd.Series) -> pd.Series:
    """Batch tokenize: Series[str] -> Series[list[str]] (default pipeline)."""
    toks = texts.fillna("").str.findall(TOKEN_RE)
    # Long-token removal + lowercase, applied list-wise. The corpus hot path
    # (build.py) uses tokenize_flat instead, which avoids per-list work.
    return toks.map(
        lambda ts: [t.lower() for t in ts if len(t.encode("utf-8")) < LONG_TOKEN_LIMIT]
    )


def _flat_ascii(texts: pd.Series, orig_idx: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """ASCII fast path. For pure-ASCII text, lowercasing at the DOC level
    is bit-identical to token-level lowercasing (ASCII case mapping never
    changes `\\w`-class membership or length), and byte length == char
    length, so the 40-byte filter becomes a cheap char-length filter —
    this skips the per-token utf-8 encode that dominates the slow path
    (~25% of total build CPU on an ASCII corpus)."""
    lists = texts.str.lower().str.findall(TOKEN_RE).to_numpy()
    lens = np.fromiter(map(len, lists), dtype=np.int64, count=len(lists))
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=object)
    row_idx = np.repeat(orig_idx, lens)
    flat = np.concatenate([np.asarray(v, dtype=object) for v in lists if len(v)])
    tlens = np.fromiter(map(len, flat), dtype=np.int64, count=total)
    keep = tlens < LONG_TOKEN_LIMIT
    if not keep.all():
        row_idx = row_idx[keep]
        flat = flat[keep]
    return row_idx, flat


def _flat_unicode(texts: pd.Series, orig_idx: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Exact tantivy order: split first, byte-length filter, THEN lower."""
    lists = texts.str.findall(TOKEN_RE).to_numpy()
    lens = np.fromiter(map(len, lists), dtype=np.int64, count=len(lists))
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=object)
    row_idx = np.repeat(orig_idx, lens)
    flat = np.concatenate([np.asarray(v, dtype=object) for v in lists if len(v)])
    s = pd.Series(flat, copy=False)
    keep = s.str.encode("utf-8").str.len().to_numpy() < LONG_TOKEN_LIMIT
    if not keep.all():
        row_idx = row_idx[keep]
        s = s[keep]
    return row_idx, s.str.lower().to_numpy()


def tokenize_flat(texts: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """Batch tokenize to flat form: (row_index, token) numpy arrays.

    The index-build hot path: one findall pass, then fully-vectorized
    flattening (np.repeat for row ids, np.concatenate for tokens).
    Pure-ASCII rows take :func:`_flat_ascii` (semantically identical,
    much cheaper); other rows take the exact split→filter→lower order
    (lowercasing can change codepoint classes, e.g. 'İ'). Mixed batches
    are stitched back into row order, so callers see one stable stream.
    """
    t = texts.fillna("")
    is_ascii = np.fromiter(map(str.isascii, t.to_numpy()), dtype=bool, count=len(t))
    all_idx = np.arange(len(t), dtype=np.int64)
    if is_ascii.all():
        return _flat_ascii(t, all_idx)
    if not is_ascii.any():
        return _flat_unicode(t, all_idx)
    ri_a, tok_a = _flat_ascii(t[is_ascii], all_idx[is_ascii])
    ri_u, tok_u = _flat_unicode(t[~is_ascii], all_idx[~is_ascii])
    row_idx = np.concatenate([ri_a, ri_u])
    toks = np.concatenate([tok_a, tok_u])
    order = np.argsort(row_idx, kind="stable")  # restore row order
    return row_idx[order], toks[order]


def ngram_tokens(
    text: str, min_gram: int, max_gram: int, prefix_only: bool = False
) -> list[str]:
    """Character n-grams of the input, per tantivy's documented
    NgramTokenizer behavior: for each start position, every gram length
    in [min_gram, max_gram] that fits — 'hello' with (2, 3) yields
    he, hel, el, ell, ll, llo, lo; ``prefix_only`` keeps start=0 only
    (edge-gram, the autocomplete shape)."""
    if min_gram < 1 or max_gram < min_gram:
        raise ValueError("need 1 <= min_gram <= max_gram")
    text = text or ""
    n = len(text)
    starts = (0,) if prefix_only else range(n)
    return [
        text[s : s + ln]
        for s in starts
        for ln in range(min_gram, max_gram + 1)
        if s + ln <= n
    ]


def facet_tokens(path: str) -> list[str]:
    """tantivy FacetTokenizer: a facet path emits every ancestor prefix —
    '/lang/rust' -> ['/lang', '/lang/rust'] — so an ordinary inverted
    index over these tokens answers subtree queries by exact term match.
    The Spark aggregation twin is
    :func:`sparktext.aggs.facet_prefixes_col` (same prefixes, column
    expression)."""
    parts = [p for p in (path or "").strip("/").split("/") if p]
    return ["/" + "/".join(parts[: i + 1]) for i in range(len(parts))]


#: RE2 split pattern for the Arrow ASCII path: complement of the (ascii,
#: lowered) token class. Equivalence with TOKEN_RE on pure-ASCII text:
#: Python's [^\W_] over ASCII is exactly [a-zA-Z0-9]; after doc-level
#: lowercase (safe for ASCII, see _flat_ascii) tokens are maximal
#: [a-z0-9]+ runs == the fields left by splitting on [^a-z0-9]+ runs.
_ASCII_SPLIT_RE = "[^a-z0-9]+"


def tokenize_flat_arrow(texts: pd.Series):
    """Batch tokenize to (row_idx: np.int64 array, tokens: pa.StringArray).

    The build hot path's hot path: on pure-ASCII batches every step runs
    in Arrow C++ (utf8_lower -> split_pattern_regex -> list_flatten ->
    length filter) — NO Python token objects are ever materialized, and
    the returned Arrow buffer is ~6x smaller than an object array of the
    same tokens (the object path's DRAM traffic is what capped build
    scaling at 8->32 cores). Non-ASCII rows take the exact
    split→bytefilter→lower order via :func:`_flat_unicode` and are
    stitched back in row order, so output equals ``tokenize_flat`` with
    the strings living in one Arrow array.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    t = texts.fillna("")
    vals = t.to_numpy()
    is_ascii = np.fromiter(map(str.isascii, vals), dtype=bool, count=len(t))
    all_idx = np.arange(len(t), dtype=np.int64)
    outs: list[tuple[np.ndarray, pa.Array]] = []
    if is_ascii.any():
        sub = vals if is_ascii.all() else vals[is_ascii]
        arr = pa.array(sub, type=pa.string())
        sp = pc.split_pattern_regex(pc.utf8_lower(arr), _ASCII_SPLIT_RE)
        lens = pc.list_value_length(sp).to_numpy(zero_copy_only=False)
        ridx = np.repeat(all_idx[is_ascii], lens)
        flat = pc.list_flatten(sp)
        # splitting yields empty fields at the edges; drop those plus
        # over-long tokens in one mask (ASCII: bytes == chars).
        fl = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
        keep = (fl > 0) & (fl < LONG_TOKEN_LIMIT)
        if not keep.all():
            ridx = ridx[keep]
            flat = flat.filter(pa.array(keep))
        outs.append((ridx, flat))
    if not is_ascii.all():
        ri_u, tok_u = _flat_unicode(t[~is_ascii], all_idx[~is_ascii])
        outs.append((ri_u, pa.array(tok_u, type=pa.string())))
    if not outs:  # empty batch
        return np.empty(0, dtype=np.int64), pa.array([], type=pa.string())
    if len(outs) == 1:
        return outs[0]
    row_idx = np.concatenate([o[0] for o in outs])
    toks = pa.concat_arrays([o[1] for o in outs])
    order = np.argsort(row_idx, kind="stable")  # restore row order
    return row_idx[order], toks.take(pa.array(order))


@dataclass
class TokenizerPipeline:
    """A2 pluggable pipeline: default tokenizer + optional filters.

    ``lowercase`` / ``long_limit`` mirror the default pipeline; extra
    filters: ``stopwords`` (set of tokens to drop, applied after lowercase)
    and ``ascii_fold`` (strip combining marks via NFKD). Scoring parity uses
    the default instance — custom pipelines are for user-defined fields.

    ``ngram=(min, max)`` swaps the word tokenizer for the character
    NgramTokenizer (tantivy A2): grams are emitted from the RAW text (no
    word split), then the filter chain applies; ``ngram_prefix_only``
    keeps edge-grams only.
    """

    long_limit: int = LONG_TOKEN_LIMIT
    lowercase: bool = True
    stopwords: frozenset[str] = field(default_factory=frozenset)
    ascii_fold: bool = False
    stem: str | None = None  # e.g. "english": Snowball stemming (A2)
    ngram: tuple[int, int] | None = None
    ngram_prefix_only: bool = False

    def __post_init__(self):
        self._stemmer = None
        if self.stem:
            try:
                import snowballstemmer

                self._stemmer = snowballstemmer.stemmer(self.stem).stemWord
            except ImportError:
                if self.stem != "english":
                    raise ValueError(
                        f"stem={self.stem!r} needs the snowballstemmer "
                        "package; only 'english' has a built-in "
                        "implementation (sparktext.porter2)"
                    )
                # Built-in Porter2 (the Snowball English algorithm,
                # implemented from the published spec) — deterministic
                # output with zero environment dependence.
                from sparktext.porter2 import stem as _p2

                self._stemmer = _p2

    def _stem_token(self, t: str) -> str:
        return self._stemmer(t) if self._stemmer is not None else t

    def tokenize(self, texts: pd.Series) -> pd.Series:
        toks = texts.fillna("")
        if self.ascii_fold:
            import unicodedata

            toks = toks.map(
                lambda t: "".join(
                    c for c in unicodedata.normalize("NFKD", t) if not unicodedata.combining(c)
                )
            )
        if self.ngram is not None:
            mn, mx = self.ngram
            lists = toks.map(
                lambda t: ngram_tokens(t, mn, mx, self.ngram_prefix_only)
            )
        else:
            lists = toks.str.findall(TOKEN_RE)

        def _post(ts: list[str]) -> list[str]:
            out = []
            for t in ts:
                if len(t.encode("utf-8")) >= self.long_limit:
                    continue
                if self.lowercase:
                    t = t.lower()
                if t in self.stopwords:
                    continue
                if self.stem:
                    t = self._stem_token(t)
                out.append(t)
            return out

        return lists.map(_post)
