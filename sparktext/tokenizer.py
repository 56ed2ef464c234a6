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


def tokenize_flat(texts: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """Batch tokenize to flat form: (row_index, token) numpy arrays.

    The index-build hot path: one findall pass, then fully-vectorized
    flattening (np.repeat for row ids, np.concatenate for tokens),
    vectorized byte-length filter and lowercasing via pandas str ops.
    Returns positions implicitly by flat order (stable within a row).
    """
    lists = texts.fillna("").str.findall(TOKEN_RE)
    lens = lists.str.len().to_numpy()
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=object)
    row_idx = np.repeat(np.arange(len(texts), dtype=np.int64), lens)
    flat = np.concatenate([np.asarray(v, dtype=object) for v in lists.to_numpy() if len(v)])
    s = pd.Series(flat, copy=False)
    keep = s.str.encode("utf-8").str.len().to_numpy() < LONG_TOKEN_LIMIT
    if not keep.all():
        row_idx = row_idx[keep]
        s = s[keep]
    return row_idx, s.str.lower().to_numpy()


@dataclass
class TokenizerPipeline:
    """A2 pluggable pipeline: default tokenizer + optional filters.

    ``lowercase`` / ``long_limit`` mirror the default pipeline; extra
    filters: ``stopwords`` (set of tokens to drop, applied after lowercase)
    and ``ascii_fold`` (strip combining marks via NFKD). Scoring parity uses
    the default instance — custom pipelines are for user-defined fields.
    """

    long_limit: int = LONG_TOKEN_LIMIT
    lowercase: bool = True
    stopwords: frozenset[str] = field(default_factory=frozenset)
    ascii_fold: bool = False
    stem: str | None = None  # e.g. "english": Snowball stemming (A2)

    def __post_init__(self):
        self._stemmer = None
        if self.stem:
            try:
                import snowballstemmer

                self._stemmer = snowballstemmer.stemmer(self.stem)
            except ImportError:
                # gate gracefully: fall back to a light English suffix
                # stripper so the pipeline slot still functions offline
                self._stemmer = None

    def _stem_token(self, t: str) -> str:
        if self._stemmer is not None:
            return self._stemmer.stemWord(t)
        for suf in ("ies", "sses", "ing", "ed", "s"):
            if t.endswith(suf) and len(t) > len(suf) + 2:
                return t[: -len(suf)] + ("y" if suf == "ies" else "")
        return t

    def tokenize(self, texts: pd.Series) -> pd.Series:
        toks = texts.fillna("")
        if self.ascii_fold:
            import unicodedata

            toks = toks.map(
                lambda t: "".join(
                    c for c in unicodedata.normalize("NFKD", t) if not unicodedata.combining(c)
                )
            )
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
