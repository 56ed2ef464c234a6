"""Independent plain-Python reference implementation used by tests.

Deliberately NOT importing the engine's scoring pipeline — only the
fieldnorm table (which is spec, not pipeline). Micro-corpus docs are
plain space-joined lowercase words, so `.split()` is a valid tokenizer
stand-in there.
"""

from __future__ import annotations

import math
from collections import Counter

from sparktext.fieldnorm import quantize

K1, B = 1.2, 0.75


def build_ref(docs: dict[int, str]):
    tokens = {d: t.split() for d, t in docs.items()}
    doc_len = {d: len(ts) for d, ts in tokens.items()}
    tf = {d: Counter(ts) for d, ts in tokens.items()}
    df = Counter()
    for d, c in tf.items():
        for term in c:
            df[term] += 1
    n = len(docs)
    total = sum(doc_len.values())
    avg = total / n
    return {"tf": tf, "df": df, "n": n, "avg": avg, "doc_len": doc_len}


def bm25(ref, doc: int, term: str) -> float:
    tf = ref["tf"][doc].get(term, 0)
    if tf == 0:
        return 0.0
    df = ref["df"][term]
    idf = math.log(1 + (ref["n"] - df + 0.5) / (df + 0.5))
    dl = float(quantize([ref["doc_len"][doc]])[0])
    return idf * tf * (K1 + 1) / (tf + K1 * (1 - B + B * dl / ref["avg"]))


def score_query(ref, terms: list[str]) -> dict[int, float]:
    out = {}
    for d in ref["tf"]:
        s = sum(bm25(ref, d, t) for t in set(terms))
        if any(t in ref["tf"][d] for t in terms):
            out[d] = s
    return out


def topk(scores: dict[int, float], k: int) -> list[tuple[int, float]]:
    return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
