"""search_many (batch B2–B5+B9) must equal per-query results exactly."""

import pytest


QUERIES = {
    "q_single": "heavy",
    "q_or": "apple banana",
    "q_must": "+apple +banana",
    "q_mixed": "+grape cherry",
    "q_not": "apple -banana",
    "q_missing": "zzzmissing",
    "q_must_missing": "+zzzmissing apple",
    "q_rare": "unique",
}


def _individual(index, qstr, k):
    from sparktext.query import matched_docs, parse_query
    from sparktext.topk import top_k

    rows = top_k(matched_docs(index, parse_query(qstr)), k).collect()
    return [(r["doc_id"], round(r["score"], 9)) for r in rows]


@pytest.mark.parametrize("k", [3, 12])
def test_batch_equals_individual(micro_index, k):
    from sparktext.query import search_many

    batch = search_many(micro_index, QUERIES, k=k)
    got: dict[str, list] = {qid: [] for qid in QUERIES}
    rows = batch.collect()
    order = {}
    for r in rows:
        got.setdefault(r["query_id"], []).append((r["doc_id"], round(r["score"], 9)))
    for qid in got:
        got[qid].sort(key=lambda t: (-t[1], t[0]))
    for qid, qstr in QUERIES.items():
        assert got.get(qid, []) == _individual(micro_index, qstr, k), qid


def test_batch_empty_queries(micro_index):
    from sparktext.query import search_many

    assert search_many(micro_index, {"a": "zzz", "b": ""}).count() == 0
