"""End-to-end: index build, term dict, sha invariant, BM25 search,
boolean queries, top-k tie-breaks — against the reference_impl."""

import hashlib

import pytest

from tests.conftest import MICRO_DOCS
from tests.reference_impl import build_ref, score_query, topk

DOCS = {d[0]: d[5] for d in MICRO_DOCS}
REF = build_ref(DOCS)


@pytest.fixture(scope="module")
def ref():
    return REF


def test_term_dict(micro_index, ref):
    rows = {r["term"]: r for r in micro_index.term_dict.collect()}
    assert set(rows) == set(ref["df"])
    for term, r in rows.items():
        assert r["doc_freq"] == ref["df"][term], term
        assert r["total_tf"] == sum(c[term] for c in ref["tf"].values()), term


def test_stats(micro_index, ref):
    assert micro_index.stats.num_docs == ref["n"]
    assert micro_index.stats.total_tokens == sum(ref["doc_len"].values())


def test_doc_meta_and_sha_invariant(micro_index):
    rows = {r["doc_id"]: r for r in micro_index.doc_meta.collect()}
    assert len(rows) == len(DOCS)
    for doc_id, content in DOCS.items():
        r = rows[doc_id]
        assert r["doc_len"] == len(content.split())
        assert r["sha"] == hashlib.sha256(content.encode()).hexdigest()


def test_postings_blocks_sorted(micro_index):
    blocks = micro_index.postings.collect()
    seen = {}
    for b in blocks:
        key = (b["segment_id"], b["term"])
        assert b["count"] >= 1
        assert b["first_doc"] <= b["last_doc"]
        seen.setdefault(key, []).append((b["block_id"], b["first_doc"], b["last_doc"]))
    for key, bs in seen.items():
        bs.sort()
        for (b1, _, l1), (b2, f2, _) in zip(bs, bs[1:]):
            assert l1 < f2  # blocks disjoint, increasing


def _search(index, qstr, k=12):
    from sparktext.query import matched_docs, parse_query
    from sparktext.topk import top_k

    hits = top_k(matched_docs(index, parse_query(qstr)), k)
    return [(r["doc_id"], r["score"]) for r in hits.collect()]


def test_single_term_scores(micro_index, ref):
    for term in ["apple", "heavy", "unique", "grape"]:
        got = _search(micro_index, term)
        exp = topk(score_query(ref, [term]), 12)
        assert [d for d, _ in got] == [d for d, _ in exp], term
        for (gd, gs), (ed, es) in zip(got, exp):
            assert gs == pytest.approx(es, abs=1e-9), (term, gd)


def test_or_query(micro_index, ref):
    got = _search(micro_index, "apple banana")
    exp = topk(score_query(ref, ["apple", "banana"]), 12)
    assert [d for d, _ in got] == [d for d, _ in exp]
    for (gd, gs), (ed, es) in zip(got, exp):
        assert gs == pytest.approx(es, abs=1e-9)


def test_must_query(micro_index, ref):
    got = _search(micro_index, "+apple +banana")
    expected_docs = {d for d in DOCS if "apple" in DOCS[d].split() and "banana" in DOCS[d].split()}
    assert {d for d, _ in got} == expected_docs
    scores = score_query(ref, ["apple", "banana"])
    for d, s in got:
        assert s == pytest.approx(scores[d], abs=1e-9)


def test_must_with_should(micro_index):
    # +grape cherry: all docs with grape; cherry adds score only.
    got = _search(micro_index, "+grape cherry")
    expected_docs = {d for d in DOCS if "grape" in DOCS[d].split()}
    assert {d for d, _ in got} == expected_docs


def test_must_not(micro_index):
    got = _search(micro_index, "apple -banana")
    exp_docs = {
        d for d in DOCS
        if "apple" in DOCS[d].split() and "banana" not in DOCS[d].split()
    }
    assert {d for d, _ in got} == exp_docs


def test_missing_term(micro_index):
    assert _search(micro_index, "zzzmissing") == []
    assert _search(micro_index, "+zzzmissing apple") == []
    # must_not of a missing term is a no-op
    got = _search(micro_index, "apple -zzzmissing")
    assert {d for d, _ in got} == {d for d in DOCS if "apple" in DOCS[d].split()}


def test_tie_break_by_doc_id(micro_index):
    got = _search(micro_index, "egg")
    # docs 4 and 11... find analytic ties: same tf, same quantized len
    scores = {}
    for d, s in got:
        scores.setdefault(round(s, 9), []).append(d)
    for same in scores.values():
        assert same == sorted(same)


def test_hits_materialization(micro_index):
    from sparktext.query import matched_docs, parse_query
    from sparktext.topk import materialize_hits, top_k

    hits = top_k(matched_docs(micro_index, parse_query("unique")), 5)
    rows = materialize_hits(micro_index, hits).collect()
    assert len(rows) == 1
    assert rows[0]["path"] == "c/0.py"


def test_build_without_doc_ids(spark, micro_corpus, micro_index):
    """A3: corpora without a caller-supplied doc_id get deterministic
    dense ids ordered by (repo, path, commit), and the range partitions
    double as segments (one less corpus shuffle). The micro fixture's
    key order coincides with its doc_id order, so results must match the
    explicit-id build exactly."""
    from sparktext.build import build_index
    from sparktext.query import matched_docs, parse_query
    from sparktext.topk import top_k

    idx = build_index(spark, micro_corpus.drop("doc_id"), num_segments=3)
    assert idx.stats.num_docs == micro_index.stats.num_docs
    assert idx.stats.total_tokens == micro_index.stats.total_tokens
    for q in ["heavy", "apple banana", "+grape cherry", "apple -banana"]:
        a = [(r["doc_id"], round(r["score"], 9))
             for r in top_k(matched_docs(idx, parse_query(q)), 12).collect()]
        b = [(r["doc_id"], round(r["score"], 9))
             for r in top_k(matched_docs(micro_index, parse_query(q)), 12).collect()]
        assert a == b, q
    # ids are dense 0..n-1 in key order
    ids = sorted(r["doc_id"] for r in idx.doc_meta.select("doc_id").collect())
    assert ids == list(range(12))


def test_unicode_corpus_end_to_end(spark):
    """Mixed ASCII/unicode corpus through the FUSED build: the per-batch
    ascii fast path and unicode slow path must both index correctly."""
    from sparktext.build import build_index
    from sparktext.query import matched_docs, parse_query

    rows = [
        (0, "r", "p/0", "c0", "de", "Füße im Gras heute", 18),
        (1, "r", "p/1", "c1", "en", "plain ascii grass today", 24),
        (2, "r", "p/2", "c2", "de", "GRAS und fusse", 14),
        (3, "r", "p/3", "c3", "ru", "тест привет gras", 16),
    ]
    corpus = spark.createDataFrame(
        rows,
        "doc_id long, repo string, path string, commit string, lang string, "
        "content string, n_chars long",
    )
    idx = build_index(spark, corpus, num_segments=2)
    terms = {r["term"] for r in idx.term_dict.select("term").collect()}
    assert {"füße", "gras", "тест", "привет", "ascii"} <= terms
    hits = {r["doc_id"] for r in matched_docs(idx, parse_query("gras")).collect()}
    assert hits == {0, 2, 3}
    hits_u = {r["doc_id"] for r in matched_docs(idx, parse_query("привет")).collect()}
    assert hits_u == {3}


def test_clause_boosts(spark, micro_index):
    """B1 `term^N` boost: partials of the boosted term scale by N;
    unboosted queries are unchanged; search_many applies per-(query,
    term) boosts identically under BOTH batch strategies."""
    import pytest

    from sparktext.query import matched_docs, parse_query, search_many

    q = parse_query("apple^3 banana")
    assert q.boosts == {"apple": 3.0}
    plain = {r["doc_id"]: r["score"]
             for r in matched_docs(micro_index, parse_query("apple banana")).collect()}
    boosted = {r["doc_id"]: r["score"]
               for r in matched_docs(micro_index, q).collect()}
    apple_only = {r["doc_id"]: r["score"]
                  for r in matched_docs(micro_index, parse_query("apple")).collect()}
    assert set(plain) == set(boosted)
    for d, s in boosted.items():
        expected = plain[d] + 2.0 * apple_only.get(d, 0.0)
        assert s == pytest.approx(expected, abs=1e-9), d
    # non-numeric suffix is a regular token stream, not a boost
    assert parse_query("c^x").boosts == {}

    # Batch boosts: a boosted + an unboosted query in one batch, each
    # equal to its per-query matched_docs result, on both strategies.
    batch = {"a": "apple^3 banana", "b": "apple banana"}
    want = {
        qid: {
            r["doc_id"]: r["score"]
            for r in matched_docs(micro_index, parse_query(qs)).collect()
        }
        for qid, qs in batch.items()
    }
    for strat in ("broadcast", "join"):
        got: dict[str, dict] = {qid: {} for qid in batch}
        for r in search_many(micro_index, batch, k=100, strategy=strat).collect():
            got[r["query_id"]][r["doc_id"]] = r["score"]
        for qid in batch:
            assert set(got[qid]) == set(want[qid]), (strat, qid)
            for d, s in got[qid].items():
                assert s == pytest.approx(want[qid][d], abs=1e-9), (strat, qid, d)


def test_duplicate_term_boost_semantics(spark, micro_index):
    """Pin the documented divergence (query.py module doc): a duplicated
    term is scored ONCE and the last EXPLICIT boost wins — an unboosted
    repeat does not reset an earlier boost."""
    import pytest

    from sparktext.query import matched_docs, parse_query

    assert parse_query("apple^2 apple^3").boosts == {"apple": 3.0}
    assert parse_query("apple^2 apple").boosts == {"apple": 2.0}
    assert parse_query("apple apple^2").boosts == {"apple": 2.0}
    # scoring: 'apple^2 apple^3' == a single apple^3 clause
    a = {r["doc_id"]: r["score"]
         for r in matched_docs(micro_index, parse_query("apple^2 apple^3")).collect()}
    b = {r["doc_id"]: r["score"]
         for r in matched_docs(micro_index, parse_query("apple^3")).collect()}
    assert set(a) == set(b)
    for d in a:
        assert a[d] == pytest.approx(b[d], abs=1e-12)
