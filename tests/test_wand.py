"""B10: block-max WAND must be result-identical to exhaustive scoring."""

import pytest

from sparktext.query import matched_docs, parse_query
from sparktext.topk import top_k


def _topk(index, qstr, k, exhaustive):
    # wand_min_postings=0 forces the PRUNING plan even on tiny fixtures
    # (the cost-based gate would otherwise pick the exhaustive plan).
    df = top_k(
        matched_docs(index, parse_query(qstr), exhaustive=exhaustive, k=k,
                     wand_min_postings=0),
        k,
    )
    return [(r["doc_id"], round(r["score"], 9)) for r in df.collect()]


@pytest.mark.parametrize("qstr,k", [
    ("heavy", 3),
    ("apple banana", 5),
    ("unique", 10),
    ("grape egg fig", 4),
])
def test_wand_equals_exhaustive_micro(micro_index, qstr, k):
    assert _topk(micro_index, qstr, k, False) == _topk(micro_index, qstr, k, True)


@pytest.fixture(scope="module")
def doc_index(spark):
    from sparktext.build import build_index
    from sparktext.corpus import documents_as_corpus

    corpus = documents_as_corpus(spark, "/root/testdata/sf0.001")
    return build_index(spark, corpus, num_segments=8)


@pytest.mark.parametrize("qstr,k", [
    ("spark", 10),
    ("query window scan", 10),
    ("customer merge", 5),
])
def test_wand_equals_exhaustive_sf0001(doc_index, qstr, k):
    assert _topk(doc_index, qstr, k, False) == _topk(doc_index, qstr, k, True)


def test_wand_actually_prunes_on_skewed_tf(spark):
    """A corpus where a few docs have tf=10 and hundreds have tf=1: the
    seed θ (from the high-ub block) must exceed the tf=1 blocks' bounds,
    so WAND must PRUNE them — and still return identical top-k."""
    rows = []
    for i in range(600):
        tf = 10 if i < 10 else 1
        content = " ".join(["hot"] * tf + ["pad", f"w{i % 7}"])
        rows.append((i, "r", f"p/{i}", f"c{i}", "py", content, len(content)))
    corpus = spark.createDataFrame(
        rows,
        "doc_id long, repo string, path string, commit string, lang string, "
        "content string, n_chars long",
    )
    from sparktext.build import build_index
    from sparktext.query import postings_for_terms
    from sparktext.score import term_stats, wand_candidate_blocks

    # one segment -> >4 blocks of 128 docs for 'hot'
    index = build_index(spark, corpus, num_segments=1)
    stats_map = term_stats(index, ["hot"])
    total = postings_for_terms(index, ["hot"], stats_map).count()
    kept = wand_candidate_blocks(index, ["hot"], 5, stats_map).count()
    assert total >= 5
    assert kept < total  # pruning really happened
    assert _topk(index, "hot", 5, False) == _topk(index, "hot", 5, True)


def test_wand_prunes_blocks(doc_index):
    """The candidate set must not exceed the full block set; on a corpus
    with >k docs per term it should genuinely shrink it."""
    from sparktext.query import postings_for_terms
    from sparktext.score import term_stats, wand_candidate_blocks

    terms = ["spark", "query"]
    stats_map = term_stats(doc_index, terms)
    total = postings_for_terms(doc_index, terms, stats_map).count()
    kept = wand_candidate_blocks(doc_index, terms, 10, stats_map).count()
    assert kept <= total


def test_cost_based_fallback(doc_index):
    """Below the postings threshold, exhaustive=False must pick the
    exhaustive plan (no theta subtree) — plans are identical."""
    from sparktext.query import matched_docs, parse_query

    q = parse_query("query window scan")
    lazy_wand = matched_docs(doc_index, q, exhaustive=False, k=10)
    lazy_ex = matched_docs(doc_index, q, exhaustive=True)
    assert "_theta" not in lazy_wand._jdf.queryExecution().analyzed().toString()
    # forcing the threshold off re-enables the pruning plan
    forced = matched_docs(doc_index, q, exhaustive=False, k=10, wand_min_postings=0)
    assert "_theta" in forced._jdf.queryExecution().analyzed().toString()
