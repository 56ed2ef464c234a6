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
    assert "wand_pruned" not in lazy_wand._jdf.queryExecution().analyzed().toString()
    # forcing the threshold off re-enables the pruning plan
    forced = matched_docs(doc_index, q, exhaustive=False, k=10, wand_min_postings=0)
    assert "wand_pruned" in forced._jdf.queryExecution().analyzed().toString()
    # must queries keep the distributed θ subtree (unbounded anchor set)
    forced_must = matched_docs(
        doc_index, parse_query("+spark query"), exhaustive=False, k=10,
        wand_min_postings=0,
    )
    assert "_theta" in forced_must._jdf.queryExecution().analyzed().toString()


@pytest.mark.parametrize("qstr,k", [
    ("+heavy apple banana", 5),     # must driver + should
    ("+apple grape -banana", 6),    # must + should + must_not
    ("apple -banana", 5),           # must_not only
    ("heavy^2 apple", 5),           # boosted should
    ("+heavy apple^3 banana", 4),   # must + boosted should
])
def test_wand_equals_exhaustive_boolean(micro_index, qstr, k):
    """Round-4: pruning now covers must/must_not/boosted queries (the
    round-3 verdict's silent-exhaustive-fallback gap) — results must
    stay rank-identical to the exhaustive plan."""
    assert _topk(micro_index, qstr, k, False) == _topk(micro_index, qstr, k, True)


def test_wand_negative_boost_falls_back(micro_index):
    """ub * boost only bounds the boosted partial for boost > 0 — a
    negative boost must route to the exhaustive plan."""
    q = parse_query("apple^-2 banana")
    lazy = matched_docs(micro_index, q, exhaustive=False, k=5, wand_min_postings=0)
    assert "_theta" not in lazy._jdf.queryExecution().analyzed().toString()


def test_wand_must_prunes_nonmust_segments(spark):
    """The Spark analogue of tantivy's must-driven pruning: θ is seeded
    from the MUST term's own postings, and segments holding no must
    blocks get max_ub(must, s) = 0 — their should blocks are pruned
    wholesale by the per-segment bound, which IS the must-semi-join
    effect without a separate stage."""
    rows = []
    for i in range(512):
        words = ["hot"] + ["pad"] * 18
        if i < 10:
            words = ["tag", "tag", "tag", "hot"] + ["pad"] * 16
        content = " ".join(words)
        rows.append((i, "r", f"p/{i}", f"c{i}", "py", content, len(content)))
    corpus = spark.createDataFrame(
        rows,
        "doc_id long, repo string, path string, commit string, lang string, "
        "content string, n_chars long",
    )
    from sparktext.build import build_index
    from sparktext.query import postings_for_terms
    from sparktext.score import term_stats, wand_blocks_for_query

    index = build_index(spark, corpus, num_segments=4)
    q = parse_query("+tag hot")
    stats_map = term_stats(index, ["tag", "hot"])
    total = postings_for_terms(index, ["tag", "hot"], stats_map).count()
    kept = wand_blocks_for_query(index, q, 5, stats_map).count()
    assert kept < total, (kept, total)  # hot blocks outside seg 0 pruned
    # all tag blocks + seg-0 hot block(s) survive; 3 hot-only segments
    # have bound 0 + ub_hot << θ and must be gone
    assert kept <= total - 3, (kept, total)
    assert _topk(index, "+tag hot", 5, False) == _topk(index, "+tag hot", 5, True)


def test_wand_on_persisted_index(spark, micro_corpus, tmpdir):
    """The driver-literal θ/bounds collects must work against the
    parquet-backed postings too (partition-pruned seed fetch, header
    mini-cache built from the persisted table) — in-memory-only coverage
    would miss a persisted-path regression."""
    from sparktext.build import build_index

    idx = build_index(spark, micro_corpus, num_segments=3,
                      index_dir=str(tmpdir), num_groups=2)
    for qstr, k in [("heavy", 3), ("apple banana", 5), ("+heavy apple", 4)]:
        assert _topk(idx, qstr, k, False) == _topk(idx, qstr, k, True), qstr


def test_wand_with_tombstones_falls_back_and_matches(micro_index):
    """Tombstones poison the theta seed (deleted docs can hold the
    seeded k-th best score, inflating theta and pruning blocks of real
    results), so matched_docs must route deleted-carrying indexes to
    the exhaustive plan — results identical to exhaustive, deleted docs
    absent, even with wand_min_postings=0 forcing the pruning branch."""
    # 'heavy' top docs include doc 2 (tf=3) and 7; delete the top doc so
    # a stale theta would provably overshoot the best alive score.
    full = _topk(micro_index, "heavy", 3, True)
    victim = full[0][0]
    spark = micro_index.postings.sparkSession
    idx = micro_index.with_deletes(
        spark.createDataFrame([(victim,)], "doc_id long")
    )
    try:
        pruned = _topk(idx, "heavy", 3, False)
        exhaustive = _topk(idx, "heavy", 3, True)
        assert pruned == exhaustive
        assert all(d != victim for d, _ in pruned)
        # the fallback is the reason: the pruned-plan marker is absent
        from sparktext.query import matched_docs as md, parse_query as pq
        plan = md(idx, pq("heavy"), exhaustive=False, k=3,
                  wand_min_postings=0)._jdf.queryExecution().analyzed().toString()
        assert "wand_pruned" not in plan
    finally:
        idx.deleted.unpersist()


def _batch_results(index, queries, k, exhaustive, wmp=0):
    from sparktext.query import search_many

    rows = search_many(index, queries, k=k, exhaustive=exhaustive,
                       wand_min_postings=wmp).collect()
    got: dict[str, list] = {}
    for r in rows:
        got.setdefault(r["query_id"], []).append(
            (r["doc_id"], round(r["score"], 9))
        )
    for qid in got:
        got[qid].sort(key=lambda t: (-t[1], t[0]))
    return got


def test_batch_wand_equals_exhaustive_micro(micro_index):
    """Batch pruning (exhaustive=False, forced gate) must be
    result-identical to the exhaustive batch across mixed shapes —
    pure-should queries prune, boolean/boosted queries anchor their
    terms (kept in full)."""
    queries = {
        "q1": "heavy",
        "q2": "apple banana",
        "q3": "+grape cherry",       # must: anchored
        "q4": "apple -banana",       # must_not: anchored
        "q5": "heavy^2 grape",       # boosted pure-should: prunable
        "q6": "unique",
    }
    for k in (3, 12):
        assert _batch_results(micro_index, queries, k, False) == \
            _batch_results(micro_index, queries, k, True), k


def test_batch_wand_prunes_and_matches_on_zipf(spark):
    """On the clustered-skew corpus the batch survivor union must be a
    strict subset of the full block set (real pruning) while batch
    results stay identical to exhaustive."""
    from sparktext.build import build_index
    from sparktext.query import parse_query, postings_for_terms
    from sparktext.score import term_stats, wand_blocks_for_batch
    from sparktext.corpus import skewed_impact_corpus

    index = build_index(spark, skewed_impact_corpus(spark, 4000), num_segments=2)
    queries = {
        "z1": "alpha beta",
        "z2": "gamma",
        "z3": "alpha beta gamma",
    }
    live = {qid: parse_query(qs) for qid, qs in queries.items()}
    terms = ["alpha", "beta", "gamma"]
    sm = term_stats(index, terms)
    total = postings_for_terms(index, terms, sm).count()
    blocks = wand_blocks_for_batch(index, live, 5, sm, terms, 0)
    assert blocks is not None
    kept = blocks.count()
    assert kept < total, (kept, total)
    assert _batch_results(index, queries, 5, False) == \
        _batch_results(index, queries, 5, True)
    index.unpersist()


def test_batch_wand_gate_and_tombstone_fallback(micro_index):
    """Below the postings gate or with tombstones the batch helper
    declines (None) — the caller decodes the full union."""
    from sparktext.query import parse_query
    from sparktext.score import term_stats, wand_blocks_for_batch

    live = {"a": parse_query("heavy")}
    sm = term_stats(micro_index, ["heavy"])
    # gate: candidate postings (10) < min
    assert wand_blocks_for_batch(micro_index, live, 3, sm, ["heavy"], 10**6) is None
    # tombstones poison theta -> decline
    spark = micro_index.postings.sparkSession
    idx = micro_index.with_deletes(spark.createDataFrame([(2,)], "doc_id long"))
    try:
        assert wand_blocks_for_batch(idx, live, 3, sm, ["heavy"], 0) is None
    finally:
        idx.deleted.unpersist()
