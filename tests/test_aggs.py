"""C1–C14 collector tests against hand-computed fruits (SURVEY.md §5)."""

import pytest

from tests.conftest import MICRO_DOCS

DOCS = {d[0]: d[5] for d in MICRO_DOCS}
LANG = {d[0]: d[4] for d in MICRO_DOCS}
NCHARS = {d[0]: d[6] for d in MICRO_DOCS}
HEAVY_DOCS = sorted(d for d in DOCS if "heavy" in DOCS[d].split())


@pytest.fixture(scope="module")
def matched(spark, micro_index):
    """The crate's agg entry: aggregations run over a matched doc set."""
    from sparktext.query import matched_docs, parse_query

    m = matched_docs(micro_index, parse_query("heavy"))
    return m.join(micro_index.doc_meta, "doc_id").persist()


def test_count_min_max_sum_avg_stats_one_pass(matched):
    from sparktext.aggs import (
        AvgAgg, CountAgg, MaxAgg, MinAgg, StatsAgg, SumAgg, metrics_agg,
    )

    row = metrics_agg(
        matched,
        [CountAgg(), MinAgg("n_chars"), MaxAgg("n_chars"), SumAgg("n_chars"),
         AvgAgg("n_chars"), StatsAgg("doc_len")],
    ).collect()[0]
    vals = [NCHARS[d] for d in HEAVY_DOCS]
    assert row["count"] == len(HEAVY_DOCS)
    assert row["min_n_chars"] == min(vals)
    assert row["max_n_chars"] == max(vals)
    assert row["sum_n_chars"] == sum(vals)
    assert row["avg_n_chars"] == pytest.approx(sum(vals) / len(vals))
    lens = [len(DOCS[d].split()) for d in HEAVY_DOCS]
    assert row["doc_len_count"] == len(lens)
    assert row["doc_len_sum"] == sum(lens)
    assert row["doc_len_min"] == min(lens)
    assert row["doc_len_max"] == max(lens)
    assert row["doc_len_avg"] == pytest.approx(sum(lens) / len(lens))


def test_empty_set_semantics(spark, micro_index):
    from sparktext.aggs import AvgAgg, CountAgg, MinAgg, SumAgg, metrics_agg
    from sparktext.query import matched_docs, parse_query

    m = matched_docs(micro_index, parse_query("zzzmissing"))
    m = m.join(micro_index.doc_meta, "doc_id")
    row = metrics_agg(m, [CountAgg(), MinAgg("n_chars"), SumAgg("n_chars"), AvgAgg("n_chars")]).collect()[0]
    assert row["count"] == 0
    assert row["min_n_chars"] is None  # Option<min> = None
    assert row["sum_n_chars"] == 0  # sum = 0 on empty
    assert row["avg_n_chars"] is None


def test_terms_agg_counts_and_topn(matched):
    from sparktext.aggs import MaxAgg, terms_agg

    rows = terms_agg(matched, "lang", size=None, sub_aggs=[MaxAgg("n_chars")]).collect()
    got = {r["lang"]: (r["count"], r["max_n_chars"]) for r in rows}
    exp = {}
    for d in HEAVY_DOCS:
        c, mx = exp.get(LANG[d], (0, 0))
        exp[LANG[d]] = (c + 1, max(mx, NCHARS[d]))
    assert got == exp

    top1 = terms_agg(matched, "lang", size=1).collect()
    best = max(exp.items(), key=lambda kv: (kv[1][0], -ord(kv[0][0])))
    assert len(top1) == 1 and top1[0]["lang"] == best[0]


def test_terms_agg_tie_break_key_asc(matched):
    from sparktext.aggs import terms_agg

    rows = terms_agg(matched, "repo", size=2).collect()
    exp_counts = {}
    for d in HEAVY_DOCS:
        r = next(x[1] for x in MICRO_DOCS if x[0] == d)
        exp_counts[r] = exp_counts.get(r, 0) + 1
    order = sorted(exp_counts.items(), key=lambda kv: (-kv[1], kv[0]))[:2]
    assert [(r["repo"], r["count"]) for r in rows] == order


def test_histogram_agg(matched):
    from sparktext.aggs import histogram_agg

    rows = histogram_agg(matched, "n_chars", interval=10.0).collect()
    exp = {}
    for d in HEAVY_DOCS:
        b = (NCHARS[d] // 10) * 10
        exp[float(b)] = exp.get(float(b), 0) + 1
    assert {r["bucket"]: r["count"] for r in rows} == exp


def test_histogram_offset(matched):
    from sparktext.aggs import histogram_agg

    rows = histogram_agg(matched, "n_chars", interval=10.0, offset=5.0).collect()
    exp = {}
    for d in HEAVY_DOCS:
        b = ((NCHARS[d] - 5) // 10) * 10 + 5
        exp[float(b)] = exp.get(float(b), 0) + 1
    assert {r["bucket"]: r["count"] for r in rows} == exp


def test_range_agg(matched):
    from sparktext.aggs import range_agg

    rows = range_agg(matched, "n_chars", edges=[18, 24]).collect()
    got = {r["range_key"]: r["count"] for r in rows}
    exp = {}
    for d in HEAVY_DOCS:
        v = NCHARS[d]
        key = "*-18" if v < 18 else ("18-24" if v < 24 else "24-*")
        exp[key] = exp.get(key, 0) + 1
    assert got == exp


def test_filter_agg_no_second_scan(matched):
    from sparktext.aggs import CountAgg, FilterAgg, SumAgg, metrics_agg

    row = metrics_agg(
        matched,
        [CountAgg(name="total"),
         FilterAgg("lang = 'py'", (CountAgg(name="py_count"), SumAgg("n_chars", name="py_sum")))],
    ).collect()[0]
    py = [d for d in HEAVY_DOCS if LANG[d] == "py"]
    assert row["total"] == len(HEAVY_DOCS)
    assert row["py_count"] == len(py)
    assert row["py_sum"] == sum(NCHARS[d] for d in py)


def test_percentiles_exact(matched):
    import numpy as np

    from sparktext.aggs import PercentilesAgg, metrics_agg

    row = metrics_agg(matched, [PercentilesAgg("n_chars", (0.5, 0.9))]).collect()[0]
    vals = np.array(sorted(NCHARS[d] for d in HEAVY_DOCS), dtype=float)
    assert row["n_chars_p50"] == pytest.approx(np.percentile(vals, 50))
    assert row["n_chars_p90"] == pytest.approx(np.percentile(vals, 90))


def test_agg_search_fused(micro_index):
    from sparktext.aggs import CountAgg, StatsAgg, agg_search

    out = agg_search(
        micro_index,
        "heavy",
        k=3,
        metric_aggs=[CountAgg(), StatsAgg("n_chars")],
        bucket_aggs={
            "by_lang": ("terms", "lang", 5, []),
            "hist": ("histogram", "n_chars", 10.0, 0.0, []),
        },
    )
    assert set(out) == {"hits", "metrics", "by_lang", "hist", "release"}
    assert out["hits"].count() == 3
    assert out["metrics"].collect()[0]["count"] == len(HEAVY_DOCS)
    assert out["by_lang"].count() == 2
    out["release"]()


def test_post_filter(micro_index):
    from sparktext.aggs import CountAgg, agg_search

    out = agg_search(
        micro_index, "heavy", k=12,
        metric_aggs=[CountAgg()],
        post_filter="lang = 'rs'",
    )
    # hits restricted to rs docs; metrics still see the full matched set
    hit_docs = {r["doc_id"] for r in out["hits"].collect()}
    assert hit_docs == {d for d in HEAVY_DOCS if LANG[d] == "rs"}
    assert out["metrics"].collect()[0]["count"] == len(HEAVY_DOCS)


def test_terms_agg_multivalued(spark):
    """C7 over a multi-valued (ArrayType) facet: each doc contributes to
    every bucket it holds a value for; empty/null arrays to none."""
    from sparktext.aggs import SumAgg, terms_agg

    df = spark.createDataFrame(
        [(1, ["a", "b"], 10), (2, ["b"], 20), (3, [], 30), (4, None, 40)],
        "doc_id long, tags array<string>, x long",
    )
    rows = {
        r["tags"]: (r["count"], r["sum_x"])
        for r in terms_agg(df, "tags", size=10, sub_aggs=[SumAgg("x")]).collect()
    }
    assert rows == {"b": (2, 30), "a": (1, 10)}


def test_terms_agg_multivalued_through_agg_search(spark, micro_index):
    """The agg_search bucket path auto-explodes array facets too."""
    from sparktext.aggs import terms_agg
    from sparktext.query import matched_docs, parse_query
    from pyspark.sql import functions as F

    m = matched_docs(micro_index, parse_query("heavy")).join(
        micro_index.doc_meta, "doc_id"
    )
    # synthesize tags = [lang, repo]; every matched doc carries both
    mm = m.withColumn("tags", F.array("lang", "repo"))
    rows = {r["tags"]: r["count"] for r in terms_agg(mm, "tags", size=None).collect()}
    n_heavy = len(HEAVY_DOCS)
    assert sum(rows.values()) == 2 * n_heavy
    langs = {LANG[d] for d in HEAVY_DOCS}
    assert langs <= set(rows)


def test_facet_terms_agg_rollup(spark):
    """Hierarchical facet paths: '/a/b' counts into '/a' AND '/a/b'
    (ancestor rollup); path normalization strips stray slashes; blank
    paths contribute nothing; depth caps the levels."""
    from sparktext.aggs import facet_terms_agg

    df = spark.createDataFrame(
        [(1, "/lang/rust"), (2, "/lang/py"), (3, "lang/rust/"), (4, "/tools"),
         (5, ""), (6, None), (7, "/lang/rust/macros")],
        "doc_id long, path string",
    )
    rows = {r["facet"]: r["count"] for r in facet_terms_agg(df, "path", size=None).collect()}
    assert rows == {
        "/lang": 4, "/lang/rust": 3, "/lang/py": 1, "/tools": 1,
        "/lang/rust/macros": 1,
    }
    # depth=1: only top-level buckets
    d1 = {r["facet"]: r["count"] for r in facet_terms_agg(df, "path", depth=1, size=None).collect()}
    assert d1 == {"/lang": 4, "/tools": 1}


def test_agg_search_facet_bucket(spark, micro_corpus, micro_index):
    """agg_search's 'facet' bucket kind: hierarchical rollup fused into
    the one-pass plan (and the pruned matched-set cache keeps the path
    column)."""
    from sparktext.aggs import agg_search

    out = agg_search(
        micro_index, "heavy", k=5,
        bucket_aggs={"by_path": ("facet", "path", 1, None, [])},
    )
    rows = {r["facet"]: r["count"] for r in out["by_path"].collect()}
    out["release"]()
    # micro paths are 'a/0.py' style -> level-1 facets are /a /b /c
    from tests.conftest import MICRO_DOCS

    exp = {}
    for d, _r, p, _c, _l, t, _n in MICRO_DOCS:
        if "heavy" in t.split():
            key = "/" + p.split("/")[0]
            exp[key] = exp.get(key, 0) + 1
    assert rows == exp


def test_collect_results_parallel_harvest(spark, micro_index):
    """collect_results: all fruits in one call, identical to sequential
    collects, cache released afterwards."""
    from sparktext.aggs import CountAgg, SumAgg, agg_search, collect_results

    def make():
        return agg_search(
            micro_index, "heavy", k=3,
            metric_aggs=[CountAgg(), SumAgg("n_chars")],
            bucket_aggs={"by_lang": ("terms", "lang", 5, [])},
        )

    rows = collect_results(make())
    out = make()
    release = out.pop("release")
    seq = {k: df.collect() for k, df in out.items()}
    release()
    assert set(rows) == set(seq)
    for k in seq:
        assert sorted(map(tuple, rows[k])) == sorted(map(tuple, seq[k])), k


def test_cardinality_agg(matched):
    from sparktext.aggs import CardinalityAgg, metrics_agg

    row = metrics_agg(
        matched, [CardinalityAgg("lang"), CardinalityAgg("lang", approx=True, name="c2")]
    ).collect()[0]
    exact = len({LANG[d] for d in HEAVY_DOCS})
    assert row["cardinality_lang"] == exact
    # HLL++ on 2 distinct values is exact in practice
    assert row["c2"] == exact


def test_terms_agg_multivalued_distinct_within_doc(spark):
    """A value duplicated WITHIN one doc's array counts that doc ONCE —
    the Elasticsearch/tantivy SortedSetDocValues contract (round-3
    advisory: raw explode double-counted the doc)."""
    from sparktext.aggs import SumAgg, terms_agg

    df = spark.createDataFrame(
        [(1, ["a", "a", "b"], 10), (2, ["b", "b"], 20)],
        "doc_id long, tags array<string>, x long",
    )
    rows = {
        r["tags"]: (r["count"], r["sum_x"])
        for r in terms_agg(df, "tags", size=10, sub_aggs=[SumAgg("x")]).collect()
    }
    assert rows == {"a": (1, 10), "b": (2, 30)}


def test_facet_depth_validation(spark):
    """depth <= 0 must raise, not silently emit bogus '/' buckets
    (F.sequence(1, 0) counts DOWN)."""
    import pytest
    from pyspark.sql import functions as F

    from sparktext.aggs import facet_prefixes_col

    with pytest.raises(ValueError, match="depth"):
        facet_prefixes_col(F.lit("/a/b"), depth=0)
    with pytest.raises(ValueError, match="depth"):
        facet_prefixes_col(F.lit("/a/b"), depth=-1)
    df = spark.range(1).select(facet_prefixes_col(F.lit("/a/b"), depth=1).alias("p"))
    assert df.collect()[0]["p"] == ["/a"]


def test_agg_search_hits_only_skips_meta_join(micro_index):
    """Hits-only agg_search reads nothing from doc_meta: the matched set
    is persisted directly — no join node in the plan — and the hits
    equal the plain top_k path."""
    from sparktext.aggs import agg_search
    from sparktext.query import matched_docs, parse_query
    from sparktext.topk import top_k

    out = agg_search(micro_index, "heavy", k=3)
    try:
        plan = out["hits"]._jdf.queryExecution().optimizedPlan().toString()
        assert "Join" not in plan
        want = [
            (r["doc_id"], round(r["score"], 9))
            for r in top_k(
                matched_docs(micro_index, parse_query("heavy")), 3
            ).collect()
        ]
        got = [(r["doc_id"], round(r["score"], 9)) for r in out["hits"].collect()]
        assert got == want
    finally:
        out["release"]()
