"""Round-5 surface additions: snippets (tantivy SnippetGenerator shape),
search_after pagination (B9), and the top_hits sub-aggregation (C7 x B9).
All three are pure column-expression / window plans — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sparktext.query import matched_docs, parse_query
from sparktext.topk import top_k, top_k_after


def _scored(micro_index, qstr):
    return matched_docs(micro_index, parse_query(qstr))


# ---------------------------------------------------------------------------
# snippets
# ---------------------------------------------------------------------------


def test_snippet_highlights_first_match_window(micro_index, micro_corpus):
    from sparktext.snippet import snippets

    hits = top_k(_scored(micro_index, "grape"), 3, round_decimals=4)
    out = snippets(hits, micro_corpus, ["grape"], max_chars=100).collect()
    assert len(out) == 3
    for row in out:
        assert "<b>grape</b>" in row["snippet"]


def test_snippet_window_start_and_clamp(spark):
    from sparktext.snippet import snippet_col

    long_prefix = " ".join(["pad"] * 20)  # 79 chars of padding
    df = spark.createDataFrame(
        [(0, f"{long_prefix} target tail tail"), (1, "target at start"),
         (2, "no match here")],
        "doc_id long, content string",
    )
    got = {
        r["doc_id"]: r["s"]
        for r in df.select(
            "doc_id",
            snippet_col(F.col("content"), ["target"], max_chars=40, before=10).alias("s"),
        ).collect()
    }
    # 'target' starts at char 81 (1-based; 20x "pad " = 80 chars before
    # it): window starts at 81-10=71, which lands on the 'd' of a pad.
    assert got[0].startswith("d pad pad <b>target</b>")
    assert "<b>target</b>" in got[0]
    assert len(got[0]) <= 40 + len("<b></b>") * 3
    # match at position 1: clamped to text start.
    assert got[1].startswith("<b>target</b> at start")
    # no match: head of text, nothing highlighted.
    assert got[2] == "no match here"


def test_snippet_word_boundary_no_partial_highlight(spark):
    from sparktext.snippet import snippet_col

    df = spark.createDataFrame(
        [(0, "grapefruit is not grape juice")], "doc_id long, content string"
    )
    s = df.select(
        snippet_col(F.col("content"), ["grape"], max_chars=100).alias("s")
    ).collect()[0]["s"]
    # 'grapefruit' must NOT be highlighted; the whole word 'grape' must be.
    assert "<b>grape</b> juice" in s
    assert "<b>grape</b>fruit" not in s


def test_snippet_multi_term_earliest_wins(spark):
    from sparktext.snippet import snippet_col

    df = spark.createDataFrame(
        [(0, "alpha beta gamma delta")], "doc_id long, content string"
    )
    s = df.select(
        snippet_col(F.col("content"), ["delta", "beta"], max_chars=200, before=2).alias("s")
    ).collect()[0]["s"]
    # beta (pos 7) is earlier than delta (pos 18): window anchors on beta.
    assert s.startswith("a <b>beta</b>")
    assert "<b>delta</b>" in s


# ---------------------------------------------------------------------------
# search_after pagination
# ---------------------------------------------------------------------------


def test_search_after_pages_partition_the_total_order(micro_index):
    m = _scored(micro_index, "heavy apple")
    all_rows = top_k(m, 100, round_decimals=4).collect()
    assert len(all_rows) >= 6
    page1 = top_k(m, 3, round_decimals=4).collect()
    cur = page1[-1]
    page2 = top_k_after(m, 3, cur["score"], cur["doc_id"], round_decimals=4).collect()
    got = [(r["doc_id"], r["score"]) for r in page1 + page2]
    want = [(r["doc_id"], r["score"]) for r in all_rows[:6]]
    assert got == want


def test_search_after_tie_break_on_equal_scores(spark):
    # Four docs with identical scores: the cursor must split purely on
    # doc_id, and no row may repeat or vanish across the page boundary.
    m = spark.createDataFrame(
        [(d, 1.5) for d in (7, 3, 11, 5)], "doc_id long, score double"
    )
    p1 = top_k(m, 2).collect()
    assert [r["doc_id"] for r in p1] == [3, 5]
    p2 = top_k_after(m, 2, p1[-1]["score"], p1[-1]["doc_id"]).collect()
    assert [r["doc_id"] for r in p2] == [7, 11]


# ---------------------------------------------------------------------------
# top_hits sub-aggregation
# ---------------------------------------------------------------------------


def test_top_hits_per_bucket_rank_and_tiebreak(micro_index):
    from sparktext.aggs import top_hits_agg

    m = _scored(micro_index, "heavy")
    mm = m.join(micro_index.doc_meta.select("doc_id", "lang"), "doc_id")
    out = top_hits_agg(mm, "lang", k=2, round_decimals=4)
    rows = out.collect()
    by_lang: dict = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    # exactly <=2 hits per bucket, ranks 1..n
    for hits in by_lang.values():
        assert [h["hit_rank"] for h in hits] == list(range(1, len(hits) + 1))
        assert len(hits) <= 2
    # per-bucket ground truth from the exhaustive matched set
    full = mm.withColumn("score", F.round("score", 4)).collect()
    for lang in by_lang:
        docs = sorted(
            [(r["score"], r["doc_id"]) for r in full if r["lang"] == lang],
            key=lambda t: (-t[0], t[1]),
        )[:2]
        got = [(h["score"], h["doc_id"]) for h in by_lang[lang]]
        assert got == docs


def test_top_hits_plan_uses_window_group_limit(micro_index):
    # The rank<=k filter must lower to WindowGroupLimit (map-side
    # per-bucket heads before the exchange) — the per-bucket analogue of
    # TakeOrderedAndProject. Guards the 100-TB shuffle shape.
    from sparktext.aggs import top_hits_agg

    m = _scored(micro_index, "heavy")
    mm = m.join(micro_index.doc_meta.select("doc_id", "lang"), "doc_id")
    plan = top_hits_agg(mm, "lang", k=2)._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
