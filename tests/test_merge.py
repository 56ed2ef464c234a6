"""A10/§4.7: merge correctness + salted skew handling."""

import numpy as np
import pytest
from pyspark.sql import functions as F


def _topk(index, qstr, k=12):
    from sparktext.query import matched_docs, parse_query
    from sparktext.topk import top_k

    rows = top_k(matched_docs(index, parse_query(qstr)), k).collect()
    return [(r["doc_id"], round(r["score"], 9)) for r in rows]


def test_merge_preserves_results(spark, micro_index):
    from sparktext.merge import merge_segments

    merged = merge_segments(micro_index, 1)
    segs = [r["segment_id"] for r in merged.postings.select("segment_id").distinct().collect()]
    assert segs == [0]
    for q in ["heavy", "apple banana", "+grape cherry", "apple -banana"]:
        assert _topk(merged, q) == _topk(micro_index, q), q


def test_merge_block_renumbering(spark, micro_index):
    from sparktext.merge import merge_segments

    merged = merge_segments(micro_index, 1)
    for row in merged.postings.groupBy("term").agg(
        F.collect_list(F.struct("block_id", "first_doc", "last_doc")).alias("bs")
    ).collect():
        bs = sorted((b["block_id"], b["first_doc"], b["last_doc"]) for b in row["bs"])
        assert [b[0] for b in bs] == list(range(len(bs)))
        for (_, _, l1), (_, f2, _) in zip(bs, bs[1:]):
            assert l1 < f2


@pytest.fixture(scope="module")
def skew_corpus(spark):
    """400 docs; 'hot' appears in 50% of docs (synthetic skew, §4.7)."""
    rng = np.random.default_rng(7)
    rows = []
    vocab = ["alpha", "beta", "gamma", "delta"]
    for i in range(400):
        words = list(rng.choice(vocab, size=5))
        if i % 2 == 0:
            words += ["hot", "hot"]
        rows.append(
            (i, "r", f"p/{i}", f"c{i}", "py", " ".join(words), len(" ".join(words)))
        )
    return spark.createDataFrame(
        rows,
        "doc_id long, repo string, path string, commit string, lang string, "
        "content string, n_chars long",
    )


def test_salted_skew_build_and_merge(spark, skew_corpus):
    from sparktext.build import SALT_CHUNK, build_index
    from sparktext.merge import merge_segments

    index = build_index(spark, skew_corpus, num_segments=8)
    hot = index.term_dict.filter("term = 'hot'").collect()[0]
    assert hot["doc_freq"] == 200

    merged = merge_segments(index, 2)
    assert _topk(merged, "hot alpha") == _topk(index, "hot alpha")
    assert _topk(merged, "+hot -beta") == _topk(index, "+hot -beta")

    # postings fully intact after merge: decode and compare doc sets
    from sparktext import codec

    def docs_of(idx, term):
        pdf_rows = idx.postings.filter(F.col("term") == term).collect()
        import pandas as pd

        flat = codec.decode_blocks_pdf(pd.DataFrame([r.asDict() for r in pdf_rows]))
        return sorted(flat["doc_id"].tolist())

    assert docs_of(merged, "hot") == docs_of(index, "hot")
    assert docs_of(merged, "delta") == docs_of(index, "delta")


def test_merge_after_delete(spark, micro_index):
    """A10×A11: merge PURGES tombstones — build→delete→merge→query must
    equal build→delete→query, and deleted docs must not resurrect."""
    from sparktext.merge import merge_segments
    from sparktext.query import matched_docs, parse_query

    from tests.conftest import MICRO_DOCS

    apple_docs = {r[0] for r in MICRO_DOCS if "apple" in r[5].split()}
    victims = sorted(apple_docs)[:2]
    deleted = spark.createDataFrame([(v,) for v in victims], "doc_id long")
    tomb = micro_index.with_deletes(deleted)
    merged = merge_segments(tomb, 1)

    assert merged.deleted is None  # purged, not carried
    for q in ["apple", "heavy banana", "+apple -cherry", "apple banana cherry"]:
        assert _topk(merged, q) == _topk(tomb, q), q
    # physically absent from the merged postings, not just filtered
    import pandas as pd

    from sparktext import codec

    rows = merged.postings.filter(F.col("term") == "apple").collect()
    flat = codec.decode_blocks_pdf(pd.DataFrame([r.asDict() for r in rows]))
    assert set(flat["doc_id"]).isdisjoint(victims)
    # doc_meta purged too
    assert merged.doc_meta.filter(F.col("doc_id").isin(victims)).count() == 0


def test_merge_carries_positions(spark, micro_corpus):
    """A10×B6: phrase queries keep working on a merged positions index."""
    from sparktext.build import build_index
    from sparktext.merge import merge_segments
    from sparktext.query import phrase_docs

    idx = build_index(spark, micro_corpus, num_segments=3, with_positions=True)
    merged = merge_segments(idx, 1)
    before = sorted((r["doc_id"], round(r["score"], 9))
                    for r in phrase_docs(idx, ["apple", "banana"]).collect())
    after = sorted((r["doc_id"], round(r["score"], 9))
                   for r in phrase_docs(merged, ["apple", "banana"]).collect())
    assert before == after and before


def test_merge_recompute_stats(spark, micro_index, micro_corpus):
    """recompute_stats=True: post-purge statistics must equal a fresh
    rebuild over the alive corpus (reference post-merge semantics)."""
    from sparktext.build import build_index
    from sparktext.merge import merge_segments

    from tests.conftest import MICRO_DOCS

    apple_docs = {r[0] for r in MICRO_DOCS if "apple" in r[5].split()}
    victims = sorted(apple_docs)[:2]
    deleted = spark.createDataFrame([(v,) for v in victims], "doc_id long")
    merged = merge_segments(micro_index.with_deletes(deleted), 1, recompute_stats=True)

    fresh = build_index(
        spark, micro_corpus.filter(~F.col("doc_id").isin(victims)), num_segments=1
    )
    assert merged.stats.num_docs == fresh.stats.num_docs
    assert merged.stats.total_tokens == fresh.stats.total_tokens
    got = {
        r["term"]: (r["doc_freq"], r["total_tf"])
        for r in merged.term_dict.collect()
    }
    want = {
        r["term"]: (r["doc_freq"], r["total_tf"])
        for r in fresh.term_dict.collect()
    }
    assert got == want
    # and scores now match the fresh rebuild exactly (same ids kept)
    for q in ["apple", "heavy banana"]:
        assert _topk(merged, q) == _topk(fresh, q), q
