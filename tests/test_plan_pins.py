"""Plan-shape regression pins for the bench-suite text/ANN operators.

Round-3 verdict flagged unattributed wall-time swings on op_simhash and
op_ann_cosine; their PLANS never changed. These tests pin the shapes so a
future real plan regression (extra exchange, accidental cross join,
lost TakeOrderedAndProject) fails loudly instead of surfacing as an
unexplained bench delta. Modeled on test_manifest's plan-prune assert.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs_df(spark):
    rows = [(i, f"alpha beta gamma doc{i} alpha") for i in range(50)]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def emb_small(spark):
    import numpy as np

    rng = np.random.default_rng(11)
    rows = [(i, [float(x) for x in rng.standard_normal(8)]) for i in range(40)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_simhash_plan_exchanges_no_join(spark, docs_df):
    """Production (xxhash64) simhash = one explode + ONE fused hash-agg
    shuffle; the sha oracle twin pays its documented second exchange for
    the (doc, term) tf pre-agg. Neither ever joins."""
    from sparktext.textops import simhash

    spark.conf.set("spark.sql.debug.maxToStringFields", "2000")
    for hash_fn, max_exchanges in [("xxhash64", 1), ("sha256", 2)]:
        plan = _plan(simhash(docs_df, hash_fn=hash_fn))
        assert "CartesianProduct" not in plan, hash_fn
        assert "BroadcastNestedLoopJoin" not in plan, hash_fn
        assert "SortMergeJoin" not in plan, hash_fn
        n_exchanges = plan.count("Exchange hashpartitioning")
        assert 1 <= n_exchanges <= max_exchanges, (hash_fn, plan)


def test_ann_cosine_topk_plan_no_shuffle(spark, emb_small):
    """Brute-force cosine top-k = narrow scan + TakeOrderedAndProject:
    a bounded per-partition heap, ZERO exchanges before the final take."""
    from sparktext.ann import cosine_topk

    plan = _plan(cosine_topk(emb_small, [1.0] * 8, 10))
    assert "TakeOrderedAndProject" in plan, plan
    assert "Exchange hashpartitioning" not in plan, plan
    assert "CartesianProduct" not in plan
    assert "Join" not in plan


def test_single_term_query_plan_no_exchange(micro_index):
    """Round 6: a single-scored-term query decodes at most one posting
    row per doc, so matched_docs skips the groupBy(doc_id) — the plan is
    decode -> project -> TakeOrderedAndProject with ZERO exchanges. A
    multi-term query (and any must_not) keeps its aggregation exchange."""
    from sparktext.query import matched_docs, parse_query
    from sparktext.topk import top_k

    single = _plan(top_k(matched_docs(micro_index, parse_query("apple")), 5))
    assert "TakeOrderedAndProject" in single, single
    assert "Exchange hashpartitioning" not in single, single

    multi = _plan(top_k(matched_docs(micro_index, parse_query("apple banana")), 5))
    assert "Exchange hashpartitioning" in multi, multi
    # must + single term still takes the shuffle-free path
    must1 = _plan(top_k(matched_docs(micro_index, parse_query("+apple")), 5))
    assert "Exchange hashpartitioning" not in must1, must1
    # must_not adds an exclusion term to the scan -> aggregation returns
    mn = _plan(top_k(matched_docs(micro_index, parse_query("apple -banana")), 5))
    assert "Exchange hashpartitioning" in mn, mn


def test_must_query_single_aggregate_phase(micro_index):
    """Round 6: the must-hit counter is a plain filtered count (decode
    rows are unique per (doc, term)), so the boolean aggregation stays
    ONE hash-aggregate phase — count_distinct would plan a second
    aggregate/Exchange (measured 2x wall, 4 jobs vs 2, at local[32])."""
    from sparktext.query import matched_docs, parse_query
    from sparktext.topk import top_k

    plan = _plan(top_k(matched_docs(micro_index, parse_query("+apple +banana")), 5))
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "expand" not in plan.lower(), plan


def test_simhash_and_ann_row_counts(spark, docs_df, emb_small):
    """Cheap result pins next to the plan pins: row counts are exact."""
    from sparktext.ann import cosine_topk
    from sparktext.textops import simhash

    assert simhash(docs_df).count() == 50
    assert simhash(docs_df, hash_fn="xxhash64").count() == 50
    assert cosine_topk(emb_small, [1.0] * 8, 10).count() == 10


def test_simhash_xxhash64_locality(spark):
    """Both hash families share the simhash locality property: a one-word
    edit stays hamming-close, an unrelated doc lands far."""
    from sparktext.textops import simhash

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    near = base.replace("kappa", "lambda")
    far = "one two three four five six seven eight nine ten"
    df = spark.createDataFrame(
        [(0, base), (1, near), (2, far)], "doc_id long, text string"
    )
    for hash_fn in ("sha256", "xxhash64"):
        sh = {r["doc_id"]: r["simhash"] for r in simhash(df, hash_fn=hash_fn).collect()}
        d_near = bin(sh[0] ^ sh[1]).count("1")
        d_far = bin(sh[0] ^ sh[2]).count("1")
        assert d_near < d_far, (hash_fn, d_near, d_far)
        # determinism across calls
        sh2 = {r["doc_id"]: r["simhash"] for r in simhash(df, hash_fn=hash_fn).collect()}
        assert sh == sh2, hash_fn
