"""Similarity search: exact top-k, LSH bucketing, near-dup pairs."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def emb_df(spark):
    rng = np.random.default_rng(3)
    rows = []
    base = rng.standard_normal(16).astype(np.float32)
    for i in range(80):
        v = rng.standard_normal(16).astype(np.float32)
        rows.append((i, [float(x) for x in v]))
    # two planted near-duplicates of vector 0
    v0 = np.array(rows[0][1], dtype=np.float64)
    rows.append((80, [float(x) for x in v0 + 0.01 * rng.standard_normal(16)]))
    rows.append((81, [float(x) for x in v0 * 1.5]))  # same direction
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _np_cosines(rows, qvec):
    q = np.asarray(qvec, dtype=np.float64)
    out = {}
    for r in rows:
        v = np.asarray(r["embedding"], dtype=np.float64)
        out[r["vec_id"]] = float(v @ q / (np.linalg.norm(v) * np.linalg.norm(q)))
    return out

def test_cosine_topk_exact(spark, emb_df):
    from sparktext.ann import cosine_topk

    rows = emb_df.collect()
    qvec = [float(x) for x in rows[0]["embedding"]]
    sims = _np_cosines(rows, qvec)
    exp = sorted(sims.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    got = [(r["vec_id"], r["cosine"]) for r in cosine_topk(emb_df, qvec, 5).collect()]
    assert [g[0] for g in got] == [e[0] for e in exp]
    for (gid, gs), (eid, es) in zip(got, exp):
        assert gs == pytest.approx(es, abs=1e-9)
    # planted near-dups rank at the top (after self)
    assert set(g[0] for g in got[:3]) == {0, 80, 81}


def test_cosine_pairs_threshold(spark, emb_df):
    from sparktext.ann import cosine_pairs

    got = {(r["id_a"], r["id_b"]) for r in cosine_pairs(emb_df, 0.95).collect()}
    assert (0, 80) in got and (0, 81) in got
    assert (80, 81) in got


def test_lsh_pairs_subset_and_recall(spark, emb_df):
    from sparktext.ann import cosine_pairs, lsh_cosine_pairs

    exact = {(r["id_a"], r["id_b"]) for r in cosine_pairs(emb_df, 0.9).collect()}
    lsh = {(r["id_a"], r["id_b"]) for r in lsh_cosine_pairs(emb_df, 0.9, n_planes=4).collect()}
    assert lsh <= exact
    # near-identical vectors almost surely share all 4 sign buckets
    assert (0, 80) in lsh and (0, 81) in lsh


def test_lsh_topk_contains_near_dups(spark, emb_df):
    from sparktext.ann import lsh_bucketed_topk

    rows = emb_df.collect()
    qvec = [float(x) for x in rows[0]["embedding"]]
    got = [r["vec_id"] for r in lsh_bucketed_topk(emb_df, qvec, k=3, n_planes=4).collect()]
    assert got[0] == 0
    assert set(got) <= {0, 80, 81} | set(range(82))
    assert 80 in got and 81 in got


def test_cosine_topk_batch_matches_single(spark):
    """Batch ANN must equal N single-query runs exactly."""
    from pyspark.sql import functions as F

    from sparktext.ann import cosine_topk, cosine_topk_batch

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qids = [0, 3, 7]
    qs = emb.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_embedding")
    )
    batch = cosine_topk_batch(emb, qs, k=5, round_decimals=6)
    got = {}
    for r in batch.collect():
        got.setdefault(r["query_id"], []).append((r["vec_id"], r["cosine"]))
    assert set(got) == set(qids)
    for qid in qids:
        qvec = [float(x) for x in emb.filter(F.col("vec_id") == qid).first()["embedding"]]
        single = [(r["vec_id"], r["cosine"])
                  for r in cosine_topk(emb, qvec, 5, round_decimals=6).collect()]
        assert sorted(got[qid], key=lambda t: (-t[1], t[0])) == single, qid


def test_lsh_cosine_pairs_mega_bucket_cap(spark, emb_df):
    """The 100-TB skew escape: 1000 identical embeddings collapse into
    one sign-pattern bucket; with max_bucket set, that bucket is dropped
    BEFORE the pair join can go quadratic, while distinct near-dups in
    other buckets still come back."""
    from sparktext.ann import lsh_cosine_pairs

    rows = emb_df.collect()
    # the duplicate block is the NEGATION of vector 0: every hyperplane
    # sign flips, so its bucket is disjoint from vector 0's bucket and
    # the planted (0, 80)/(0, 81) near-dups are never collateral damage
    v0 = rows[0]["embedding"]
    dup = [(1000 + i, [float(-x) for x in v0]) for i in range(1000)]
    big = emb_df.union(
        spark.createDataFrame(dup, "vec_id long, embedding array<float>")
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in lsh_cosine_pairs(big, 0.9, n_planes=4, max_bucket=50).collect()
    }
    # the mega-bucket of identical vectors is dropped wholesale
    assert not any(a >= 1000 and b >= 1000 for a, b in got)
    # distinct near-dups in healthy buckets survive
    assert (0, 80) in got and (0, 81) in got
    # uncapped, the identical block WOULD pair up (sanity of the fixture)
    some = (
        lsh_cosine_pairs(big.filter("vec_id >= 1000 and vec_id < 1010"), 0.9, n_planes=4)
        .count()
    )
    assert some == 45  # 10 choose 2


def test_ivf_topk_recall_and_full_probe_exact(spark, emb_df):
    """IVF coarse quantizer: planted near-dups share the query's cell
    (identical direction, tiny offset), and probing ALL lists equals the
    exact brute-force top-k."""
    from sparktext.ann import cosine_topk, ivf_build, ivf_topk

    assigned, centroids = ivf_build(emb_df, n_lists=8, seed=7)
    assert centroids.shape == (8, 16)
    # every vector landed in exactly one list
    assert assigned.count() == emb_df.count()

    rows = emb_df.collect()
    qvec = [float(x) for x in rows[0]["embedding"]]
    got = [r["vec_id"] for r in ivf_topk(assigned, centroids, qvec, k=3, nprobe=2).collect()]
    assert got[0] == 0 and 80 in got and 81 in got

    exact = [(r["vec_id"], round(r["cosine"], 9))
             for r in cosine_topk(emb_df, qvec, 10).collect()]
    full = [(r["vec_id"], round(r["cosine"], 9))
            for r in ivf_topk(assigned, centroids, qvec, k=10, nprobe=8).collect()]
    assert full == exact
