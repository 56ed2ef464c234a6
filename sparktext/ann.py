"""Similarity search over embedding columns (driver-mandated extension).

Input: a table with ``(vec_id: long, embedding: array<float>, ...)``.

Two paths:

- :func:`cosine_topk` — brute-force exact cosine top-k against one query
  vector. All arithmetic is JVM-side (``zip_with`` + ``aggregate`` over
  doubles, whole-stage codegen); top-k via orderBy+limit
  (TakeOrderedAndProject). The correctness baseline; at 100 TB it is a
  single narrow scan + bounded heap — no shuffle at all.
- :func:`lsh_bucketed_topk` — random-hyperplane LSH pre-filter: vectors
  are bucketed by the sign pattern of ``n_planes`` fixed pseudo-random
  hyperplanes (deterministic, seeded); the query only scores vectors in
  its own bucket (optionally hamming-adjacent buckets). The scale path:
  the scan prunes to ~1/2^n_planes of the data.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_sim_col(emb: Column, qvec: list[float]) -> Column:
    q = F.array(*[F.lit(float(v)) for v in qvec])
    e = _as_double(emb)
    qn = float(np.sqrt(np.sum(np.asarray(qvec, dtype=np.float64) ** 2)))
    return _dot(e, q) / (_norm(e) * F.lit(qn))


def cosine_topk(
    df: DataFrame,
    qvec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    round_decimals: int | None = None,
) -> DataFrame:
    sim = cosine_sim_col(F.col(emb_col), qvec)
    if round_decimals is not None:
        sim = F.round(sim, round_decimals)
    return (
        df.select(F.col(id_col), sim.alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def cosine_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    round_decimals: int | None = 6,
) -> DataFrame:
    """Exact embedding near-duplicate pairs: all (a < b) with cosine >=
    threshold. O(n^2) — the small-side/correctness path; at scale use
    :func:`lsh_cosine_pairs` (bucket equi-join instead of cross join)."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(emb_col).alias("e_a"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(emb_col).alias("e_b"))
    ea, eb = _as_double(F.col("e_a")), _as_double(F.col("e_b"))
    sim = _dot(ea, eb) / (_norm(ea) * _norm(eb))
    if round_decimals is not None:
        sim = F.round(sim, round_decimals)
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", sim.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def lsh_cosine_pairs(
    df: DataFrame,
    threshold: float,
    n_planes: int = 6,
    seed: int = 42,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    max_bucket: int | None = 1000,
) -> DataFrame:
    """Approximate near-dup pairs: candidates share a hyperplane-sign
    bucket (equi-join on bucket id — shuffles by bucket, never a cross
    join), then exact cosine filters. Recall < 1 by construction
    (P[same bucket] = (1 - theta/pi)^n_planes); raise recall with fewer
    planes or multiple tables.

    ``max_bucket`` (the 100-TB skew escape, mirroring
    :func:`sparktext.textops.lsh_candidate_pairs`): a bucket of n vectors
    joins into n² candidate rows, so a corpus with many identical or
    near-identical embeddings collapses into one sign-pattern bucket and
    goes quadratic. Buckets larger than ``max_bucket`` are dropped — a
    documented recall trade; members of a dropped bucket are
    overwhelmingly EXACT duplicates, which the scale pipeline must remove
    (exact dedup on a vector hash) BEFORE near-dup LSH. Defaults ON so
    production callers inherit the linear shape; pass ``None`` only for
    exhaustive small-scale comparisons."""
    dim = len(df.select(emb_col).first()[0])
    planes = hyperplanes(dim, n_planes, seed)
    bucketed = df.select(
        F.col(id_col), F.col(emb_col), bucket_col(F.col(emb_col), planes).alias("_b")
    )
    if max_bucket is not None:
        # Per-bucket size via one small groupBy; mega-buckets are dropped
        # BEFORE the pair join ever expands them. The size table is
        # bucket-cardinality-sized (<= 2^n_planes rows) — broadcast.
        keep = (
            bucketed.groupBy("_b").count()
            .filter(F.col("count") <= max_bucket)
            .select("_b")
        )
        bucketed = bucketed.join(F.broadcast(keep), "_b")
    a = bucketed.select(F.col(id_col).alias("id_a"), F.col(emb_col).alias("e_a"), "_b")
    b = bucketed.select(F.col(id_col).alias("id_b"), F.col(emb_col).alias("e_b"), "_b")
    ea, eb = _as_double(F.col("e_a")), _as_double(F.col("e_b"))
    sim = F.round(_dot(ea, eb) / (_norm(ea) * _norm(eb)), 6)
    return (
        a.join(b, "_b")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", sim.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def hyperplanes(dim: int, n_planes: int = 8, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def bucket_col(emb: Column, planes: np.ndarray) -> Column:
    """Sign-pattern bucket id of an embedding under fixed hyperplanes."""
    e = _as_double(emb)
    bucket = F.lit(0)
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(float(v)) for v in plane])
        bucket = bucket + F.when(_dot(e, p) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def cosine_topk_batch(
    df: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    q_id_col: str = "query_id",
    q_emb_col: str = "q_embedding",
    round_decimals: int | None = None,
) -> DataFrame:
    """Batch ANN: N query vectors -> ONE corpus scan (the throughput
    shape, mirroring :func:`sparktext.query.search_many`).

    The (small) query table broadcasts; per-(vector, query) cosine is
    pure codegen'd array arithmetic over the fanned-out rows — corpus
    norms are computed once per corpus row BEFORE the fan-out; per-query
    top-k rides WindowGroupLimit's partial per-partition heap, so the
    only shuffle is the tiny per-query heads. For thousands of queries,
    pre-filter both sides with :func:`bucket_col` (bucket equi-join)
    instead of the dense fan-out.

    Returns (query_id, vec_id, cosine), top-k per query ranked by
    (cosine desc, id asc).
    """
    from pyspark.sql import Window

    corpus = df.select(
        F.col(id_col), _as_double(F.col(emb_col)).alias("_e")
    ).withColumn("_n", _norm(F.col("_e")))
    qt = queries.select(
        F.col(q_id_col), _as_double(F.col(q_emb_col)).alias("_qe")
    ).withColumn("_qn", _norm(F.col("_qe")))
    sim = _dot(F.col("_e"), F.col("_qe")) / (F.col("_n") * F.col("_qn"))
    if round_decimals is not None:
        sim = F.round(sim, round_decimals)
    scored = corpus.join(F.broadcast(qt)).select(
        q_id_col, id_col, sim.alias("cosine")
    )
    w = Window.partitionBy(q_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def lsh_bucketed_topk(
    df: DataFrame,
    qvec: list[float],
    k: int = 10,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: exact cosine inside the query's LSH bucket."""
    dim = len(qvec)
    planes = hyperplanes(dim, n_planes, seed)
    qb = 0
    qarr = np.asarray(qvec, dtype=np.float64)
    for i, plane in enumerate(planes):
        if float(plane @ qarr) >= 0:
            qb |= 1 << i
    candidates = df.filter(bucket_col(F.col(emb_col), planes) == F.lit(qb))
    return cosine_topk(candidates, qvec, k, id_col, emb_col)


# ------------------------------------------------------------- IVF ANN ----
# The coarse-quantizer scale path (FAISS's IndexIVFFlat shape, public
# design): k-means centroids partition the corpus into inverted lists;
# a query scores only the nprobe nearest lists. Training and assignment
# are JVM-side (Spark MLlib KMeans); the centroid table is tiny and
# lives on the driver. Complements the hyperplane-LSH path: IVF adapts
# to the data distribution (learned cells vs fixed random planes), at
# the cost of a training pass.


def ivf_build(
    df: DataFrame,
    n_lists: int = 16,
    max_iter: int = 10,
    seed: int = 42,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
):
    """Train the coarse quantizer and assign every vector to its list.

    Returns ``(assigned_df, centroids)``: the input plus an ``ivf_list``
    int column (write it as a partition/bucket column at scale — a probe
    then prunes files exactly like term_bucket does for postings), and
    the (n_lists, dim) numpy centroid matrix for the driver-side probe
    selection."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    vecs = df.withColumn("_v", array_to_vector(_as_double(F.col(emb_col))))
    model = KMeans(
        k=n_lists, maxIter=max_iter, seed=seed, featuresCol="_v",
        predictionCol="ivf_list",
    ).fit(vecs)
    assigned = model.transform(vecs).drop("_v")
    centroids = np.vstack([np.asarray(c) for c in model.clusterCenters()])
    return assigned, centroids


def ivf_topk(
    assigned: DataFrame,
    centroids: np.ndarray,
    qvec: list[float],
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    round_decimals: int | None = None,
) -> DataFrame:
    """Approximate cosine top-k scanning only the ``nprobe`` lists whose
    centroids lie nearest the query (driver-side argsort over the tiny
    centroid matrix — no extra job). ``nprobe == n_lists`` degenerates
    to the exact brute-force scan (asserted in tests)."""
    q = np.asarray(qvec, dtype=np.float64)
    d2 = ((centroids - q) ** 2).sum(axis=1)
    probes = [int(i) for i in np.argsort(d2)[: max(1, nprobe)]]
    cand = assigned.filter(F.col("ivf_list").isin(probes))
    return cosine_topk(cand, qvec, k, id_col, emb_col, round_decimals)
