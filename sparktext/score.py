"""BM25 scoring (B8) and block-max WAND pruning (B10).

BM25 exactly as tantivy's public formula (k1=1.2, b=0.75):

    idf(t)       = ln(1 + (N - df + 0.5) / (df + 0.5))
    score(d, t)  = idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl))

where ``dl`` is the DECODED QUANTIZED fieldnorm (sparktext.fieldnorm §4.5)
and ``avgdl`` the exact corpus mean token count. The score is a pure
column expression over decoded postings — whole-stage-codegen'd, no UDF.

Block-max WAND here is a *data-parallel two-phase* reformulation of
tantivy's document-at-a-time algorithm (no Catalyst equivalent, §4.3):

- every block row carries (max_tf, min_norm_id); its score upper bound is
  the BM25 formula evaluated at tf=max_tf, dl=decode(min_norm_id) — BM25
  is increasing in tf and decreasing in dl, so this bounds any doc in it;
- phase 1 decodes only the few highest-bound blocks per term and scores
  them exactly; the k-th best *partial* score is a valid lower bound θ of
  the final k-th best score — this is the ONLY driver action in the
  pruning path (one job, no persist);
- phase 2 keeps block B of term t in segment s iff
  ub(B) + Σ_{t'≠t} max_ub(t', s) >= θ. The "other terms" bound is
  PER-SEGMENT (a doc's postings live in exactly one segment, so only
  same-segment blocks of other terms can contribute to its score) — far
  tighter than a global per-term bound when impact is clustered by doc
  range, which is exactly the layout block-max WAND exploits. The bound
  table is computed lazily from block headers (a groupBy 128x smaller
  than postings) and broadcast-joined back — no second collect.

Correctness: if B is pruned, every doc d in B has true score
<= ub(B) + Σ_{t'≠t} max_ub(t', seg(d)) < θ <= k-th best; so no true
top-k member ever loses a block (contradiction: its total would be < θ),
and a pruned doc's underestimated score stays strictly below every true
top-k score. Results are therefore identical to exhaustive scoring
(asserted in tests/test_wand.py).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from sparktext.fieldnorm import FIELDNORM_TABLE

K1 = 1.2
B = 0.75


def idf(num_docs: int, doc_freq: int) -> float:
    return math.log(1.0 + (num_docs - doc_freq + 0.5) / (doc_freq + 0.5))


def term_stats(index, terms: list[str]) -> dict[str, dict]:
    """Driver-side lookup of per-term statistics from the term dictionary.

    The term_dict is tiny relative to the corpus (vocabulary-sized); a
    filtered collect of <= len(terms) rows is the broadcast-dictionary
    pattern of BASELINE.json north_star ("document-frequency/length
    statistics carried in a broadcast term dictionary").
    """
    uniq = sorted(set(t for t in terms if t))
    if not uniq:
        return {}
    rows = index.term_dict.filter(F.col("term").isin(uniq)).collect()
    n = index.stats.num_docs
    return {
        r["term"]: {
            "doc_freq": r["doc_freq"],
            "total_tf": r["total_tf"],
            "term_bucket": r["term_bucket"],
            "idf": idf(n, r["doc_freq"]),
        }
        for r in rows
    }


def _decoded_norm_col(norm_id_col: Column) -> Column:
    """norm_id -> quantized doc length via a 256-literal array lookup
    (stays inside whole-stage codegen; no UDF)."""
    table = F.array(*[F.lit(int(v)) for v in FIELDNORM_TABLE])
    return F.element_at(table, norm_id_col.cast("int") + 1).cast("double")


def _idf_map_col(stats_map: dict[str, dict], term_col: Column) -> Column:
    pairs = []
    for t, s in stats_map.items():
        pairs.extend([F.lit(t), F.lit(float(s["idf"]))])
    return F.element_at(F.create_map(*pairs), term_col)


def bm25_score_col(index, stats_map, term_col, tf_col, norm_id_col) -> Column:
    """The B8 score as a single column expression."""
    avgdl = float(index.stats.avg_len)
    dl = _decoded_norm_col(norm_id_col)
    tf = tf_col.cast("double")
    idf_c = _idf_map_col(stats_map, term_col)
    return idf_c * tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / F.lit(avgdl)))


def block_ub_col(index, stats_map) -> Column:
    """Per-block score upper bound from (max_tf, min_norm_id)."""
    avgdl = float(index.stats.avg_len)
    dl = _decoded_norm_col(F.col("min_norm_id"))
    tf = F.col("max_tf").cast("double")
    idf_c = _idf_map_col(stats_map, F.col("term"))
    return idf_c * tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / F.lit(avgdl)))


def wand_candidate_blocks(index, terms: list[str], k: int, stats_map=None) -> DataFrame:
    """Phase-1+2 block pruning; returns the surviving block rows, LAZILY.

    Fully declarative: θ is a 1-row DataFrame (k-th best exact partial
    sum over the per-term seed blocks) cross-broadcast-joined into the
    survivor filter as a scalar — no collect, no persist, no extra driver
    job. The entire WAND query (seed scoring -> θ -> bound filter ->
    survivor decode -> BM25 -> top-k) executes as ONE Spark job, the same
    count as the exhaustive path; the seed/bounds subtrees are
    header-level (128x smaller than postings) and broadcast-sized.
    """
    from sparktext.query import postings_for_terms  # local import: cycle

    if stats_map is None:
        stats_map = term_stats(index, terms)
    present = [t for t in terms if t in stats_map]
    buckets = sorted({stats_map[t]["term_bucket"] for t in present})

    # All header-level math (seed selection, per-segment bounds) runs on
    # the block-header mini-cache — NOT through the payload-bearing
    # postings cache, which these subtrees would otherwise re-scan once
    # each per query. Only two payload scans remain: the seed fetch and
    # the survivor decode.
    hdr = index.block_headers().filter(
        F.col("term_bucket").isin(buckets) & F.col("term").isin(present)
    ).withColumn("_ub", block_ub_col(index, stats_map))

    seeds_per_term = max(1, math.ceil(k / 128)) + 1
    w = Window.partitionBy("term").orderBy(
        F.desc("_ub"), F.asc("segment_id"), F.asc("block_id")
    )
    seed_keys = (
        hdr.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= seeds_per_term)
        .select("segment_id", "term", "block_id")
    )

    # Phase 1: exact partial sums over the seed blocks -> θ as a 1-row
    # DataFrame. θ = k-th best seed total when >= k seed docs exist, else
    # 0 (prune nothing). A valid lower bound on the final k-th best.
    from sparktext import codec

    blocks = postings_for_terms(index, present, stats_map)
    seed_blocks = blocks.join(
        F.broadcast(seed_keys), ["segment_id", "term", "block_id"]
    )
    theta_df = (
        seed_blocks.select("segment_id", "term", "count", "first_doc",
                           "doc_bits", "doc_bytes", "tf_bytes", "norm_bytes")
        .mapInPandas(
            lambda it: (codec.decode_blocks_pdf(pdf) for pdf in it),
            schema="segment_id int, term string, doc_id long, tf long, norm_id long",
        )
        .withColumn("partial", bm25_score_col(index, stats_map, F.col("term"), F.col("tf"), F.col("norm_id")))
        .groupBy("doc_id").agg(F.sum("partial").alias("s"))
        .orderBy(F.desc("s")).limit(k)
        .agg(
            F.when(F.count("*") >= k, F.min("s")).otherwise(F.lit(0.0)).alias("_theta")
        )
    )

    # Phase 2: per-(segment, term) max bounds from block headers; keep
    # block B of term t in segment s iff ub(B) + Σ_{t'≠t} max_ub(t', s)
    # >= θ. The bound test alone is safe for EVERY block (any pruned
    # block's docs have true score < θ, and every true top-k doc's blocks
    # pass), so no seed carve-out is needed. The per-term maxes are
    # pivoted into ONE groupBy(segment) (query terms are few), so the
    # bound table costs a single small exchange.
    uniq = sorted(stats_map)
    seg_bounds = hdr.groupBy("segment_id").agg(*[
        F.coalesce(
            F.max(F.when(F.col("term") == t, F.col("_ub"))), F.lit(0.0)
        ).alias(f"_ub{i}")
        for i, t in enumerate(uniq)
    ])
    tot = sum(F.col(f"_ub{i}") for i in range(len(uniq)))
    my_ub = None
    for i, t in enumerate(uniq):
        cond = F.col("term") == t
        my_ub = F.when(cond, F.col(f"_ub{i}")) if my_ub is None else my_ub.when(cond, F.col(f"_ub{i}"))
    survivors = (
        blocks.withColumn("_ub", block_ub_col(index, stats_map))
        .join(F.broadcast(seg_bounds), "segment_id")
        .join(F.broadcast(theta_df))
        .filter(F.col("_ub") + (tot - my_ub) >= F.col("_theta"))
    )
    return survivors.drop(
        "_ub", "_theta", *[f"_ub{i}" for i in range(len(uniq))]
    )
