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

    Looked-up stats are MEMOIZED per Index instance (``Index._tstats``,
    including negative entries for absent terms): the per-query collect
    job (~0.35 s at local[32] — measured round 6) is paid once per
    distinct term, not once per query. This is the in-memory term
    dictionary every engine keeps, not result caching: stats depend only
    on the immutable postings of this Index instance.
    """
    uniq = sorted(set(t for t in terms if t))
    if not uniq:
        return {}
    cache = getattr(index, "_tstats", None)
    if cache is None:
        cache = {}
    missing = [t for t in uniq if t not in cache]
    if missing:
        rows = index.term_dict.filter(F.col("term").isin(missing)).collect()
        n = index.stats.num_docs
        for r in rows:
            cache[r["term"]] = {
                "doc_freq": r["doc_freq"],
                "total_tf": r["total_tf"],
                "term_bucket": r["term_bucket"],
                "idf": idf(n, r["doc_freq"]),
            }
        for t in missing:
            cache.setdefault(t, None)  # negative entry: term not in dict
    return {t: cache[t] for t in uniq if cache.get(t) is not None}


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


#: Driver-side bound table gate: the per-(segment, term) max-ub table is
#: collected and inlined as literal map lookups when it has at most this
#: many rows (segments x query terms — a query-sized lookup, same class
#: as the term_stats collect). Beyond it, the distributed pivot +
#: broadcast-join plan takes over. The literal path removes TWO AQE
#: stage materializations (the seg-bounds groupBy exchange and its
#: broadcast) from WAND's fixed cost — the round-3 verdict's reason the
#: pruning plan never repaid itself below ~24M postings.
WAND_DRIVER_BOUNDS_MAX = 4096


def _boost_mult_col(boosts: dict[str, float], term_col: Column) -> Column:
    """Per-term positive boost multiplier as a literal map (1.0 default)."""
    pairs = []
    for t, b in boosts.items():
        if b != 1.0:
            pairs.extend([F.lit(t), F.lit(float(b))])
    if not pairs:
        return F.lit(1.0)
    return F.coalesce(F.element_at(F.create_map(*pairs), term_col), F.lit(1.0))


def _seed_key_cond(hdr: DataFrame, k: int):
    """Literal filter selecting the few highest-ub blocks per term.

    The keys are tiny (seeds_per_term x |terms| rows, collected from the
    header mini-cache) so an isin over a fused key string beats a
    broadcast join by one whole exchange materialization.
    """
    seeds_per_term = max(1, math.ceil(k / 128)) + 1
    w = Window.partitionBy("term").orderBy(
        F.desc("_ub"), F.asc("segment_id"), F.asc("block_id")
    )
    seed_rows = (
        hdr.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= seeds_per_term)
        .select("segment_id", "term", "block_id")
        .collect()
    )
    keys = [f"{r['segment_id']}|{r['term']}|{r['block_id']}" for r in seed_rows]
    return F.concat_ws(
        "|", F.col("segment_id"), F.col("term"), F.col("block_id")
    ).isin(keys)


def _theta_from_decoded(index, stats_map, boosts, dec, k: int) -> float:
    """θ from an already-decoded seed posting frame (columns term,
    doc_id, tf, norm_id): the k-th best per-doc partial sum, scored with
    the same BM25 formula in numpy. 0 when fewer than k seed docs —
    prune nothing. The batch path calls this once per query over ONE
    shared decode (sliced to the query's terms by the caller)."""
    import numpy as np
    import pandas as pd

    if len(dec) == 0:
        return 0.0
    idf_map = {t: s["idf"] * boosts.get(t, 1.0) for t, s in stats_map.items()}
    idf = dec["term"].map(idf_map).to_numpy(dtype=np.float64)
    tf = dec["tf"].to_numpy(dtype=np.float64)
    dl = np.asarray(FIELDNORM_TABLE, dtype=np.float64)[
        dec["norm_id"].to_numpy(dtype=np.int64)
    ]
    avgdl = float(index.stats.avg_len)
    part = idf * tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / avgdl))
    sums = pd.Series(part).groupby(dec["doc_id"].to_numpy()).sum()
    if len(sums) < k:
        return 0.0
    theta = float(np.sort(sums.to_numpy())[-k])
    # Relative slack: numpy/pandas accumulate in a different order than
    # the JVM expression tree, so θ can land a few ulps ABOVE the exact
    # JVM score of a tied doc — and '>= θ' would then prune blocks of
    # docs the exhaustive plan returns. θ only needs to be a LOWER
    # bound; 1e-9 relative covers any last-ulp ordering difference at
    # the cost of keeping a vanishing sliver of extra blocks.
    return theta - max(abs(theta) * 1e-9, 1e-12)


def _theta_local(index, stats_map, boosts, rows, k: int) -> float:
    """θ computed on the DRIVER from collected seed-block payloads:
    decode with the local codec then :func:`_theta_from_decoded`.
    Bounded work: the caller collects at most seeds_per_term x |terms|
    block rows."""
    if not rows:
        return 0.0
    import pandas as pd

    from sparktext import codec

    dec = codec.decode_blocks_pdf(pd.DataFrame([r.asDict() for r in rows]))
    return _theta_from_decoded(index, stats_map, boosts, dec, k)


def wand_candidate_blocks(index, terms: list[str], k: int, stats_map=None) -> DataFrame:
    """Should-only entry point (kept for the bench counters and older
    call sites) — see :func:`wand_blocks_for_query` for the general
    must/must_not/boost-aware pruning."""
    from sparktext.query import Query  # local import: cycle

    return wand_blocks_for_query(index, Query(should=list(terms)), k, stats_map)


def wand_blocks_for_query(index, query, k: int, stats_map=None) -> DataFrame:
    """Block-max pruning for a full boolean query; returns the block rows
    the scorer must decode, LAZILY.

    Plan shape: ONE header-cache job collects the per-(segment, term)
    bound table AND the seed block keys together (bounded by
    :data:`WAND_DRIVER_BOUNDS_MAX` rows — query-sized, the same class of
    driver action as the term_stats lookup); for pure-should queries a
    second tiny job fetches the few seed payload blocks so θ becomes a
    LITERAL, and the main query job then has the exhaustive plan's exact
    stage count over ~1% of the blocks. Pieces:

    - **θ seed**: with MUST clauses, the seed set is ALL blocks of the
      must (+ must_not) terms — they must be decoded anyway, and the
      k-th best boosted must-partial sum over docs passing the boolean
      filter is a valid lower bound of the final k-th best score (should
      partials only ADD); θ rides as a 1-row DataFrame broadcast into
      the survivor filter. Without must, the seeds are the few
      highest-ub blocks per scored term (classic block-max seeding,
      here the per-(term, segment) top blocks from the bounds collect),
      decoded ON THE DRIVER with the local codec → θ literal; must_not
      seeds are decoded distributed so excluded docs can't inflate θ.
    - **bounds**: per-(segment, term) max block ubs (boost-scaled),
      inlined as literal maps (zero exchanges); geometries past
      WAND_DRIVER_BOUNDS_MAX fall back to the distributed pivot +
      broadcast plan with a distributed θ.
    - **pruning applies only to should-only terms**: keep block B of
      term t in segment s iff ub(B) + Σ_{t'≠t, scored} max_ub(t', s) >=
      θ. Must/must_not blocks always pass (the boolean filter needs
      them). Correctness: a pruned block's docs have true score below θ
      <= k-th best, and every true top-k doc keeps ALL its blocks (its
      real score >= θ certifies every per-term bound test), so results
      are identical to exhaustive — asserted incl. must/boost variants
      in tests/test_wand.py.

    Boosts must be POSITIVE (the caller gates): ub * boost bounds the
    boosted partial only for boost > 0.
    """
    from sparktext import codec
    from sparktext.query import postings_for_terms  # local import: cycle

    if stats_map is None:
        stats_map = term_stats(index, query.scored_terms + query.must_not)
    scored = [t for t in query.scored_terms if t in stats_map]
    must = sorted({t for t in query.must if t in stats_map})
    mn = sorted({t for t in query.must_not if t in stats_map})
    should_only = [t for t in scored if t not in set(must)]
    boosts = {t: float(query.boosts.get(t, 1.0)) for t in scored}

    all_terms = sorted(set(scored) | set(mn))
    blocks = postings_for_terms(index, all_terms, stats_map)
    if not should_only:
        return blocks  # pure-must query: nothing prunable

    buckets = sorted({stats_map[t]["term_bucket"] for t in scored})
    hdr = index.block_headers().filter(
        F.col("term_bucket").isin(buckets) & F.col("term").isin(scored)
    ).withColumn(
        "_ub", block_ub_col(index, stats_map) * _boost_mult_col(boosts, F.col("term"))
    )

    # --- bounds (tiny header-cache job) ------------------------------
    bound_rows = (
        hdr.groupBy("segment_id", "term").agg(F.max("_ub").alias("m"))
        .limit(WAND_DRIVER_BOUNDS_MAX + 1)
        .collect()
    )
    driver_mode = len(bound_rows) <= WAND_DRIVER_BOUNDS_MAX

    # --- θ seed ------------------------------------------------------
    anchor_terms = sorted(set(must) | set(mn))
    theta_df = None
    theta_lit: float | None = None
    if not (must or mn) and driver_mode:
        # Pure-should query, bounded geometry: collect the GLOBAL top
        # seed block keys per term (a window over the header cache —
        # deliberately global, not per-segment: the best seed blocks of
        # different terms tend to cover the SAME high-impact doc ranges,
        # and θ quality comes from that overlap), fetch those few payload
        # rows, decode with the local codec, and inline θ as a LITERAL.
        # The pruned plan then has the exhaustive plan's exact stage
        # count — the θ subtree's three AQE materializations (decode
        # exchange, doc groupBy, top-k limit) vanish, which was the
        # round-3 fixed cost that kept pruning from ever repaying itself
        # locally.
        seed_payload = (
            blocks.filter(_seed_key_cond(hdr, k))
            .select("segment_id", "term", "count", "first_doc",
                    "doc_bits", "doc_bytes", "tf_bytes", "norm_bytes")
            .collect()
        )
        theta_lit = _theta_local(index, stats_map, boosts, seed_payload, k)
    else:
        # must/must_not anchors are unbounded postings (and the >4096-row
        # fallback keeps everything distributed), so θ stays a 1-row
        # DataFrame broadcast into the survivor filter.
        if must:
            seed_blocks = blocks.filter(F.col("term").isin(anchor_terms))
        else:
            seed_cond = _seed_key_cond(hdr, k)
            if mn:
                seed_cond = seed_cond | F.col("term").isin(mn)
            seed_blocks = blocks.filter(seed_cond)
        seed_partial = F.when(
            F.col("term").isin(mn) & ~F.col("term").isin(scored), F.lit(0.0)
        ).otherwise(
            bm25_score_col(index, stats_map, F.col("term"), F.col("tf"), F.col("norm_id"))
            * _boost_mult_col(boosts, F.col("term"))
        )
        seed_aggs = [F.sum("partial").alias("s")]
        if must:
            # count == count_distinct here: (doc, term) decode rows are
            # unique, and count_distinct costs an extra aggregate phase.
            seed_aggs.append(
                F.count(
                    F.when(F.col("term").isin(must), F.lit(1))
                ).alias("_mh")
            )
        if mn:
            seed_aggs.append(
                F.max(F.when(F.col("term").isin(mn), 1).otherwise(0)).alias("_mn")
            )
        seed_docs = (
            seed_blocks.select("segment_id", "term", "count", "first_doc",
                               "doc_bits", "doc_bytes", "tf_bytes", "norm_bytes")
            .mapInPandas(
                lambda it: (codec.decode_blocks_pdf(pdf) for pdf in it),
                schema="segment_id int, term string, doc_id long, tf long, norm_id long",
            )
            .withColumn("partial", seed_partial)
            .groupBy("doc_id").agg(*seed_aggs)
        )
        if must:
            seed_docs = seed_docs.filter(F.col("_mh") == len(must))
        if mn:
            seed_docs = seed_docs.filter(F.col("_mn") == 0)
        theta_df = (
            seed_docs.orderBy(F.desc("s")).limit(k)
            .agg(
                F.when(F.count("*") >= k, F.min("s")).otherwise(F.lit(0.0)).alias("_theta")
            )
        )

    # --- survivor filter ---------------------------------------------
    prunable = blocks.filter(F.col("term").isin(should_only)).withColumn(
        "_ub", block_ub_col(index, stats_map) * _boost_mult_col(boosts, F.col("term"))
    )
    if driver_mode:
        # literal maps: other(t, s) = total(s) - max_ub(t, s); pure
        # codegen lookups, zero extra exchanges in the survivor subtree.
        totals: dict[int, float] = {}
        own: dict[str, float] = {}
        for r in bound_rows:
            totals[r["segment_id"]] = totals.get(r["segment_id"], 0.0) + r["m"]
            own[f"{r['term']}|{r['segment_id']}"] = r["m"]
        tot_pairs = []
        for s, v in totals.items():
            tot_pairs.extend([F.lit(s), F.lit(v)])
        own_pairs = []
        for ky, v in own.items():
            own_pairs.extend([F.lit(ky), F.lit(v)])
        other = (
            F.element_at(F.create_map(*tot_pairs), F.col("segment_id"))
            - F.element_at(
                F.create_map(*own_pairs),
                F.concat_ws("|", F.col("term"), F.col("segment_id")),
            )
        )
        if theta_lit is not None:
            survivors = prunable.filter(
                F.col("_ub") + other >= F.lit(theta_lit)
            ).drop("_ub")
        else:
            survivors = (
                prunable.join(F.broadcast(theta_df))
                .filter(F.col("_ub") + other >= F.col("_theta"))
                .drop("_ub", "_theta")
            )
    else:
        uniq = sorted(set(scored))
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
        joined = prunable.join(F.broadcast(seg_bounds), "segment_id")
        if theta_lit is not None:
            survivors = joined.filter(
                F.col("_ub") + (tot - my_ub) >= F.lit(theta_lit)
            ).drop("_ub", *[f"_ub{i}" for i in range(len(uniq))])
        else:
            survivors = (
                joined.join(F.broadcast(theta_df))
                .filter(F.col("_ub") + (tot - my_ub) >= F.col("_theta"))
                .drop("_ub", "_theta", *[f"_ub{i}" for i in range(len(uniq))])
            )
    if anchor_terms:
        survivors = blocks.filter(F.col("term").isin(anchor_terms)).unionByName(
            survivors
        )
    return survivors


#: Batch bound-table cap: the batch pruning path collects per-(segment,
#: term) max-ub rows for the union of pure-should batch terms. Beyond
#: this many rows the driver-side threshold fold (and either survivor
#: plan) stops being query-sized — fall back to the exhaustive batch.
WAND_BATCH_BOUNDS_MAX = 65536

#: One-collect header fast path (round 6): when the batch terms' block
#: HEADERS fit under this many rows (~rows x 40 B = 10 MB driver-side,
#: = cap x 128 ≈ 33M candidate postings), ONE collect of (segment, term,
#: block_id, ub) replaces the separate bounds-groupBy collect and the
#: seed-key window collect — one driver job instead of two in the batch
#: pruning fixed cost. Larger geometries keep the two-job distributed
#: path.
WAND_HEADER_ROWS_MAX = 262144


def wand_blocks_for_batch(
    index,
    live: dict,
    k: int,
    stats_map: dict,
    terms: list[str],
    wand_min_postings: int,
) -> DataFrame | None:
    """Block-max pruning for a :func:`sparktext.query.search_many` batch
    (B10 x batch): returns the posting-block rows the shared batch
    decode must cover, or ``None`` when pruning is inapplicable (the
    caller then decodes the full union — results identical either way).

    A block survives iff it survives for ANY query — folded driver-side
    into ONE per-(term, segment) threshold so the survivor filter stays
    a single literal-map (or broadcast-join) lookup regardless of batch
    size::

        thr(t, s) = min over pure-should queries q containing t of
                    (θ_q - Σ_{t'∈q, t'≠t} max_ub(t', s)·boost_q(t'))
                    / boost_q(t)
        keep B of term t in segment s  iff  ub_raw(B) >= thr(t, s)

    Correctness per query follows the single-query argument: q's
    survivor set here is a SUPERSET of its own WAND survivors (the min
    only lowers thresholds), every true top-k doc of q keeps all its
    blocks, and extra kept blocks only add exactly-scored candidates —
    equality with the exhaustive batch is asserted in tests.

    Sharing structure (the whole point — fixed cost is paid ONCE for
    the batch, not per query): one header-cache job collects the
    per-(segment, term) bound table for the union of pure-should batch
    terms; one job fetches the union of per-term seed payload blocks;
    the driver decodes them ONCE and computes every θ_q by slicing that
    frame to q's terms (numpy, query-sized). The threshold fold loops
    |pure queries| x |segments| x |terms per query| driver-side —
    ~1M cheap ops for a 5000-query batch on 64 segments.

    Scope guards (each falls back to ``None`` = exhaustive):

    - tombstones poison θ (same as single-query WAND) — skip;
    - candidate postings below ``wand_min_postings`` — pruning cannot
      repay its two extra tiny jobs;
    - queries with must/must_not clauses (their boolean filters need
      full postings of THEIR terms) or non-positive boosts anchor all
      their terms: those blocks are always kept, and only terms used
      exclusively by pure-should queries are pruned;
    - a bound table beyond :data:`WAND_BATCH_BOUNDS_MAX` rows.
    """
    import pandas as pd

    from sparktext import codec
    from sparktext.query import postings_for_terms  # local import: cycle

    if index.deleted is not None or not k:
        return None
    present = [t for t in terms if t in stats_map]
    if sum(stats_map[t]["doc_freq"] for t in present) < wand_min_postings:
        return None

    pure: dict[str, tuple] = {}
    anchored_terms: set[str] = set()
    for qid, q in live.items():
        sp = [t for t in q.scored_terms if t in stats_map]
        if (
            not q.must and not q.must_not and sp
            and all(b > 0 for b in q.boosts.values())
        ):
            pure[qid] = (q, sp)
        else:
            anchored_terms.update(
                t for t in q.scored_terms + q.must_not if t in stats_map
            )
    prunable = sorted(
        {t for _, sp in pure.values() for t in sp} - anchored_terms
    )
    if not pure or not prunable:
        return None
    prunable_set = set(prunable)
    bound_terms = sorted({t for _, sp in pure.values() for t in sp})

    blocks = postings_for_terms(index, present, stats_map)
    buckets = sorted({stats_map[t]["term_bucket"] for t in bound_terms})
    hdr = index.block_headers().filter(
        F.col("term_bucket").isin(buckets) & F.col("term").isin(bound_terms)
    ).withColumn("_ub", block_ub_col(index, stats_map))  # RAW ub; boosts fold driver-side

    hdr_rows = (
        hdr.select("segment_id", "term", "block_id", "_ub")
        .limit(WAND_HEADER_ROWS_MAX + 1)
        .collect()
    )
    if len(hdr_rows) <= WAND_HEADER_ROWS_MAX:
        # One-collect fast path: bounds AND seed keys from the same rows.
        maxub: dict[tuple, float] = {}
        by_term: dict[str, list] = {}
        for r in hdr_rows:
            v = float(r["_ub"])
            key = (r["term"], r["segment_id"])
            if key not in maxub or v > maxub[key]:
                maxub[key] = v
            by_term.setdefault(r["term"], []).append(r)
        if len(maxub) > WAND_BATCH_BOUNDS_MAX:
            return None
        seeds_per_term = max(1, math.ceil(k / 128)) + 1
        seed_keys = []
        for t, rows_t in by_term.items():
            # same ordering as _seed_key_cond's window: ub desc, then
            # (segment, block) asc for determinism
            rows_t.sort(key=lambda r: (-r["_ub"], r["segment_id"], r["block_id"]))
            seed_keys.extend(
                f"{r['segment_id']}|{t}|{r['block_id']}"
                for r in rows_t[:seeds_per_term]
            )
        seed_cond = F.concat_ws(
            "|", F.col("segment_id"), F.col("term"), F.col("block_id")
        ).isin(seed_keys)
    else:
        bound_rows = (
            hdr.groupBy("segment_id", "term").agg(F.max("_ub").alias("m"))
            .limit(WAND_BATCH_BOUNDS_MAX + 1)
            .collect()
        )
        if len(bound_rows) > WAND_BATCH_BOUNDS_MAX:
            return None
        maxub = {(r["term"], r["segment_id"]): float(r["m"]) for r in bound_rows}
        seed_cond = _seed_key_cond(hdr, k)
    segs = sorted({s for (_, s) in maxub})

    seed_payload = (
        blocks.filter(seed_cond & F.col("term").isin(bound_terms))
        .select("segment_id", "term", "count", "first_doc",
                "doc_bits", "doc_bytes", "tf_bytes", "norm_bytes")
        .collect()
    )
    dec = (
        codec.decode_blocks_pdf(pd.DataFrame([r.asDict() for r in seed_payload]))
        if seed_payload else pd.DataFrame(
            {"term": [], "doc_id": [], "tf": [], "norm_id": []}
        )
    )

    neg_inf = float("-inf")
    thr: dict[tuple, float] = {}
    for qid, (q, sp) in pure.items():
        boosts = {t: float(q.boosts.get(t, 1.0)) for t in sp}
        sub = dec[dec["term"].isin(sp)] if len(dec) else dec
        theta = _theta_from_decoded(index, stats_map, boosts, sub, k)
        for s in segs:
            if theta <= 0.0:
                # fewer than k seed docs: q prunes nothing — its terms'
                # thresholds collapse to -inf (keep everything)
                for t in sp:
                    if t in prunable_set:
                        thr[(t, s)] = neg_inf
                continue
            other_all = sum(maxub.get((t2, s), 0.0) * boosts[t2] for t2 in sp)
            for t in sp:
                if t not in prunable_set:
                    continue
                th = (theta - (other_all - maxub.get((t, s), 0.0) * boosts[t])) \
                    / boosts[t]
                key = (t, s)
                if key not in thr or th < thr[key]:
                    thr[key] = th

    prunable_blocks = blocks.filter(F.col("term").isin(prunable)).withColumn(
        "_ub", block_ub_col(index, stats_map)
    )
    finite = {ky: v for ky, v in thr.items() if v != neg_inf}
    if len(finite) <= WAND_DRIVER_BOUNDS_MAX:
        # literal-map thresholds: zero extra exchanges (missing key =
        # -inf threshold = keep, covering the theta<=0 sentinels too)
        if not finite:
            return None  # every threshold is -inf: pruning keeps all
        pairs = []
        for (t, s), v in finite.items():
            pairs.extend([F.lit(f"{t}|{s}"), F.lit(v)])
        lookup = F.element_at(
            F.create_map(*pairs),
            F.concat_ws("|", F.col("term"), F.col("segment_id")),
        )
        survivors = prunable_blocks.filter(
            F.col("_ub") >= F.coalesce(lookup, F.lit(neg_inf))
        ).drop("_ub")
    else:
        spark = index.postings.sparkSession
        thr_df = spark.createDataFrame(
            [(t, s, v) for (t, s), v in finite.items()],
            "term string, segment_id int, _thr double",
        )
        survivors = (
            prunable_blocks.join(F.broadcast(thr_df), ["term", "segment_id"], "left")
            .filter(F.col("_ub") >= F.coalesce(F.col("_thr"), F.lit(neg_inf)))
            .drop("_ub", "_thr")
        )
    anchored_all = sorted(set(present) - prunable_set)
    if anchored_all:
        survivors = blocks.filter(F.col("term").isin(anchored_all)).unionByName(
            survivors
        )
    return survivors.alias("wand_batch_pruned")
