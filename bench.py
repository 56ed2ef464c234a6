"""Benchmark harness (driver contract + BASELINE.md scaling evidence).

Runs at ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` (default 32). Prints ONE JSON line:
``{"metric": ..., "value": <total sec>, "unit": "sec",
"queries": {name: sec}, "sf": ..., ...extras}``.

Phases:
- build: full index build (tokenize -> blocks -> dict) -> files/sec
- query suite: BM25 top-10 (single/OR/must/must_not/WAND), the fused
  agg_search plan, dedup + ANN ops -> queries/sec (suite repeated
  ``$SPARK_GRAFT_BENCH_REPS`` times, default 3, best-of reported per
  query to damp JIT/cache warmup noise; total is the sum of means).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))

    from sparktext.session import get_spark

    spark = get_spark(
        app_name="sparktext-bench", master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    from sparktext.aggs import CountAgg, StatsAgg, agg_search, collect_results
    from sparktext.ann import cosine_topk
    from sparktext.build import build_index
    from sparktext.corpus import documents_as_corpus
    from sparktext.query import matched_docs, parse_query
    from sparktext.textops import lsh_candidate_pairs, simhash
    from sparktext.topk import top_k

    timings: dict[str, float] = {}
    host_attr: dict[str, dict] = {}

    def _host_stat():
        """(host_busy_jiffies, host_total_jiffies) from /proc/stat."""
        with open("/proc/stat") as f:
            parts = f.readline().split()[1:]
        vals = [int(x) for x in parts]
        idle = vals[3] + (vals[4] if len(vals) > 4 else 0)  # idle + iowait
        return sum(vals) - idle, sum(vals)

    # Warmup (NOT timed), mirroring tools/scaling_bench.py: fork one
    # python worker per slot (cold pandas/numpy/sparktext imports are ~2s
    # each) and JIT the scan path. Measured: the FIRST build in a session
    # costs ~8s at sf0.1, the second ~0.9s — the difference is session
    # warmup, not engine work, and a steady-state engine amortizes it.
    def _warm(batches):
        import sparktext.build  # noqa: F401

        for pdf in batches:
            yield pdf

    corpus = documents_as_corpus(spark, sf_dir)
    corpus.count()
    spark.range(int(cpus) * 8, numPartitions=int(cpus)).mapInPandas(
        _warm, "id long"
    ).count()

    # host attribution wraps the BUILD phases too (round-4 verdict: the
    # r4 driver run's index_build swing was unattributable because only
    # run() ops carried a host_busy row).
    b0, tj0 = _host_stat()
    t0 = time.time()
    index = build_index(spark, corpus, num_segments=int(cpus))
    # Materialize every index table (build is lazy until actioned).
    n_docs = index.stats.num_docs
    index.postings.count()
    index.doc_meta.count()
    build_s = time.time() - t0
    timings["index_build"] = round(build_s, 3)
    b1, tj1 = _host_stat()
    if tj1 > tj0:
        host_attr["index_build"] = round((b1 - b0) / (tj1 - tj0), 3)

    def run(name, fn):
        # Per-op host attribution (round-3 verdict: unattributed bench
        # regressions): record the whole-host busy fraction across the
        # reps. This process tree's own CPU is not separable cheaply
        # (executors are JVM threads), so the signal is host_busy vs the
        # op's known parallelism — a flat-plan op whose wall regresses
        # while host_busy >> its own core budget is co-tenant steal.
        b0, t0j = _host_stat()
        best = None
        for _ in range(reps):
            t = time.time()
            fn()
            dt = time.time() - t
            best = dt if best is None else min(best, dt)
        b1, t1j = _host_stat()
        timings[name] = round(best, 3)
        if t1j > t0j:
            host_attr[name] = round((b1 - b0) / (t1j - t0j), 3)

    def search(qstr, k=10, exhaustive=True):
        return top_k(
            matched_docs(index, parse_query(qstr), exhaustive=exhaustive, k=k), k
        ).collect()

    run("q_term", lambda: search("spark"))
    run("q_or", lambda: search("query window scan"))
    run("q_must", lambda: search("+merge +customer"))
    run("q_must_not", lambda: search("scan -filter"))
    run("q_wand", lambda: search("query window scan", exhaustive=False))

    def fused():
        out = agg_search(
            index, "spark", k=10,
            metric_aggs=[CountAgg(), StatsAgg("n_chars")],
            bucket_aggs={"by_lang": ("terms", "lang", 5, []),
                         "hist": ("histogram", "n_chars", 100.0, 0.0, [])},
        )
        # one-shot harvest: branches materialize concurrently over the
        # shared matched-set cache, then release (cache hygiene)
        collect_results(out)

    run("q_agg_fused", fused)

    # WAND pruning evidence: candidate blocks vs total blocks for the
    # OR query (results proven identical in tests/test_wand.py).
    from sparktext.query import parse_query, postings_for_terms
    from sparktext.score import term_stats, wand_candidate_blocks

    wq = parse_query("query window scan").scored_terms
    sm = term_stats(index, wq)
    wand_total = postings_for_terms(index, wq, sm).count()
    wand_kept = wand_candidate_blocks(index, wq, 10, sm).count()

    # Regex query (B7 dictionary expansion via broadcast join).
    from sparktext.query import regex_docs

    run("q_regex", lambda: regex_docs(index, "^s.*n$").count())

    # WAND on a skewed-impact (Zipf-tf) corpus — the layout where
    # block-max pruning actually wins. The uniform fixture corpus above
    # has no dominating blocks, so q_wand there measures overhead only.
    from sparktext.corpus import skewed_impact_corpus

    zn = int(os.environ.get("SPARK_GRAFT_ZIPF_N", "500000"))
    b0, tj0 = _host_stat()
    zt0 = time.time()
    zidx = build_index(
        spark, skewed_impact_corpus(spark, zn), num_segments=int(cpus)
    )
    zidx.postings.count()
    zipf_build_s = round(time.time() - zt0, 3)
    b1, tj1 = _host_stat()
    if tj1 > tj0:
        # NOT in `timings` (keeps the headline total comparable across
        # rounds) — recorded as its own extras key below.
        host_attr["zipf_build"] = round((b1 - b0) / (tj1 - tj0), 3)
    zq = ["alpha", "beta", "gamma"]
    zsm = term_stats(zidx, zq)
    zipf_total = postings_for_terms(zidx, zq, zsm).count()
    zipf_kept = wand_candidate_blocks(zidx, zq, 10, zsm).count()

    def zsearch(exhaustive):
        return top_k(
            matched_docs(zidx, parse_query("alpha beta gamma"),
                         exhaustive=exhaustive, k=10), 10
        ).collect()

    run("q_or_zipf", lambda: zsearch(True))
    run("q_wand_zipf", lambda: zsearch(False))

    # Batch block-max pruning (round 5): survivor-union counters + walls
    # for a mixed pure-should batch on the skewed corpus — the scale
    # evidence is blocks decoded, not local wall time.
    from sparktext.query import parse_query as _pq
    from sparktext.query import search_many as _sm
    from sparktext.score import wand_blocks_for_batch

    zqs = {
        "zb0": "alpha", "zb1": "beta", "zb2": "gamma",
        "zb3": "alpha beta", "zb4": "beta gamma",
        "zb5": "alpha beta gamma", "zb6": "alpha^2 gamma",
    }
    zlive = {qid: _pq(qs) for qid, qs in zqs.items()}
    zb = wand_blocks_for_batch(zidx, zlive, 10, zsm, zq, 0)
    zipf_batch_kept = zb.count() if zb is not None else zipf_total
    run("q_batch_zipf", lambda: _sm(zidx, zqs, k=10).collect())
    run("q_batch_zipf_wand",
        lambda: _sm(zidx, zqs, k=10, exhaustive=False,
                    wand_min_postings=0).collect())

    import json as _json

    qpath = os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests", "queries.json")
    with open(qpath) as f:
        fixture_queries = {k: v["q"] for k, v in _json.load(f).items()}

    def batch20():
        from sparktext.query import search_many

        search_many(index, fixture_queries, k=10).collect()

    run("q_batch20", batch20)

    # The textops/ANN lines don't touch either text index: release the
    # zipf index's caches so 500k docs of postings stop competing for
    # executor storage memory with these ops (round-3 verdict: the
    # op_simhash/op_ann tail regressed with no plan change — remove the
    # one engine-side suspect before blaming co-tenant windows).
    zidx.unpersist()

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # Known-flat sentinel between suite sections: a narrow parquet count
    # whose plan cannot regress. If op_* wall moves while the sentinel
    # moves too, the window is contaminated (host_attr gives the busy
    # fraction); if the sentinel stays flat, the op regression is real.
    run("op_sentinel_scan", lambda: docs.count())
    # Production hash path (xxhash64 int64 signatures). The sha256-hex
    # twin exists only for DuckDB oracle parity; recall equivalence is
    # pinned in tests/test_hygiene.py::test_minhash_xxhash64_recall_matches_sha.
    run("op_minhash_lsh", lambda: lsh_candidate_pairs(docs, hash_fn="xxhash64").count())
    # Production simhash (xxhash64, ONE fused shuffle — plan pinned in
    # tests/test_plan_pins.py); the sha template remains the oracle twin.
    run("op_simhash", lambda: simhash(docs, hash_fn="xxhash64").count())

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = [float(x) for x in emb.filter("vec_id = 0").collect()[0]["embedding"]]
    run("op_ann_cosine", lambda: cosine_topk(emb, qvec, 10).collect())

    # the sentinel is a measurement canary, not a suite line — keep the
    # round-over-round queries_per_sec metric comparable
    query_names = [k for k in timings if k not in ("index_build", "op_sentinel_scan")]
    total = round(sum(timings.values()), 3)
    qsum = sum(timings[k] for k in query_names)
    print(json.dumps({
        "metric": "index_build+query_suite_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir.rstrip("/").rsplit("sf", 1)[-1],
        "cpus": int(cpus),
        "n_docs": n_docs,
        "build_files_per_sec": round(n_docs / build_s, 1),
        "queries_per_sec": round(len(query_names) / qsum, 2) if qsum else None,
        "batch_queries_per_sec": round(len(fixture_queries) / timings["q_batch20"], 2),
        "wand_blocks_total": wand_total,
        "wand_blocks_kept": wand_kept,
        "zipf_n_docs": zn,
        "zipf_build_sec": zipf_build_s,
        "zipf_blocks_total": zipf_total,
        "zipf_blocks_kept": zipf_kept,
        "zipf_batch_blocks_kept": zipf_batch_kept,
        "host_busy_frac": host_attr,
    }))


if __name__ == "__main__":
    main()
