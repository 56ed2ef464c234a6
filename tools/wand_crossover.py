"""WAND crossover sweep: exhaustive vs forced block-max pruning on the
skewed-impact corpus at several sizes (candidate postings = 3 * n_docs).

Round-3 found the pruning plan's fixed cost (~3 extra AQE stage
materializations) unrepaid at every measured point up to 24M postings;
round-4 cut that cost (driver-literal seed keys + per-segment bounds —
two fewer exchanges). This sweep re-measures the crossover to
recalibrate WAND_MIN_POSTINGS.

Usage: python tools/wand_crossover.py [n_docs ...]   (default sweep)
Prints one JSON line per corpus size.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [500_000, 2_000_000, 4_000_000, 8_000_000]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))

    from sparktext.session import get_spark

    spark = get_spark(app_name="wand-crossover", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")

    from sparktext.build import build_index
    from sparktext.corpus import skewed_impact_corpus
    from sparktext.query import matched_docs, parse_query, postings_for_terms
    from sparktext.score import term_stats, wand_blocks_for_query
    from sparktext.topk import top_k

    q = parse_query("alpha beta gamma")
    for n in sizes:
        idx = build_index(spark, skewed_impact_corpus(spark, n),
                          num_segments=int(cpus))
        idx.postings.count()
        sm = term_stats(idx, q.scored_terms)
        cand = sum(sm[t]["doc_freq"] for t in q.scored_terms)

        def best(fn):
            b = None
            for _ in range(reps):
                t = time.time()
                fn()
                dt = time.time() - t
                b = dt if b is None else min(b, dt)
            return round(b, 3)

        ex = best(lambda: top_k(matched_docs(idx, q, exhaustive=True), 10).collect())
        pr = best(lambda: top_k(
            matched_docs(idx, q, exhaustive=False, k=10, wand_min_postings=0), 10
        ).collect())
        total = postings_for_terms(idx, q.scored_terms, sm).count()
        kept = wand_blocks_for_query(idx, q, 10, sm).count()
        print(json.dumps({
            "n_docs": n, "candidate_postings": cand,
            "exhaustive_s": ex, "pruned_s": pr,
            "blocks_total": total, "blocks_kept": kept,
            "cpus": int(cpus), "reps": reps,
        }), flush=True)
        idx.unpersist()


if __name__ == "__main__":
    main()
