"""Two-cluster-size scaling evidence (BASELINE.json north_rule).

No real cluster exists in this sandbox, so per the driver's instruction
the same job runs at two parallelism levels — local[8] and local[32] —
on the SAME input, and we report throughput at both plus
efficiency = (thr_32 / thr_8) / (32 / 8).

Each parallelism level runs in its OWN subprocess/JVM (same-JVM
back-to-back SparkContexts contaminate each other's timings via GC debt
and worker reuse). The input is the sf0.1 documents corpus replicated
``reps`` times deterministically (doc_ids offset per replica; no
external data) so tokenize/encode compute dominates fixed stage
overhead; the query workload is the 20-query fixture set replicated
10x (200 distinct query ids) through ONE search_many pass.

Usage:
    python tools/scaling_bench.py [reps]        # orchestrate both levels
    python tools/scaling_bench.py --single P reps   # one level (internal)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
QUERY_DUP = 10


def run_single(parallelism: int, reps: int) -> None:
    from pyspark.sql import functions as F

    from sparktext.session import get_spark

    spark = get_spark(
        app_name=f"scaling-{parallelism}", master=f"local[{parallelism}]",
        shuffle_partitions=parallelism * 2,
    )
    spark.sparkContext.setLogLevel("ERROR")

    from sparktext.build import build_index
    from sparktext.corpus import documents_as_corpus
    from sparktext.query import search_many

    base = documents_as_corpus(spark, SF_DIR)
    n_base = base.count()
    reps_df = spark.range(reps).withColumnRenamed("id", "rep")
    corpus = (
        base.crossJoin(reps_df)
        .withColumn("doc_id", F.col("doc_id") + F.col("rep") * F.lit(n_base))
        .withColumn("path", F.concat(F.col("path"), F.lit("#"), F.col("rep")))
        .withColumn(
            "commit", F.sha2(F.concat(F.col("commit"), F.col("rep").cast("string")), 256)
        )
        .drop("rep")
    )

    t0 = time.time()
    index = build_index(spark, corpus, num_segments=parallelism * 2)
    index.postings.count()
    index.doc_meta.count()
    build_s = time.time() - t0
    n_docs = index.stats.num_docs

    with open(os.path.join(REPO, "tests", "queries.json")) as f:
        fixture = {k: v["q"] for k, v in json.load(f).items()}
    queries = {
        f"{qid}#{i}": q for i in range(QUERY_DUP) for qid, q in fixture.items()
    }
    best = None
    for _ in range(2):
        t = time.time()
        search_many(index, queries, k=10).collect()
        dt = time.time() - t
        best = dt if best is None else min(best, dt)

    print(json.dumps({
        "parallelism": parallelism,
        "n_docs": n_docs,
        "build_sec": round(build_s, 2),
        "build_files_per_sec": round(n_docs / build_s, 1),
        "batch_sec": round(best, 3),
        "n_queries": len(queries),
        "batch_queries_per_sec": round(len(queries) / best, 2),
    }))


def orchestrate(reps: int) -> None:
    results = {}
    for p in (8, 32):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--single", str(p), str(reps)],
            capture_output=True, text=True, cwd=REPO, timeout=1200,
        )
        line = out.stdout.strip().splitlines()[-1]
        results[p] = json.loads(line)
    r8, r32 = results[8], results[32]
    eff_build = (r32["build_files_per_sec"] / r8["build_files_per_sec"]) / 4.0
    eff_query = (r32["batch_queries_per_sec"] / r8["batch_queries_per_sec"]) / 4.0
    summary = {
        "local8": r8, "local32": r32,
        "scaling_efficiency_build": round(eff_build, 3),
        "scaling_efficiency_query": round(eff_query, 3),
        "reps": reps, "sf_dir": SF_DIR,
    }
    print(json.dumps(summary))

    md = os.path.join(REPO, "BENCH", "BASELINE.md")
    os.makedirs(os.path.dirname(md), exist_ok=True)
    header = not os.path.exists(md)
    with open(md, "a") as f:
        if header:
            f.write(
                "# BENCH/BASELINE.md — measured numbers (sandbox: 32-core, "
                "local mode)\n\nScaling gate: efficiency = (thr_32/thr_8)/4; "
                "target >= 0.8 (BASELINE.json). Each level runs in its own "
                "JVM on identical input (tools/scaling_bench.py).\n\n"
                "| run | input docs | build docs/s local[8] | local[32] "
                "| eff_build | q/s local[8] | local[32] | eff_query |\n"
                "| --- | --- | --- | --- | --- | --- | --- | --- |\n"
            )
        f.write(
            f"| {time.strftime('%Y-%m-%d %H:%M')} | {r8['n_docs']} | "
            f"{r8['build_files_per_sec']} | {r32['build_files_per_sec']} | "
            f"{eff_build:.3f} | {r8['batch_queries_per_sec']} | "
            f"{r32['batch_queries_per_sec']} | {eff_query:.3f} |\n"
        )


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--single":
        run_single(int(sys.argv[2]), int(sys.argv[3]))
    else:
        orchestrate(int(sys.argv[1]) if len(sys.argv) > 1 else 100)
