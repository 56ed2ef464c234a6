"""Self-referential golden files (SURVEY.md §5 gate 3): frozen top-k
(docIDs + 8-decimal scores) for the fixture query set at sf0.01.

Regenerate (only when scoring semantics INTENTIONALLY change):
    python tests/test_goldens.py regen
If /root/reference is ever mounted, regenerate FROM the reference crate
instead to discharge BASELINE.json's rank-identity literally.
"""

import json
import os
import sys

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
QUERIES_PATH = os.path.join(HERE, "queries.json")
GOLDEN_PATH = os.path.join(HERE, "goldens_sf001.json")
SF_DIR = "/root/testdata/sf0.01"


def _run_all(spark):
    from sparktext.build import build_index
    from sparktext.corpus import documents_as_corpus
    from sparktext.query import search_many

    with open(QUERIES_PATH) as f:
        queries = json.load(f)
    corpus = documents_as_corpus(spark, SF_DIR)
    index = build_index(spark, corpus, num_segments=8)
    out = {}
    # group by k so one search_many call per k
    by_k: dict[int, dict[str, str]] = {}
    for qid, spec in queries.items():
        by_k.setdefault(spec["k"], {})[qid] = spec["q"]
    for k, qs in by_k.items():
        rows = search_many(index, qs, k=k).collect()
        for qid in qs:
            out.setdefault(qid, [])
        for r in rows:
            out[r["query_id"]].append((r["doc_id"], round(r["score"], 8)))
    for qid in out:
        out[qid].sort(key=lambda t: (-t[1], t[0]))
    return out


def test_goldens(spark):
    if not os.path.exists(GOLDEN_PATH):
        pytest.skip("golden file not generated yet")
    with open(GOLDEN_PATH) as f:
        golden = {k: [tuple(x) for x in v] for k, v in json.load(f).items()}
    got = _run_all(spark)
    assert set(got) == set(golden)
    for qid in golden:
        assert got[qid] == golden[qid], qid


if __name__ == "__main__" and "regen" in sys.argv:
    sys.path.insert(0, os.path.dirname(HERE))
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    res = _run_all(s)
    with open(GOLDEN_PATH, "w") as f:
        json.dump(res, f, indent=1)
    print(f"wrote {GOLDEN_PATH} with {len(res)} queries")
