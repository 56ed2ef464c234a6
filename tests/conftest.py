"""Shared fixtures (SURVEY.md §5, FIXTURES.md §3).

``micro_corpus``: 12 hand-checkable documents in the canonical corpus
shape — the port of the crate's inline test fixture style: a tiny
vocabulary, one deliberately heavy term (``heavy``, 10/12 docs — skew +
WAND exercise), one single-doc term (``unique`` — idf extreme), two
langs, and a numeric metadata column ``n_chars`` with known stats.
"""

from __future__ import annotations

import pytest
from pyspark.sql import SparkSession

MICRO_DOCS = [
    # (doc_id, repo, path, commit, lang, content, n_chars)
    (0, "r0", "a/0.py", "c0", "py", "apple banana heavy", 18),
    (1, "r0", "a/1.py", "c1", "py", "apple apple heavy cherry", 24),
    (2, "r0", "a/2.py", "c2", "py", "banana heavy heavy heavy", 24),
    (3, "r0", "a/3.rs", "c3", "rs", "cherry date heavy", 17),
    (4, "r1", "b/0.rs", "c4", "rs", "date egg heavy fig", 18),
    (5, "r1", "b/1.rs", "c5", "rs", "egg fig heavy apple banana cherry", 33),
    (6, "r1", "b/2.py", "c6", "py", "fig grape heavy", 15),
    (7, "r1", "b/3.py", "c7", "py", "grape heavy grape grape", 23),
    (8, "r2", "c/0.py", "c8", "py", "apple grape heavy unique", 24),
    (9, "r2", "c/1.rs", "c9", "rs", "banana date egg fig grape heavy", 31),
    (10, "r2", "c/2.rs", "c10", "rs", "apple banana", 12),
    (11, "r2", "c/3.py", "c11", "py", "date egg", 8),
]

MICRO_SCHEMA = (
    "doc_id long, repo string, path string, commit string, lang string, "
    "content string, n_chars long"
)


@pytest.fixture(scope="session")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("sparktext-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def micro_corpus(spark):
    rows = [(d, r, p, c, lg, ct, n) for d, r, p, c, lg, ct, n in MICRO_DOCS]
    return spark.createDataFrame(rows, MICRO_SCHEMA)


@pytest.fixture(scope="session")
def micro_index(spark, micro_corpus):
    from sparktext.build import build_index

    return build_index(spark, micro_corpus, num_segments=3)
