"""Top-k collector (SURVEY.md B9, §4.4).

``orderBy(score desc, doc_id asc).limit(k)`` lowers to Spark's
TakeOrderedAndProject — a per-partition bounded heap plus a driver-side
merge, exactly tantivy's per-segment TopDocs heap + merge_fruits shape.
Never a global sort. Tie-break is pinned to (score desc, doc_id asc),
mirroring tantivy's (score desc, doc address asc) for rank-identity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def top_k(matched: DataFrame, k: int, round_decimals: int | None = None) -> DataFrame:
    """k best (doc_id, score) rows; deterministic tie-break by doc_id.

    ``round_decimals`` rounds the score BEFORE ordering — used by the
    oracle-compared queries so that sub-ulp floating differences between
    engines cannot flip the order of analytic ties.
    """
    df = matched
    if round_decimals is not None:
        df = df.withColumn("score", F.round(F.col("score"), round_decimals))
    return df.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def materialize_hits(index, hits: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """A9: join top-k doc ids back to the stored fields (doc_meta)."""
    cols = columns or ["repo", "path", "commit", "lang"]
    return hits.join(index.doc_meta.select("doc_id", *cols), "doc_id", "left")
