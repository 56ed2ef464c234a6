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


def top_k_after(
    matched: DataFrame,
    k: int,
    after_score: float,
    after_doc: int,
    round_decimals: int | None = None,
) -> DataFrame:
    """B9 pagination — tantivy/Elasticsearch ``search_after``: the k best
    rows strictly AFTER the ``(after_score, after_doc)`` cursor in the
    pinned (score desc, doc_id asc) order.

    The cursor is the last row of the previous page (client-held, k-row
    sized).  Deep pagination stays cheap at scale: the plan is a filter
    + TakeOrderedAndProject, so page N costs the same one bounded-heap
    pass as page 1 — no OFFSET, which would shuffle and discard
    offset+k rows per partition (the reason Elasticsearch deprecated
    from+size for deep pages).  ``round_decimals`` must match the value
    used when the cursor page was produced, or the cursor comparison
    splits analytic ties differently than the page boundary did.
    """
    df = matched
    if round_decimals is not None:
        df = df.withColumn("score", F.round(F.col("score"), round_decimals))
    after = (F.col("score") < F.lit(float(after_score))) | (
        (F.col("score") == F.lit(float(after_score)))
        & (F.col("doc_id") > F.lit(int(after_doc)))
    )
    return df.filter(after).orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def materialize_hits(index, hits: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """A9: join top-k doc ids back to the stored fields (doc_meta)."""
    cols = columns or ["repo", "path", "commit", "lang"]
    return hits.join(index.doc_meta.select("doc_id", *cols), "doc_id", "left")
