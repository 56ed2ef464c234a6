"""Snippet / highlight generation (tantivy's ``SnippetGenerator`` surface).

Upstream tantivy builds a per-hit text fragment around query-term matches
and wraps matched ranges in ``<b></b>`` (SURVEY.md §0 provenance protocol:
`[U:tantivy src/snippet/mod.rs]` — public API, reconstructed; the
reference dir is empty).  The Spark twin keeps the whole thing JVM-side —
**pure column expressions, zero UDFs**: ``locate`` finds the first match,
``substring`` cuts the window, ``regexp_replace`` wraps every in-fragment
match.  Snippets are presentation work over the ALREADY top-k'd hit rows
(k rows, not the corpus), so the join back to the doc store is a
broadcast of the k-row side — the same A9 materialize-hits shape.

The fragment rule is deliberately deterministic and closed-form so the
DuckDB oracle can replicate it exactly (CORRECTNESS gate):

- window starts ``before`` chars left of the FIRST occurrence of any
  query term (earliest match in the text wins), clamped to the start;
- the fragment is ``max_chars`` chars of the ORIGINAL text from there;
- every whole-word term occurrence inside the fragment is wrapped in
  ``<b>…</b>`` (word-boundary regex, case-insensitive via lowercase);
- a hit whose fragment window contains no term (possible only when the
  match sits past the text head and the caller shrank the window) still
  returns the head of the text — never NULL.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def snippet_col(
    text_col: Column,
    terms: list[str],
    max_chars: int = 100,
    before: int = 30,
) -> Column:
    """Highlighted fragment of ``text_col`` around the first query-term hit.

    Pure column expression (locate + substring + regexp_replace) — stays
    inside whole-stage codegen; no Python touches row data.

    Case handling (pinned by the DuckDB oracle twin, so it cannot
    change silently): the fragment WINDOW is anchored case-insensitively
    (``lower()`` + ``locate``), but the ``<b>`` highlight wraps only
    occurrences matching the LOWERCASED term form — mixed-case text
    ('Grape') anchors the fragment without being wrapped. The oracle SQL
    in ``__spark_entry__`` replicates exactly this.
    """
    if not terms:
        raise ValueError("snippet_col needs at least one query term")
    lowered = F.lower(text_col)
    # 1-based first position per term; locate()==0 (absent) -> NULL so
    # least() (which ignores NULLs) picks the earliest PRESENT term.
    firsts = [F.nullif(F.locate(t.lower(), lowered), F.lit(0)) for t in terms]
    first = firsts[0] if len(firsts) == 1 else F.least(*firsts)
    start = F.greatest(F.lit(1), first - F.lit(before))
    frag = F.when(
        first.isNotNull(), F.substring(text_col, start, max_chars)
    ).otherwise(F.substring(text_col, F.lit(1), max_chars))
    pat = r"\b(" + "|".join(re.escape(t.lower()) for t in terms) + r")\b"
    return F.regexp_replace(frag, pat, "<b>$1</b>")


def snippets(
    hits: DataFrame,
    doc_store: DataFrame,
    terms: list[str],
    text_field: str = "content",
    max_chars: int = 100,
    before: int = 30,
) -> DataFrame:
    """Attach a ``snippet`` column to top-k ``hits`` from the doc store.

    ``hits`` is the k-row top-k output (doc_id, score); ``doc_store`` is
    the corpus / stored-fields table (A9).  The k-row side drives the
    join, so at 100 TB this is a broadcast-semi lookup into the store,
    not a store scan: Spark broadcasts ``hits`` (explicitly hinted) and
    the store's parquet scan prunes to the doc_id filter.
    """
    joined = doc_store.join(
        F.broadcast(hits), "doc_id"
    )
    return joined.select(
        "doc_id",
        "score",
        snippet_col(F.col(text_field), terms, max_chars, before).alias("snippet"),
    )
