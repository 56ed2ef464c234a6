"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` runs the REAL engine (compressed posting blocks, broadcast
term-dict stats, quantized fieldnorms); ``oracle_sql()`` replicates each
query's semantics in pure ANSI SQL for DuckDB over the same parquet views.
Score parity notes:

- the fixture corpus' text is space-joined lowercase alphanumeric words,
  so the oracle can tokenize with ``regexp_extract_all(lower(text),
  '[a-z0-9]+')`` — identical to the engine's tokenizer on this corpus;
- the engine's lossy fieldnorm quantization is inlined into the oracle as
  a 256-value table (sparktext.fieldnorm.norm_values_sql), so BM25 doc
  lengths match EXACTLY;
- float scores are rounded to 4 decimals on BOTH sides BEFORE top-k
  ordering, so sub-ulp cross-engine differences cannot flip ties (the
  final tie-break is doc_id in both).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparktext.fieldnorm import norm_values_sql

K1, B = 1.2, 0.75

_INDEX_CACHE: dict[str, object] = {}
_FACET_CACHE: dict[str, object] = {}


def _index(spark: SparkSession, sf_dir: str):
    key = sf_dir.rstrip("/")
    if key not in _INDEX_CACHE:
        from sparktext.build import build_index
        from sparktext.corpus import documents_as_corpus

        corpus = documents_as_corpus(spark, key)
        _INDEX_CACHE[key] = build_index(
            spark, corpus, num_segments=16, with_positions=True
        )
    return _INDEX_CACHE[key]


def _facet_index(spark: SparkSession, sf_dir: str):
    """The text index + an indexed '/lang/repo' facet field."""
    key = sf_dir.rstrip("/")
    if key not in _FACET_CACHE:
        from sparktext.build import with_facets

        _FACET_CACHE[key] = with_facets(
            _index(spark, sf_dir), "concat('/', lang, '/', repo)"
        )
    return _FACET_CACHE[key]


def _matched(spark, sf_dir, qstr):
    from sparktext.query import matched_docs, parse_query

    idx = _index(spark, sf_dir)
    return idx, matched_docs(idx, parse_query(qstr))


def _matched_meta(spark, sf_dir, qstr):
    idx, m = _matched(spark, sf_dir, qstr)
    return idx, m.join(idx.doc_meta, "doc_id")


def _hits(spark, sf_dir, qstr, k=10):
    from sparktext.topk import top_k

    _, m = _matched(spark, sf_dir, qstr)
    return top_k(m, k, round_decimals=4)


# --------------------------------------------------------------------------
# entry: flagship fused query (smoke check at sf0.001)
# --------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """BM25 top-10 for an OR query plus facet metadata — the §3.3 shape."""
    idx = _index(spark, "/root/testdata/sf0.001")
    from sparktext.aggs import agg_search

    out = agg_search(idx, "spark query window", k=10, round_decimals=4)
    from sparktext.topk import materialize_hits

    return materialize_hits(idx, out["hits"], ["repo", "lang"])


# --------------------------------------------------------------------------
# queries
# --------------------------------------------------------------------------


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from sparktext import textops
    from sparktext.aggs import (
        CountAgg,
        FilterAgg,
        MaxAgg,
        MinAgg,
        PercentilesAgg,
        StatsAgg,
        SumAgg,
        histogram_agg,
        metrics_agg,
        range_agg,
        terms_agg,
    )

    def index_term_dict(spark, sf_dir):
        return _index(spark, sf_dir).term_dict.select("term", "doc_freq", "total_tf")

    def index_doc_norms(spark, sf_dir):
        return _index(spark, sf_dir).doc_meta.select(
            "doc_id", "doc_len", F.col("norm_id").cast("int").alias("norm_id")
        )

    def invariant_sha(spark, sf_dir):
        return _index(spark, sf_dir).doc_meta.select("doc_id", "sha")

    def search_term_top10(spark, sf_dir):
        return _hits(spark, sf_dir, "spark")

    def search_or_top10(spark, sf_dir):
        return _hits(spark, sf_dir, "query window scan")

    def search_must(spark, sf_dir):
        return _hits(spark, sf_dir, "+merge +customer")

    def search_must_not(spark, sf_dir):
        return _hits(spark, sf_dir, "scan -filter")

    def search_wand_top10(spark, sf_dir):
        # WAND path — must be rank-identical to exhaustive (same oracle as OR).
        from sparktext.query import matched_docs, parse_query
        from sparktext.topk import top_k

        idx = _index(spark, sf_dir)
        m = matched_docs(idx, parse_query("query window scan"), exhaustive=False, k=10)
        return top_k(m, 10, round_decimals=4)

    def search_batch(spark, sf_dir):
        # N queries, ONE postings pass (search_many) — throughput shape.
        from sparktext.query import search_many

        idx = _index(spark, sf_dir)
        qs = {"b1": "spark", "b2": "query window", "b3": "+join +filter",
              "b4": "stream -slow"}
        return search_many(idx, qs, k=10, round_decimals=4)

    def search_batch_wand(spark, sf_dir):
        # Round 6: the batch block-max pruning path ACTIVE (forced via
        # wand_min_postings=0 — the cost gate would bypass it at fixture
        # scale). Pure-should batch so every query is prunable; results
        # must be identical to the exhaustive batch (same oracle shape
        # as search_batch).
        from sparktext.query import search_many

        idx = _index(spark, sf_dir)
        qs = {"w1": "spark", "w2": "query window", "w3": "query window scan"}
        return search_many(idx, qs, k=10, round_decimals=4,
                           exhaustive=False, wand_min_postings=0)

    def search_phrase(spark, sf_dir):
        from sparktext.query import phrase_docs
        from sparktext.topk import top_k

        idx = _index(spark, sf_dir)
        return top_k(phrase_docs(idx, ["query", "window"]), 10, round_decimals=4)

    def search_term_range(spark, sf_dir):
        from sparktext.query import term_range_docs

        idx = _index(spark, sf_dir)
        return term_range_docs(idx, "query", "sort").orderBy("doc_id")

    def search_prefix(spark, sf_dir):
        from sparktext.query import prefix_docs

        idx = _index(spark, sf_dir)
        return prefix_docs(idx, "s").orderBy("doc_id")

    def search_regex(spark, sf_dir):
        from sparktext.query import regex_docs

        idx = _index(spark, sf_dir)
        return regex_docs(idx, "^s.*n$").orderBy("doc_id")

    def search_fuzzy(spark, sf_dir):
        from sparktext.query import fuzzy_docs

        idx = _index(spark, sf_dir)
        return fuzzy_docs(idx, "spar", max_edits=1).orderBy("doc_id")

    def agg_count(spark, sf_dir):
        _, m = _matched(spark, sf_dir, "spark")
        return metrics_agg(m, [CountAgg()])

    def agg_stats(spark, sf_dir):
        _, mm = _matched_meta(spark, sf_dir, "spark")
        return metrics_agg(
            mm, [CountAgg(), MinAgg("n_chars"), MaxAgg("n_chars"),
                 SumAgg("n_chars"), StatsAgg("doc_len")]
        )

    def agg_terms_lang(spark, sf_dir):
        _, mm = _matched_meta(spark, sf_dir, "spark")
        return terms_agg(mm, "lang", size=5, sub_aggs=[MaxAgg("n_chars"), MinAgg("doc_len")])

    def agg_terms_repo_top10(spark, sf_dir):
        _, mm = _matched_meta(spark, sf_dir, "spark")
        return terms_agg(mm, "repo", size=10, sub_aggs=[SumAgg("n_chars")])

    def agg_histogram(spark, sf_dir):
        _, mm = _matched_meta(spark, sf_dir, "spark")
        return histogram_agg(mm, "n_chars", interval=100.0)

    def agg_range(spark, sf_dir):
        _, mm = _matched_meta(spark, sf_dir, "spark")
        return range_agg(mm, "n_chars", edges=[150.0, 300.0, 450.0])

    def agg_filter(spark, sf_dir):
        _, mm = _matched_meta(spark, sf_dir, "spark")
        return metrics_agg(
            mm,
            [CountAgg(name="total"),
             FilterAgg("lang = 'en'", (CountAgg(name="en_count"), SumAgg("n_chars", name="en_sum")))],
        )

    def agg_percentiles(spark, sf_dir):
        _, mm = _matched_meta(spark, sf_dir, "spark")
        df = metrics_agg(
            mm.withColumn("n_chars", F.col("n_chars").cast("double")),
            [PercentilesAgg("n_chars", (0.5, 0.9, 0.99))],
        )
        return df.select(*[F.round(c, 6).alias(c) for c in df.columns])

    def agg_post_filter_hits(spark, sf_dir):
        from sparktext.aggs import agg_search

        idx = _index(spark, sf_dir)
        out = agg_search(idx, "spark", k=10, post_filter="lang = 'en'", round_decimals=4)
        return out["hits"]

    def agg_terms_nested(spark, sf_dir):
        from sparktext.aggs import nested_terms_agg

        _, mm = _matched_meta(spark, sf_dir, "spark")
        return nested_terms_agg(mm, "lang", "repo", size1=3, size2=2)

    def agg_terms_multivalued(spark, sf_dir):
        # C7 over a multi-valued (ArrayType) facet: tags derived
        # deterministically from scalar metadata, exploded inside terms_agg.
        _, mm = _matched_meta(spark, sf_dir, "spark")
        tags = F.concat(
            F.array("lang", "repo"),
            F.when(F.col("n_chars") > 300, F.array(F.lit("long")))
            .otherwise(F.array().cast("array<string>")),
        )
        return terms_agg(
            mm.withColumn("tag", tags), "tag", size=10, sub_aggs=[SumAgg("n_chars")]
        )

    def agg_facet_paths(spark, sf_dir):
        # C7 hierarchical: '/lang/repo' paths with ancestor rollup.
        from sparktext.aggs import facet_terms_agg

        _, mm = _matched_meta(spark, sf_dir, "spark")
        fpath = F.concat(F.lit("/"), F.col("lang"), F.lit("/"), F.col("repo"))
        return facet_terms_agg(mm.withColumn("fpath", fpath), "fpath", size=10)

    def search_phrase_slop(spark, sf_dir):
        from sparktext.query import phrase_docs
        from sparktext.topk import top_k

        idx = _index(spark, sf_dir)
        return top_k(phrase_docs(idx, ["query", "window"], slop=1), 10, round_decimals=4)

    def search_boost(spark, sf_dir):
        # B1 clause boost: `spark^2 query` doubles spark's partials.
        return _hits(spark, sf_dir, "spark^2 query")

    def search_all(spark, sf_dir):
        from sparktext.query import all_docs

        idx = _index(spark, sf_dir)
        return all_docs(idx).orderBy("doc_id")

    def search_facet_subtree(spark, sf_dir):
        # Indexed facet field: '/en' subtree = one exact-term lookup in
        # the facet postings (ancestor rollup happens at INDEX time).
        from sparktext.query import facet_subtree_docs

        return facet_subtree_docs(_facet_index(spark, sf_dir), "/en").orderBy("doc_id")

    def search_batch_boosted(spark, sf_dir):
        # term^N boosts inside a BATCH: per-(query, term) multipliers ride
        # the shared-partial plans (both strategies result-identical).
        from sparktext.query import search_many

        idx = _index(spark, sf_dir)
        qs = {"bb1": "spark^2 query", "bb2": "spark query",
              "bb3": "+join filter^3"}
        return search_many(idx, qs, k=10, round_decimals=4)

    def search_batch_phrase(spark, sf_dir):
        # Quoted phrases inside a BATCH (round 5): phrase-carrying
        # queries' term sides share ONE join-strategy pass, each
        # distinct clause rides the positions index once, and the plain
        # query in the same batch keeps the ordinary shared plan.
        from sparktext.query import search_many

        idx = _index(spark, sf_dir)
        qs = {"p1": '"query window" spark', "p2": '"query window"',
              "p3": "spark"}
        return search_many(idx, qs, k=10, round_decimals=4)

    def search_quoted(spark, sf_dir):
        # B1 quoted-phrase syntax folded into the boolean evaluator:
        # must phrase + should term, scores summed over both clauses.
        from sparktext.query import matched_docs, parse_query
        from sparktext.topk import top_k

        idx = _index(spark, sf_dir)
        return top_k(
            matched_docs(idx, parse_query('+"query window" spark')),
            10, round_decimals=4,
        )

    def agg_facet_matched(spark, sf_dir):
        # Composition: facet-subtree matched set -> C7 terms buckets
        # (the "filter by category, facet the rest" UI query).
        from sparktext.query import facet_subtree_docs

        idx = _facet_index(spark, sf_dir)
        mm = facet_subtree_docs(idx, "/en").join(idx.doc_meta, "doc_id")
        return terms_agg(mm, "repo", size=5, sub_aggs=[SumAgg("n_chars")])

    def agg_top_hits(spark, sf_dir):
        # C7 x B9: top-2 hits per lang bucket (ES top_hits sub-agg).
        from sparktext.aggs import top_hits_agg

        idx, m = _matched(spark, sf_dir, "spark")
        mm = m.join(idx.doc_meta.select("doc_id", "lang"), "doc_id")
        return top_hits_agg(mm, "lang", k=2, round_decimals=4)

    def search_page2(spark, sf_dir):
        # B9 search_after: page 2 of the top-20, cursor = last row of
        # page 1 (client-held k-row cursor; the collect is k rows).
        from sparktext.topk import top_k, top_k_after

        _, m = _matched(spark, sf_dir, "query window scan")
        cur = top_k(m, 10, round_decimals=4).collect()[-1]
        return top_k_after(m, 10, cur["score"], cur["doc_id"], round_decimals=4)

    def search_snippets(spark, sf_dir):
        # Snippet generation over the top-5 hits: JVM-side column
        # expressions only (locate/substring/regexp_replace).
        from sparktext.corpus import documents_as_corpus
        from sparktext.snippet import snippets

        hits = _hits(spark, sf_dir, "spark query", k=5)
        corpus = documents_as_corpus(spark, sf_dir)
        return snippets(hits, corpus, ["spark", "query"])

    def agg_cardinality(spark, sf_dir):
        from sparktext.aggs import CardinalityAgg

        _, mm = _matched_meta(spark, sf_dir, "spark")
        return metrics_agg(
            mm, [CardinalityAgg("repo"), CardinalityAgg("lang")]
        )

    def agg_composed(spark, sf_dir):
        # C13: a tuple of metric collectors in ONE pass.
        _, mm = _matched_meta(spark, sf_dir, "query window")
        return metrics_agg(
            mm, [CountAgg(), SumAgg("doc_len"), MinAgg("n_chars"),
                 MaxAgg("n_chars"), StatsAgg("n_chars")]
        )

    out = {
        "index_term_dict": index_term_dict,
        "index_doc_norms": index_doc_norms,
        "invariant_sha": invariant_sha,
        "search_term_top10": search_term_top10,
        "search_or_top10": search_or_top10,
        "search_must": search_must,
        "search_must_not": search_must_not,
        "search_wand_top10": search_wand_top10,
        "search_batch": search_batch,
        "search_batch_wand": search_batch_wand,
        "search_phrase": search_phrase,
        "search_term_range": search_term_range,
        "search_prefix": search_prefix,
        "search_regex": search_regex,
        "search_fuzzy": search_fuzzy,
        "agg_count": agg_count,
        "agg_stats": agg_stats,
        "agg_terms_lang": agg_terms_lang,
        "agg_terms_repo_top10": agg_terms_repo_top10,
        "agg_histogram": agg_histogram,
        "agg_range": agg_range,
        "agg_filter": agg_filter,
        "agg_percentiles": agg_percentiles,
        "agg_post_filter_hits": agg_post_filter_hits,
        "agg_terms_nested": agg_terms_nested,
        "agg_terms_multivalued": agg_terms_multivalued,
        "agg_facet_paths": agg_facet_paths,
        "search_phrase_slop": search_phrase_slop,
        "search_all": search_all,
        "search_boost": search_boost,
        "search_facet_subtree": search_facet_subtree,
        "search_batch_boosted": search_batch_boosted,
        "search_batch_phrase": search_batch_phrase,
        "search_quoted": search_quoted,
        "agg_facet_matched": agg_facet_matched,
        "agg_cardinality": agg_cardinality,
        "agg_composed": agg_composed,
        "agg_top_hits": agg_top_hits,
        "search_page2": search_page2,
        "search_snippets": search_snippets,
    }
    out.update(textops.queries())
    return out


# --------------------------------------------------------------------------
# oracle SQL (DuckDB; views: documents, embeddings, ...)
# --------------------------------------------------------------------------

_TOK = (
    "tok AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term "
    "FROM documents)"
)
_TF = "tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term)"
_DL = (
    "dl AS (SELECT d.doc_id, COALESCE(t.n, 0) AS doc_len FROM documents d "
    "LEFT JOIN (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id) t USING (doc_id))"
)


def _bm25_cte(terms: list[str]) -> str:
    """CTE chain computing rounded BM25 per (doc, term in set)."""
    tlist = ",".join(f"('{t}')" for t in terms)
    return f"""
WITH {_TOK}, {_TF}, {_DL},
{norm_values_sql()},
qdl AS (SELECT doc_id, doc_len,
        (SELECT MAX(v) FROM norm_vals WHERE v <= doc_len) AS q FROM dl),
stats AS (SELECT (SELECT COUNT(*) FROM documents) AS n,
                 (SELECT SUM(doc_len) FROM dl) AS total),
qterms(term) AS (VALUES {tlist}),
df AS (SELECT term, COUNT(*) AS df FROM tf WHERE term IN (SELECT term FROM qterms)
       GROUP BY term),
scored AS (
  SELECT tf.doc_id, tf.term,
         ln(1.0 + (stats.n - df.df + 0.5) / (df.df + 0.5))
           * tf.tf * ({K1} + 1.0)
           / (tf.tf + {K1} * (1.0 - {B} + {B} * qdl.q
              / (CAST(stats.total AS DOUBLE) / stats.n))) AS partial
  FROM tf JOIN df USING (term) JOIN qdl USING (doc_id), stats
)"""


def _bm25_topk(terms, k=10, must=(), must_not=(), boosts=None):
    mult = ""
    if boosts:
        arms = " ".join(f"WHEN '{t}' THEN {b}" for t, b in boosts.items())
        mult = f" * CASE term {arms} ELSE 1.0 END"
    having = ""
    if must:
        mlist = ",".join(f"'{t}'" for t in must)
        having = (
            f" HAVING COUNT(DISTINCT CASE WHEN term IN ({mlist}) THEN term END) = {len(set(must))}"
        )
    excl = ""
    if must_not:
        xlist = ",".join(f"'{t}'" for t in must_not)
        excl = (
            f" AND doc_id NOT IN (SELECT DISTINCT doc_id FROM tf WHERE term IN ({xlist}))"
        )
    return f"""{_bm25_cte(list(terms))}
SELECT doc_id, ROUND(SUM(partial{mult}), 4) AS score
FROM scored WHERE 1=1{excl}
GROUP BY doc_id{having}
ORDER BY score DESC, doc_id ASC LIMIT {k}"""


_MATCHED_SPARK = (
    "matched AS (SELECT DISTINCT d.* FROM documents d "
    "JOIN tok USING (doc_id) WHERE tok.term = 'spark')"
)


def _matched_sql(terms: list[str]) -> str:
    tlist = ",".join(f"'{t}'" for t in terms)
    return (
        f"matched AS (SELECT DISTINCT d.* FROM documents d "
        f"JOIN tok USING (doc_id) WHERE tok.term IN ({tlist}))"
    )


def oracle_sql() -> dict[str, str]:
    from sparktext import textops

    out = {
        "index_term_dict": f"""
WITH {_TOK}, {_TF}
SELECT term, COUNT(*) AS doc_freq, CAST(SUM(tf) AS BIGINT) AS total_tf FROM tf GROUP BY term""",
        "index_doc_norms": f"""
WITH {_TOK}, {_DL}, {norm_values_sql()}
SELECT doc_id, doc_len,
       CAST((SELECT COUNT(*) FROM norm_vals WHERE v <= doc_len) - 1 AS INT) AS norm_id
FROM dl""",
        "invariant_sha": "SELECT doc_id, sha256(text) AS sha FROM documents",
        "search_term_top10": _bm25_topk(["spark"]),
        "search_or_top10": _bm25_topk(["query", "window", "scan"]),
        "search_must": _bm25_topk(["merge", "customer"], must=["merge", "customer"]),
        "search_must_not": _bm25_topk(["scan"], must_not=["filter"]),
        "search_wand_top10": _bm25_topk(["query", "window", "scan"]),
        "search_batch": " UNION ALL ".join(
            f"SELECT '{qid}' AS query_id, * FROM ({sql})"
            for qid, sql in [
                ("b1", _bm25_topk(["spark"])),
                ("b2", _bm25_topk(["query", "window"])),
                ("b3", _bm25_topk(["join", "filter"], must=["join", "filter"])),
                ("b4", _bm25_topk(["stream"], must_not=["slow"])),
            ]
        ),
        "search_batch_wand": " UNION ALL ".join(
            f"SELECT '{qid}' AS query_id, * FROM ({sql})"
            for qid, sql in [
                ("w1", _bm25_topk(["spark"])),
                ("w2", _bm25_topk(["query", "window"])),
                ("w3", _bm25_topk(["query", "window", "scan"])),
            ]
        ),
        "agg_count": f"""
WITH {_TOK}, {_MATCHED_SPARK}
SELECT COUNT(*) AS count FROM matched""",
        "agg_stats": f"""
WITH {_TOK}, {_DL}, {_MATCHED_SPARK}
SELECT COUNT(*) AS count, MIN(n_chars) AS min_n_chars, MAX(n_chars) AS max_n_chars,
       CAST(COALESCE(SUM(n_chars), 0) AS BIGINT) AS sum_n_chars,
       COUNT(doc_len) AS doc_len_count,
       CAST(COALESCE(SUM(doc_len), 0) AS BIGINT) AS doc_len_sum,
       MIN(doc_len) AS doc_len_min, MAX(doc_len) AS doc_len_max,
       AVG(CAST(doc_len AS DOUBLE)) AS doc_len_avg
FROM matched JOIN dl USING (doc_id)""",
        "agg_terms_lang": f"""
WITH {_TOK}, {_DL}, {_MATCHED_SPARK}
SELECT lang, COUNT(*) AS count, MAX(n_chars) AS max_n_chars, MIN(doc_len) AS min_doc_len
FROM matched JOIN dl USING (doc_id)
GROUP BY lang ORDER BY count DESC, lang ASC LIMIT 5""",
        "agg_terms_repo_top10": f"""
WITH {_TOK}, {_MATCHED_SPARK}
SELECT source AS repo, COUNT(*) AS count,
       CAST(COALESCE(SUM(n_chars),0) AS BIGINT) AS sum_n_chars
FROM matched GROUP BY source ORDER BY count DESC, repo ASC LIMIT 10""",
        "agg_histogram": f"""
WITH {_TOK}, {_MATCHED_SPARK}
SELECT CAST(FLOOR(n_chars / 100.0) * 100.0 AS DOUBLE) AS bucket, COUNT(*) AS count
FROM matched GROUP BY 1""",
        "agg_range": f"""
WITH {_TOK}, {_MATCHED_SPARK}
SELECT CASE WHEN n_chars < 150 THEN '*-150'
            WHEN n_chars < 300 THEN '150-300'
            WHEN n_chars < 450 THEN '300-450'
            ELSE '450-*' END AS range_key,
       COUNT(*) AS count
FROM matched GROUP BY 1""",
        "agg_filter": f"""
WITH {_TOK}, {_MATCHED_SPARK}
SELECT COUNT(*) AS total,
       COUNT(CASE WHEN lang = 'en' THEN 1 END) AS en_count,
       CAST(COALESCE(SUM(CASE WHEN lang = 'en' THEN n_chars END), 0) AS BIGINT) AS en_sum
FROM matched""",
        "agg_percentiles": f"""
WITH {_TOK}, {_MATCHED_SPARK}
SELECT ROUND(quantile_cont(CAST(n_chars AS DOUBLE), 0.5), 6) AS n_chars_p50,
       ROUND(quantile_cont(CAST(n_chars AS DOUBLE), 0.9), 6) AS n_chars_p90,
       ROUND(quantile_cont(CAST(n_chars AS DOUBLE), 0.99), 6) AS n_chars_p99
FROM matched""",
        "agg_post_filter_hits": _bm25_topk(["spark"], k=10)
        .replace("WHERE 1=1", "WHERE doc_id IN (SELECT doc_id FROM documents WHERE lang = 'en')"),
        "search_phrase": f"""
WITH tokp AS (SELECT doc_id,
       unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term,
       generate_subscripts(regexp_extract_all(lower(text), '[a-z0-9]+'), 1) AS pos
     FROM documents),
{_TOK}, {_DL}, {norm_values_sql()},
qdl AS (SELECT doc_id, (SELECT MAX(v) FROM norm_vals WHERE v <= doc_len) AS q FROM dl),
stats AS (SELECT (SELECT COUNT(*) FROM documents) AS n,
                 (SELECT SUM(doc_len) FROM dl) AS total),
p0 AS (SELECT doc_id, list(pos) AS ps FROM tokp WHERE term = 'query' GROUP BY doc_id),
p1 AS (SELECT doc_id, list(pos - 1) AS ps FROM tokp WHERE term = 'window' GROUP BY doc_id),
ptf AS (SELECT p0.doc_id, len(list_intersect(p0.ps, p1.ps)) AS tf
        FROM p0 JOIN p1 USING (doc_id)
        WHERE len(list_intersect(p0.ps, p1.ps)) > 0),
idf AS (SELECT SUM(ln(1.0 + (stats.n - d.df + 0.5) / (d.df + 0.5))) AS sidf
        FROM (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tokp
              WHERE term IN ('query', 'window') GROUP BY term) d, stats)
SELECT ptf.doc_id AS doc_id,
       ROUND(idf.sidf * ptf.tf * ({K1} + 1.0)
             / (ptf.tf + {K1} * (1.0 - {B} + {B} * qdl.q
                / (CAST(stats.total AS DOUBLE) / stats.n))), 4) AS score
FROM ptf JOIN qdl ON qdl.doc_id = ptf.doc_id, idf, stats
ORDER BY score DESC, ptf.doc_id ASC LIMIT 10""",
        "search_term_range": f"""
WITH {_TOK}
SELECT DISTINCT doc_id, 1.0 AS score FROM tok
WHERE term >= 'query' AND term < 'sort' ORDER BY doc_id""",
        "search_prefix": f"""
WITH {_TOK}
SELECT DISTINCT doc_id, 1.0 AS score FROM tok
WHERE term LIKE 's%' ORDER BY doc_id""",
        "search_regex": f"""
WITH {_TOK}
SELECT DISTINCT doc_id, 1.0 AS score FROM tok
WHERE regexp_matches(term, '^s.*n$') ORDER BY doc_id""",
        "search_fuzzy": f"""
WITH {_TOK}
SELECT DISTINCT doc_id, 1.0 AS score FROM tok
WHERE levenshtein(term, 'spar') <= 1 ORDER BY doc_id""",
        "agg_terms_nested": f"""
WITH {_TOK}, {_MATCHED_SPARK},
b AS (SELECT lang, source AS repo, COUNT(*) AS count FROM matched GROUP BY lang, source),
b1 AS (SELECT *, SUM(count) OVER (PARTITION BY lang) AS tot FROM b),
b2 AS (SELECT *, DENSE_RANK() OVER (ORDER BY tot DESC, lang ASC) AS rk FROM b1),
b3 AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY lang ORDER BY count DESC, repo ASC) AS rn2
       FROM b2 WHERE rk <= 3)
SELECT lang, repo, count FROM b3 WHERE rn2 <= 2""",
        "search_all": "SELECT doc_id, 1.0 AS score FROM documents ORDER BY doc_id",
        "search_boost": _bm25_topk(["spark", "query"], boosts={"spark": 2.0}),
        "search_facet_subtree": (
            "SELECT doc_id, 1.0 AS score FROM documents WHERE lang = 'en' "
            "ORDER BY doc_id"
        ),
        "agg_facet_matched": """
SELECT source AS repo, COUNT(*) AS count,
       CAST(COALESCE(SUM(n_chars), 0) AS BIGINT) AS sum_n_chars
FROM documents WHERE lang = 'en'
GROUP BY source ORDER BY count DESC, repo ASC LIMIT 5""",
        "search_quoted": f"""
WITH tokp AS (SELECT doc_id,
       unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term,
       generate_subscripts(regexp_extract_all(lower(text), '[a-z0-9]+'), 1) AS pos
     FROM documents),
{_TOK}, {_TF}, {_DL}, {norm_values_sql()},
qdl AS (SELECT doc_id, (SELECT MAX(v) FROM norm_vals WHERE v <= doc_len) AS q FROM dl),
stats AS (SELECT (SELECT COUNT(*) FROM documents) AS n,
                 (SELECT SUM(doc_len) FROM dl) AS total),
p0 AS (SELECT doc_id, list(pos) AS ps FROM tokp WHERE term = 'query' GROUP BY doc_id),
p1 AS (SELECT doc_id, list(pos - 1) AS ps FROM tokp WHERE term = 'window' GROUP BY doc_id),
ptf AS (SELECT p0.doc_id, len(list_intersect(p0.ps, p1.ps)) AS tf
        FROM p0 JOIN p1 USING (doc_id)
        WHERE len(list_intersect(p0.ps, p1.ps)) > 0),
pidf AS (SELECT SUM(ln(1.0 + (stats.n - d.df + 0.5) / (d.df + 0.5))) AS sidf
         FROM (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tokp
               WHERE term IN ('query', 'window') GROUP BY term) d, stats),
phr AS (SELECT ptf.doc_id,
        pidf.sidf * ptf.tf * ({K1} + 1.0)
          / (ptf.tf + {K1} * (1.0 - {B} + {B} * qdl.q
             / (CAST(stats.total AS DOUBLE) / stats.n))) AS s
        FROM ptf JOIN qdl ON qdl.doc_id = ptf.doc_id, pidf, stats),
sdf AS (SELECT COUNT(*) AS df FROM tf WHERE term = 'spark'),
spart AS (SELECT tf.doc_id,
          ln(1.0 + (stats.n - sdf.df + 0.5) / (sdf.df + 0.5))
            * tf.tf * ({K1} + 1.0)
            / (tf.tf + {K1} * (1.0 - {B} + {B} * qdl.q
               / (CAST(stats.total AS DOUBLE) / stats.n))) AS s
          FROM tf JOIN qdl USING (doc_id), sdf, stats WHERE tf.term = 'spark')
SELECT phr.doc_id AS doc_id, ROUND(phr.s + COALESCE(spart.s, 0.0), 4) AS score
FROM phr LEFT JOIN spart ON spart.doc_id = phr.doc_id
ORDER BY score DESC, doc_id ASC LIMIT 10""",
        "search_batch_boosted": " UNION ALL ".join(
            f"SELECT '{qid}' AS query_id, * FROM ({sql})"
            for qid, sql in [
                ("bb1", _bm25_topk(["spark", "query"], boosts={"spark": 2.0})),
                ("bb2", _bm25_topk(["spark", "query"])),
                ("bb3", _bm25_topk(["join", "filter"], must=["join"],
                                   boosts={"filter": 3.0})),
            ]
        ),
        "agg_cardinality": f"""
WITH {_TOK}, {_MATCHED_SPARK}
SELECT COUNT(DISTINCT source) AS cardinality_repo,
       COUNT(DISTINCT lang) AS cardinality_lang
FROM matched""",
        "agg_terms_multivalued": f"""
WITH {_TOK}, {_MATCHED_SPARK},
t AS (SELECT unnest(list_distinct(
        [lang, source] || CASE WHEN n_chars > 300 THEN ['long']
                          ELSE CAST([] AS VARCHAR[]) END
      )) AS tag, n_chars
      FROM matched)
SELECT tag, COUNT(*) AS count,
       CAST(COALESCE(SUM(n_chars), 0) AS BIGINT) AS sum_n_chars
FROM t GROUP BY tag ORDER BY count DESC, tag ASC LIMIT 10""",
        "agg_facet_paths": f"""
WITH {_TOK}, {_MATCHED_SPARK},
t AS (SELECT '/' || lang AS facet FROM matched
      UNION ALL SELECT '/' || lang || '/' || source FROM matched)
SELECT facet, COUNT(*) AS count
FROM t GROUP BY facet ORDER BY count DESC, facet ASC LIMIT 10""",
        "search_phrase_slop": f"""
WITH tokp AS (SELECT doc_id,
       unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term,
       generate_subscripts(regexp_extract_all(lower(text), '[a-z0-9]+'), 1) AS pos
     FROM documents),
{_TOK}, {_DL}, {norm_values_sql()},
qdl AS (SELECT doc_id, (SELECT MAX(v) FROM norm_vals WHERE v <= doc_len) AS q FROM dl),
stats AS (SELECT (SELECT COUNT(*) FROM documents) AS n,
                 (SELECT SUM(doc_len) FROM dl) AS total),
a AS (SELECT doc_id, pos AS p FROM tokp WHERE term = 'query'),
b AS (SELECT doc_id, pos AS q FROM tokp WHERE term = 'window'),
anchors AS (SELECT DISTINCT a.doc_id, a.p FROM a
            JOIN b ON b.doc_id = a.doc_id AND abs(b.q - a.p - 1) <= 1),
ptf AS (SELECT doc_id, COUNT(*) AS tf FROM anchors GROUP BY doc_id),
idf AS (SELECT SUM(ln(1.0 + (stats.n - d.df + 0.5) / (d.df + 0.5))) AS sidf
        FROM (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tokp
              WHERE term IN ('query', 'window') GROUP BY term) d, stats)
SELECT ptf.doc_id AS doc_id,
       ROUND(idf.sidf * ptf.tf * ({K1} + 1.0)
             / (ptf.tf + {K1} * (1.0 - {B} + {B} * qdl.q
                / (CAST(stats.total AS DOUBLE) / stats.n))), 4) AS score
FROM ptf JOIN qdl ON qdl.doc_id = ptf.doc_id, idf, stats
ORDER BY score DESC, ptf.doc_id ASC LIMIT 10""",
        "agg_composed": f"""
WITH {_TOK}, {_DL}, {_matched_sql(["query", "window"])}
SELECT COUNT(*) AS count, CAST(COALESCE(SUM(doc_len), 0) AS BIGINT) AS sum_doc_len,
       MIN(n_chars) AS min_n_chars, MAX(n_chars) AS max_n_chars,
       COUNT(n_chars) AS n_chars_count,
       CAST(COALESCE(SUM(n_chars), 0) AS BIGINT) AS n_chars_sum,
       MIN(n_chars) AS n_chars_min, MAX(n_chars) AS n_chars_max,
       AVG(CAST(n_chars AS DOUBLE)) AS n_chars_avg
FROM matched JOIN dl USING (doc_id)""",
    }
    out["agg_top_hits"] = f"""{_bm25_cte(["spark"])},
sc AS (SELECT doc_id, ROUND(SUM(partial), 4) AS score FROM scored GROUP BY doc_id),
ranked AS (
  SELECT d.lang, sc.doc_id, sc.score,
         ROW_NUMBER() OVER (PARTITION BY d.lang
                            ORDER BY sc.score DESC, sc.doc_id ASC) AS hit_rank
  FROM sc JOIN documents d USING (doc_id))
SELECT lang, doc_id, score, CAST(hit_rank AS INT) AS hit_rank
FROM ranked WHERE hit_rank <= 2"""
    # search_after == rows 11..20 of the same total order (the cursor
    # filter and OFFSET select identical rows because the order is total:
    # rounded score desc, doc_id asc).
    out["search_page2"] = (
        f"SELECT doc_id, score FROM ({_bm25_topk(['query', 'window', 'scan'], k=20)}) t "
        "ORDER BY score DESC, doc_id ASC LIMIT 10 OFFSET 10"
    )
    out["search_snippets"] = f"""
SELECT t.doc_id, t.score,
       regexp_replace(
         substr(d.text,
                CASE WHEN d.fp IS NULL THEN 1
                     ELSE greatest(1, d.fp - 30) END, 100),
         '\\b(spark|query)\\b', '<b>\\1</b>', 'g') AS snippet
FROM ({_bm25_topk(["spark", "query"], k=5)}) t
JOIN (
  SELECT doc_id, text,
         nullif(least(
           coalesce(nullif(strpos(lower(text), 'spark'), 0), 2147483647),
           coalesce(nullif(strpos(lower(text), 'query'), 0), 2147483647)),
           2147483647) AS fp
  FROM documents) d USING (doc_id)"""
    # Batch-with-phrases: per-query SQL reuses the single-query oracle
    # bodies verbatim (p1 = the quoted mixed query, p2 = the bare
    # phrase, p3 = a plain BM25 query riding the same batch).
    out["search_batch_phrase"] = " UNION ALL ".join(
        f"SELECT '{qid}' AS query_id, * FROM ({sql})"
        for qid, sql in [
            ("p1", out["search_quoted"]),
            ("p2", out["search_phrase"]),
            ("p3", _bm25_topk(["spark"])),
        ]
    )
    out.update(textops.oracle_sql())
    return out
