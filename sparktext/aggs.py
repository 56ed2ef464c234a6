"""Aggregation collectors C1–C14 (SURVEY.md §2.C) — the crate proper.

Every collector is expressed through Spark's native partial+final
aggregation (hash-agg partials before the shuffle ARE tantivy's
SegmentAgg -> merge_fruits contract, §4.6). Metric collectors are spec
objects lowering to aliased Column expressions so arbitrary tuples of
them fuse into ONE ``.agg(...)`` pass (C13); bucket collectors are
DataFrame -> DataFrame functions.

``agg_search`` is the crate's entry point (§3.3): one persisted matched
set feeds hits + every aggregation — the Spark idiom for "fused into the
scoring pass".

Upstream parity map (module names per SURVEY §2.C; crate source
unavailable locally — SURVEY.md §0): count_agg.rs -> CountAgg,
min/max/sum/avg/stats_agg.rs -> Min/Max/Sum/Avg/StatsAgg,
percentiles_agg.rs -> PercentilesAgg, terms_agg.rs -> terms_agg,
filter_agg.rs -> FilterAgg/filter_agg, post_filter_agg.rs -> agg_search's
``post_filter``, histogram/range -> histogram_agg/range_agg.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _cond(col: Column, cond: Column | None) -> Column:
    return F.when(cond, col) if cond is not None else col


@dataclass(frozen=True)
class MetricAgg:
    """Base spec: lowers to one or more aliased aggregate Columns.

    ``cond`` support makes FilterAgg (C8) a zero-extra-scan rewrite:
    every metric accepts an optional predicate applied via CASE WHEN
    inside the aggregate.
    """

    def exprs(self, cond: Column | None = None) -> list[Column]:  # pragma: no cover
        raise NotImplementedError


@dataclass(frozen=True)
class CountAgg(MetricAgg):  # C1
    name: str = "count"

    def exprs(self, cond=None):
        return [F.count(_cond(F.lit(1), cond)).alias(self.name)]


@dataclass(frozen=True)
class MinAgg(MetricAgg):  # C2
    field: str = ""
    name: str = ""

    def exprs(self, cond=None):
        return [F.min(_cond(F.col(self.field), cond)).alias(self.name or f"min_{self.field}")]


@dataclass(frozen=True)
class MaxAgg(MetricAgg):  # C3
    field: str = ""
    name: str = ""

    def exprs(self, cond=None):
        return [F.max(_cond(F.col(self.field), cond)).alias(self.name or f"max_{self.field}")]


@dataclass(frozen=True)
class SumAgg(MetricAgg):  # C4 — 0 on empty, like the crate
    field: str = ""
    name: str = ""

    def exprs(self, cond=None):
        return [
            F.coalesce(F.sum(_cond(F.col(self.field), cond)), F.lit(0)).alias(
                self.name or f"sum_{self.field}"
            )
        ]


@dataclass(frozen=True)
class AvgAgg(MetricAgg):  # C5 — NULL on empty (Option<mean>)
    field: str = ""
    name: str = ""

    def exprs(self, cond=None):
        return [F.avg(_cond(F.col(self.field), cond)).alias(self.name or f"avg_{self.field}")]


@dataclass(frozen=True)
class StatsAgg(MetricAgg):  # C6 — one pass, five fruits
    field: str = ""
    prefix: str = ""

    def exprs(self, cond=None):
        c = _cond(F.col(self.field), cond)
        p = self.prefix or f"{self.field}_"
        return [
            F.count(c).alias(f"{p}count"),
            F.coalesce(F.sum(c), F.lit(0)).alias(f"{p}sum"),
            F.min(c).alias(f"{p}min"),
            F.max(c).alias(f"{p}max"),
            F.avg(c).alias(f"{p}avg"),
        ]


@dataclass(frozen=True)
class PercentilesAgg(MetricAgg):  # C10
    """Exact by default (matches the DuckDB oracle's quantile_cont);
    ``approx=True`` switches to percentile_approx — the 100TB path, where
    an exact percentile would require a full sort per group."""

    field: str = ""
    pcts: tuple[float, ...] = (0.5, 0.9, 0.99)
    approx: bool = False
    prefix: str = ""

    def exprs(self, cond=None):
        c = _cond(F.col(self.field), cond)
        p = self.prefix or f"{self.field}_p"
        fn = F.percentile_approx if self.approx else F.percentile
        return [
            fn(c, F.lit(float(pct))).alias(f"{p}{int(pct * 100)}") for pct in self.pcts
        ]


@dataclass(frozen=True)
class CardinalityAgg(MetricAgg):
    """Distinct-value count over a fast field (Elasticsearch-style
    cardinality bucket metric; extension beyond the crate's metric set).
    Exact by default (count_distinct — a full shuffle of the distinct
    set); ``approx=True`` is the 100-TB path (HyperLogLog++ via
    approx_count_distinct: bounded sketch state, map-side partials)."""

    field: str = ""
    approx: bool = False
    rsd: float = 0.05
    name: str = ""

    def exprs(self, cond=None):
        c = _cond(F.col(self.field), cond)
        fn = (
            F.approx_count_distinct(c, self.rsd)
            if self.approx
            else F.count_distinct(c)
        )
        return [fn.alias(self.name or f"cardinality_{self.field}")]


@dataclass(frozen=True)
class FilterAgg(MetricAgg):  # C8 — conditional rewrite, no second scan
    predicate: str = ""  # SQL boolean expression over matched columns
    sub_aggs: tuple[MetricAgg, ...] = dc_field(default_factory=tuple)

    def exprs(self, cond=None):
        mine = F.expr(self.predicate)
        if cond is not None:
            mine = cond & mine
        out: list[Column] = []
        for sub in self.sub_aggs:
            out.extend(sub.exprs(cond=mine))
        return out


def metrics_agg(matched: DataFrame, aggs: list[MetricAgg]) -> DataFrame:
    """C13: any tuple of metric collectors -> ONE aggregation pass."""
    cols: list[Column] = []
    for a in aggs:
        cols.extend(a.exprs())
    return matched.agg(*cols)


def terms_agg(
    matched: DataFrame,
    field: str,
    size: int | None = 10,
    sub_aggs: list[MetricAgg] | None = None,
    order_by: str = "count",
    ascending: bool = False,
) -> DataFrame:
    """C7: top-N facet buckets with nested sub-aggregations.

    groupBy(field) runs with map-side partial aggregation; top-N uses a
    single-partition window over the (small, cardinality-of-facet) bucket
    set — never over docs. Tie-break: bucket key ascending.

    MULTI-VALUED facets (the crate's terms_agg over multi-valued fast
    fields; SURVEY §1.3): an ``ArrayType`` field column is exploded first
    — each doc contributes ONCE to every bucket it holds a value for (the
    Elasticsearch/tantivy SortedSetDocValues contract: a value duplicated
    within one doc's array still counts that doc once, hence the
    ``array_distinct`` before the explode), and docs with empty/null
    arrays contribute to none. The explode is a narrow map feeding the
    same partial+final hash aggregation.
    """
    if dict(matched.dtypes).get(field, "").startswith("array"):
        matched = matched.withColumn(field, F.explode(F.array_distinct(field)))
    cols = [F.count(F.lit(1)).alias("count")]
    for sub in sub_aggs or []:
        cols.extend(sub.exprs())
    buckets = matched.groupBy(field).agg(*cols)
    if size is not None:
        order = [
            F.asc(order_by) if ascending else F.desc(order_by),
            F.asc(field),
        ]
        w = Window.partitionBy(F.lit(1)).orderBy(*order)
        buckets = (
            buckets.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= size)
            .drop("_rn")
        )
    return buckets


def top_hits_agg(
    matched: DataFrame,
    field: str,
    k: int,
    round_decimals: int | None = None,
) -> DataFrame:
    """C7 × B9: the k best-scoring hits INSIDE each terms bucket — the
    Elasticsearch ``top_hits`` sub-aggregation (tantivy exposes the same
    shape as a TopDocs collector run per facet bucket).

    Output: one row per (bucket, hit) = ``(field, doc_id, score,
    hit_rank)``, hit_rank 1..k within the bucket by (score desc, doc_id
    asc) — the pinned B9 tie-break, per bucket.

    Scale shape: ONE shuffle on the facet key; the ``row_number <= k``
    filter lowers to Spark's WindowGroupLimit, which pre-limits each
    group map-side BEFORE the exchange — per-bucket bounded heaps, the
    per-bucket analogue of TakeOrderedAndProject. Never a global sort,
    and the post-shuffle state per bucket is k rows, so a million-bucket
    facet at 100 TB shuffles ~k × |buckets| rows, not the matched set.
    """
    df = matched
    if round_decimals is not None:
        df = df.withColumn("score", F.round("score", round_decimals))
    w = Window.partitionBy(field).orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        df.withColumn("hit_rank", F.row_number().over(w))
        .filter(F.col("hit_rank") <= k)
        .select(field, "doc_id", "score", "hit_rank")
    )


def facet_prefixes_col(path_col: Column, depth: int | None = None) -> Column:
    """Hierarchical facet paths (tantivy's ``facet`` field type, e.g.
    ``/lang/rust``): every ancestor prefix of the path up to ``depth``
    levels — '/lang/rust' -> ['/lang', '/lang/rust']. Pure column
    expression (split + transform + slice); empty/blank paths yield [].
    ``depth`` must be >= 1 when given: F.sequence(1, 0) counts DOWN, so a
    non-positive depth would silently emit bogus ['/','level-1'] buckets.
    """
    if depth is not None and depth < 1:
        raise ValueError(f"facet depth must be >= 1, got {depth}")
    parts = F.split(F.regexp_replace(path_col, r"^/+|/+$", ""), "/")
    parts = F.filter(parts, lambda x: x != "")
    n = F.size(parts)
    upper = n if depth is None else F.least(n, F.lit(depth))
    # sequence(1, 0) would COUNT DOWN ([1, 0]); guard the empty path.
    return F.when(
        n > 0,
        F.transform(
            F.sequence(F.lit(1), upper),
            lambda i: F.concat(F.lit("/"), F.concat_ws("/", F.slice(parts, 1, i))),
        ),
    ).otherwise(F.array().cast("array<string>"))


def facet_terms_agg(
    matched: DataFrame,
    path_col: str,
    depth: int | None = None,
    size: int | None = None,
    sub_aggs: list[MetricAgg] | None = None,
) -> DataFrame:
    """C7 hierarchical variant: per-level rollup counts over facet paths.

    A doc with path '/lang/rust' lands in BOTH the '/lang' and
    '/lang/rust' buckets (ancestor rollup — tantivy's facet counting
    semantics), so parent counts are the sum of their subtree without a
    second pass: the prefix explode IS the rollup. Output column:
    ``facet``; ordering/top-N identical to :func:`terms_agg`.
    """
    exploded = matched.withColumn(
        "facet", F.explode(facet_prefixes_col(F.col(path_col), depth))
    )
    return terms_agg(exploded, "facet", size=size, sub_aggs=sub_aggs)


def nested_terms_agg(
    matched: DataFrame,
    field1: str,
    field2: str,
    size1: int | None = None,
    size2: int | None = None,
    sub_aggs: list[MetricAgg] | None = None,
) -> DataFrame:
    """C7 nested terms: terms(field1) -> terms(field2) sub-buckets,
    returned flattened as (field1, field2, count, subs...).

    ``size1`` keeps the top-N outer buckets by TOTAL count; ``size2`` the
    top-N inner buckets per outer bucket. One groupBy over both keys +
    window ranking over the (small) bucket set — never a second doc scan.
    """
    cols = [F.count(F.lit(1)).alias("count")]
    for sub in sub_aggs or []:
        cols.extend(sub.exprs())
    buckets = matched.groupBy(field1, field2).agg(*cols)
    # outer ranking first, over FULL per-outer totals (not post-size2 ones)
    if size1 is not None:
        w_tot = Window.partitionBy(field1)
        buckets = buckets.withColumn("_tot", F.sum("count").over(w_tot))
        w1 = Window.partitionBy(F.lit(1)).orderBy(F.desc("_tot"), F.asc(field1))
        buckets = (
            buckets.withColumn("_rank", F.dense_rank().over(w1))
            .filter(F.col("_rank") <= size1)
            .drop("_tot", "_rank")
        )
    if size2 is not None:
        w2 = Window.partitionBy(field1).orderBy(F.desc("count"), F.asc(field2))
        buckets = (
            buckets.withColumn("_rn2", F.row_number().over(w2))
            .filter(F.col("_rn2") <= size2)
            .drop("_rn2")
        )
    return buckets


def histogram_agg(
    matched: DataFrame,
    field: str,
    interval: float,
    offset: float = 0.0,
    sub_aggs: list[MetricAgg] | None = None,
) -> DataFrame:
    """C11: fixed-width buckets; key = floor((x-offset)/interval)*interval+offset."""
    key = (
        F.floor((F.col(field) - F.lit(offset)) / F.lit(interval)) * F.lit(interval)
        + F.lit(offset)
    ).alias("bucket")
    cols = [F.count(F.lit(1)).alias("count")]
    for sub in sub_aggs or []:
        cols.extend(sub.exprs())
    return matched.groupBy(key).agg(*cols)


def range_agg(
    matched: DataFrame,
    field: str,
    edges: list[float],
    sub_aggs: list[MetricAgg] | None = None,
    keep_unbounded: bool = True,
) -> DataFrame:
    """C12: explicit [lo, hi) buckets from an edge list, plus the two
    unbounded tails. Bucket key = '<lo>-<hi>' strings ('*' for open)."""
    col = F.col(field)
    branches: list[tuple[Column, str]] = []
    if keep_unbounded:
        branches.append((col < F.lit(edges[0]), f"*-{edges[0]:g}"))
    for lo, hi in zip(edges, edges[1:]):
        branches.append(((col >= F.lit(lo)) & (col < F.lit(hi)), f"{lo:g}-{hi:g}"))
    if keep_unbounded:
        branches.append((col >= F.lit(edges[-1]), f"{edges[-1]:g}-*"))
    key = None
    for cond, label in branches:
        key = F.when(cond, label) if key is None else key.when(cond, label)
    cols = [F.count(F.lit(1)).alias("count")]
    for sub in sub_aggs or []:
        cols.extend(sub.exprs())
    return matched.groupBy(key.alias("range_key")).agg(*cols)


def _spec_fields(agg: MetricAgg) -> set[str]:
    """Column names a metric spec reads (conservative superset for SQL
    predicate strings: every identifier-shaped token)."""
    import re

    out: set[str] = set()
    fld = getattr(agg, "field", "")
    if fld:
        out.add(fld)
    pred = getattr(agg, "predicate", "")
    if pred:
        out.update(re.findall(r"[A-Za-z_][A-Za-z0-9_]*", pred))
    for sub in getattr(agg, "sub_aggs", ()) or ():
        out.update(_spec_fields(sub))
    return out


def _needed_meta_columns(
    doc_meta_cols: list[str],
    metric_aggs: list[MetricAgg] | None,
    bucket_aggs: dict | None,
    post_filter: str | None,
) -> list[str]:
    """doc_meta columns the composed aggregation actually reads. The
    persisted matched set is the per-query cache every branch scans;
    carrying the full doc_meta row (sha, commit, path — wide strings no
    agg touches) measurably inflates both the cache write and every
    branch's cache scan, so prune to the referenced set. Unknown
    identifiers in SQL predicate strings over-approximate harmlessly
    (intersected with the real column list)."""
    import re

    need: set[str] = set()
    for a in metric_aggs or []:
        need.update(_spec_fields(a))
    for sp in (bucket_aggs or {}).values():
        kind = sp[0]
        if kind in ("terms", "histogram", "range", "facet"):
            need.add(sp[1])
            for sub in (sp[-1] or []):
                need.update(_spec_fields(sub))
    if post_filter:
        need.update(re.findall(r"[A-Za-z_][A-Za-z0-9_]*", post_filter))
    return [c for c in doc_meta_cols if c == "doc_id" or c in need]


def agg_search(
    index,
    query_str: str,
    k: int = 10,
    metric_aggs: list[MetricAgg] | None = None,
    bucket_aggs: dict[str, tuple] | None = None,
    post_filter: str | None = None,
    round_decimals: int | None = None,
    exhaustive: bool = True,
):
    """§3.3 — the crate's ``searcher.agg_search``: ONE matched-set scan
    feeding top-k hits + every aggregation (C13/C14 composition).

    ``bucket_aggs``: name -> ("terms", field, size, [subs]) |
    ("histogram", field, interval, offset, [subs]) |
    ("range", field, edges, [subs]) |
    ("facet", path_field, depth, size, [subs])  (hierarchical rollup).

    ``post_filter`` (C9): SQL predicate applied to hits ONLY — every
    aggregation still sees the pre-filter matched set (faceted-search UX).

    ``exhaustive=False`` (WAND pruning) is a HITS-ONLY optimization: the
    pruned matched set only guarantees the global top-k, so aggregations
    or a post_filter over it would silently aggregate a subset (and the
    best post-filtered docs may have been pruned). Requesting both raises.

    Returns dict with "hits" plus one DataFrame per aggregation, plus a
    ``release()`` callable that unpersists the shared matched set once
    every consumer has materialized — call it in long-lived sessions or
    the per-query cache accumulates without bound.
    """
    from sparktext.query import matched_docs, parse_query
    from sparktext.topk import top_k

    if not exhaustive and (metric_aggs or bucket_aggs or post_filter):
        raise ValueError(
            "exhaustive=False (WAND) is hits-only: aggregations/post_filter "
            "require the full matched set — use exhaustive=True"
        )
    query = parse_query(query_str)
    matched = matched_docs(index, query, exhaustive=exhaustive, k=k)
    meta_cols = _needed_meta_columns(
        index.doc_meta.columns, metric_aggs, bucket_aggs, post_filter
    )
    if meta_cols == ["doc_id"]:
        # hits-only (no aggs, no post_filter): nothing is read from
        # doc_meta, so the row-preserving join would only add a shuffle
        # — persist the matched set directly.
        enriched = matched.persist()
    else:
        enriched = matched.join(
            index.doc_meta.select(*meta_cols), "doc_id"
        ).persist()

    hit_src = enriched.filter(post_filter) if post_filter else enriched
    out: dict[str, DataFrame] = {
        "hits": top_k(hit_src.select("doc_id", "score"), k, round_decimals)
    }
    if metric_aggs:
        out["metrics"] = metrics_agg(enriched, metric_aggs)
    for name, spec in (bucket_aggs or {}).items():
        kind = spec[0]
        if kind == "terms":
            _, fld, size, subs = spec
            out[name] = terms_agg(enriched, fld, size, subs)
        elif kind == "histogram":
            _, fld, interval, offset, subs = spec
            out[name] = histogram_agg(enriched, fld, interval, offset, subs)
        elif kind == "range":
            _, fld, edges, subs = spec
            out[name] = range_agg(enriched, fld, edges, subs)
        elif kind == "facet":
            _, fld, depth, size, subs = spec
            out[name] = facet_terms_agg(enriched, fld, depth, size, subs)
        else:
            raise ValueError(f"unknown bucket agg kind {kind!r}")
    out["release"] = lambda: enriched.unpersist()
    return out


def collect_results(out: dict, release: bool = True) -> dict[str, list]:
    """Materialize every branch of an :func:`agg_search` result dict
    CONCURRENTLY and return {name: rows}.

    Each branch is its own Spark job; running them from worker threads
    lets the scheduler overlap them over one shared matched-set cache
    (Spark job submission is thread-safe), so wall time approaches the
    slowest branch instead of the sum — the tantivy agg_search call
    returns all fruits from one pass, and this is the Spark-idiomatic
    equivalent of that one-shot harvest. ``release=True`` unpersists the
    matched set afterwards (cache hygiene for long-lived sessions).
    """
    from concurrent.futures import ThreadPoolExecutor

    rel = out.get("release")
    branches = {k: v for k, v in out.items() if k != "release"}
    rows: dict[str, list] = {}
    # Materialize the shared cache once through the (cheap) hits branch
    # before fanning out: concurrent first-touch of an unpopulated cache
    # can recompute partitions racily instead of sharing them.
    if "hits" in branches:
        rows["hits"] = branches.pop("hits").collect()
    if branches:
        with ThreadPoolExecutor(max_workers=max(1, len(branches))) as ex:
            futs = {k: ex.submit(df.collect) for k, df in branches.items()}
            for k, f in futs.items():
                rows[k] = f.result()
    if release and rel is not None:
        rel()
    return rows
