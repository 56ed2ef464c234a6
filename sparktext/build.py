"""Index build pipeline (SURVEY.md A3, A4, A6, A7, A8, A12; §3.1).

Corpus contract (BASELINE.json input_hint): an Iceberg-shaped table with
columns ``(repo, path, commit, lang, content)`` — plus optionally a caller
supplied dense ``doc_id``. The build:

1. attaches ``sha = sha2(content, 256)`` (the per-row invariant carried
   through every doc-mapped table),
2. assigns deterministic dense ``doc_id`` (order by repo, path, commit)
   when absent, using the scalable two-phase pattern (per-partition
   row_number + collected partition offsets — no global window),
3. assigns ``segment_id = doc_id // ceil(N / num_segments)`` (contiguous
   doc ranges per segment: cheap gap encoding, disjoint segment ranges,
   trivially mergeable),
4. ONE tokenize pass per document (mapInPandas, Arrow batches, vectorized
   pandas inside): emits posting rows AND doc-length rows from the same
   scan, persisted so the doc_meta/postings/term_dict branches share it —
   the Spark idiom for tantivy's single indexing pass,
5. per-(segment, term) sorted posting lists, chunked into 128-doc blocks
   with delta+FOR/varint compression and inline fieldnorm bytes
   (:mod:`sparktext.codec`),
6. a global ``term_dict(term, doc_freq, total_tf)`` — the broadcast-side
   statistics for BM25 — plus corpus stats (num_docs, total_tokens).

Scale notes: posting-group size is bounded by the segment size, so the
applyInPandas groups can't blow up on heavy terms (§4.7 skew bound);
``term_bucket = pmod(xxhash64(term), n_buckets)`` is written as a parquet
partition column so query-time term filters prune files (§4.1). Postings
are keyed by the term STRING (no dense term-id indirection) — a global
dense term-id assignment would need an extra near-global sort at 10^12
scale for zero query-time benefit when the dictionary is broadcast anyway.

Persisted layout under ``index_dir`` (A12): ``postings/`` (parquet,
partitioned by term_bucket), ``doc_meta/``, ``term_dict/``, ``stats/``,
``_manifest/`` + ``_metrics/`` (lineage: one row per segment-group with
row/byte counts, an xxhash64 input fingerprint and wall-clock). Builds are
resumable: completed segment-groups recorded in the manifest are skipped
on re-run (see :func:`build_index` ``resume``).
"""

from __future__ import annotations

import math
import time
from dataclasses import dataclass
from dataclasses import field as dc_field
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sparktext import codec
from sparktext.fieldnorm import fieldnorm_to_id
from sparktext.tokenizer import tokenize_flat, tokenize_flat_arrow

DEFAULT_N_BUCKETS = 16

CORPUS_COLS = ("repo", "path", "commit", "lang", "content")

_TOKENS_SCHEMA = (
    "kind tinyint, segment_id int, doc_id long, term string, tf int, doc_len int"
)
_TOKENS_SCHEMA_POS = _TOKENS_SCHEMA + ", positions array<int>"


@dataclass
class IndexStats:
    num_docs: int
    total_tokens: int

    @property
    def avg_len(self) -> float:
        # tantivy's BM25 average fieldnorm: exact total token count / docs.
        return self.total_tokens / max(1, self.num_docs)


@dataclass
class Index:
    """The queryable index: three DataFrames + scalar stats.

    ``positions`` (optional, ``build_index(with_positions=True)``): the
    per-(segment, term, doc) token-position arrays backing phrase queries
    (B6). ``deleted`` (optional, A11): alive-filtering tombstone table
    ``(doc_id)`` — applied as an anti-join at query time, exactly
    tantivy's per-segment alive bitset role.
    """

    doc_meta: DataFrame  # doc_id, segment_id, repo, path, commit, lang, doc_len, norm_id, sha
    postings: DataFrame  # BLOCK_SCHEMA + term_bucket
    term_dict: DataFrame  # term, doc_freq, total_tf
    stats: IndexStats
    n_buckets: int = DEFAULT_N_BUCKETS
    positions: DataFrame | None = None  # segment_id, term, doc_id, positions
    deleted: DataFrame | None = None  # doc_id
    _headers: DataFrame | None = None  # lazy block-header mini-cache
    #: optional facet postings (tantivy `facet` field): same block codec
    #: as ``postings`` but terms are '/a/b' ancestor paths; see with_facets
    facet_postings: DataFrame | None = None
    #: SQL expression the facet field derives from (serializable — lets
    #: append/merge re-derive facet postings) + its depth cap
    facet_expr: str | None = None
    facet_depth: int | None = None
    #: driver-side term-dictionary stat memo (sparktext.score.term_stats):
    #: filled lazily per QUERIED term (None = negative entry), so repeated
    #: queries skip the per-call term_dict collect job entirely — the
    #: in-memory term dictionary every engine keeps (tantivy mmaps its
    #: FST; the broadcast-dict design of SURVEY §4.2 is the same idea).
    #: Bounded by distinct queried terms, ~100 B each; never persisted.
    #: Postings/term_dict are immutable per Index instance (deletes are
    #: tombstones on a NEW Index; append/merge build new instances), so
    #: entries can never go stale.
    _tstats: dict = dc_field(default_factory=dict)

    def block_headers(self) -> DataFrame:
        """Block headers WITHOUT the binary payload columns, persisted on
        first use (128x fewer rows than postings and ~10x narrower).
        WAND's seed-selection and bound subtrees scan headers repeatedly;
        reading them through the full postings cache would re-filter every
        payload batch once per subtree — linear in index size per query.
        One bounded cache per index, like term_dict."""
        if self._headers is None:
            self._headers = self.postings.select(
                "segment_id", "term", "term_bucket", "block_id", "count",
                "first_doc", "last_doc", "max_tf", "min_norm_id",
            ).persist()
        return self._headers

    def unpersist(self) -> None:
        """Release every cache this index holds (postings, doc_meta,
        term_dict, positions, tombstones, the header mini-cache). For
        benchmarks and multi-index sessions: a retired index's caches
        otherwise keep competing for executor storage memory with the
        live one's."""
        for df in (self.doc_meta, self.postings, self.term_dict,
                   self.positions, self.deleted, self._headers,
                   self.facet_postings):
            if df is not None:
                try:
                    df.unpersist()
                except Exception:
                    pass

    def with_deletes(self, doc_ids_df: DataFrame) -> "Index":
        """A11: mark docs deleted (tombstones; postings untouched)."""
        new_del = doc_ids_df.select("doc_id").distinct()
        if self.deleted is not None:
            new_del = self.deleted.union(new_del).distinct()
        return Index(
            doc_meta=self.doc_meta, postings=self.postings,
            term_dict=self.term_dict, stats=self.stats,
            n_buckets=self.n_buckets, positions=self.positions,
            deleted=new_del.persist(), facet_postings=self.facet_postings,
            facet_expr=self.facet_expr, facet_depth=self.facet_depth,
            # tombstones don't touch the term dictionary: share the memo
            _tstats=self._tstats,
        )


def with_sha(corpus: DataFrame) -> DataFrame:
    """Attach the per-row content sha256 invariant column."""
    if "sha" in corpus.columns:
        return corpus
    return corpus.withColumn("sha", F.sha2(F.col("content"), 256))


def assign_doc_ids(
    corpus: DataFrame,
    num_partitions: int,
    keep_pid: bool = False,
    _cache_out: list | None = None,
) -> DataFrame:
    """Deterministic dense doc_id ordered by (repo, path, commit).

    Two-phase (scales to arbitrary row counts — no single-partition
    window): range-partition on the key, per-partition row_number, then add
    collected cumulative partition offsets via a broadcast join.

    The ranged DataFrame is PERSISTED before the counts collect (which
    materializes it): repartitionByRange samples its boundaries and Spark
    documents the result as potentially inconsistent across executions,
    so without the pin the counts job and the assignment job could see
    different partitionings — mismatched offsets, duplicate/skipped ids.
    The cache guarantees both jobs read the same physical partitions.
    (Residual cluster caveat: losing a cached partition to executor death
    re-runs the sampling lineage for that partition only; production
    builds should checkpoint or write-out the ranged corpus instead.)
    Callers pass ``_cache_out`` (a list) to receive the cached DataFrame
    and unpersist it once their own downstream materialization is done.

    ``keep_pid=True`` keeps the ``_pid`` range-partition column: each
    range partition holds a CONTIGUOUS doc-id range (ids are assigned in
    partition order), so the caller can adopt ``_pid`` directly as
    ``segment_id`` and skip a whole extra corpus shuffle — the window's
    hash(_pid) exchange already co-located every segment's rows.
    """
    if "doc_id" in corpus.columns:
        return corpus
    ranged = corpus.repartitionByRange(num_partitions, "repo", "path", "commit")
    ranged = ranged.withColumn("_pid", F.spark_partition_id()).persist()
    if _cache_out is not None:
        _cache_out.append(ranged)
    counts = ranged.groupBy("_pid").count().orderBy("_pid").collect()
    offsets, acc = {}, 0
    for row in counts:
        offsets[row["_pid"]] = acc
        acc += row["count"]
    spark = corpus.sparkSession
    off_df = spark.createDataFrame(
        [(int(p), int(o)) for p, o in offsets.items()], "_pid int, _offset long"
    )
    w = Window.partitionBy("_pid").orderBy("repo", "path", "commit")
    out = (
        ranged.withColumn("_rn", F.row_number().over(w) - F.lit(1))
        .join(F.broadcast(off_df), "_pid")
        .withColumn("doc_id", (F.col("_rn") + F.col("_offset")).cast("long"))
        .drop("_rn", "_offset")
    )
    return out if keep_pid else out.drop("_pid")


def _tokenize_partition(
    batches: Iterator[pd.DataFrame], with_positions: bool = False
) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: one tokenize pass -> posting rows + meta rows.

    kind=0 rows: (segment_id, doc_id, term, tf, doc_len[, positions]) — one
    per distinct (doc, term). kind=1 rows: (segment_id, doc_id, doc_len) —
    one per doc (term null), so zero-token docs still reach doc_meta.
    """
    for pdf in batches:
        n = len(pdf)
        if n == 0:
            continue
        row_idx, terms = tokenize_flat(pdf["content"])
        doc_ids = pdf["doc_id"].to_numpy()
        seg_ids = pdf["segment_id"].to_numpy()
        doc_len = np.zeros(n, dtype=np.int64)
        if row_idx.size:
            np.add.at(doc_len, row_idx, 1)
            tok = pd.DataFrame({"i": row_idx, "term": terms})
            if with_positions:
                # token position within its doc = running count per row
                tok["pos"] = tok.groupby("i", sort=False).cumcount().astype(np.int32)
                grp = (
                    tok.groupby(["i", "term"], sort=False)["pos"]
                    .agg(list)
                    .reset_index(name="positions")
                )
                grp["tf"] = grp["positions"].str.len()
            else:
                grp = tok.groupby(["i", "term"], sort=False).size().reset_index(name="tf")
            gi = grp["i"].to_numpy()
            postings = pd.DataFrame(
                {
                    "kind": np.zeros(len(grp), dtype=np.int8),
                    "segment_id": seg_ids[gi],
                    "doc_id": doc_ids[gi],
                    "term": grp["term"].to_numpy(),
                    "tf": grp["tf"].to_numpy().astype(np.int32),
                    "doc_len": doc_len[gi],
                }
            )
            if with_positions:
                postings["positions"] = grp["positions"].to_numpy()
        else:
            postings = None
        meta = pd.DataFrame(
            {
                "kind": np.ones(n, dtype=np.int8),
                "segment_id": seg_ids,
                "doc_id": doc_ids,
                "term": pd.Series([None] * n, dtype="object"),
                "tf": np.zeros(n, dtype=np.int32),
                "doc_len": doc_len,
            }
        )
        if with_positions:
            meta["positions"] = pd.Series([None] * n, dtype="object")
        yield pd.concat([postings, meta], ignore_index=True) if postings is not None else meta


#: doc-metadata columns carried through the fused worker (nullable on
#: block rows). n_chars is always in the schema; null when absent.
_META_CARRY = ("repo", "path", "commit", "lang", "sha")

_FUSED_SCHEMA = (
    "kind tinyint, segment_id int, term string, block_id int, count int, "
    "first_doc long, last_doc long, max_tf int, sum_tf long, min_norm_id int, "
    "doc_bits int, doc_bytes binary, tf_bytes binary, norm_bytes binary, "
    "doc_id long, doc_len int, norm_id int, "
    "repo string, path string, commit string, lang string, sha string, "
    "n_chars long"
)
_FUSED_COLS = [c.split()[0] for c in _FUSED_SCHEMA.split(", ")]


def _build_segment_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Fused per-partition index build (SURVEY A4's preferred shape):
    tokenize AND encode posting blocks inside ONE mapInPandas pass —
    segment == partition, so no token-level shuffle and no token-level
    persist ever materializes. Emits kind=0 block rows (BLOCK_SCHEMA
    fields) + kind=1 doc rows carrying the FULL doc metadata incl.
    norm_id, so doc_meta needs no downstream join at all.

    The token stream stays off the Python heap end-to-end: per batch,
    :func:`tokenize_flat_arrow` yields tokens as ONE Arrow string buffer;
    the partition-level accumulation concatenates buffers; a single
    C++ ``dictionary_encode`` maps every token to an int32 code; the
    (doc, term)->tf aggregation is ``np.unique`` over a fused
    ``code*NDOCS+docpos`` int64 key. Object-dtype string arrays (60+
    bytes/token of pointer-chased heap) were the DRAM-bandwidth term
    that capped 8->32-core build scaling at ~0.6 efficiency; the Arrow
    buffer is ~6x denser and the grouping touches only ints. Term
    STRINGS materialize exactly once per (segment, term) run for the
    output block rows.

    Memory is bounded by segment sizing (seg_size docs), which the
    caller controls — the knob that must scale with executor memory.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    tok_arrays: list = []       # one Arrow string array per batch
    tok_docpos: list = []       # global (partition-level) doc position per token
    seg_parts: list = []
    did_parts: list = []
    dlen_parts: list = []
    meta_parts: list[pd.DataFrame] = []
    n_seen = 0
    for pdf in batches:
        n = len(pdf)
        if n == 0:
            continue
        row_idx, toks = tokenize_flat_arrow(pdf["content"])
        doc_ids = pdf["doc_id"].to_numpy()
        seg_ids = pdf["segment_id"].to_numpy()
        doc_len = np.zeros(n, dtype=np.int64)
        if len(toks):
            np.add.at(doc_len, row_idx, 1)
            tok_arrays.append(toks)
            tok_docpos.append(row_idx + n_seen)
        seg_parts.append(seg_ids)
        did_parts.append(doc_ids)
        dlen_parts.append(doc_len)
        mp = pd.DataFrame(
            {"segment_id": seg_ids, "doc_id": doc_ids, "doc_len": doc_len}
        )
        mp["norm_id"] = fieldnorm_to_id(doc_len).astype(np.int32)
        for c in _META_CARRY:
            mp[c] = pdf[c].to_numpy() if c in pdf.columns else None
        mp["n_chars"] = (
            pdf["n_chars"].to_numpy() if "n_chars" in pdf.columns else np.int64(0)
        )
        if "n_chars" not in pdf.columns:
            mp["n_chars"] = None
        meta_parts.append(mp)
        n_seen += n

    # Blocks and meta are emitted as SEPARATE Arrow frames (same schema):
    # concatenating them forced pandas through object-NA reconciliation on
    # every carry column — measurable churn at 32 concurrent workers.
    if tok_arrays:
        flat = pa.concat_arrays(
            a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
            for a in tok_arrays
        )
        enc = pc.dictionary_encode(flat)
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vocab = enc.dictionary
        docpos = np.concatenate(tok_docpos)
        seg_all = np.concatenate(seg_parts)
        did_all = np.concatenate(did_parts)
        dlen_all = np.concatenate(dlen_parts)
        # tf per (code, doc) over a fused int64 key: hash-aggregate the
        # raw tokens (value_counts, O(T)), then sort only the ~T/2
        # aggregated pairs — measured 2-4x faster than np.unique's full
        # sort of the raw token stream.
        vc = pd.Series(codes * np.int64(n_seen) + docpos).value_counts(sort=False)
        uk = vc.index.to_numpy()
        tf_g = vc.to_numpy()
        o = np.argsort(uk, kind="stable")
        uk, tf_g = uk[o], tf_g[o]
        code_g = uk // n_seen
        pos_g = (uk % n_seen).astype(np.int64)
        seg_g = seg_all[pos_g]
        did_g = did_all[pos_g]
        nid_g = fieldnorm_to_id(dlen_all[pos_g])
        # Run order needed: (segment, term) groups contiguous, doc_id
        # ascending inside. When partition row order is already doc_id-
        # ascending with monotone segments (every built-in assignment
        # path), the unique output is already exactly that — skip the
        # sort. Arbitrary caller-supplied orders fall back to a lexsort.
        monotonic = (
            did_all.size < 2
            or (np.all(did_all[1:] > did_all[:-1]) and np.all(seg_all[1:] >= seg_all[:-1]))
        )
        if not monotonic:
            order = np.lexsort((did_g, code_g, seg_g))
            code_g, seg_g, did_g = code_g[order], seg_g[order], did_g[order]
            tf_g, nid_g = tf_g[order], nid_g[order]
        change = np.empty(len(code_g), dtype=bool)
        change[0] = True
        change[1:] = (code_g[1:] != code_g[:-1]) | (seg_g[1:] != seg_g[:-1])
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], len(code_g))
        run_terms = vocab.take(pa.array(code_g[starts], type=pa.int32())).to_pylist()
        records: list[dict] = []
        for term, s, e in zip(run_terms, starts, ends):
            rows = codec.encode_blocks(did_g[s:e], tf_g[s:e], nid_g[s:e])
            seg = int(seg_g[s])
            for r in rows:
                r["segment_id"] = seg
                r["term"] = term
            records.extend(rows)
        blocks = pd.DataFrame.from_records(records)
        blocks["segment_id"] = blocks["segment_id"].astype(np.int32)
        blocks.insert(0, "kind", np.int8(0))
        blocks["doc_id"] = np.int64(0)
        blocks["doc_len"] = np.int32(0)
        blocks["norm_id"] = np.int32(0)
        for c in _META_CARRY:
            blocks[c] = None
        blocks["n_chars"] = None
        yield blocks[_FUSED_COLS]
    if meta_parts:
        meta = pd.concat(meta_parts, ignore_index=True)
        mf = pd.DataFrame(
            {
                "kind": np.int8(1),
                "segment_id": meta["segment_id"].to_numpy(),
                "term": pd.Series([None] * len(meta), dtype="object"),
                "block_id": np.int32(0),
                "count": np.int32(0),
                "first_doc": np.int64(0),
                "last_doc": np.int64(0),
                "max_tf": np.int32(0),
                "sum_tf": np.int64(0),
                "min_norm_id": np.int32(0),
                "doc_bits": np.int32(0),
                "doc_bytes": None,
                "tf_bytes": None,
                "norm_bytes": None,
                "doc_id": meta["doc_id"].to_numpy(),
                "doc_len": meta["doc_len"].to_numpy().astype(np.int32),
                "norm_id": meta["norm_id"].to_numpy(),
            }
        )
        for c in _META_CARRY:
            mf[c] = meta[c].to_numpy()
        mf["n_chars"] = meta["n_chars"].to_numpy()
        yield mf[_FUSED_COLS]


#: Salt chunk (§4.7): posting rows are grouped by (segment, term,
#: doc_id // SALT_CHUNK) for block encoding, so no single task ever holds
#: more than SALT_CHUNK postings of one term — a stop-word term spanning a
#: 100M-doc segment would otherwise OOM one executor. Chunks are
#: CONTIGUOUS doc ranges, so each salted group is a sorted run and runs
#: concatenate into the final posting list by construction (only block_id
#: needs renumbering, done by a cheap window over block headers).
SALT_CHUNK = 16384


def _build_blocks_salted(key, pdf: pd.DataFrame) -> pd.DataFrame:
    """applyInPandas worker: one (segment, term, salt) run -> encoded blocks.

    norm_id may come pre-computed (merge path) or be derived from doc_len
    (build path).
    """
    segment_id, term = key[0], key[1]
    order = np.argsort(pdf["doc_id"].to_numpy(), kind="stable")
    doc_ids = pdf["doc_id"].to_numpy()[order]
    tfs = pdf["tf"].to_numpy()[order]
    if "norm_id" in pdf.columns:
        norm_ids = pdf["norm_id"].to_numpy()[order].astype(np.uint8)
    else:
        norm_ids = fieldnorm_to_id(pdf["doc_len"].to_numpy()[order])
    rows = codec.encode_blocks(doc_ids, tfs, norm_ids)
    out = pd.DataFrame(rows)
    out.insert(0, "segment_id", np.int32(segment_id))
    out.insert(1, "term", term)
    return out


def encode_posting_blocks(
    posting_rows: DataFrame,
    n_buckets: int = DEFAULT_N_BUCKETS,
    shuffle_partitions: int | None = None,
) -> DataFrame:
    """(segment_id, term, doc_id, tf, doc_len|norm_id) rows -> block rows.

    Salted two-phase encode (§4.7): group by (segment, term, salt) where
    salt is the contiguous SALT_CHUNK doc-range, encode each run, then
    renumber block_id per (segment, term) ordered by first_doc. The
    renumber window runs over BLOCK HEADERS (128x smaller than postings),
    so the extra exchange is cheap; the win is bounded task memory and
    heavy-term parallelism at build AND merge time.
    """
    spark = posting_rows.sparkSession
    n_shuffle = shuffle_partitions or spark.sparkContext.defaultParallelism * 2
    salted = posting_rows.withColumn(
        "_salt", (F.col("doc_id") / F.lit(SALT_CHUNK)).cast("int")
    )
    blocks = (
        salted.repartition(n_shuffle, "segment_id", "term", "_salt")
        .groupBy("segment_id", "term", "_salt")
        .applyInPandas(_build_blocks_salted, schema=codec.BLOCK_SCHEMA)
    )
    w = Window.partitionBy("segment_id", "term").orderBy("first_doc")
    return (
        blocks.withColumn("block_id", F.row_number().over(w) - F.lit(1))
        .withColumn("term_bucket", term_bucket_col(F.col("term"), n_buckets))
    )


def term_bucket_col(term_col, n_buckets: int):
    return F.pmod(F.xxhash64(term_col), F.lit(n_buckets)).cast("int")


def build_index(
    spark: SparkSession,
    corpus: DataFrame,
    num_segments: int | None = None,
    n_buckets: int = DEFAULT_N_BUCKETS,
    index_dir: str | None = None,
    resume: bool = False,
    num_groups: int = 1,
    with_positions: bool = False,
    phase_walls: dict | None = None,
) -> Index:
    """Build the full index from a canonical corpus DataFrame.

    In-memory mode (``index_dir=None``): returns an :class:`Index` whose
    DataFrames are persisted (MEMORY_AND_DISK). Persisted mode: writes the
    A12 layout with manifest/metrics and supports ``resume``.

    ``phase_walls``: optional dict the build fills with per-phase
    wall-clock seconds (driver-side twin of the _metrics lineage table;
    used by tools/scaling_bench.py to attribute scaling loss per phase).
    """
    if index_dir is not None:
        from sparktext.manifest import build_persistent_index

        return build_persistent_index(
            spark, corpus, index_dir, num_segments=num_segments,
            n_buckets=n_buckets, resume=resume, num_groups=num_groups,
            with_positions=with_positions,
        )

    if num_segments is None:
        num_segments = max(4, spark.sparkContext.defaultParallelism)
    pw = phase_walls if phase_walls is not None else {}
    t0 = time.time()
    assigned = "doc_id" not in corpus.columns
    _id_caches: list = []
    corpus = assign_doc_ids(corpus, num_segments, keep_pid=assigned, _cache_out=_id_caches)
    n_docs = corpus.count()
    pw["assign_count"] = round(time.time() - t0, 3)
    seg_size = max(1, math.ceil(n_docs / num_segments))
    if assigned:
        # The doc-id assignment's window already co-located each range
        # partition (= a contiguous doc range) — adopt it as the segment
        # and SKIP the second full-corpus shuffle entirely.
        corpus = with_sha(corpus.withColumnRenamed("_pid", "segment_id"))
    elif corpus.rdd.getNumPartitions() >= max(num_segments // 2, 2):
        # Caller-supplied doc ids AND a well-split input: adopt the input
        # partitions as segments outright — zero shuffle. Segments become
        # arrival-order batches (exactly tantivy's segment semantics;
        # nothing requires contiguous doc ranges: per-(segment, term)
        # posting lists are sorted in the worker, scores are
        # segmentation-independent, and merge re-derives segmentation).
        # Sparse in-segment doc ids cost a few extra delta bits per gap.
        corpus = with_sha(corpus.withColumn("segment_id", F.spark_partition_id()))
    else:
        # Few-partition input (e.g. one small local file): repartition
        # BEFORE the sha projection so per-row prep runs post-exchange —
        # and so one source file can't serialize the whole build.
        corpus = with_sha(
            corpus.withColumn(
                "segment_id", (F.col("doc_id") / F.lit(seg_size)).cast("int")
            ).repartition(num_segments, "segment_id")
        )

    positions = None
    if with_positions:
        corpus = corpus.persist()  # two consumers on this path
        # positions path: token-level rows are needed anyway, so use the
        # two-step build (tokenize rows -> salted encode).
        tokens = (
            corpus.select("doc_id", "segment_id", "content")
            .mapInPandas(
                lambda it: _tokenize_partition(it, with_positions=True),
                schema=_TOKENS_SCHEMA_POS,
            )
            .persist()
        )
        posting_rows = tokens.filter(F.col("kind") == 0).drop("kind")
        meta_rows = tokens.filter(F.col("kind") == 1).select("doc_id", "doc_len")
        positions = posting_rows.select("segment_id", "term", "doc_id", "positions").persist()
        postings = encode_posting_blocks(posting_rows.drop("positions"), n_buckets).persist()
    else:
        # Fused fast path (SURVEY A4): tokenize + block-encode in ONE
        # mapInPandas over segment partitions — zero token-level shuffle;
        # the persisted intermediate is block headers + doc-meta rows
        # (~100x smaller than token rows), and doc_meta comes straight
        # out of the same pass (no join, no second corpus scan).
        carry = [c for c in (*_META_CARRY, "n_chars") if c in corpus.columns]
        fused = (
            corpus.select("doc_id", "segment_id", "content", *carry)
            .mapInPandas(_build_segment_partition, schema=_FUSED_SCHEMA)
            .persist()
        )
        # ONE cache holds the build output: postings/doc_meta are filter
        # views over it. Cache writes are the one build phase that does
        # NOT scale with cores (MemoryStore contention measured 2x slower
        # at local[32] than local[8] on identical data), so the build
        # persists each output row exactly once and nothing twice.
        postings = (
            fused.filter(F.col("kind") == 0)
            .select("segment_id", "term", "block_id", "count", "first_doc",
                    "last_doc", "max_tf", "sum_tf", "min_norm_id",
                    "doc_bits", "doc_bytes", "tf_bytes", "norm_bytes")
            .withColumn("term_bucket", term_bucket_col(F.col("term"), n_buckets))
        )
        meta_rows = fused.filter(F.col("kind") == 1).select("doc_id", "doc_len")
        doc_meta = fused.filter(F.col("kind") == 1).select(
            "doc_id", "segment_id", *_META_CARRY, "doc_len", "norm_id",
            *(["n_chars"] if "n_chars" in corpus.columns else []),
        )

    # A6: global term statistics, derived from BLOCK HEADERS (128x fewer
    # rows than postings). The groupBy is algebraic -> map-side partial
    # aggregation already defuses term skew for these sums.
    term_dict = (
        postings.groupBy("term")
        .agg(F.sum("count").alias("doc_freq"), F.sum("sum_tf").alias("total_tf"))
        .withColumn("term_bucket", term_bucket_col(F.col("term"), n_buckets))
        .persist()
    )

    if with_positions:
        norm_udf = F.pandas_udf(
            lambda s: pd.Series(fieldnorm_to_id(s.to_numpy()).astype(np.int32)), "int"
        )
        doc_meta = (
            corpus.join(meta_rows, "doc_id")
            .withColumn("norm_id", norm_udf(F.col("doc_len")))
            .select(
                "doc_id", "segment_id", "repo", "path", "commit", "lang",
                "doc_len", "norm_id", "sha",
                *(["n_chars"] if "n_chars" in corpus.columns else []),
            )
        )
    if with_positions:
        doc_meta = doc_meta.persist()

    # First action on the fused pipeline: materializes shuffle + tokenize
    # + encode + persist, then the tiny stats aggregate reads the cache.
    t0 = time.time()
    total_tokens = meta_rows.agg(F.sum("doc_len")).collect()[0][0] or 0
    pw["tokenize_encode"] = round(time.time() - t0, 3)
    # The fused/tokens cache is materialized now; the doc-id assignment's
    # ranged cache has served its purpose — release it.
    for c in _id_caches:
        c.unpersist()
    stats = IndexStats(num_docs=n_docs, total_tokens=int(total_tokens))
    return Index(doc_meta=doc_meta, postings=postings, term_dict=term_dict,
                 stats=stats, n_buckets=n_buckets, positions=positions)


def facet_posting_rows(doc_meta: DataFrame, facet_expr: str, depth: int | None) -> DataFrame:
    """(doc_id, segment_id[, group_id], term=ancestor-prefix, tf=1,
    doc_len=1) rows for the facet encode — shared by with_facets, the
    append extension, and the post-purge merge rebuild."""
    from sparktext.aggs import facet_prefixes_col  # local: import cycle

    keep = ["doc_id", "segment_id"] + (
        ["group_id"] if "group_id" in doc_meta.columns else []
    )
    return (
        doc_meta.select(
            *keep,
            F.explode(facet_prefixes_col(F.expr(facet_expr), depth)).alias("term"),
        )
        .withColumn("tf", F.lit(1))
        .withColumn("doc_len", F.lit(1))
    )


def with_facets(
    index: Index,
    facet_expr,
    depth: int | None = None,
    index_dir: str | None = None,
) -> Index:
    """Index a facet field (tantivy's ``Facet`` type; SURVEY §2 A2/C7
    query-side complement): hierarchical '/a/b' paths become exact TERMS
    in a facet postings table built through the SAME A4 block-codec
    encode as text postings.

    Every ancestor prefix of a doc's facet path is indexed (rollup AT
    INDEX TIME — tantivy stores facet ords the same way), so a
    '/lang/rust' SUBTREE query is a single exact-term lookup: no LIKE
    scan over doc_meta, partition-pruned by term_bucket exactly like a
    term query. ``facet_expr`` is a SQL expression STRING over
    ``index.doc_meta`` columns (e.g. ``"concat('/', lang, '/', repo)"``)
    — a string, not a Column, so the spec can be persisted in a
    ``facets.json`` sidecar and the facet table MAINTAINED by
    ``append_documents`` (per-group extension) and ``merge_segments``
    (post-purge rebuild). A Column is still accepted for ad-hoc
    in-memory use (it cannot be persisted or maintained).

    Facet terms score constant 1.0 (tantivy multi-term ConstScorer), so
    tf=1 and doc_len=1 placeholders feed the codec; text BM25 statistics
    are untouched — the facet table is separate from ``postings`` and
    never pollutes avgdl/idf.

    ``index_dir``: also write the table (partitioned by
    (group_id, term_bucket) like postings — group-scoped dynamic
    overwrite keeps the append extension crash-safe) plus the sidecar;
    ``load_index`` picks both up on reload.
    """
    if index_dir is not None and not isinstance(facet_expr, str):
        raise TypeError(
            "persisted facets need a SQL-string facet_expr (it is stored "
            "in facets.json so appends/merges can re-derive the table)"
        )
    if isinstance(facet_expr, str):
        rows = facet_posting_rows(index.doc_meta, facet_expr, depth)
        expr_attr: str | None = facet_expr
    else:
        from sparktext.aggs import facet_prefixes_col  # local: import cycle

        rows = (
            index.doc_meta.select(
                "doc_id", "segment_id",
                F.explode(facet_prefixes_col(facet_expr, depth)).alias("term"),
            )
            .withColumn("tf", F.lit(1))
            .withColumn("doc_len", F.lit(1))
        )
        expr_attr = None
    group_cols = [c for c in ("group_id",) if c in rows.columns]
    fp = encode_posting_blocks(rows.drop(*group_cols), index.n_buckets)
    if index_dir is not None:
        import json
        import os
        import shutil

        if group_cols:
            # re-attach group_id to encoded blocks: every segment belongs
            # to exactly one group (appends offset segment ids), so a
            # collected segment->group literal map suffices.
            seg2grp = (
                index.doc_meta.select("segment_id", "group_id").distinct().collect()
            )
            pairs = []
            for r in seg2grp:
                pairs.extend([F.lit(int(r["segment_id"])), F.lit(int(r["group_id"]))])
            fp = fp.withColumn(
                "group_id", F.element_at(F.create_map(*pairs), F.col("segment_id"))
            )
        else:
            fp = fp.withColumn("group_id", F.lit(0))
        # FULL static overwrite, not the dynamic per-partition mode: a
        # re-run with a DIFFERENT facet_expr must truncate the whole
        # table — dynamic overwrite would leave term_bucket partitions
        # that only old-expr terms hashed into, serving a mixed facet
        # hierarchy. (Appends extend per-group with the dynamic mode;
        # this initial build is the truncating writer.) The stale
        # facets.json is removed FIRST so a crash mid-write leaves
        # table-without-sidecar — the torn state load_index ignores.
        facets_json = os.path.join(index_dir, "facets.json")
        if os.path.exists(facets_json):
            os.remove(facets_json)
        shutil.rmtree(os.path.join(index_dir, "facet_postings"), ignore_errors=True)
        (fp.sortWithinPartitions("term", "segment_id", "block_id")
           .write.mode("overwrite").partitionBy("group_id", "term_bucket")
           .parquet(os.path.join(index_dir, "facet_postings")))
        with open(facets_json, "w") as f:
            json.dump({"expr": facet_expr, "depth": depth}, f)
        fp = index.doc_meta.sparkSession.read.parquet(
            os.path.join(index_dir, "facet_postings")
        )
    else:
        fp = fp.persist()
    return Index(
        doc_meta=index.doc_meta, postings=index.postings,
        term_dict=index.term_dict, stats=index.stats,
        n_buckets=index.n_buckets, positions=index.positions,
        deleted=index.deleted, facet_postings=fp,
        facet_expr=expr_attr, facet_depth=depth,
        # facets don't touch the text term dictionary: share the memo
        _tstats=index._tstats,
    )
