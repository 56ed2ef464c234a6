"""Training-data pipeline operators over document tables (driver-mandated
extensions beyond the reference crate): deduplication (exact, MinHash+LSH,
SimHash, n-gram Jaccard), text analysis (token counting, quality scoring,
language-ID, fingerprinting).

Design rules:

- Everything is JVM-side column expressions (regexp_extract_all, higher
  order array functions, sha2) — zero Python UDFs, full whole-stage
  codegen, trivially scales: these are narrow maps + one groupBy/join.
- MinHash has two hash backends: sha256-hex (both engines expose it;
  min-of-hex strings is a total order, so the DuckDB oracle computes
  bit-identical values — the correctness twin) and xxhash64 int64 (the
  PRODUCTION path: same LSH guarantees, ~10x cheaper, shuffles longs
  not hex strings — what a 100 TB dedup run must use).
- The text-ops analyzer is the simple ascii ``[a-z0-9]+`` lowercase
  regex (pipeline ops care about content similarity, not scoring parity;
  the index tokenizer A1 remains the unicode one).
- SimHash is generated as a shared SQL template (32 bit-vote aggregate
  expressions) executed by Spark SQL and DuckDB alike — parity by
  construction.

Multimodal note: image/audio/video payloads would ride as opaque
``binary`` columns with typed metadata; see :mod:`sparktext.multimodal`
for the (stubbed decode, real plumbing) Spark-side handling.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

TOKEN_REGEX = "[a-z0-9]+"

# language-ID marker sets (function words; deterministic heuristic).
LANG_MARKERS = {
    "de": ("der", "die", "das", "und", "ist", "nicht"),
    "en": ("the", "a", "and", "of", "to", "in", "is"),
    "es": ("el", "los", "las", "una", "por", "que"),
    "fr": ("le", "la", "les", "des", "et", "est"),
    "zh": ("de", "shi", "bu", "wo", "zai", "le"),
}

# Fixture-scale MinHash parameters (what the DuckDB oracle mirrors).
# A production near-dup pipeline wants far more resolution — use
# PRODUCTION_MINHASH_H/BANDS (128 perms / 16 bands of 8: the standard
# ~0.8-Jaccard knee) by passing them explicitly; both paths are the same
# code, parameterized.
#: Default mega-bucket cap for BOTH LSH pair generators (here and
#: sparktext.ann.lsh_cosine_pairs): a bucket of n members expands to
#: n*(n-1)/2 pairs, so an uncapped default hands integrators the
#: quadratic blow-up the docstrings warn about. Oracle/exhaustive twins
#: opt out with max_bucket=None explicitly.
DEFAULT_MAX_BUCKET = 1000

MINHASH_H = 6  # hash functions
MINHASH_BANDS = 3  # bands of 2 -> candidate pairs need 2 matching sigs
PRODUCTION_MINHASH_H = 128
PRODUCTION_MINHASH_BANDS = 16
SHINGLE_K = 3


def _spread(docs: DataFrame, key: str = "doc_id") -> DataFrame:
    """Hash-repartition on the doc key iff the input has fewer partitions
    than the session's parallelism (e.g. one small local parquet file).
    On a real cluster the scan already yields many partitions and this is
    a no-op; keying by doc_id lets any downstream groupBy(doc_id) reuse
    the partitioning instead of shuffling again."""
    par = docs.sparkSession.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < par:
        return docs.repartition(par, key)
    return docs


def tokens_col(text_col: Column) -> Column:
    return F.regexp_extract_all(F.lower(text_col), F.lit(TOKEN_REGEX), 0)


def shingles_col(toks: Column, k: int = SHINGLE_K) -> Column:
    """Distinct k-gram shingles of a token array (empty if < k tokens)."""
    return F.when(
        F.size(toks) >= k,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - (k - 1)),
                lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


# ----------------------------------------------------------- token counts --


def token_count(docs: DataFrame, text_col: str = "text") -> DataFrame:
    return docs.select(
        "doc_id", F.size(tokens_col(F.col(text_col))).cast("long").alias("n_tokens")
    )


# ------------------------------------------------------------ exact dedup --


def exact_dedup_groups(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact duplicate groups by content sha256: one row per distinct
    content with the representative (min) doc_id and the copy count."""
    return docs.groupBy(F.sha2(F.col(text_col), 256).alias("sha")).agg(
        F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_copies")
    )


def exact_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Surviving rows (first doc_id per distinct content)."""
    keep = exact_dedup_groups(docs, text_col).select(
        F.col("keep_doc_id").alias("doc_id")
    )
    return docs.join(keep, "doc_id", "semi")


# ---------------------------------------------------------------- quality --


def quality_scores(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic quality components + combined score in [0, 1].

    components: capped token count, type/token (distinct) ratio, stopword
    ratio (English function words), capped mean token length.
    """
    toks = tokens_col(F.col(text_col))
    stop_list = ", ".join(f"'{w}'" for w in LANG_MARKERS["en"])
    d = docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
        F.size(F.expr(
            f"filter(regexp_extract_all(lower({text_col}), '{TOKEN_REGEX}', 0),"
            f" t -> t IN ({stop_list}))"
        )).cast("long").alias("n_stop"),
        F.length(text_col).cast("long").alias("n_chars_txt"),
    )
    nt = F.col("n_tokens").cast("double")
    avg_word = F.when(
        F.col("n_tokens") > 0,
        (F.col("n_chars_txt") - (F.col("n_tokens") - 1)) / nt,
    ).otherwise(F.lit(0.0))
    quality = F.when(F.col("n_tokens") == 0, F.lit(0.0)).otherwise(
        F.least(nt, F.lit(100.0)) / 100.0 * 0.25
        + (F.col("n_distinct") / nt) * 0.25
        + (F.col("n_stop") / nt) * 0.25
        + F.least(avg_word / 10.0, F.lit(1.0)) * 0.25
    )
    # floor(x*1e6+0.5)/1e6 instead of round(): round-half tie handling
    # differs between engines; floor is bit-deterministic on equal doubles.
    quality = F.floor(quality * 1e6 + 0.5).cast("double") / 1e6
    return d.select("doc_id", "n_tokens", "n_distinct", "n_stop", quality.alias("quality"))


# ---------------------------------------------------------------- lang id --


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language heuristic; 'unknown' when no marker hits.

    Ties break by language code ascending (deterministic).
    """
    toks = tokens_col(F.col(text_col))
    cols = [F.col("doc_id")]
    for lang, markers in sorted(LANG_MARKERS.items()):
        mlist = ", ".join(f"'{w}'" for w in markers)
        cols.append(
            F.size(F.expr(
                f"filter(regexp_extract_all(lower({text_col}), '{TOKEN_REGEX}', 0),"
                f" t -> t IN ({mlist}))"
            )).cast("long").alias(f"s_{lang}")
        )
    d = docs.select(*cols)
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col(f"s_{lg}") for lg in langs])
    # when-chain: first (lexicographically smallest) lang hitting the max wins
    pred = F.when(best == 0, "unknown")
    for lg in langs:
        pred = pred.when(F.col(f"s_{lg}") == best, lg)
    return d.withColumn("pred_lang", pred).select("doc_id", "pred_lang")


# ------------------------------------------------------------ fingerprint --


def fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Content fingerprint: min sha256 over 3-gram shingles (NULL if the
    doc has < 3 tokens). A winnowing-style representative hash — equal
    fingerprints are near-dup candidates."""
    sh = shingles_col(tokens_col(F.col(text_col)))
    fp = F.array_min(F.transform(sh, lambda s: F.sha2(s, 256)))
    return docs.select("doc_id", fp.alias("fingerprint"))


# -------------------------------------------------------------- MinHash ----


def minhash_signatures(
    docs: DataFrame, text_col: str = "text", h: int = MINHASH_H,
    hash_fn: str = "sha256",
) -> DataFrame:
    """H min-hash values over the distinct 3-gram shingle set.

    ``hash_fn="sha256"`` (oracle twin): sig_i = min over shingles of
    sha256('{i}:' || shingle) — hex-string min is a valid total order,
    and matches the DuckDB oracle exactly.

    ``hash_fn="xxhash64"`` (the PRODUCTION path): sig_i =
    min(xxhash64(i, shingle)) as int64 — the same LSH guarantees (any
    family of independent hash total-orders works), ~10x cheaper per
    shingle, and every downstream shuffle moves longs instead of 64-char
    hex strings. At 100 TB the sha256 constant (H hashes per shingle,
    string mins) is the dedup pipeline's dominant cost; always use
    xxhash64 there and keep sha256 for cross-engine oracle parity.
    """
    docs = _spread(docs)
    # Explode distinct shingles ONCE, then take the H mins as plain
    # hash-aggregates: linear work, map-side partial min, one narrow
    # shuffle on doc_id. (The per-column array-lambda formulation
    # recomputes the shingle array H times and is O(len^2) per doc via
    # slice-in-transform — 10x slower at sf0.1.) Docs with < SHINGLE_K
    # tokens produce no shingles and therefore no signature row.
    sh_flat = docs.select(
        "doc_id", F.explode(shingles_col(tokens_col(F.col(text_col)))).alias("shingle")
    )
    if hash_fn == "xxhash64":
        cols = [
            F.min(F.xxhash64(F.lit(i), F.col("shingle"))).alias(f"s{i}")
            for i in range(h)
        ]
    elif hash_fn == "sha256":
        cols = [
            F.min(F.sha2(F.concat(F.lit(f"{i}:"), F.col("shingle")), 256)).alias(f"s{i}")
            for i in range(h)
        ]
    else:
        raise ValueError(f"hash_fn must be 'sha256' or 'xxhash64', got {hash_fn!r}")
    return sh_flat.groupBy("doc_id").agg(*cols)


def lsh_candidate_pairs(
    docs: DataFrame,
    text_col: str = "text",
    h: int = MINHASH_H,
    bands: int = MINHASH_BANDS,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
    hash_fn: str = "sha256",
) -> DataFrame:
    """MinHash+LSH near-duplicate candidate pairs (doc_a < doc_b).

    Rows of each band (signature slice) group into buckets; docs sharing
    any bucket become a pair. ONE groupBy collects each bucket's (sorted)
    doc ids and in-bucket pairs are generated JVM-side with array
    expressions — no self-join, so the signature pipeline is computed
    exactly once per call with nothing persisted (the join formulation
    either re-computed it per side or leaked one cache per call; AQE
    exchange reuse does not fire across self-join aliases here).

    ``max_bucket`` (the 100-TB skew escape): a band bucket of n docs
    yields n*(n-1)/2 pairs, so one mega-bucket of identical signatures —
    a duplicate-heavy corpus — is quadratic (and materializes an n-sized
    array per bucket). Buckets larger than ``max_bucket`` are dropped (a
    documented recall trade: members of a dropped bucket are
    overwhelmingly EXACT duplicates, which the scale pipeline must remove
    with :func:`exact_dedup` BEFORE near-dup LSH — run exact first, then
    LSH with a cap). The cap defaults ON (``DEFAULT_MAX_BUCKET``) so
    production callers inherit the linear shape; pass ``None`` only for
    exhaustive small-scale twins (the oracle paths do, explicitly).
    """
    sig = minhash_signatures(docs, text_col, h, hash_fn=hash_fn)
    rows_per_band = h // bands
    band_structs = []
    for b in range(bands):
        sig_cols = [F.col(f"s{b * rows_per_band + j}") for j in range(rows_per_band)]
        if hash_fn == "xxhash64":
            # int64 signatures: fold the band slice into ONE long key —
            # the bucket groupBy shuffles 8-byte keys, not concatenated
            # hex strings (~rows_per_band*64 bytes each).
            key = F.xxhash64(*sig_cols)
        else:
            key = F.concat(*sig_cols)
        band_structs.append(F.struct(F.lit(b).alias("band_id"), key.alias("key")))
    bands_df = sig.select(
        "doc_id", F.explode(F.array(*band_structs)).alias("band")
    ).select("doc_id", "band.band_id", "band.key")
    buckets = (
        bands_df.groupBy("band_id", "key")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("ds"))
        .filter(F.size("ds") >= 2)
    )
    if max_bucket is not None:
        buckets = buckets.filter(F.size("ds") <= max_bucket)
    # all i<j pairs of the sorted bucket array (2-arg lambda = (elem, idx))
    pairs = F.expr(
        "flatten(transform(ds, (x, i) -> "
        "transform(slice(ds, i + 2, size(ds) - i - 1), "
        "y -> struct(x AS doc_a, y AS doc_b))))"
    )
    return (
        buckets.select(F.explode(pairs).alias("p"))
        .select("p.doc_a", "p.doc_b")
        .distinct()
    )


def ngram_jaccard_pairs(
    docs: DataFrame, text_col: str = "text", threshold: float = 0.0,
    hash_fn: str = "sha256", max_bucket: int | None = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """Exact n-gram Jaccard similarity, computed ONLY for LSH candidate
    pairs (never all-pairs): |A∩B| / |A∪B| over distinct 3-gram shingles.
    ``max_bucket`` passes through to :func:`lsh_candidate_pairs`."""
    sh = docs.select(
        "doc_id", shingles_col(tokens_col(F.col(text_col))).alias("sh")
    )
    pairs = lsh_candidate_pairs(docs, text_col, hash_fn=hash_fn,
                                max_bucket=max_bucket)
    j = (
        pairs.join(sh.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sh", "sh_a"), "doc_a")
        .join(sh.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sh", "sh_b"), "doc_b")
        .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")).cast("double"))
        .withColumn("uni", F.size(F.array_union("sh_a", "sh_b")).cast("double"))
        .select(
            "doc_a", "doc_b",
            F.round(F.col("inter") / F.col("uni"), 6).alias("jaccard"),
        )
    )
    return j.filter(F.col("jaccard") >= threshold) if threshold > 0 else j


# -------------------------------------------------------------- SimHash ----

SIMHASH_BITS = 32


def _simhash_sql(table: str, sha_fn: str, bits: int = SIMHASH_BITS) -> str:
    """Shared SQL template: tf-weighted simhash from a (doc_id, term, tf)
    table. ``sha_fn`` is 'sha256({})' for DuckDB, 'sha2({}, 256)' for
    Spark SQL — everything else is common SQL, so parity holds by
    construction."""
    h = sha_fn.format("term")
    votes = []
    for b in range(bits):
        nib_pos = b // 4 + 1
        bit_in_nib = b % 4
        nib_val = f"(instr('0123456789abcdef', substr({h}, {nib_pos}, 1)) - 1)"
        bit = f"(CAST(floor({nib_val} / {2 ** bit_in_nib}) AS BIGINT) % 2)"
        votes.append(
            f"CAST(CASE WHEN SUM(CASE WHEN {bit} = 1 THEN tf ELSE -tf END) > 0 "
            f"THEN {2 ** b} ELSE 0 END AS BIGINT)"
        )
    combined = " + ".join(votes)
    return f"SELECT doc_id, ({combined}) AS simhash FROM {table} GROUP BY doc_id"


def simhash(
    docs: DataFrame,
    text_col: str = "text",
    bits: int = SIMHASH_BITS,
    hash_fn: str = "sha256",
) -> DataFrame:
    """tf-weighted SimHash fingerprint (default 32 bits, non-negative in
    an int64). Computed entirely in Spark SQL expressions.

    ``hash_fn='sha256'`` is the DuckDB-oracle twin (shared SQL template,
    parity by construction). ``hash_fn='xxhash64'`` is the PRODUCTION
    path, mirroring :func:`minhash_signatures`: bit b of the term hash is
    ``(xxhash64(term) >>> b) & 1`` — pure integer ops instead of a
    sha256-hex nibble walk — and the per-(doc, term) tf pre-aggregation
    is FUSED away: summing ±1 per token OCCURRENCE equals summing ±tf
    per distinct term, so the whole fingerprint is ONE groupBy(doc_id)
    (one shuffle instead of two; the sha plan's second exchange and its
    32 sha2 calls per row both disappear). The two hash families yield
    different fingerprints but the same locality property (pinned in
    tests via hamming-distance ordering)."""
    spark = docs.sparkSession
    if hash_fn == "xxhash64":
        toks = docs.select(
            "doc_id", F.explode(tokens_col(F.col(text_col))).alias("term")
        )
        h = F.xxhash64("term")
        combined = None
        for b in range(bits):
            vote = F.sum(
                F.when(F.shiftrightunsigned(h, b).bitwiseAND(F.lit(1)) == 1, 1)
                .otherwise(-1)
            )
            col = F.when(vote > 0, F.lit(1 << b)).otherwise(F.lit(0)).cast("long")
            combined = col if combined is None else (combined + col)
        return toks.groupBy("doc_id").agg(combined.alias("simhash"))
    if hash_fn != "sha256":
        raise ValueError(f"hash_fn must be 'sha256' or 'xxhash64', got {hash_fn!r}")
    tf = (
        docs.select("doc_id", F.explode(tokens_col(F.col(text_col))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    # Stable view name (Python's str hash is salted per process, which
    # made the name nondeterministic across runs — harmless but noisy).
    view = "_simhash_tf_" + "".join(c if c.isalnum() else "_" for c in text_col)
    tf.createOrReplaceTempView(view)
    return spark.sql(_simhash_sql(view, "sha2({}, 256)", bits))


# ----------------------------------------------------- entry-point wiring --


def queries():
    from sparktext import ann

    def token_counts_q(spark, sf_dir):
        return token_count(spark.read.parquet(f"{sf_dir}/documents.parquet"))

    def dedup_exact_q(spark, sf_dir):
        return exact_dedup_groups(spark.read.parquet(f"{sf_dir}/documents.parquet"))

    def quality_q(spark, sf_dir):
        return quality_scores(spark.read.parquet(f"{sf_dir}/documents.parquet"))

    def lang_id_q(spark, sf_dir):
        return lang_id(spark.read.parquet(f"{sf_dir}/documents.parquet"))

    def fingerprint_q(spark, sf_dir):
        return fingerprint(spark.read.parquet(f"{sf_dir}/documents.parquet"))

    def minhash_pairs_q(spark, sf_dir):
        # max_bucket=None: the DuckDB oracle SQL has no cap, so the
        # exhaustive twin opts out of the production default explicitly.
        return lsh_candidate_pairs(
            spark.read.parquet(f"{sf_dir}/documents.parquet"), max_bucket=None
        )

    def jaccard_pairs_q(spark, sf_dir):
        return ngram_jaccard_pairs(
            spark.read.parquet(f"{sf_dir}/documents.parquet"), max_bucket=None
        )

    def simhash_q(spark, sf_dir):
        return simhash(spark.read.parquet(f"{sf_dir}/documents.parquet"))

    def ann_cosine_q(spark, sf_dir):
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        qvec = [float(x) for x in emb.filter("vec_id = 0").collect()[0]["embedding"]]
        return ann.cosine_topk(emb, qvec, k=10, round_decimals=6)

    def emb_pairs_q(spark, sf_dir):
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        return ann.cosine_pairs(emb, threshold=0.4)

    def ann_batch_q(spark, sf_dir):
        from pyspark.sql import functions as FF

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        qs = emb.filter(FF.col("vec_id").isin([0, 1, 2])).select(
            FF.col("vec_id").alias("query_id"),
            FF.col("embedding").alias("q_embedding"),
        )
        return ann.cosine_topk_batch(emb, qs, k=10, round_decimals=6)

    return {
        "text_token_counts": token_counts_q,
        "dedup_exact_groups": dedup_exact_q,
        "text_quality": quality_q,
        "text_lang_id": lang_id_q,
        "text_fingerprint": fingerprint_q,
        "dedup_minhash_pairs": minhash_pairs_q,
        "dedup_ngram_jaccard": jaccard_pairs_q,
        "text_simhash": simhash_q,
        "ann_cosine_top10": ann_cosine_q,
        "ann_cosine_batch": ann_batch_q,
        "dedup_embedding_pairs": emb_pairs_q,
    }


_D_TOKS = (
    "tok AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks "
    "FROM documents)"
)
_D_SHINGLES = (
    "sh AS (SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - 1), "
    "i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))) AS shs FROM tok "
    "WHERE len(toks) >= 3)"
)


def _minhash_sig_sql(h: int = MINHASH_H) -> str:
    mins = ", ".join(
        f"MIN(sha256('{i}:' || shingle)) AS s{i}" for i in range(h)
    )
    return (
        f"{_D_TOKS}, {_D_SHINGLES}, "
        f"shx AS (SELECT doc_id, unnest(shs) AS shingle FROM sh), "
        f"sig AS (SELECT doc_id, {mins} FROM shx GROUP BY doc_id)"
    )


def _lsh_pairs_sql(h: int = MINHASH_H, bands: int = MINHASH_BANDS) -> str:
    rpb = h // bands
    band_rows = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band_id, {key} AS key FROM sig".format(
            b=b, key=" || ".join(f"s{b * rpb + j}" for j in range(rpb))
        )
        for b in range(bands)
    )
    return f"""
WITH {_minhash_sig_sql(h)},
bands AS ({band_rows})
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a JOIN bands b USING (band_id, key)
WHERE a.doc_id < b.doc_id"""


def oracle_sql():
    stop_en = ", ".join(f"'{w}'" for w in LANG_MARKERS["en"])
    lang_score_cols = ", ".join(
        "len(list_filter(toks, t -> t IN ({m}))) AS s_{lg}".format(
            m=", ".join(f"'{w}'" for w in ms), lg=lg
        )
        for lg, ms in sorted(LANG_MARKERS.items())
    )
    langs = sorted(LANG_MARKERS)
    greatest = "GREATEST(" + ", ".join(f"s_{lg}" for lg in langs) + ")"
    pred_chain = "CASE WHEN " + greatest + " = 0 THEN 'unknown' " + " ".join(
        f"WHEN s_{lg} = {greatest} THEN '{lg}'" for lg in langs
    ) + " END"

    jaccard_sql = f"""
WITH {_minhash_sig_sql()},
bands AS (SELECT doc_id, 0 AS band_id, s0 || s1 AS key FROM sig
  UNION ALL SELECT doc_id, 1, s2 || s3 FROM sig
  UNION ALL SELECT doc_id, 2, s4 || s5 FROM sig),
pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b USING (band_id, key) WHERE a.doc_id < b.doc_id)
SELECT doc_a, doc_b,
  ROUND(CAST(len(list_intersect(x.shs, y.shs)) AS DOUBLE)
        / len(list_distinct(list_concat(x.shs, y.shs))), 6) AS jaccard
FROM pairs JOIN sh x ON x.doc_id = doc_a JOIN sh y ON y.doc_id = doc_b"""

    return {
        "text_token_counts": (
            "SELECT doc_id, CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) "
            "AS BIGINT) AS n_tokens FROM documents"
        ),
        "dedup_exact_groups": (
            "SELECT sha256(text) AS sha, MIN(doc_id) AS keep_doc_id, "
            "COUNT(*) AS n_copies FROM documents GROUP BY 1"
        ),
        "text_quality": f"""
WITH {_D_TOKS},
d AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
        CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
        CAST(len(list_filter(toks, t -> t IN ({stop_en}))) AS BIGINT) AS n_stop,
        (SELECT length(text) FROM documents x WHERE x.doc_id = tok.doc_id) AS nc
      FROM tok)
SELECT doc_id, n_tokens, n_distinct, n_stop,
  CASE WHEN n_tokens = 0 THEN 0.0 ELSE FLOOR((
    LEAST(CAST(n_tokens AS DOUBLE), 100.0) / 100.0 * 0.25
    + (CAST(n_distinct AS DOUBLE) / n_tokens) * 0.25
    + (CAST(n_stop AS DOUBLE) / n_tokens) * 0.25
    + LEAST(((nc - (n_tokens - 1)) / CAST(n_tokens AS DOUBLE)) / 10.0, 1.0) * 0.25
  ) * 1e6 + 0.5) / 1e6 END AS quality
FROM d""",
        "text_lang_id": f"""
WITH {_D_TOKS},
s AS (SELECT doc_id, {lang_score_cols} FROM tok)
SELECT doc_id, {pred_chain} AS pred_lang FROM s""",
        "text_fingerprint": f"""
WITH {_D_TOKS}
SELECT doc_id,
  CASE WHEN len(toks) >= 3 THEN
    list_min(list_transform(range(1, len(toks) - 1),
      i -> sha256('' || concat_ws(' ', toks[i], toks[i+1], toks[i+2]))))
  END AS fingerprint
FROM tok""",
        "ann_cosine_batch": """
WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings
           WHERE vec_id IN (0, 1, 2)),
s AS (SELECT q.query_id, e.vec_id,
        ROUND(list_dot_product(e.embedding::DOUBLE[], q.qe::DOUBLE[])
          / (SQRT(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
             * SQRT(list_dot_product(q.qe::DOUBLE[], q.qe::DOUBLE[]))), 6) AS cosine
      FROM embeddings e, q),
r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        ORDER BY cosine DESC, vec_id ASC) AS rn FROM s)
SELECT query_id, vec_id, cosine FROM r WHERE rn <= 10""",
        "dedup_minhash_pairs": _lsh_pairs_sql(),
        "dedup_ngram_jaccard": jaccard_sql,
        "text_simhash": (
            "WITH tokx AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), "
            "'[a-z0-9]+')) AS term FROM documents), "
            "tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tokx GROUP BY doc_id, term) "
            + _simhash_sql("tf", "sha256({})")
        ),
        "ann_cosine_top10": """
WITH q AS (SELECT generate_subscripts(embedding, 1) AS i,
                  CAST(unnest(embedding) AS DOUBLE) AS qv
           FROM embeddings WHERE vec_id = 0),
e AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
             CAST(unnest(embedding) AS DOUBLE) AS v
      FROM embeddings),
s AS (SELECT vec_id, SUM(v * qv) AS dot, SUM(v * v) AS sq
      FROM e JOIN q USING (i) GROUP BY vec_id),
qn AS (SELECT SQRT(SUM(qv * qv)) AS qnorm FROM q)
SELECT vec_id, ROUND(dot / (SQRT(sq) * qn.qnorm), 6) AS cosine
FROM s, qn
ORDER BY cosine DESC, vec_id ASC LIMIT 10""",
        "dedup_embedding_pairs": """
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND(
         list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
         / (SQRT(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
            * SQRT(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))),
       6) AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE ROUND(
  list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
  / (SQRT(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
     * SQRT(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))),
6) >= 0.4""",
    }


# ------------------------------------------------------ composed pipeline --


def training_data_pipeline(
    docs: DataFrame,
    text_col: str = "text",
    min_quality: float = 0.3,
    keep_langs: tuple[str, ...] | None = None,
    near_dup: bool = True,
    minhash_h: int = MINHASH_H,
    minhash_bands: int = MINHASH_BANDS,
    max_bucket: int | None = 1000,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """The composed 100-TB cleaning pipeline these operators exist for,
    in the scale-correct order:

    1. EXACT dedup first (hash groupBy — removes the identical-content
       mass that would otherwise create quadratic LSH mega-buckets),
    2. quality filter (pure column expressions),
    3. optional language filter (marker heuristic),
    4. near-dup removal via MinHash+LSH candidates (bucketed equi-work,
       ``max_bucket``-capped): from each candidate pair the LARGER doc_id
       drops, so one survivor remains per near-dup cluster chain.

    Every stage is a narrow map, hash groupBy or semi/anti join — no
    cross joins, no driver materialization; returns the surviving rows
    of ``docs`` with a ``quality`` column attached.
    """
    survivors = exact_dedup(docs, text_col)
    q = quality_scores(survivors, text_col).select("doc_id", "quality")
    survivors = survivors.join(q, "doc_id").filter(F.col("quality") >= min_quality)
    if keep_langs:
        langs = lang_id(survivors, text_col)
        keep = langs.filter(F.col("pred_lang").isin(list(keep_langs))).select("doc_id")
        survivors = survivors.join(keep, "doc_id", "semi")
    if near_dup:
        pairs = lsh_candidate_pairs(
            survivors, text_col, h=minhash_h, bands=minhash_bands,
            max_bucket=max_bucket, hash_fn=hash_fn,
        )
        drop = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
        survivors = survivors.join(drop, "doc_id", "left_anti")
    return survivors
