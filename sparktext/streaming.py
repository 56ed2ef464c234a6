"""Structured Streaming ingest (incremental indexing, §north_star
"resumable builds" carried to a live source).

The reference is a batch library whose incremental story is
``add_document + commit`` (appending segments); the Spark-native
equivalent of a long-running IndexWriter is a Structured Streaming file
source feeding micro-batch commits. Each micro-batch routes through
:func:`sparktext.manifest.append_documents` — one manifest GROUP per
batch — so the streaming sink inherits the A12 crash-safety contract
end-to-end:

- Spark's streaming checkpoint guarantees each source file lands in
  exactly one micro-batch;
- a batch replayed after a crash re-runs ``append_documents`` with the
  SAME content, which the append path recognizes (pre-manifest-commit
  crash: same group id + dynamic partition overwrite replaces orphans;
  post-commit crash: content-fingerprint match -> idempotent
  re-finalize) — so replays never duplicate documents: end-to-end
  exactly-once without any sink-side transaction log beyond the
  manifest itself.

``trigger(availableNow=True)`` drains everything currently in the
source and stops — the batch-job-with-streaming-semantics mode used for
scheduled incremental index refreshes; omit it for a continuously
running ingest.

Compaction interplay: ``append_documents`` holds the index's
single-writer lock, so a micro-batch that lands while
:func:`sparktext.manifest.compact_index` is swapping directories fails
fast with ``WriterLockHeld`` (failing the streaming query) instead of
writing into a directory about to be deleted. Restarting the stream
after the compaction replays that batch from the checkpoint — which
compaction carries across its directory swap — and the batch's
``commit_token`` keeps the replay exactly-once.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

#: canonical corpus schema for streaming file sources (file streams
#: require an explicit schema — no inference at stream start)
CORPUS_STREAM_SCHEMA = (
    "doc_id long, repo string, path string, commit string, lang string, "
    "content string, n_chars long"
)


def stream_ingest(
    spark: SparkSession,
    index_dir: str,
    source_dir: str,
    schema: str = CORPUS_STREAM_SCHEMA,
    fmt: str = "parquet",
    num_segments: int | None = None,
    available_now: bool = True,
    drop_doc_ids: bool = True,
):
    """Start a streaming query appending ``source_dir`` files to the
    persisted index at ``index_dir`` (which must already hold a base
    build). Returns the StreamingQuery; call ``awaitTermination()``.

    ``drop_doc_ids``: source files carrying their own ``doc_id`` column
    would collide across micro-batches (append offsets every batch by
    the current max); dropping lets ``assign_doc_ids`` mint dense ids
    per batch — the default for real feeds.
    """
    from sparktext.manifest import append_documents

    reader = spark.readStream.schema(schema)
    stream = getattr(reader, fmt)(source_dir) if fmt in ("parquet", "json") \
        else reader.format(fmt).load(source_dir)

    def _sink(batch_df, batch_id: int) -> None:
        if drop_doc_ids and "doc_id" in batch_df.columns:
            batch_df = batch_df.drop("doc_id")
        if batch_df.isEmpty():
            return
        # commit_token = the streaming batch id: a crash-replay of the
        # SAME batch is repaired (skip + re-finalize), while a later
        # batch whose content happens to be identical (re-exported
        # snapshot) still appends — content fingerprints alone cannot
        # tell those apart.
        append_documents(
            spark, index_dir, batch_df, num_segments=num_segments,
            commit_token=f"stream-batch-{batch_id}",
        )

    writer = (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", f"{index_dir}/_stream_checkpoint")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
