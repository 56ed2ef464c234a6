"""Corpus adapters (FIXTURES.md §2).

The engine's canonical input is the Iceberg-shaped table
``(repo, path, commit, lang, content)`` (BASELINE.json input_hint). The
driver's fixture corpus ``documents.parquet`` is presented in that shape
here; ``doc_id``/``n_chars`` are carried through so oracle comparisons can
key on the driver's stable ids and aggregate the numeric fast field.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def documents_as_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        F.col("source").alias("repo"),
        F.concat(F.lit("doc/"), F.col("doc_id").cast("string")).alias("path"),
        F.sha2(F.col("doc_id").cast("string"), 256).alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"),
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("n_chars").cast("long").alias("n_chars"),
    )
