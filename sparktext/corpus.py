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


def skewed_impact_corpus(spark: SparkSession, n: int, heavy_frac: float = 0.01) -> DataFrame:
    """Deterministic synthetic corpus with CLUSTERED tf skew (Zipf-ish
    impact): the first ``heavy_frac`` of docs carry tf 8-40 for the three
    query terms (alpha/beta/gamma); the rest carry tf 1. All docs are
    padded to equal token count, so block-max upper bounds are driven by
    max_tf alone. Because the high-impact docs are contiguous in doc_id,
    their blocks concentrate in the first segment(s) — the layout
    block-max WAND exploits — so the bench can show real pruning
    (blocks_kept << blocks_total) instead of the uniform fixture corpus
    where no block dominates. Pure column expressions; no randomness.
    """
    df = spark.range(n).withColumnRenamed("id", "doc_id")
    heavy = F.col("doc_id") < int(n * heavy_frac)
    df = (
        df.withColumn("tfa", F.when(heavy, F.col("doc_id") % 33 + 8).otherwise(F.lit(1)).cast("int"))
        .withColumn("tfb", F.when(heavy, F.col("doc_id") % 17 + 8).otherwise(F.lit(1)).cast("int"))
        .withColumn("tfc", F.when(heavy, F.col("doc_id") % 11 + 8).otherwise(F.lit(1)).cast("int"))
        .withColumn("content", F.expr(
            "concat(repeat('alpha ', tfa), repeat('beta ', tfb), "
            "repeat('gamma ', tfc), repeat('pad ', 128 - tfa - tfb - tfc))"))
    )
    return df.select(
        F.lit("zipf").alias("repo"),
        F.concat(F.lit("z/"), F.col("doc_id")).alias("path"),
        F.concat(F.lit("zc"), F.col("doc_id")).alias("commit"),
        F.lit("en").alias("lang"),
        "content",
        "doc_id",
        F.length("content").cast("long").alias("n_chars"),
    )


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
