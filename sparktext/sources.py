"""Corpus sources and index sinks (SURVEY.md A13).

The canonical production source is an Iceberg table of source-code
repositories ``(repo, path, commit, lang, content)`` (BASELINE.json
input_hint). This sandbox has no Iceberg catalog jars, so the Iceberg
path is gated: it builds the correct reader call and raises a clear
error if the runtime lacks the catalog — parquet is the tested local
twin (same DataFrame downstream, identical engine behavior).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparktext.build import CORPUS_COLS


def read_corpus(
    spark: SparkSession,
    location: str,
    fmt: str = "parquet",
    validate: bool = True,
) -> DataFrame:
    """Load a canonical corpus table from parquet or an Iceberg table.

    ``fmt='iceberg'``: ``location`` is a catalog table name
    (``catalog.db.table``); requires iceberg-spark-runtime on the
    cluster classpath — the standard spark-submit deployment of this
    engine; unavailable in the local sandbox.
    """
    if fmt == "parquet":
        df = spark.read.parquet(location)
    elif fmt == "iceberg":
        try:
            df = spark.read.format("iceberg").load(location)
        except Exception as e:  # catalog/jars absent
            raise RuntimeError(
                "Iceberg source requires iceberg-spark-runtime jars + a "
                "configured catalog (spark.sql.catalog.*); add them to "
                "spark-submit --packages. Local testing uses parquet."
            ) from e
    else:
        raise ValueError(f"unknown corpus format {fmt!r}")
    if validate:
        missing = [c for c in CORPUS_COLS if c not in df.columns]
        if missing:
            raise ValueError(
                f"corpus at {location} missing required columns {missing}; "
                f"expected {list(CORPUS_COLS)}"
            )
    return df


def snapshot_filter(df: DataFrame, commit_col: str = "commit", commits: list[str] | None = None) -> DataFrame:
    """Restrict a repo corpus to a set of commits (time-travel stand-in
    when the source is plain parquet; Iceberg gets this natively via
    VERSION AS OF)."""
    if not commits:
        return df
    return df.filter(F.col(commit_col).isin(commits))
