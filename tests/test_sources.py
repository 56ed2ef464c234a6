"""A13 sources/sinks: parquet twin is fully tested; the Iceberg path
runs a real hadoop-catalog round-trip IF iceberg-spark-runtime is on the
classpath, and skips cleanly otherwise (this sandbox ships no catalog
jars — the call-path gating itself is still asserted)."""

import pytest


def _iceberg_on_classpath(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def test_read_corpus_parquet_roundtrip(spark, micro_corpus, tmpdir):
    from sparktext.sources import read_corpus

    micro_corpus.write.parquet(str(tmpdir) + "/corpus")
    df = read_corpus(spark, str(tmpdir) + "/corpus")
    assert df.count() == micro_corpus.count()
    assert set(df.columns) == set(micro_corpus.columns)


def test_read_corpus_validates_columns(spark, tmpdir):
    from sparktext.sources import read_corpus

    spark.range(3).write.parquet(str(tmpdir) + "/bad")
    with pytest.raises(ValueError, match="missing required columns"):
        read_corpus(spark, str(tmpdir) + "/bad")


def test_iceberg_gated_error_without_runtime(spark, micro_corpus):
    """Without the runtime the Iceberg path must fail with actionable
    guidance, not an opaque ClassNotFound."""
    from sparktext.sources import read_corpus

    if _iceberg_on_classpath(spark):
        pytest.skip("iceberg runtime present; gating path not reachable")
    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        read_corpus(spark, "nocat.db.corpus", fmt="iceberg")


def test_iceberg_roundtrip(spark, micro_corpus, tmpdir):
    """Real write+read through a local hadoop catalog — exercised only
    when iceberg-spark-runtime jars are present (spark-submit --packages
    deployment); skipped cleanly in jar-less sandboxes."""
    if not _iceberg_on_classpath(spark):
        pytest.skip("iceberg-spark-runtime not on the classpath")
    from sparktext.sources import read_corpus

    spark.conf.set("spark.sql.catalog.ib_test", "org.apache.iceberg.spark.SparkCatalog")
    spark.conf.set("spark.sql.catalog.ib_test.type", "hadoop")
    spark.conf.set("spark.sql.catalog.ib_test.warehouse", str(tmpdir) + "/wh")
    micro_corpus.writeTo("ib_test.db.corpus").create()
    df = read_corpus(spark, "ib_test.db.corpus", fmt="iceberg")
    assert df.count() == micro_corpus.count()
    assert sorted(r["doc_id"] for r in df.select("doc_id").collect()) == list(range(12))
