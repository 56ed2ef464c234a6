"""Opt-in Iceberg execution attempt (round-3 verdict item 8; A13).

The A13 Iceberg round-trip test self-gates on the classpath. This tool
makes the jar acquisition itself a one-command attempt: it starts a
fresh SparkSession with ``spark.jars.packages`` pointing at
iceberg-spark-runtime (Maven download needs network access), then runs
the same write+read round-trip as tests/test_sources.py, and prints a
JSON verdict either way — the artifact BENCH/BASELINE.md records.

Usage:
    SPARKTEXT_TRY_ICEBERG=1 python tools/try_iceberg.py
(The env guard keeps CI/benches from stalling on a 60s network timeout.)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PACKAGE = "org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:1.10.0"


def main() -> None:
    if os.environ.get("SPARKTEXT_TRY_ICEBERG") != "1":
        print(json.dumps({"attempted": False,
                          "reason": "set SPARKTEXT_TRY_ICEBERG=1 to opt in"}))
        return
    out = {"attempted": True, "package": PACKAGE}
    t0 = time.time()
    try:
        from pyspark.sql import SparkSession

        wh = tempfile.mkdtemp(prefix="iceberg_wh_")
        spark = (
            SparkSession.builder.master("local[4]")
            .appName("sparktext-iceberg-attempt")
            .config("spark.jars.packages", PACKAGE)
            .config("spark.sql.catalog.ib", "org.apache.iceberg.spark.SparkCatalog")
            .config("spark.sql.catalog.ib.type", "hadoop")
            .config("spark.sql.catalog.ib.warehouse", wh)
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
        from sparktext.sources import read_corpus

        df = spark.createDataFrame(
            [(0, "r", "p/0", "c0", "py", "alpha beta", 10)],
            "doc_id long, repo string, path string, commit string, "
            "lang string, content string, n_chars long",
        )
        df.writeTo("ib.db.corpus").create()
        back = read_corpus(spark, "ib.db.corpus", fmt="iceberg")
        out["roundtrip_rows"] = back.count()
        out["ok"] = out["roundtrip_rows"] == 1
    except Exception as e:
        out["ok"] = False
        out["error"] = f"{type(e).__name__}: {str(e)[:400]}"
    out["wall_s"] = round(time.time() - t0, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
