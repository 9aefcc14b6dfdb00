"""Environment / contract self-check — the engine's analog of the
reference's `test_setup.py` (environment smoke, test_setup.py:13-240) and
`kafka_diagnostic.py` (connectivity probe): a PASS/FAIL sweep over every
layer the engine needs, runnable anywhere the package is installed.

Usage: python tools/diagnose.py [sf_dir]     (default /root/testdata/sf0.001)

Checks: imports → SparkSession → testdata tables readable → flagship batch
query → sentiment golden values (the reference's 4 fixture texts,
test_setup.py:102-107) → Arrow/pandas UDF crossing → streaming drain →
DuckDB oracle harness. Exit code 0 iff everything passes.
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS: list[tuple[str, bool, str]] = []


def check(name: str):
    def deco(fn):
        def run(*a, **kw):
            try:
                fn(*a, **kw)
                RESULTS.append((name, True, ""))
            except Exception as e:  # noqa: BLE001 — diagnostic sweep
                RESULTS.append((name, False, f"{type(e).__name__}: {e}"))
                traceback.print_exc(limit=2)
        return run
    return deco


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    @check("imports (pyspark, pyarrow, pandas, numpy, duckdb)")
    def c_imports():
        import duckdb  # noqa: F401
        import numpy  # noqa: F401
        import pandas  # noqa: F401
        import pyarrow  # noqa: F401
        import pyspark  # noqa: F401
    c_imports()

    @check("SparkSession (local, AQE, Arrow)")
    def c_session():
        from social_media_sentiment_analysis_spark.session import get_spark
        spark = get_spark("diagnose", shuffle_partitions=8)
        spark.sparkContext.setLogLevel("ERROR")
        assert spark.range(10).count() == 10
        globals()["_spark"] = spark
    c_session()

    spark = globals().get("_spark")
    if spark is None:
        _report()
        return 1

    @check(f"testdata tables readable ({sf_dir})")
    def c_tables():
        from social_media_sentiment_analysis_spark.schemas import (
            TESTDATA_TABLES,
        )
        from social_media_sentiment_analysis_spark.sources.batch import (
            load_table,
        )
        for t in TESTDATA_TABLES:
            assert load_table(spark, sf_dir, t).limit(1).count() == 1, t
    c_tables()

    @check("flagship batch query (sentiment summary)")
    def c_flagship():
        from social_media_sentiment_analysis_spark.queries.reference import (
            q_sentiment_summary,
        )
        rows = q_sentiment_summary(spark, sf_dir).collect()
        assert rows and {r.final_sentiment for r in rows} <= {
            "positive", "neutral", "negative"}
    c_flagship()

    @check("sentiment ensemble goldens (lexicon vocabulary)")
    def c_goldens():
        # same shape as the reference's 4-text smoke (test_setup.py:102-107)
        # over the engine's valence lexicon (functions/lexicon_data.py) —
        # the default model. Real VADER/TextBlob UDFs are import-gated and
        # slot into the same pipeline when their packages are installed.
        from social_media_sentiment_analysis_spark.functions.sentiment import (
            sentiment_enrich,
        )
        texts = [
            "the fast big engine is fast",      # positive-loaded
            "a slow small response so slow",    # negative-loaded
            "the engine processes the stream",  # neutral
            "",                                 # U5 canonical fallback
        ]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "id long, text string")
        out = {r.id: r.final_sentiment
               for r in sentiment_enrich(df, text_col="text").collect()}
        assert out[0] == "positive" and out[1] == "negative", out
        assert out[2] == "neutral" and out[3] == "neutral", out
    c_goldens()

    @check("Arrow pandas-UDF crossing (mapInPandas)")
    def c_arrow():
        def ident(batches):
            for pdf in batches:
                yield pdf
        df = spark.range(100).mapInPandas(ident, schema="id long")
        assert df.count() == 100
    c_arrow()

    @check("streaming drain (file stream -> memory sink)")
    def c_stream():
        from social_media_sentiment_analysis_spark.queries.temporal import (
            q_streaming_hourly_rollup,
        )
        assert q_streaming_hourly_rollup(spark, sf_dir).count() > 0
    c_stream()

    @check("DuckDB oracle harness (flagship parity)")
    def c_oracle():
        import duckdb
        from social_media_sentiment_analysis_spark.queries.registry import (
            QUERIES,
        )
        from social_media_sentiment_analysis_spark.schemas import (
            TESTDATA_TABLES,
        )
        con = duckdb.connect()
        for t in TESTDATA_TABLES:
            con.execute(f"CREATE VIEW {t} AS SELECT * "
                        f"FROM '{sf_dir}/{t}.parquet'")
        q = QUERIES["sentiment_summary"]
        spark_n = q.builder(spark, sf_dir).count()
        oracle_n = len(con.execute(q.oracle).fetchall())
        assert spark_n == oracle_n, (spark_n, oracle_n)
    c_oracle()

    return _report()


def _report() -> int:
    print()
    width = max(len(n) for n, _, _ in RESULTS)
    failed = 0
    for name, ok, msg in RESULTS:
        status = "PASS" if ok else "FAIL"
        failed += (not ok)
        line = f"  [{status}] {name.ljust(width)}"
        if msg:
            line += f"  — {msg}"
        print(line)
    print(f"\n{len(RESULTS) - failed}/{len(RESULTS)} checks passed")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
