"""Cross-engine code-point semantics pin for the per-character pipeline
(r4 advice: the sf* testdata is pure ASCII, so the parity gate could never
catch a Spark-vs-DuckDB divergence on realistic social-media text).

Two layers:

1. ``split('')`` primitive: both engines must split per Unicode CODE
   POINT — astral-plane emoji must stay whole (Java's regex engine is
   code-point aware; DuckDB splits UTF-8 code points), and the known
   divergence class (Unicode special case mappings under full ``lower()``,
   e.g. U+0130 'İ' → "i"+U+0307 in Java vs "i" in DuckDB) must stay OUT of
   the pipeline — which is why char_entropy folds case with ASCII-only
   ``translate`` on both sides.
2. The full ``char_entropy`` query end-to-end on a non-ASCII corpus
   (emoji, CJK, accents, Turkish dotted-İ, German ß, mixed) written as a
   tmp documents.parquet: identical rows from Spark and the DuckDB oracle.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from social_media_sentiment_analysis_spark.queries.llmdata import (
    ORACLE_CHAR_ENTROPY,
    q_char_entropy,
)

NON_ASCII_TEXTS = [
    "emoji 😀🎉😀 party 🚀",          # astral-plane, repeated
    "héllo wörld naïve café",         # latin-1 accents
    "日本語テキストの品質チェック",      # CJK, no spaces
    "İstanbul LOWERS to istanbul İİ",  # Turkish dotted capital I (U+0130)
    "STRASSE vs straße ẞß",           # German sharp s, capital ẞ (U+1E9E)
    "mixed ASCII and Ünïcödé 🧪 text",
]


@pytest.fixture(scope="module")
def nonascii_sf_dir(tmp_path_factory):
    """A documents.parquet matching the testdata schema, non-ASCII text."""
    d = tmp_path_factory.mktemp("nonascii_sf")
    pd.DataFrame({
        "doc_id": range(len(NON_ASCII_TEXTS)),
        "text": NON_ASCII_TEXTS,
        "lang": ["xx"] * len(NON_ASCII_TEXTS),
        "source": ["emoji", "latin", "cjk", "turkish", "german", "mixed"],
        "n_chars": [len(t) for t in NON_ASCII_TEXTS],
    }).to_parquet(d / "documents.parquet", index=False)
    return str(d)


def test_split_empty_is_code_point_identical_across_engines(spark):
    """The raw primitive both engines build on: per-code-point split of the
    ASCII-translate-folded text must agree EXACTLY — including astral-plane
    emoji (surrogate pairs must not be split) and 'İ' (must survive the
    ASCII fold untouched, dodging the Java full-case-mapping expansion)."""
    upper = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    sdf = spark.createDataFrame(
        [(t,) for t in NON_ASCII_TEXTS], ["text"])
    spark_chars = [
        r.cs for r in sdf.select(
            F.split(F.translate(F.col("text"), upper, upper.lower()),
                    "").alias("cs")).collect()]
    con = duckdb.connect()
    duck_chars = [
        con.execute(
            "SELECT string_split(translate(?, ?, ?), '')",
            [t, upper, upper.lower()]).fetchone()[0]
        for t in NON_ASCII_TEXTS]
    for t, s_cs, d_cs in zip(NON_ASCII_TEXTS, spark_chars, duck_chars):
        # Spark's split('') yields leading/trailing '' fragments the query
        # filters out; DuckDB does not emit them
        s_cs = [c for c in s_cs if c != ""]
        assert s_cs == d_cs, f"code-point split diverged on {t!r}"
    # astral-plane sanity: the emoji survived both splits whole
    assert "😀" in spark_chars[0] and "😀" in duck_chars[0]


def test_char_entropy_parity_on_non_ascii_corpus(spark, nonascii_sf_dir):
    """End-to-end char_entropy on the non-ASCII corpus: Spark result ==
    DuckDB oracle result, row for row (the exact driver-gate comparison,
    run on text the gate's ASCII testdata can never exercise)."""
    sdf = q_char_entropy(spark, nonascii_sf_dir).toPandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{nonascii_sf_dir}/documents.parquet'")
    odf = con.execute(ORACLE_CHAR_ENTROPY).df()
    assert len(sdf) == len(odf) == 6
    assert sorted(sdf.columns) == sorted(odf.columns)
    sdf = sdf.sort_values("source").reset_index(drop=True)
    odf = odf.sort_values("source").reset_index(drop=True)
    for col in sdf.columns:
        for a, b in zip(sdf[col], odf[col]):
            assert a == b, (col, a, b)


def test_arrow_entropy_matches_column_fold(spark, sf_dir):
    """The r10 Arrow-histogram rewrite's equivalence pin: per-document h
    from the Counter/sorted-char fold matches the r5 sorted-run Column
    fold to ≤1e-12 (measured ≤3.6e-15 at all SFs — the only divergence
    source is math.log2 vs the JVM log at ≤1 ulp), while the nearest
    decision boundary (the h < 3.5 cut and every round(·,4) edge) is
    ≥1e-6 away — so the FINAL query rows are exactly equal, which is
    asserted too."""
    import math
    from collections import Counter

    import pyspark.sql.functions as F

    from social_media_sentiment_analysis_spark.queries.llmdata import (
        q_char_entropy,
    )
    from social_media_sentiment_analysis_spark.sources.batch import (
        load_table,
    )

    upper = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    docs = load_table(spark, sf_dir, "documents")
    # the r5 Column form, reconstructed
    arr = F.array_sort(F.filter(
        F.split(F.translate(F.col("text"), upper, upper.lower()), ""),
        lambda c: c != ""))
    wa = docs.select("doc_id", arr.alias("arr"),
                     F.size(arr).alias("n")).filter(F.col("n") >= 1)
    starts = F.filter(
        F.sequence(F.lit(1), F.col("n")),
        lambda i: (i == 1) | (F.element_at("arr", i)
                              != F.element_at("arr", i - 1)))
    col_h = {r.doc_id: r.h for r in (
        wa.withColumn("starts", starts)
        .withColumn("ends", F.array_append(
            F.slice("starts", 2, F.greatest(F.size("starts") - 1,
                                            F.lit(0))),
            F.col("n") + 1))
        .withColumn("s", F.aggregate(
            F.zip_with("starts", "ends",
                       lambda a, b: (b - a).cast("double")
                       * F.log2((b - a).cast("double"))),
            F.lit(0.0), lambda acc, x: acc + x))
        .select("doc_id", (F.log2("n") - F.col("s") / F.col("n"))
                .alias("h"))).collect()}
    # the r10 python form, per doc
    tbl = str.maketrans(upper, upper.lower())
    for r in docs.select("doc_id", "text").collect():
        t = (r.text or "").translate(tbl)
        n = len(t)
        if n < 1:
            assert r.doc_id not in col_h
            continue
        counts = Counter(t)
        acc = 0.0
        for ch in sorted(counts):
            acc = acc + counts[ch] * math.log2(counts[ch])
        h = math.log2(n) - acc / n
        assert abs(h - col_h[r.doc_id]) <= 1e-12, r.doc_id
        assert abs(h - 3.5) >= 1e-6, r.doc_id
    # final rows exactly equal to the Column-form rollup
    col_scored = (
        docs.select("source", arr.alias("arr"), F.size(arr).alias("n"))
        .filter(F.col("n") >= 1)
        .withColumn("starts", starts)
        .withColumn("ends", F.array_append(
            F.slice("starts", 2, F.greatest(F.size("starts") - 1,
                                            F.lit(0))),
            F.col("n") + 1))
        .withColumn("s", F.aggregate(
            F.zip_with("starts", "ends",
                       lambda a, b: (b - a).cast("double")
                       * F.log2((b - a).cast("double"))),
            F.lit(0.0), lambda acc, x: acc + x))
        .select("source", (F.log2("n") - F.col("s") / F.col("n"))
                .alias("h")))
    col_rows = [tuple(x) for x in (
        col_scored.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.round(F.avg("h"), 4).alias("avg_entropy"),
             F.round(F.min("h"), 4).alias("min_entropy"),
             F.round(F.max("h"), 4).alias("max_entropy"),
             F.sum(F.when(F.col("h") < 3.5, 1).otherwise(0))
             .cast("bigint").alias("low_entropy_docs"))
        .orderBy("source")).collect()]
    new_rows = [tuple(x) for x in q_char_entropy(spark, sf_dir).collect()]
    assert new_rows == col_rows
