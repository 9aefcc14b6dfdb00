"""Semi-structured (VARIANT) queries — Spark 4's open-schema JSON path.

A training-data pipeline's rawest inputs are JSON with drifting schemas
(API envelopes, crawler metadata, tool logs). The classic ``from_json``
path (streaming/pipeline.py) needs a schema up front and silently nulls
anything that drifts; Spark 4's VARIANT type instead parses ONCE into a
binary-encoded open document (``parse_json``) and defers typing to read
time (``variant_get`` / ``try_variant_get`` with JSON paths), which is the
scale-correct trade: the corpus is written once in a shredding-friendly
binary encoding, and schema drift never forces a reprocess.

The test JSON is SYNTHESIZED deterministically from the documents table
with plain string concatenation (only enum-ish fields — no free text, so
no escaping ambiguity), built by the IDENTICAL expression in Spark and in
the DuckDB oracle; drift is injected on purpose (an object field present
on every 3rd doc, a `score` that is sometimes a number and sometimes a
string) so the queries exercise exactly the heterogeneity VARIANT exists
for. Values compared by the gate are the EXTRACTED plain columns —
engine-portable even though the variant encodings differ.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.batch import load_table


def _json_col() -> F.Column:
    """Deterministic heterogeneous JSON per document (Spark side).

    {"id":N,"lang":"xx","chars":N[,"meta":{"src":"..."}],"score":N|"high",
     "tags":["<source>","<lang>"]}
    """
    meta = F.when(
        F.col("doc_id") % 3 == 0,
        F.concat(F.lit(',"meta":{"src":"'), F.col("source"), F.lit('"}')),
    ).otherwise(F.lit(""))
    score = F.when(F.col("doc_id") % 5 == 0, F.lit('"high"')) \
        .otherwise((F.col("doc_id") % 7).cast("string"))
    return F.concat(
        F.lit('{"id":'), F.col("doc_id").cast("string"),
        F.lit(',"lang":"'), F.col("lang"),
        F.lit('","chars":'), F.col("n_chars").cast("string"),
        meta,
        F.lit(',"score":'), score,
        F.lit(',"tags":["'), F.col("source"), F.lit('","'), F.col("lang"),
        F.lit('"]}'),
    )


# The same synthesis in DuckDB dialect — identical byte-for-byte output.
_SQL_JSON = """
    '{"id":' || CAST(doc_id AS VARCHAR)
    || ',"lang":"' || lang
    || '","chars":' || CAST(n_chars AS VARCHAR)
    || CASE WHEN doc_id % 3 = 0
            THEN ',"meta":{"src":"' || source || '"}' ELSE '' END
    || ',"score":' || CASE WHEN doc_id % 5 = 0 THEN '"high"'
                           ELSE CAST(doc_id % 7 AS VARCHAR) END
    || ',"tags":["' || source || '","' || lang || '"]}'
"""


def variant_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents + a parsed VARIANT column ``v`` (the open-schema record a
    raw-ingest pipeline would persist)."""
    return (
        load_table(spark, sf_dir, "documents")
        .withColumn("v", F.parse_json(_json_col()))
    )


def q_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed path extraction over drifting shapes: per language, how many
    records carry the optional meta object, and the numeric-score stats
    where `score` happens to be a number (``try_variant_get`` absorbs the
    string-typed ones as NULL instead of failing the scan — the VARIANT
    way to survive type drift). One scan, one aggregate."""
    docs = variant_docs(spark, sf_dir)
    return (
        docs.select(
            F.variant_get("v", "$.lang", "string").alias("lang"),
            F.variant_get("v", "$.chars", "long").alias("chars"),
            F.try_variant_get("v", "$.meta.src", "string").alias("src"),
            F.try_variant_get("v", "$.score", "long").alias("score_num"),
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count("src").alias("with_meta"),
            F.count("score_num").alias("numeric_scores"),
            F.sum("score_num").alias("score_sum"),
            F.sum("chars").alias("total_chars"),
        )
        .orderBy("lang")
    )


ORACLE_VARIANT_EXTRACT = f"""
WITH j AS (
    SELECT {_SQL_JSON} AS doc FROM documents
), x AS (
    SELECT json_extract_string(doc, '$.lang') AS lang,
           CAST(json_extract(doc, '$.chars') AS BIGINT) AS chars,
           json_extract_string(doc, '$.meta.src') AS src,
           TRY_CAST(json_extract_string(doc, '$.score') AS BIGINT)
               AS score_num
    FROM j
)
SELECT lang,
       COUNT(*) AS n_docs,
       COUNT(src) AS with_meta,
       COUNT(score_num) AS numeric_scores,
       CAST(SUM(score_num) AS BIGINT) AS score_sum,
       CAST(SUM(chars) AS BIGINT) AS total_chars
FROM x
GROUP BY lang
ORDER BY lang
"""


def q_variant_shred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array shredding: LATERAL ``variant_explode`` of the `tags` array
    into (tag, position) rows, rolled up to tag frequencies — the
    open-schema twin of the relational explode (no array schema declared
    anywhere). The explode is map-side (Generate over the scan); the only
    exchange is the final rollup."""
    docs = variant_docs(spark, sf_dir)
    docs.createOrReplaceTempView("__variant_docs")
    return spark.sql("""
        SELECT cast(value AS string) AS tag,
               pos,
               count(*) AS n_docs,
               count(DISTINCT variant_get(v, '$.lang', 'string')) AS n_langs
        FROM __variant_docs,
        LATERAL variant_explode(variant_get(v, '$.tags')) AS t(pos, key, value)
        GROUP BY tag, pos
        ORDER BY tag, pos
    """)


ORACLE_VARIANT_SHRED = f"""
WITH j AS (
    SELECT {_SQL_JSON} AS doc FROM documents
), tags AS (
    SELECT json_extract_string(doc, '$.tags[0]') AS tag, 0 AS pos,
           json_extract_string(doc, '$.lang') AS lang FROM j
    UNION ALL
    SELECT json_extract_string(doc, '$.tags[1]') AS tag, 1 AS pos,
           json_extract_string(doc, '$.lang') AS lang FROM j
)
SELECT tag, pos, COUNT(*) AS n_docs, COUNT(DISTINCT lang) AS n_langs
FROM tags
GROUP BY tag, pos
ORDER BY tag, pos
"""


def q_schema_drift_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shape census over the open-schema corpus: which optional fields are
    present and what type `score` took, counted per shape — the audit a
    pipeline runs BEFORE declaring a schema for shredding. Uses only
    portable predicates (presence + type probes), not engine-specific
    schema strings."""
    docs = variant_docs(spark, sf_dir)
    has_meta = F.try_variant_get("v", "$.meta.src", "string").isNotNull()
    score_is_num = F.try_variant_get("v", "$.score", "long").isNotNull()
    return (
        docs.select(
            has_meta.alias("has_meta"),
            score_is_num.alias("score_is_number"),
        )
        .groupBy("has_meta", "score_is_number")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("has_meta", "score_is_number")
    )


ORACLE_SCHEMA_DRIFT_AUDIT = f"""
WITH j AS (
    SELECT {_SQL_JSON} AS doc FROM documents
), x AS (
    SELECT json_extract_string(doc, '$.meta.src') IS NOT NULL AS has_meta,
           TRY_CAST(json_extract_string(doc, '$.score') AS BIGINT)
               IS NOT NULL AS score_is_number
    FROM j
)
SELECT has_meta, score_is_number, COUNT(*) AS n_docs
FROM x
GROUP BY has_meta, score_is_number
ORDER BY has_meta, score_is_number
"""
