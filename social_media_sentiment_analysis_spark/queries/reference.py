"""Queries mirroring the reference's serving surface (SURVEY §2/§3.3).

Each builder takes (spark, sf_dir) and returns a lazy DataFrame; its DuckDB
oracle twin lives beside it. The ``documents`` testdata table stands in for
the tweet stream (text + language), ``events`` for the processing-time
stream; engagement counts are deterministic functions of doc_id since the
synthetic tables carry none.

Scale notes: every query here is a single declarative plan — scan (with
pushed filters / pruned columns) → codegen'd projection → hash aggregate /
top-k. Nothing shuffles more than once, and sorts after aggregation operate
on grouped (small) data. ``orderBy(...).limit(n)`` plans as
TakeOrderedAndProject — a true distributed top-k, not a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import sql_decimal_sum, sql_round_half_up
from ..functions.sentiment import sentiment_enrich
from ..sources.batch import load_table
from .sqlgen import ENRICHED_DOCS_CTE


def _sql_exact_avg(col: str, digits: int = 4) -> str:
    """Order-independent mean of a double column, engine-exact rounding."""
    return sql_round_half_up(f"{sql_decimal_sum(col)} / COUNT(*)", digits)


def _enrich_docs_relation(docs: DataFrame) -> DataFrame:
    """Shared batch/stream projection: rename, synthesize engagement
    counts, run the full clean→score→ensemble pipeline (stateless Column
    algebra — identical on a batch scan and a file stream)."""
    docs = (
        docs
        .withColumnRenamed("text", "tweet_text")
        .withColumnRenamed("lang", "language")
        .withColumn("like_count", F.col("doc_id") % 100)
        .withColumn("retweet_count", (F.col("doc_id") * 7) % 50)
    )
    return sentiment_enrich(docs, text_col="tweet_text")


def enriched_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's `tweets` relation: documents cleaned, scored, labeled
    (U4/U6 composite) with deterministic synthetic engagement counts."""
    return _enrich_docs_relation(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# A1+A2: sentiment summary (GET /summary, sentiment_analysis.py:450-519)
# ---------------------------------------------------------------------------

def _summary_aggs() -> list:
    """Shared batch/streaming aggregate list for the sentiment summary.
    avg_confidence is decimal_sum/count + engine-exact rounding rather than
    round(avg(),4): double accumulation order differs between batch partials
    and micro-batch partials, and an order-INDEPENDENT exact sum is the only
    form one DuckDB oracle can pin for both."""
    from ..functions.rounding import decimal_sum, round_half_up

    n = F.count(F.lit(1))
    return [
        n.alias("tweet_count"),
        round_half_up(decimal_sum(F.col("confidence_score")) / n, 4)
        .alias("avg_confidence"),
        F.sum("like_count").alias("total_likes"),
        F.sum("retweet_count").alias("total_retweets"),
    ]


def q_sentiment_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        enriched_documents(spark, sf_dir)
        .groupBy("final_sentiment")
        .agg(*_summary_aggs())
        .orderBy(F.desc("tweet_count"), F.asc("final_sentiment"))
    )


ORACLE_SENTIMENT_SUMMARY = ENRICHED_DOCS_CTE + f"""
SELECT final_sentiment,
       COUNT(*) AS tweet_count,
       {_sql_exact_avg('confidence_score')} AS avg_confidence,
       CAST(SUM(like_count) AS BIGINT) AS total_likes,
       CAST(SUM(retweet_count) AS BIGINT) AS total_retweets
FROM enriched
GROUP BY final_sentiment
ORDER BY tweet_count DESC, final_sentiment ASC
"""


def q_sentiment_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 grand total — in the reference this is an app-side sum over the
    summary (sentiment_analysis.py:628); here a global aggregate."""
    from ..functions.rounding import decimal_sum, round_half_up

    n = F.count(F.lit(1))
    return enriched_documents(spark, sf_dir).agg(
        n.alias("total_tweets"),
        round_half_up(decimal_sum(F.col("confidence_score")) / n, 4)
        .alias("avg_confidence"),
    )


ORACLE_SENTIMENT_TOTAL = ENRICHED_DOCS_CTE + f"""
SELECT COUNT(*) AS total_tweets,
       {_sql_exact_avg('confidence_score')} AS avg_confidence
FROM enriched
"""


# ---------------------------------------------------------------------------
# U4/U6: full enriched projection (POST /analyze surface + S8 export shape)
# ---------------------------------------------------------------------------

_ENRICHED_COLS = [
    "doc_id", "tweet_text", "cleaned_text", "language",
    "like_count", "retweet_count",
    "vader_sentiment", "vader_compound", "vader_positive", "vader_negative",
    "vader_neutral", "textblob_sentiment", "textblob_polarity",
    "textblob_subjectivity", "final_sentiment", "confidence_score",
]


def q_sentiment_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    return enriched_documents(spark, sf_dir).select(*_ENRICHED_COLS)


ORACLE_SENTIMENT_ENRICH = ENRICHED_DOCS_CTE + f"""
SELECT {', '.join(_ENRICHED_COLS)}
FROM enriched
"""


# ---------------------------------------------------------------------------
# O1 (+P4): recent-N top-k (GET /tweets, sentiment_analysis.py:521-573)
# documents carry no timestamp; recency key = doc_id (monotone insert order).
# ---------------------------------------------------------------------------

def q_recent_tweets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        enriched_documents(spark, sf_dir)
        .select("doc_id", "cleaned_text", "final_sentiment", "confidence_score")
        .orderBy(F.desc("doc_id"))
        .limit(50)
    )


ORACLE_RECENT_TWEETS = ENRICHED_DOCS_CTE + """
SELECT doc_id, cleaned_text, final_sentiment, confidence_score
FROM enriched
ORDER BY doc_id DESC
LIMIT 50
"""


def q_recent_negative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1 with the P4 sentiment-equality filter (?sentiment=negative)."""
    return (
        enriched_documents(spark, sf_dir)
        .filter(F.col("final_sentiment") == "negative")
        .select("doc_id", "cleaned_text", "final_sentiment", "confidence_score")
        .orderBy(F.desc("doc_id"))
        .limit(20)
    )


ORACLE_RECENT_NEGATIVE = ENRICHED_DOCS_CTE + """
SELECT doc_id, cleaned_text, final_sentiment, confidence_score
FROM enriched
WHERE final_sentiment = 'negative'
ORDER BY doc_id DESC
LIMIT 20
"""


# ---------------------------------------------------------------------------
# P2/P3: language + empty-text filters (twitter_streamer.py:159-161)
# ---------------------------------------------------------------------------

def q_lang_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        enriched_documents(spark, sf_dir)
        .filter((F.col("language") == "en") & (F.trim(F.col("cleaned_text")) != ""))
        .select("doc_id", "language", "cleaned_text", "final_sentiment")
    )


ORACLE_LANG_FILTER = ENRICHED_DOCS_CTE + """
SELECT doc_id, language, cleaned_text, final_sentiment
FROM enriched
WHERE language = 'en' AND trim(cleaned_text) <> ''
"""


# ---------------------------------------------------------------------------
# P5: trailing-time-window predicate (INTERVAL 'N hours'), on the events
# stream table. Anchored to max(ts) in-data (now() would be nondeterministic).
# ---------------------------------------------------------------------------

def q_trailing_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    anchor = events.agg(F.max("ts").alias("max_ts"))
    return (
        events.join(F.broadcast(anchor))
        .filter(F.col("ts") >= F.col("max_ts") - F.expr("INTERVAL 24 HOURS"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .orderBy(F.desc("event_count"), F.asc("event_type"))
    )


ORACLE_TRAILING_WINDOW = """
SELECT event_type,
       COUNT(*) AS event_count,
       round(SUM(value), 4) AS total_value
FROM events
WHERE ts >= (SELECT max(ts) FROM events) - INTERVAL 24 HOUR
GROUP BY event_type
ORDER BY event_count DESC, event_type ASC
"""


# ---------------------------------------------------------------------------
# A3: hourly rollup (sentiment_summary table the reference declared but never
# populated — batch date_trunc form; streaming twin in streaming/pipeline.py)
# ---------------------------------------------------------------------------

def q_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # avg over doubles is accumulation-order-dependent, so the mean is
    # derived from an ORDER-INDEPENDENT decimal sum and rounded with the
    # engine-exact floor idiom (functions/rounding.py) — round(avg(),4)
    # was observed to differ in the last digit at sf0.1
    from ..functions.rounding import decimal_sum, round_half_up

    n = F.count(F.lit(1))
    return (
        load_table(spark, sf_dir, "events")
        .groupBy(
            F.date_trunc("hour", F.col("ts")).alias("date_hour"),
            F.col("event_type"),
        )
        .agg(
            n.alias("event_count"),
            round_half_up(decimal_sum(F.col("value")) / n, 4)
            .alias("avg_value"),
        )
        .orderBy("date_hour", "event_type")
    )


ORACLE_HOURLY_ROLLUP = f"""
SELECT date_trunc('hour', ts) AS date_hour,
       event_type,
       COUNT(*) AS event_count,
       {_sql_exact_avg('value')} AS avg_value
FROM events
GROUP BY date_trunc('hour', ts), event_type
ORDER BY date_hour, event_type
"""


# ---------------------------------------------------------------------------
# O3/S8: export — time-filtered full projection, sorted (GET /export)
# ---------------------------------------------------------------------------

def q_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    anchor = events.agg(F.max("ts").alias("max_ts"))
    return (
        events.join(F.broadcast(anchor))
        .filter(F.col("ts") >= F.col("max_ts") - F.expr("INTERVAL 72 HOURS"))
        .select("event_id", "ts", "user_id", "event_type", "value")
        .orderBy(F.desc("ts"), F.desc("event_id"))
    )


ORACLE_EXPORT = """
SELECT event_id, ts, user_id, event_type, value
FROM events
WHERE ts >= (SELECT max(ts) FROM events) - INTERVAL 72 HOUR
ORDER BY ts DESC, event_id DESC
"""


def q_streaming_sentiment_summary(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """The flagship query computed by STRUCTURED STREAMING and verified by
    the SAME DuckDB oracle as the batch form: the documents table consumed
    as a micro-batched file stream, pushed through the identical
    clean→score→ensemble Column pipeline (``_enrich_docs_relation`` —
    stateless, so batch and stream share the code path verbatim),
    aggregated in complete mode, drained with availableNow, final table
    returned. This is the reference's whole architecture (SURVEY §3.2-3.3:
    Kafka loop → per-tweet RPC scoring → SQL summary endpoint) restated as
    one streaming plan whose output is provably identical to the batch
    plan on the same input."""
    from ..sources.batch import load_table_stream
    from ..streaming.pipeline import drain_stream_to_df

    stream = _enrich_docs_relation(
        load_table_stream(spark, sf_dir, "documents"))
    summary = stream.groupBy("final_sentiment").agg(*_summary_aggs())
    return drain_stream_to_df(summary, "stream_summary") \
        .orderBy(F.desc("tweet_count"), F.asc("final_sentiment"))


def q_sentiment_enrich_relational(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """The enrichment projection computed by the PURE-JVM relational plan
    (explode → broadcast lexicon join → re-aggregate → join back) instead
    of the default Arrow-UDF path. Shares ORACLE_SENTIMENT_ENRICH with
    q_sentiment_enrich — one oracle pinning two independent Spark plans."""
    from ..functions.sentiment import sentiment_enrich_relational

    docs = (
        load_table(spark, sf_dir, "documents")
        .withColumnRenamed("text", "tweet_text")
        .withColumnRenamed("lang", "language")
        .withColumn("like_count", F.col("doc_id") % 100)
        .withColumn("retweet_count", (F.col("doc_id") * 7) % 50)
    )
    return sentiment_enrich_relational(
        docs, spark, text_col="tweet_text").select(*_ENRICHED_COLS)
