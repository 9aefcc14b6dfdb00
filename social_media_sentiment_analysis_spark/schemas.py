"""Explicit StructType schemas for every dataflow boundary.

The reference is schema-on-read (``.get()`` with defaults on raw dicts,
twitter_streamer.py:141-154) on the stream side and fixed DDL on the store
side (sentiment_analysis.py:87-216). Here every boundary gets an explicit
schema so ``from_json`` can parse permissively (missing -> null, normalized
to defaults downstream) and sinks have stable, documented shapes.

Type mapping (SURVEY §1.2): TEXT->String, INTEGER->Long, REAL->Double,
ISO-string timestamps -> TimestampType, epoch-millis -> Long.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# ---------------------------------------------------------------------------
# Stream-side: raw Kafka tweet envelope
# (built at twitter_producer.py:184-188; kafka_timestamp stamped at :139;
#  consumed at twitter_streamer.py:55, fields read at :141-154)
# ---------------------------------------------------------------------------

PUBLIC_METRICS_SCHEMA = StructType([
    StructField("retweet_count", LongType()),
    StructField("like_count", LongType()),
    StructField("reply_count", LongType()),
    StructField("quote_count", LongType()),
])

TWEET_DATA_SCHEMA = StructType([
    StructField("id", StringType()),
    StructField("text", StringType()),
    StructField("created_at", StringType()),      # ISO-8601; normalized later
    StructField("author_id", StringType()),
    StructField("lang", StringType()),
    StructField("public_metrics", PUBLIC_METRICS_SCHEMA),
])

USER_SCHEMA = StructType([
    StructField("id", StringType()),
    StructField("name", StringType()),
    StructField("username", StringType()),
    StructField("public_metrics", MapType(StringType(), LongType())),
])

TWEET_ENVELOPE_SCHEMA = StructType([
    StructField("data", TWEET_DATA_SCHEMA),
    StructField("includes", StructType([
        StructField("users", ArrayType(USER_SCHEMA)),
    ])),
    StructField("kafka_timestamp", LongType()),   # epoch millis
])

# ---------------------------------------------------------------------------
# Enriched record (18 fields, twitter_streamer.py:167-186) — the JSONL sink
# row and the /store payload.
# ---------------------------------------------------------------------------

ENRICHED_TWEET_SCHEMA = StructType([
    StructField("tweet_id", StringType(), nullable=False),
    StructField("tweet_text", StringType()),
    StructField("cleaned_text", StringType()),
    StructField("created_at", TimestampType()),   # event time (normalized)
    StructField("author_id", StringType()),
    StructField("language", StringType()),
    StructField("retweet_count", LongType()),
    StructField("like_count", LongType()),
    StructField("reply_count", LongType()),
    StructField("quote_count", LongType()),
    StructField("sentiment", StringType()),
    StructField("sentiment_confidence", DoubleType()),
    StructField("sentiment_compound", DoubleType()),
    StructField("sentiment_positive", DoubleType()),
    StructField("sentiment_negative", DoubleType()),
    StructField("sentiment_neutral", DoubleType()),
    StructField("kafka_timestamp", LongType()),
    StructField("processed_timestamp", LongType()),
])

# ---------------------------------------------------------------------------
# Store-side: `tweets` table (25 cols, sentiment_analysis.py:157-193) with the
# reference's *intended* semantics (each model's label in its own column,
# vader_neutral present — the shipped INSERT was bugged, SURVEY §2.1 S6).
# ---------------------------------------------------------------------------

TWEETS_TABLE_SCHEMA = StructType([
    StructField("tweet_id", StringType(), nullable=False),   # UNIQUE key
    StructField("tweet_text", StringType(), nullable=False),
    StructField("cleaned_text", StringType()),
    StructField("created_at", TimestampType()),
    StructField("author_id", StringType()),
    StructField("language", StringType()),
    StructField("retweet_count", LongType()),
    StructField("like_count", LongType()),
    StructField("reply_count", LongType()),
    StructField("quote_count", LongType()),
    StructField("vader_sentiment", StringType()),
    StructField("vader_compound", DoubleType()),
    StructField("vader_positive", DoubleType()),
    StructField("vader_negative", DoubleType()),
    StructField("vader_neutral", DoubleType()),
    StructField("textblob_sentiment", StringType()),
    StructField("textblob_polarity", DoubleType()),
    StructField("textblob_subjectivity", DoubleType()),
    StructField("final_sentiment", StringType()),
    StructField("confidence_score", DoubleType()),
    StructField("processed_at", TimestampType()),
    StructField("kafka_timestamp", LongType()),
])

# `sentiment_summary` hourly rollup (sentiment_analysis.py:136-149 — declared
# in the reference but never populated; we implement it, SURVEY §2.4 A3).
SENTIMENT_SUMMARY_SCHEMA = StructType([
    StructField("date_hour", TimestampType()),
    StructField("sentiment", StringType()),
    StructField("tweet_count", LongType()),
    StructField("avg_confidence", DoubleType()),
    StructField("total_likes", LongType()),
    StructField("total_retweets", LongType()),
])

# ---------------------------------------------------------------------------
# Multimodal: opaque payload column + typed metadata (engine extension).
# ---------------------------------------------------------------------------

MEDIA_SCHEMA = StructType([
    StructField("media_id", StringType(), nullable=False),
    StructField("modality", StringType()),        # image | audio | video
    StructField("payload", BinaryType()),          # opaque encoded bytes
    StructField("mime_type", StringType()),
    StructField("width", LongType()),
    StructField("height", LongType()),
    StructField("duration_ms", LongType()),
    StructField("sample_rate", LongType()),
])

# Driver testdata tables (TESTDATA.md).
TESTDATA_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)
