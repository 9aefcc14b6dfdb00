"""Kafka wire-format contract (S3/S4) — pinned WITHOUT a broker.

No Kafka broker exists in this sandbox, so the live produce/subscribe path
cannot run; what CAN be pinned is the serialization contract both ends
share: ``kafka_wire_columns`` (the sink's value projection) must emit the
reference producer's message shape (twitter_producer.py:130-158 — the
envelope dict json.dumps'd to utf-8), and ``parse_envelopes`` must read
those exact bytes back losslessly. If both hold, the broker in between is
a byte pipe.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from social_media_sentiment_analysis_spark.schemas import TWEET_ENVELOPE_SCHEMA
from social_media_sentiment_analysis_spark.streaming.pipeline import (
    parse_envelopes,
)
from social_media_sentiment_analysis_spark.streaming.sinks import (
    kafka_wire_columns,
)

ENVELOPE = {
    "data": {
        "id": "1750000000000000001",
        "text": "an amazing stream of events",
        "created_at": "2024-01-15T10:00:00Z",
        "author_id": "4242",
        "lang": "en",
        "public_metrics": {"retweet_count": 3, "like_count": 14,
                           "reply_count": 1, "quote_count": 0},
    },
    "includes": {"users": [{"id": "4242", "name": "Ada", "username": "ada",
                            "public_metrics": {"followers_count": 9}}]},
    "kafka_timestamp": 1705312800000,
}


def _envelope_df(spark):
    # in the producer direction the envelope enters as the reference
    # publishes it: one json.dumps'd message (kafka_diagnostic.py:70-72)
    raw = spark.createDataFrame([(json.dumps(ENVELOPE),)], "value string")
    good, rejects = parse_envelopes(raw)
    assert rejects.count() == 0
    return good


def test_producer_wire_shape_matches_reference(spark):
    """The sink's value bytes must parse back to the reference's envelope
    dict: top-level data/includes/kafka_timestamp, nested public_metrics —
    the exact shape twitter_streamer.py:141-154 consumes."""
    df = _envelope_df(spark)
    wire = df.select(*kafka_wire_columns(df, key_col=None)).collect()
    assert len(wire) == 1 and list(wire[0].asDict()) == ["value"]
    sent = json.loads(wire[0]["value"])
    assert sent["data"]["id"] == ENVELOPE["data"]["id"]
    assert sent["data"]["text"] == ENVELOPE["data"]["text"]
    assert sent["data"]["public_metrics"] == ENVELOPE["data"]["public_metrics"]
    assert sent["includes"]["users"][0]["username"] == "ada"
    assert sent["kafka_timestamp"] == ENVELOPE["kafka_timestamp"]
    assert set(sent) == {"data", "includes", "kafka_timestamp"}


def test_round_trip_is_lossless(spark):
    """produce → (broker) → consume: serializing with the sink projection
    and re-parsing with parse_envelopes must reproduce the rows exactly."""
    df = _envelope_df(spark)
    wire = df.select(*kafka_wire_columns(df, key_col=None))
    back, rejects = parse_envelopes(wire)
    assert rejects.count() == 0
    assert back.schema == TWEET_ENVELOPE_SCHEMA
    assert back.collect() == df.collect()


def test_key_column_projection(spark):
    df = _envelope_df(spark)
    row = df.select(
        *kafka_wire_columns(df, key_col="kafka_timestamp")).collect()[0]
    assert row["key"] == "1705312800000"  # string key, reference partition key
    assert json.loads(row["value"])["data"]["id"] == ENVELOPE["data"]["id"]


def test_malformed_and_idless_messages_quarantine(spark):
    """S4 fault path: junk bytes and id-less envelopes must route to the
    rejects side carrying the raw payload (twitter_streamer.py:279-281)."""
    raw = spark.createDataFrame(
        [("{not json",), (json.dumps({"data": {"text": "no id"}}),),
         (json.dumps(ENVELOPE),)], "value string")
    good, rejects = parse_envelopes(raw)
    assert good.count() == 1
    got = {r["raw"] for r in rejects.collect()}
    assert got == {"{not json", json.dumps({"data": {"text": "no id"}})}
