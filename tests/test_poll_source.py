"""Custom poll data source (S1/S2) tests: pure-Python reader semantics
(per-poll cap, offset monotonicity, deterministic replay) plus a full
Structured Streaming integration read feeding the shared enrichment pipeline.
"""

from __future__ import annotations

import json
import uuid

import pytest

from social_media_sentiment_analysis_spark.sources.poll import (
    API_MAX_RESULTS,
    TweetPollDataSource,
    TweetPollStreamReader,
)

TWEETS = [
    {
        "id": f"t{i}",
        "text": f"tweet number {i} is fast",
        "created_at": "2024-01-15T10:00:00Z",
        "author_id": f"a{i % 3}",
        "lang": "en",
        "public_metrics": {"retweet_count": i, "like_count": 2 * i,
                           "reply_count": 0, "quote_count": 0},
    }
    for i in range(7)
]


@pytest.fixture(scope="module")
def fixture_path(tmp_path_factory):
    d = tmp_path_factory.mktemp("poll")
    p = d / "tweets.jsonl"
    with open(p, "w") as f:
        for t in TWEETS:
            f.write(json.dumps(t) + "\n")
    return str(p)


def _reader(fixture_path, **opts):
    options = {"path": fixture_path, "kafka_timestamp_ms": "1705312800000"}
    options.update({k: str(v) for k, v in opts.items()})
    return TweetPollStreamReader(options)


def test_poll_cap_and_offsets(fixture_path):
    r = _reader(fixture_path, max_results=3)
    off = r.initialOffset()
    polls = []
    for _ in range(4):
        rows, off = r.read(off)
        polls.append(list(rows))
    assert [len(p) for p in polls] == [3, 3, 1, 0]   # capped, then drained
    assert off["pos"] == 7     # ts also rides in the offset (replay stamp)
    ids = [row[0][0] for poll in polls for row in poll]
    assert ids == [t["id"] for t in TWEETS]


def test_api_result_cap(fixture_path):
    r = _reader(fixture_path, max_results=500)
    assert r.max_results == API_MAX_RESULTS  # min(max_results, 100)


def test_replay_reuses_the_offsets_stamp(fixture_path):
    """Live mode (no fixed kafka_timestamp_ms): the poll stamp is recorded
    in the committed offset, so a crash-recovery readBetweenOffsets
    replays the ORIGINAL stamp — not a fresh wall clock that would make
    replayed rows hash as new data downstream."""
    r = TweetPollStreamReader({"path": fixture_path, "max_results": "3"})
    rows, off = r.read(r.initialOffset())
    first = list(rows)
    assert "ts" in off and off["ts"] == first[0][2]  # stamped from offset ts
    replay = list(r.readBetweenOffsets({"pos": 0}, off))
    assert replay == first  # byte-identical replay, stamp included


def test_replay_is_deterministic(fixture_path):
    r = _reader(fixture_path, max_results=5)
    first, off = r.read(r.initialOffset())
    first = list(first)
    replayed = list(r.readBetweenOffsets({"pos": 0}, off))
    assert first == replayed


def test_stream_integration(spark, fixture_path):
    from social_media_sentiment_analysis_spark.streaming import (
        enrich_tweet_stream,
    )

    try:
        spark.dataSource.register(TweetPollDataSource)
    except Exception as e:  # already registered in a prior test run
        if "already" not in str(e).lower():
            raise
    stream = (
        spark.readStream.format("tweet-poll")
        .option("path", fixture_path)
        .option("max_results", 3)
        .option("kafka_timestamp_ms", "1705312800000")
        .load()
    )
    assert stream.isStreaming
    enriched = enrich_tweet_stream(stream)
    name = "poll_" + uuid.uuid4().hex[:8]
    # continuous micro-batches: each trigger = one capped poll (the source
    # does not support availableNow — it models an unbounded REST poll)
    q = (
        enriched.writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(processingTime="0 seconds").start()
    )
    import time

    deadline = time.time() + 60
    while time.time() < deadline:
        if spark.table(name).count() >= len(TWEETS):
            break
        time.sleep(0.5)
    q.stop()
    q.awaitTermination()
    out = spark.table(name).collect()
    # the 3-per-poll cap forces >= ceil(7/3) = 3 polls
    assert len(q.recentProgress) >= 3
    assert {r.tweet_id for r in out} == {t["id"] for t in TWEETS}
    assert all(r.final_sentiment == "positive" for r in out)  # 'fast' lexicon
    assert all(r.kafka_timestamp == 1705312800000 for r in out)
