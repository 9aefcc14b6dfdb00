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
    assert off["cursor"] == 7     # ts also rides in the offset (replay stamp)
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
    replay = list(r.readBetweenOffsets({"cursor": 0}, off))
    assert replay == first  # byte-identical replay, stamp included


def test_replay_is_deterministic(fixture_path):
    r = _reader(fixture_path, max_results=5)
    first, off = r.read(r.initialOffset())
    first = list(first)
    replayed = list(r.readBetweenOffsets({"cursor": 0}, off))
    assert first == replayed


def test_idle_poll_returns_start_offset_unchanged(fixture_path):
    """A drained source must return the START offset object unchanged (same
    ts, same cursor) — a re-stamped offset makes every idle trigger look
    like new data, growing the offset log forever on a quiet source."""
    r = TweetPollStreamReader({"path": fixture_path, "max_results": "100"})
    rows, off = r.read(r.initialOffset())
    assert len(list(rows)) == len(TWEETS)
    idle_rows, off2 = r.read(off)
    assert list(idle_rows) == []
    assert off2 is off or off2 == off  # byte-identical: no fresh ts
    idle_rows, off3 = r.read(off2)
    assert list(idle_rows) == [] and off3 == off


class _FakeResponse:
    def __init__(self, status_code, body=None, headers=None):
        self.status_code = status_code
        self._body = body or {}
        self.headers = headers or {}
        self.url = "fake://"

    def json(self):
        return self._body

    def raise_for_status(self):
        if self.status_code >= 400:
            raise RuntimeError(f"HTTP {self.status_code}")


def test_http_transport_429_backoff_then_retry(fixture_path):
    """S2 live path (twitter_producer.py:94-111): a 429 with
    x-rate-limit-reset must sleep until reset + 60 s and retry once,
    driven through the DataSource reader's read()."""
    from social_media_sentiment_analysis_spark.sources.poll import (
        HttpPollTransport,
    )

    body = {"data": [dict(t, id=str(1000 + i))
                     for i, t in enumerate(TWEETS[:2])],
            "includes": {"users": [{"id": "a0", "name": "n",
                                    "username": "u",
                                    "public_metrics": {}}]}}
    calls, sleeps = [], []

    def fake_get(url, headers=None, params=None):
        calls.append(params)
        if len(calls) == 1:
            return _FakeResponse(429, headers={"x-rate-limit-reset": "1100"})
        return _FakeResponse(200, body=body)

    r = TweetPollStreamReader({
        "path": fixture_path, "kafka_timestamp_ms": "1705312800000"})
    r.transport = HttpPollTransport(
        bearer_token="tok", query="q",
        get=fake_get, sleep=sleeps.append, now=lambda: 1000)
    rows, off = r.read(r.initialOffset())
    rows = list(rows)
    assert len(calls) == 2                    # 429 then retried
    assert sleeps == [1100 - 1000 + 60]       # reset - now + 60 (reference)
    assert len(rows) == 2
    assert off["cursor"] is not None
    assert calls[0]["query"] == "q"
    # incremental next poll carries since_id from the committed cursor
    r.read(off)
    assert calls[-1].get("since_id") == off["cursor"]


def test_http_transport_idle_and_since_id():
    """Empty poll keeps the cursor; non-empty polls advance it to the max
    tweet id and pass it back as since_id."""
    from social_media_sentiment_analysis_spark.sources.poll import (
        HttpPollTransport,
    )

    pages = [
        {"data": [{"id": "101", "text": "x"}, {"id": "105", "text": "y"}]},
        {"data": []},
        {"data": [{"id": "130", "text": "z"}]},
    ]
    calls = []

    def fake_get(url, headers=None, params=None):
        calls.append(dict(params))
        return _FakeResponse(200, body=pages[len(calls) - 1])

    t = HttpPollTransport("tok", "q", get=fake_get,
                          sleep=lambda s: None, now=lambda: 0)
    objs, cur = t.poll(t.initial_cursor(), 50)
    assert [o["data"]["id"] for o in objs] == ["101", "105"]
    assert cur == "105" and "since_id" not in calls[0]
    objs, cur2 = t.poll(cur, 50)
    assert objs == [] and cur2 == cur         # idle: cursor unchanged
    assert calls[1]["since_id"] == "105"
    objs, cur3 = t.poll(cur2, 50)
    assert cur3 == "130"


def test_http_transport_overflow_drain_and_truncation():
    """When more than max_results tweets arrived, poll must follow
    meta.next_token so the committed cursor only moves past ids actually
    read; when the drain hits max_pages it truncates with a warning (bounded
    loss) rather than silently skipping everything past page one."""
    from social_media_sentiment_analysis_spark.sources.poll import (
        HttpPollTransport,
    )

    pages = [
        {"data": [{"id": "300", "text": "newest"}, {"id": "299", "text": "b"}],
         "meta": {"next_token": "t1"}},
        {"data": [{"id": "298", "text": "c"}, {"id": "297", "text": "d"}]},
    ]
    calls = []

    def fake_get(url, headers=None, params=None):
        calls.append(dict(params))
        return _FakeResponse(200, body=pages[len(calls) - 1])

    t = HttpPollTransport("tok", "q", get=fake_get,
                          sleep=lambda s: None, now=lambda: 0, max_pages=5)
    objs, cur = t.poll("296", 2)
    assert [o["data"]["id"] for o in objs] == ["300", "299", "298", "297"]
    assert cur == "300"
    assert "next_token" not in calls[0] and calls[1]["next_token"] == "t1"
    assert all(c["since_id"] == "296" for c in calls)

    # truncation: max_pages=1 stops after the first page but still advances
    calls.clear()
    pages[:] = [
        {"data": [{"id": "310", "text": "x"}],
         "meta": {"next_token": "t9"}},
    ]
    t1 = HttpPollTransport("tok", "q", get=fake_get,
                           sleep=lambda s: None, now=lambda: 0, max_pages=1)
    objs, cur = t1.poll("300", 1)
    assert [o["data"]["id"] for o in objs] == ["310"] and cur == "310"
    assert len(calls) == 1


def test_http_transport_replay_contract_flag(fixture_path):
    """The reader must surface which replay contract the transport gives:
    file = exact, http = best-effort (documented weaker contract)."""
    from social_media_sentiment_analysis_spark.sources.poll import (
        HttpPollTransport,
    )

    r = TweetPollStreamReader({"path": fixture_path})
    assert r.transport_replay_exact is True
    r.transport = HttpPollTransport(
        "tok", "q", get=lambda *a, **k: None,
        sleep=lambda s: None, now=lambda: 0)
    assert r.transport_replay_exact is False


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
