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


def test_http_first_poll_single_page():
    """ADVICE r4: with no cursor, the first poll must return only the most
    recent page — next_token pagination is for draining overflow BETWEEN
    incremental polls, not walking history on startup."""
    from social_media_sentiment_analysis_spark.sources.poll import (
        HttpPollTransport,
    )

    pages = [
        {"data": [{"id": "500", "text": "newest"}],
         "meta": {"next_token": "deep-history"}},
        {"data": [{"id": "499", "text": "old"}]},
    ]
    calls = []

    def fake_get(url, headers=None, params=None):
        calls.append(dict(params))
        return _FakeResponse(200, body=pages[len(calls) - 1])

    t = HttpPollTransport("tok", "q", get=fake_get,
                          sleep=lambda s: None, now=lambda: 0, max_pages=5)
    objs, cur = t.poll(None, 50)
    assert [o["data"]["id"] for o in objs] == ["500"]
    assert cur == "500"
    assert len(calls) == 1 and "next_token" not in calls[0]


def test_http_spool_replay_byte_identical_after_crash(tmp_path):
    """VERDICT r4 #5: a >max_results burst drains multiple pages within one
    poll AND spools the raw committed range, so a crash between read() and
    commit replays the batch BYTE-IDENTICALLY from disk (a fresh transport
    instance, the live API now returning different data) — the contract the
    content-addressed shard sink needs."""
    from social_media_sentiment_analysis_spark.sources.poll import (
        HttpPollTransport,
    )

    burst = [
        {"data": [{"id": "310", "text": "n3"}, {"id": "309", "text": "n2"}],
         "meta": {"next_token": "t1"}},
        {"data": [{"id": "308", "text": "n1"}],
         "includes": {"users": [{"id": "u9", "name": "n", "username": "un",
                                 "public_metrics": {"followers_count": 3}}]}},
    ]
    calls = []

    def fake_get(url, headers=None, params=None):
        calls.append(dict(params))
        return _FakeResponse(200, body=burst[len(calls) - 1])

    spool = str(tmp_path / "spool")
    t = HttpPollTransport("tok", "q", get=fake_get, sleep=lambda s: None,
                          now=lambda: 0, max_pages=5, spool_dir=spool)
    assert t.replay_exact is True
    objs, cur = t.poll("305", 2)          # burst of 3 > max_results 2
    assert [o["data"]["id"] for o in objs] == ["310", "309", "308"]
    assert cur == "310"

    # crash: new process = new transport over the same spool dir; the live
    # API has moved on (would now 500) — replay must not even touch it
    def dead_get(url, headers=None, params=None):
        raise AssertionError("replay must serve from spool, not the API")

    t2 = HttpPollTransport("tok", "q", get=dead_get, sleep=lambda s: None,
                           now=lambda: 0, max_pages=5, spool_dir=spool)
    assert t2.replay("305", "310") == objs  # byte-identical raw envelopes


def test_http_replay_fallback_paginates_with_until_id():
    """Without a spool, replay falls back to a live (since, end] re-poll —
    and must FOLLOW pagination so a multi-page committed range replays
    fully, bounded by until_id = end + 1."""
    from social_media_sentiment_analysis_spark.sources.poll import (
        HttpPollTransport,
    )

    pages = [
        {"data": [{"id": "310", "text": "a"}, {"id": "309", "text": "b"}],
         "meta": {"next_token": "t1"}},
        {"data": [{"id": "308", "text": "c"}]},
    ]
    calls = []

    def fake_get(url, headers=None, params=None):
        calls.append(dict(params))
        return _FakeResponse(200, body=pages[len(calls) - 1])

    t = HttpPollTransport("tok", "q", get=fake_get,
                          sleep=lambda s: None, now=lambda: 0, max_pages=5)
    objs = t.replay("305", "310")
    assert [o["data"]["id"] for o in objs] == ["310", "309", "308"]
    assert len(calls) == 2
    assert all(c["since_id"] == "305" for c in calls)
    assert all(c["until_id"] == "311" for c in calls)  # end+1, exclusive
    assert calls[1]["next_token"] == "t1"


def test_http_spool_gc_keeps_newest(tmp_path):
    """The spool is bounded: only the newest spool_keep committed ranges
    survive (replay only ever needs the uncommitted tail)."""
    import os

    from social_media_sentiment_analysis_spark.sources.poll import (
        HttpPollTransport,
    )

    seq = {"n": 100}

    def fake_get(url, headers=None, params=None):
        seq["n"] += 1
        return _FakeResponse(200, body={
            "data": [{"id": str(seq["n"]), "text": "x"}]})

    spool = str(tmp_path / "spool")
    t = HttpPollTransport("tok", "q", get=fake_get, sleep=lambda s: None,
                          now=lambda: 0, spool_dir=spool, spool_keep=2)
    cur = None
    for _ in range(5):
        _, cur = t.poll(cur, 10)
    files = [p for p in os.listdir(spool) if p.endswith(".json")]
    assert len(files) == 2
    assert "poll_104_105.json" in files  # the newest range survives


def test_reader_replays_spooled_batch_after_crash(tmp_path):
    """End-to-end through the READER: a burst batch read but not committed
    is replayed by readBetweenOffsets byte-identically from the spool, with
    the ORIGINAL offset timestamp (content-addressed sinks see the same
    rows), on a fresh reader instance whose transport can't reach the API."""
    from social_media_sentiment_analysis_spark.sources.poll import (
        HttpPollTransport,
    )

    burst = [
        {"data": [{"id": "310", "text": "n3"}, {"id": "309", "text": "n2"}],
         "meta": {"next_token": "t1"}},
        {"data": [{"id": "308", "text": "n1"}]},
    ]
    calls = []

    def fake_get(url, headers=None, params=None):
        calls.append(dict(params))
        return _FakeResponse(200, body=burst[len(calls) - 1])

    spool = str(tmp_path / "spool")
    r = TweetPollStreamReader({"path": "unused-will-replace",
                               "kafka_timestamp_ms": "1705312800000"})
    r.transport = HttpPollTransport(
        "tok", "q", get=fake_get, sleep=lambda s: None, now=lambda: 0,
        max_pages=5, spool_dir=spool)
    assert r.transport_replay_exact is True
    start = {"cursor": "305"}
    rows, end = r.read(start)
    rows = list(rows)
    assert len(rows) == 3 and end["cursor"] == "310"

    # crash before commit: new reader process, API unreachable
    r2 = TweetPollStreamReader({"path": "unused-will-replace",
                                "kafka_timestamp_ms": "1705312800000"})
    r2.transport = HttpPollTransport(
        "tok", "q",
        get=lambda *a, **k: (_ for _ in ()).throw(AssertionError("no API")),
        sleep=lambda s: None, now=lambda: 0, max_pages=5, spool_dir=spool)
    replayed = list(r2.readBetweenOffsets(start, end))
    assert replayed == rows  # byte-identical rows, original stamp


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


def test_spool_miss_degrades_contract_loudly(tmp_path, caplog):
    """ADVICE r5: spool_dir set but the committed range's spool file is
    GONE (GC'd / deleted / key mismatch). The live fallback may serve
    non-identical bytes, so the transport must (a) log at ERROR, (b) count
    the degradation, and (c) flip replay_exact to False — a downstream
    content-addressed sink trusting transport_replay_exact gets a signal
    instead of a silent contract violation."""
    import logging

    from social_media_sentiment_analysis_spark.sources.poll import (
        HttpPollTransport,
    )

    def fake_get(url, headers=None, params=None):
        return _FakeResponse(200, body={
            "data": [{"id": "308", "text": "re-polled"}]})

    spool = str(tmp_path / "spool")  # created empty: no spooled ranges
    t = HttpPollTransport("tok", "q", get=fake_get, sleep=lambda s: None,
                          now=lambda: 0, spool_dir=spool)
    assert t.replay_exact is True
    with caplog.at_level(logging.ERROR,
                         logger="social_media_sentiment_analysis_spark.sources.poll"):
        objs = t.replay("305", "310")
    assert [o["data"]["id"] for o in objs] == ["308"]  # live fallback ran
    assert t.replay_exact is False          # contract flag tells the truth
    assert t.replay_fallbacks == 1
    assert any("NO LONGER BYTE-IDENTICAL" in r.getMessage()
               for r in caplog.records)

    # a spool HIT must not degrade anything: poll+replay the same range
    caplog.clear()
    objs2, cur = t.poll("308", 10)
    assert t.replay("308", cur) == objs2
    assert t.replay_fallbacks == 1          # unchanged


def test_first_poll_does_not_warn_about_overflow(caplog):
    """ADVICE r5: the first poll (cursor=None) reads ONE page by design —
    any non-empty 7-day history returns a next_token, so warning
    'overflow drain truncated' there is spurious (and its advice wrong).
    The warning must still fire for a REAL truncated incremental drain."""
    import logging

    from social_media_sentiment_analysis_spark.sources.poll import (
        HttpPollTransport,
    )

    def endless_get(url, headers=None, params=None):
        return _FakeResponse(200, body={
            "data": [{"id": "310", "text": "x"}],
            "meta": {"next_token": "more"}})

    logger = "social_media_sentiment_analysis_spark.sources.poll"
    t = HttpPollTransport("tok", "q", get=endless_get, sleep=lambda s: None,
                          now=lambda: 0, max_pages=2)
    with caplog.at_level(logging.WARNING, logger=logger):
        t.poll(None, 10)                    # first poll: silent by design
    assert not caplog.records
    with caplog.at_level(logging.WARNING, logger=logger):
        t.poll("300", 10)                   # incremental overflow: warn
    assert any("truncated" in r.getMessage() for r in caplog.records)
