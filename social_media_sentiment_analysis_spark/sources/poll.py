"""Custom Python streaming data source: the reference's Twitter
recent-search *poll* source (S1/S2) as a PySpark 4 ``DataSource``.

Reference shape (twitter_producer.py:51-128, :160-224): every POLL_INTERVAL
seconds, GET /2/tweets/search/recent with ``max_results`` capped at 100,
envelope each tweet as {"data": ..., "includes": {"users": [...]},
"kafka_timestamp": epoch_ms}, dedup, publish. Rate limiting (S2,
:94-111) bounds how much each poll may pull.

Here the poll loop becomes a ``SimpleDataSourceStreamReader``:

- one ``read(start)`` call per micro-batch = one poll; each poll returns at
  most ``max_results`` envelopes (the reference's per-poll cap — the
  ``maxOffsetsPerTrigger`` analog, and the principled form of S2's
  rate-limit sleep);
- offsets are replayable cursors ({"pos": N}), so restart/replay semantics
  come from the checkpoint — the reference instead relied on Kafka group
  auto-commit and could double-poll after a crash;
- the transport is pluggable: tests point ``path`` at a JSONL fixture of
  raw tweet objects (the shape Twitter's API returns in ``data``); a live
  deployment would swap the line-reader for the HTTP GET. The poll source is
  inherently non-partitioned (one REST endpoint), which is exactly what the
  simple-reader API models; Spark repartitions downstream as needed.

Register with ``spark.dataSource.register(TweetPollDataSource)`` then
``spark.readStream.format("tweet-poll").option("path", fixture).load()``.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader
from pyspark.sql.types import StructType

from ..schemas import TWEET_ENVELOPE_SCHEMA

API_MAX_RESULTS = 100  # twitter_producer.py:67: min(max_results, 100)


def _user_tuple(u: dict) -> tuple:
    return (u.get("id"), u.get("name"), u.get("username"),
            u.get("public_metrics"))


def _envelope_tuple(tweet: dict, users: list[dict], polled_at_ms: int) -> tuple:
    """Build one TWEET_ENVELOPE_SCHEMA row from a raw API tweet object —
    the envelope assembly of twitter_producer.py:184-188 with the
    kafka_timestamp stamp of :139."""
    pm = tweet.get("public_metrics") or {}
    data = (
        tweet.get("id"),
        tweet.get("text"),
        tweet.get("created_at"),
        tweet.get("author_id"),
        tweet.get("lang"),
        (pm.get("retweet_count"), pm.get("like_count"),
         pm.get("reply_count"), pm.get("quote_count")),
    )
    includes = ([_user_tuple(u) for u in users],)
    return (data, includes, polled_at_ms)


class TweetPollStreamReader(SimpleDataSourceStreamReader):
    """One read() = one poll, capped at max_results rows (≤100)."""

    def __init__(self, options: dict) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("tweet-poll source requires option 'path'")
        self.max_results = min(int(options.get("max_results", 10)),
                               API_MAX_RESULTS)
        # fixed stamp option keeps tests deterministic; live mode stamps now()
        self.fixed_ts = options.get("kafka_timestamp_ms")

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def _lines(self) -> list[str]:
        with open(self.path) as f:
            return [ln for ln in f if ln.strip()]

    def _stamp(self) -> int:
        if self.fixed_ts is not None:
            return int(self.fixed_ts)
        import time

        return int(time.time() * 1000)

    def _rows(self, lines: list[str], ts: int) -> list[tuple]:
        # materialized (not a generator): the simple-reader prefetcher
        # pickles the batch for replay between read() and commit
        out = []
        for ln in lines:
            obj = json.loads(ln)
            users = (obj.get("includes") or {}).get("users") or []
            tweet = obj.get("data") or obj  # fixture may be raw or enveloped
            out.append(_envelope_tuple(tweet, users,
                                       obj.get("kafka_timestamp") or ts))
        return out

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        lines = self._lines()
        lo = start["pos"]
        hi = min(lo + self.max_results, len(lines))  # per-poll cap (S1/S2)
        # the poll stamp rides in the OFFSET: offsets are checkpointed, so
        # a crash-recovery replay of this batch re-reads the ORIGINAL
        # stamp instead of re-stamping with a new wall clock — without
        # this, replayed rows hash differently and every content-addressed
        # downstream (shard sink) would see them as new data
        ts = self._stamp()
        return iter(self._rows(lines[lo:hi], ts)), {"pos": hi, "ts": ts}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        # deterministic replay for recovery — the reference could not
        # replay; the stamp comes from the committed end offset (see read)
        lines = self._lines()
        ts = int(end.get("ts") or self._stamp())
        return self._rows(lines[start["pos"]:end["pos"]], ts)


class TweetPollDataSource(DataSource):
    """format("tweet-poll") — streaming-only source."""

    @classmethod
    def name(cls) -> str:
        return "tweet-poll"

    def schema(self) -> StructType:
        return TWEET_ENVELOPE_SCHEMA

    def simpleStreamReader(self, schema: StructType) -> TweetPollStreamReader:
        return TweetPollStreamReader(self.options)
