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
  ``maxOffsetsPerTrigger`` analog);
- offsets are replayable cursors, so restart/replay semantics come from the
  checkpoint — the reference instead relied on Kafka group auto-commit and
  could double-poll after a crash;
- the TRANSPORT is pluggable behind ``PollTransport``:
  * ``FilePollTransport`` (default, option path=...): reads a JSONL fixture
    of raw tweet objects — deterministic, replayable by line position.
  * ``HttpPollTransport`` (option transport=http): the live HTTP GET with
    the reference's 429 handling (twitter_producer.py:94-111 — read
    ``x-rate-limit-reset``, sleep until reset + 60 s, retry once).
    Import-gated on ``requests``; cursor is the max seen tweet id
    (``since_id`` incremental polling).
  The poll source is inherently non-partitioned (one REST endpoint), which
  is exactly what the simple-reader API models; Spark repartitions
  downstream as needed.

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
SEARCH_URL = "https://api.twitter.com/2/tweets/search/recent"
RATE_LIMIT_SLACK_S = 60  # twitter_producer.py:100: wait until reset + 60


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


class PollTransport:
    """One poll per micro-batch: cursor -> (raw envelope/tweet dicts, cursor).

    Cursors must be JSON-serializable (they ride in checkpointed offsets).
    ``poll`` MUST return an unchanged cursor when there is nothing new — the
    reader turns that into an unchanged offset so idle triggers don't grow
    the offset log.
    """

    def initial_cursor(self):
        raise NotImplementedError

    def poll(self, cursor, max_results: int) -> tuple[list[dict], object]:
        raise NotImplementedError

    def replay(self, start_cursor, end_cursor) -> list[dict]:
        """Deterministic re-read of a committed range, used only for
        crash-recovery replay of a batch that was read but never committed
        (normal operation replays from the simple-reader's prefetch cache).
        """
        raise NotImplementedError


class FilePollTransport(PollTransport):
    """Fixture transport: a JSONL file of raw tweet objects (the shape
    Twitter's API returns in ``data``), cursor = line position."""

    def __init__(self, path: str) -> None:
        self.path = path

    def _lines(self) -> list[str]:
        with open(self.path) as f:
            return [ln for ln in f if ln.strip()]

    def initial_cursor(self) -> int:
        return 0

    def poll(self, cursor: int, max_results: int):
        lines = self._lines()
        hi = min(cursor + max_results, len(lines))
        return [json.loads(ln) for ln in lines[cursor:hi]], hi

    def replay(self, start_cursor: int, end_cursor: int) -> list[dict]:
        lines = self._lines()
        return [json.loads(ln) for ln in lines[start_cursor:end_cursor]]


class HttpPollTransport(PollTransport):
    """Live transport: GET /2/tweets/search/recent with incremental
    ``since_id`` polling and the reference's 429 backoff
    (twitter_producer.py:51-128).

    ``get`` / ``sleep`` / ``now`` are injectable for tests (and because a
    live deployment may route through its own session); ``get`` defaults to
    ``requests.get`` resolved lazily so the module imports without the
    package installed.

    REPLAY CONTRACT: with ``spool_dir`` set (option ``spool_dir=...``),
    every committed poll's RAW page set is spooled to disk (atomic rename,
    keyed by the (start, end] cursor range), and ``replay`` serves the
    spooled bytes — byte-identical crash recovery, safe to feed the
    content-addressed shard sink; ``replay_exact`` reports True. Without a
    spool dir, replay falls back to re-polling the LIVE API over
    (since_id=start, until_id=end+1] (following pagination like ``poll``),
    which is best-effort, not byte-identical — tweets deleted since the
    original read vanish, and tweets whose ids landed in (start, end]
    after the original read appear. Exactly-once downstream of an
    unspooled transport must therefore key on tweet id (the upsert/
    anti-join sinks do), NOT on content hashes.
    ``TweetPollStreamReader`` surfaces the contract as
    ``transport_replay_exact``.

    OVERFLOW DRAIN: the recent-search endpoint returns the newest page
    first. Advancing ``since_id`` to the max seen id after ONE page would
    permanently skip anything older than the page boundary whenever more
    than ``max_results`` tweets arrived between polls (the reference shares
    this gap, twitter_producer.py:67). ``poll`` therefore follows the
    API's ``meta.next_token`` pagination within one poll, up to
    ``max_pages`` pages, so the committed cursor only moves past ids that
    were actually read. If the drain still truncates (more than
    max_pages·max_results arrivals in one interval), the remainder is
    skipped and a warning is logged — bounded loss instead of silent loss,
    and the bound is operator-tunable.

    FIRST POLL (``cursor is None``): returns only the MOST RECENT page and
    does NOT follow ``next_token`` — pagination exists to drain overflow
    *between* incremental polls, not to walk the 7-day search history on
    startup (an up-to-5x first-batch volume surprise). Backfill depth is
    the operator's call: seed the checkpoint with an explicit ``since_id``
    cursor, or raise ``max_results``.
    """

    def __init__(self, bearer_token: str, query: str,
                 get=None, sleep=None, now=None, max_pages: int = 5,
                 spool_dir: str | None = None, spool_keep: int = 64) -> None:
        if get is None:
            import requests  # import-gated: not installed in all sandboxes

            get = requests.get
        if sleep is None:
            import time

            sleep = time.sleep
        if now is None:
            import time as _t

            now = _t.time
        self._get, self._sleep, self._now = get, sleep, now
        self.bearer_token = bearer_token
        self.query = query
        self.max_pages = max(1, int(max_pages))
        self.spool_dir = spool_dir
        self.spool_keep = max(1, int(spool_keep))
        # see REPLAY CONTRACT in class docstring; replay_exact flips to
        # False (and replay_fallbacks counts) if a spooled range is ever
        # missing at replay time and the live fallback had to serve it
        self.replay_exact = spool_dir is not None
        self.replay_fallbacks = 0
        if spool_dir is not None:
            import os

            os.makedirs(spool_dir, exist_ok=True)

    def _headers(self) -> dict:
        return {
            "Authorization": f"Bearer {self.bearer_token}",
            "Content-Type": "application/json",
        }

    def _request(self, params: dict):
        """GET with one 429 backoff-retry, mirroring
        twitter_producer.py:94-111: wait until x-rate-limit-reset + 60 s."""
        resp = self._get(SEARCH_URL, headers=self._headers(), params=params)
        if resp.status_code == 429:
            reset = resp.headers.get("x-rate-limit-reset")
            if reset:
                wait = int(reset) - int(self._now()) + RATE_LIMIT_SLACK_S
                if wait > 0:
                    self._sleep(wait)
            resp = self._get(SEARCH_URL, headers=self._headers(),
                             params=params)
        resp.raise_for_status()
        return resp.json()

    def _params(self, max_results: int) -> dict:
        return {
            "query": self.query,
            "max_results": min(max_results, API_MAX_RESULTS),
            "tweet.fields": "id,text,created_at,author_id,public_metrics,lang",
            "expansions": "author_id",
            "user.fields": "id,name,username,public_metrics",
        }

    def initial_cursor(self):
        return None  # no since_id: first poll returns the most recent page

    def _paged(self, base_params: dict, max_pages: int,
               warn_context: str) -> tuple[list[dict], object]:
        """Follow meta.next_token up to ``max_pages`` pages; returns the
        enveloped objects (newest page first, API order within pages) and
        the max tweet id seen (None when empty)."""
        objs: list[dict] = []
        max_id = None
        next_token = None
        for _ in range(max_pages):
            params = dict(base_params)
            if next_token:
                params["next_token"] = next_token
            body = self._request(params) or {}
            tweets = body.get("data") or []
            users = (body.get("includes") or {}).get("users") or []
            objs.extend({"data": t, "includes": {"users": users}}
                        for t in tweets)
            if tweets:
                page_max = max(int(t["id"]) for t in tweets)
                max_id = page_max if max_id is None else max(max_id, page_max)
            next_token = (body.get("meta") or {}).get("next_token")
            if not next_token:
                break
        # warn_context=None: pagination is INTENTIONALLY off (first poll
        # reads one page by design — see FIRST POLL), so a next_token is
        # expected whenever the 7-day history is non-empty, not a drain
        # truncation worth warning about (r5 advice).
        if next_token and warn_context is not None:
            import logging

            logging.getLogger(__name__).warning(
                "tweet-poll: %s truncated after %d pages; "
                "tweets older than the drained window are skipped — raise "
                "max_pages or shorten the trigger interval",
                warn_context, max_pages)
        return objs, max_id

    def _spool_path(self, start_cursor, end_cursor) -> str:
        import os

        return os.path.join(
            self.spool_dir,
            f"poll_{start_cursor if start_cursor else 'none'}"
            f"_{end_cursor}.json")

    def _spool_write(self, start_cursor, end_cursor,
                     objs: list[dict]) -> None:
        """Atomically persist the committed range's RAW pages (write to a
        temp name, rename into place — a crash mid-write leaves no partial
        spool), then GC all but the newest ``spool_keep`` spools (bounded
        disk; replay only ever needs uncommitted-tail ranges)."""
        import os

        path = self._spool_path(start_cursor, end_cursor)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(objs, f)
        os.replace(tmp, path)
        spools = sorted(
            (p for p in os.listdir(self.spool_dir)
             if p.startswith("poll_") and p.endswith(".json")),
            key=lambda p: os.path.getmtime(os.path.join(self.spool_dir, p)))
        for stale in spools[:-self.spool_keep]:
            try:
                os.remove(os.path.join(self.spool_dir, stale))
            except OSError:
                pass

    def poll(self, cursor, max_results: int):
        params = self._params(max_results)
        if cursor:
            params["since_id"] = cursor
        # first poll (no cursor): single most-recent page, NO pagination —
        # see FIRST POLL in the class docstring; warn_context=None keeps
        # the (expected) leftover next_token from logging a bogus
        # "overflow drain truncated" warning on every startup
        pages = self.max_pages if cursor else 1
        objs, max_id = self._paged(
            params, pages, "overflow drain" if cursor else None)
        if not objs:
            return [], cursor  # unchanged cursor => unchanged offset
        if self.spool_dir is not None:
            self._spool_write(cursor, str(max_id), objs)
        return objs, str(max_id)

    def replay(self, start_cursor, end_cursor) -> list[dict]:
        if self.spool_dir is not None:
            import os

            path = self._spool_path(start_cursor, end_cursor)
            if os.path.exists(path):
                with open(path) as f:
                    return json.load(f)  # byte-identical committed pages
            # The spool PROMISED byte-identical replay (replay_exact was
            # True) but the committed range's file is gone — GC'd by
            # spool_keep, deleted, or cursor-key mismatch. The live
            # fallback below may return NON-identical bytes, so a
            # content-addressed consumer trusting transport_replay_exact
            # would silently violate its contract: log loudly, count the
            # degradation, and flip replay_exact so the contract flag
            # tells the truth from here on (r5 advice).
            import logging

            self.replay_fallbacks += 1
            self.replay_exact = False
            logging.getLogger(__name__).error(
                "tweet-poll: spool file missing for committed range "
                "(%s, %s] (%s) — REPLAY IS NO LONGER BYTE-IDENTICAL; "
                "falling back to live re-poll. Raise spool_keep or "
                "checkpoint-restart from a newer offset. replay_exact "
                "is now False (fallback #%d).",
                start_cursor, end_cursor, path, self.replay_fallbacks)
        # Fallback: best-effort range re-poll of (start, end] by id —
        # until_id is exclusive, so request until end+1; paginate like
        # poll() so a multi-page committed range replays fully.
        params = self._params(API_MAX_RESULTS)
        if start_cursor:
            params["since_id"] = start_cursor
        if end_cursor:
            params["until_id"] = str(int(end_cursor) + 1)
        objs, _ = self._paged(params, self.max_pages, "replay drain")
        return objs


class TweetPollStreamReader(SimpleDataSourceStreamReader):
    """One read() = one poll, capped at max_results rows per page (≤100;
    the http transport may drain up to ``max_pages`` pages on overflow).

    Replay semantics depend on the transport (``transport_replay_exact``):
    the file transport replays a committed offset range byte-identically;
    the http transport is byte-identical too when ``spool_dir`` is set
    (raw committed pages persisted to disk), else it re-polls the live API
    best-effort (deletions vanish, stragglers appear — see
    HttpPollTransport). Pipelines that require byte-identical replay (the
    content-addressed shard sink) must use a replay-exact transport or
    insert an id-keyed idempotent sink between this source and the
    content-addressed stage.
    """

    def __init__(self, options: dict) -> None:
        self.max_results = min(int(options.get("max_results", 10)),
                               API_MAX_RESULTS)
        # fixed stamp option keeps tests deterministic; live mode stamps now()
        self.fixed_ts = options.get("kafka_timestamp_ms")
        if options.get("transport", "file") == "http":
            self.transport: PollTransport = HttpPollTransport(
                bearer_token=options.get("bearer_token", ""),
                query=options.get("query", ""),
                max_pages=int(options.get("max_pages", 5)),
                spool_dir=options.get("spool_dir"),
                spool_keep=int(options.get("spool_keep", 64)))
        else:
            path = options.get("path")
            if not path:
                raise ValueError("tweet-poll file transport requires 'path'")
            self.transport = FilePollTransport(path)

    @property
    def transport_replay_exact(self) -> bool:
        return getattr(self.transport, "replay_exact", True)

    def initialOffset(self) -> dict:
        return {"cursor": self.transport.initial_cursor()}

    def _stamp(self) -> int:
        if self.fixed_ts is not None:
            return int(self.fixed_ts)
        import time

        return int(time.time() * 1000)

    def _rows(self, objs: list[dict], ts: int) -> list[tuple]:
        # materialized (not a generator): the simple-reader prefetcher
        # pickles the batch for replay between read() and commit
        out = []
        for obj in objs:
            users = (obj.get("includes") or {}).get("users") or []
            tweet = obj.get("data") or obj  # fixture may be raw or enveloped
            out.append(_envelope_tuple(tweet, users,
                                       obj.get("kafka_timestamp") or ts))
        return out

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        objs, cursor = self.transport.poll(start["cursor"], self.max_results)
        if not objs and cursor == start["cursor"]:
            # idle poll: return the START offset UNCHANGED (same ts) — a
            # re-stamped offset would make every idle trigger look like new
            # data, growing the offset log (and emitting empty downstream
            # artifacts) forever on a quiet source
            return iter([]), start
        # the poll stamp rides in the OFFSET: offsets are checkpointed, so
        # a crash-recovery replay of this batch re-reads the ORIGINAL
        # stamp instead of re-stamping with a new wall clock — without
        # this, replayed rows hash differently and every content-addressed
        # downstream (shard sink) would see them as new data
        ts = self._stamp()
        return iter(self._rows(objs, ts)), {"cursor": cursor, "ts": ts}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        # deterministic replay for recovery — the reference could not
        # replay; the stamp comes from the committed end offset (see read)
        ts = int(end.get("ts") or self._stamp())
        return self._rows(self.transport.replay(start["cursor"],
                                                end["cursor"]), ts)


class TweetPollDataSource(DataSource):
    """format("tweet-poll") — streaming-only source."""

    @classmethod
    def name(cls) -> str:
        return "tweet-poll"

    def schema(self) -> StructType:
        return TWEET_ENVELOPE_SCHEMA

    def simpleStreamReader(self, schema: StructType) -> TweetPollStreamReader:
        return TweetPollStreamReader(self.options)
