"""Streaming observability (A4): the reference's processed-counter /
log-every-10 loop (twitter_streamer.py:240, :253, :273-277) as a
``StreamingQueryListener`` — metrics come from the engine's progress events
instead of hand-maintained counters, so they stay correct under retries,
replays and parallelism.
"""

from __future__ import annotations

from pyspark.sql.streaming import StreamingQueryListener


class ProgressCounter(StreamingQueryListener):
    """Accumulates processed-row totals per query and invokes ``on_every``
    each time another ``log_every`` rows (default 10 — the reference's
    cadence) have been processed."""

    def __init__(self, log_every: int = 10, on_every=None) -> None:
        self.log_every = log_every
        self.on_every = on_every or (lambda total: None)
        self.totals: dict[str, int] = {}
        self._next_mark: dict[str, int] = {}

    def onQueryStarted(self, event) -> None:
        self.totals.setdefault(str(event.id), 0)

    def onQueryProgress(self, event) -> None:
        qid = str(event.progress.id)
        self.totals[qid] = self.totals.get(qid, 0) + event.progress.numInputRows
        mark = self._next_mark.get(qid, self.log_every)
        while self.totals[qid] >= mark:
            self.on_every(self.totals[qid])
            mark += self.log_every
        self._next_mark[qid] = mark

    def onQueryIdle(self, event) -> None:
        pass

    def onQueryTerminated(self, event) -> None:
        pass

    def total(self) -> int:
        return sum(self.totals.values())
