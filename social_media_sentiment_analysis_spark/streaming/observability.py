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


def observed(df, name: str, *metrics):
    """Attach named inline metrics to a batch plan via ``Observation`` —
    row counts / sums computed DURING the action, no second pass over the
    data (the production alternative to calling ``.count()`` again for
    monitoring). Returns (df, observation); read ``observation.get`` after
    an action completes.

    Default metrics: row count. Pass extra aggregate Columns to track
    e.g. null counts or value sums alongside.
    """
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    obs = Observation(name)
    cols = list(metrics) or []
    return df.observe(obs, F.count(F.lit(1)).alias("rows"), *cols), obs


class StateMetricsRecorder(StreamingQueryListener):
    """Per-batch state-store metrics from progress events — the
    bounded-state soak surface (r6 verdict #7): a watermarked stateful
    query on a long processingTime schedule must show ``numRowsRemoved``
    firing (watermark GC is real, not just configured) and
    ``numRowsTotal`` plateauing; monotone growth here is the canonical
    leaked-state bug that only appears under multi-trigger schedules,
    never in single-drain availableNow tests.

    Records one dict per progress event: batch id, the engine watermark,
    and per-operator rows total/updated/removed. Read ``records`` after
    the query stops (listener delivery is async — poll briefly)."""

    def __init__(self) -> None:
        self.records: list[dict] = []

    def onQueryStarted(self, event) -> None:
        pass

    def onQueryProgress(self, event) -> None:
        p = event.progress
        try:
            watermark = (p.eventTime or {}).get("watermark")
        except Exception:
            watermark = None
        ops = []
        for so in (p.stateOperators or []):
            ops.append({
                "operator": so.operatorName,
                "numRowsTotal": so.numRowsTotal,
                "numRowsUpdated": so.numRowsUpdated,
                "numRowsRemoved": so.numRowsRemoved,
            })
        self.records.append({
            "batchId": p.batchId,
            "numInputRows": p.numInputRows,
            "watermark": watermark,
            "state": ops,
        })

    def onQueryIdle(self, event) -> None:
        pass

    def onQueryTerminated(self, event) -> None:
        pass
