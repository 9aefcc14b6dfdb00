"""Custom stateful streaming operator: event-time sessionization via
``applyInPandasWithState``.

The batch twin (operators/temporal.py::session_rollup) uses the built-in
session_window; the streaming form needs explicit state because a session
closes only when the *watermark* passes last_event + gap — a condition no
built-in aggregation expresses per arbitrary rollup. This is the pattern
the engine uses for any custom stateful operator:

- group state is a tiny fixed-width tuple (epoch-ms longs + counters),
  bounded per key — no unbounded growth;
- event-time timeouts tie state GC to the watermark (late data beyond the
  watermark is dropped by Spark before it reaches the operator);
- within-batch session splits are emitted immediately; only the tail
  session per key waits in state for its timeout.

Arrow moves each group's rows as pandas batches, so the Python hop is
per-group-per-batch, not per-row.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

OUTPUT_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events bigint, total_value double"
)
# (session_start_ms, last_event_ms, n_events, total_value)
STATE_SCHEMA = "start long, last long, n long, total double"

_MS = 1_000_000  # pandas datetime64[ns] → ms divisor is 1e6


def streaming_sessionize(events: DataFrame, gap_minutes: int = 30,
                         key_col: str = "user_id", ts_col: str = "ts",
                         value_col: str = "value") -> DataFrame:
    """Watermarked per-key sessions: emits (key, start, end=last+gap, count,
    value sum) when the watermark passes the session's close. Input must
    already carry a watermark on ``ts_col``."""
    gap_ms = gap_minutes * 60 * 1000

    def _emit(key: tuple, st: tuple) -> "pd.DataFrame":
        import pandas as pd

        start, last, n, total = st
        return pd.DataFrame({
            "user_id": [key[0]],
            "session_start": [pd.Timestamp(start, unit="ms")],
            "session_end": [pd.Timestamp(last + gap_ms, unit="ms")],
            "n_events": [n],
            "total_value": [total],
        })

    def sessionize(key: tuple, pdfs: Iterator["pd.DataFrame"],
                   state: GroupState) -> Iterator["pd.DataFrame"]:
        if state.hasTimedOut:
            st = state.get
            state.remove()
            yield _emit(key, st)
            return
        cur = state.get if state.exists else None
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col)
            ts_ms = (pdf[ts_col].astype("int64") // _MS).tolist()
            vals = pdf[value_col].tolist()
            for t, v in zip(ts_ms, vals):
                if cur is None:
                    cur = (t, t, 1, float(v))
                elif t - cur[1] > gap_ms:
                    yield _emit(key, cur)     # within-batch session split
                    cur = (t, t, 1, float(v))
                else:
                    cur = (cur[0], max(cur[1], t), cur[2] + 1,
                           cur[3] + float(v))
        if cur is not None:
            close = cur[1] + gap_ms
            # applyInPandasWithState does NOT filter late input rows (unlike
            # built-in aggregations): a batch of late events can build a
            # session that is already closeable — emit it now rather than
            # registering a timeout behind the watermark (which throws)
            if close <= state.getCurrentWatermarkMs():
                if state.exists:
                    state.remove()
                yield _emit(key, cur)
            else:
                state.update(cur)
                # close when the watermark passes last + gap
                state.setTimeoutTimestamp(close)

    return (
        events.groupBy(key_col)
        .applyInPandasWithState(
            sessionize,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


# ---------------------------------------------------------------------------
# transformWithStateInPandas (state API v2): per-key running engagement
# totals with TTL-bounded state.
# ---------------------------------------------------------------------------

RUNNING_OUTPUT_SCHEMA = (
    "user_id bigint, n_events bigint, total_value double"
)


def _build_running_totals_processor():
    """Processor factory (deferred import: the v2 API needs the RocksDB
    state store, so plain imports of this module must not require it).

    State: one ValueState row per user — (n_events, total_value) — with a
    TTL so idle keys expire instead of accumulating forever (the state-v2
    replacement for hand-rolled timeout bookkeeping; the reference's
    analogue was wholesale-clearing a 10k-entry set,
    twitter_producer.py:202-205). Emits the updated running totals for
    every key seen in the micro-batch.
    """
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    class RunningTotalsProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            schema = StructType([
                StructField("n", LongType(), True),
                StructField("total", DoubleType(), True),
            ])
            self._state = handle.getValueState(
                "totals", schema, ttlDurationMs=24 * 3600 * 1000)

        def handleInputRows(self, key, rows, timerValues):
            n, total = 0, 0.0
            if self._state.exists():
                n, total = self._state.get()
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._state.update((n, total))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n],
                 "total_value": [round(total, 4)]})

        def close(self) -> None:
            pass

    return RunningTotalsProcessor()


def running_totals_stream(events: DataFrame) -> DataFrame:
    """Per-user running (n_events, total_value) via the state API v2.

    Requires the RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass=...RocksDBStateStoreProvider``
    on the writeStream conf) — the provider that makes huge keyspaces
    viable at scale (incremental checkpointing, off-heap, changelog).
    """
    return (
        events.groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=_build_running_totals_processor(),
            outputStructType=RUNNING_OUTPUT_SCHEMA,
            outputMode="append",
            timeMode="processingTime",
        )
    )
