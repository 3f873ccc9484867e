"""Custom stateful streaming — SURVEY.md §2.10 T6.

Running per-key counters via ``applyInPandasWithState``: arbitrary
user state (count, sum, last-seen) maintained per user_id across
micro-batches. State lives in the executor state store; the operator
shuffles each micro-batch by key once.
"""

from __future__ import annotations

import datetime
from collections.abc import Iterator

import pandas as pd

from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

COUNTER_OUTPUT_SCHEMA = (
    "user_id BIGINT, n_events BIGINT, total_value DOUBLE, last_event_id BIGINT"
)
COUNTER_STATE_SCHEMA = "n BIGINT, total DOUBLE, last_id BIGINT"


def _update_counters(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        n, total, last_id = state.get
    else:
        n, total, last_id = 0, 0.0, -1
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            last_id = int(pdf.loc[pdf["ts"].idxmax(), "event_id"])
    state.update((n, total, last_id))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [total],
            "last_event_id": [last_id],
        }
    )


def running_user_counters(stream):
    """Per-user running (count, sum, latest-event) emitted every
    micro-batch — the T6 stateful pattern. Output mode: update."""
    return stream.groupBy("user_id").applyInPandasWithState(
        _update_counters,
        outputStructType=COUNTER_OUTPUT_SCHEMA,
        stateStructType=COUNTER_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Oracle-exact variant: same T6 state machinery, but the float total is
# accumulated as the SAME scaled integer functions/exact.dsum uses
# (floor(x*1e6+0.5), IEEE-identical in NumPy/Spark/DuckDB), so the
# emitted total is bit-identical to the batch oracle whatever the
# batch/partition split. last_event_id is dropped: "latest" needs a
# (ts, event_id) tiebreak the demo above doesn't carry in state.
# ---------------------------------------------------------------------------

TOTALS_OUTPUT_SCHEMA = "user_id BIGINT, n_events BIGINT, total_value DOUBLE"
TOTALS_STATE_SCHEMA = "n BIGINT, total_scaled BIGINT"


def _update_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    import numpy as np

    if state.exists:
        n, total_scaled = state.get
    else:
        n, total_scaled = 0, 0
    for pdf in pdfs:
        n += len(pdf)
        total_scaled += int(
            np.floor(pdf["value"].to_numpy(dtype=np.float64) * 1e6 + 0.5)
            .astype(np.int64)
            .sum()
        )
    state.update((n, total_scaled))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [total_scaled / 1e6],
        }
    )


def running_user_totals(stream):
    """T6 with an exact accumulator — the driver-facing form."""
    return stream.groupBy("user_id").applyInPandasWithState(
        _update_totals,
        outputStructType=TOTALS_OUTPUT_SCHEMA,
        stateStructType=TOTALS_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Spark 4 native stateful API: transformWithStateInPandas. Same running
# counters as above, but with typed per-key state handles (ValueState)
# managed by the StatefulProcessor lifecycle — the forward path for
# custom operators (timers, multiple state variables, TTL) that
# applyInPandasWithState's single-tuple state can't express.
# Requires the RocksDB state store provider.
# ---------------------------------------------------------------------------

from pyspark.sql.streaming.stateful_processor import (  # noqa: E402
    StatefulProcessor,
    StatefulProcessorHandle,
)


class RunningCounterProcessor(StatefulProcessor):
    """ValueState-backed per-user running (count, sum, latest event)."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState(
            "counters", "n BIGINT, total DOUBLE, last_id BIGINT"
        )

    def handleInputRows(self, key, rows, timerValues):
        if self._state.exists():
            n, total, last_id = self._state.get()
        else:
            n, total, last_id = 0, 0.0, -1
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
            if len(pdf):
                last_id = int(pdf.loc[pdf["ts"].idxmax(), "event_id"])
        self._state.update((n, total, last_id))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [total],
                "last_event_id": [last_id],
            }
        )

    def close(self) -> None:
        pass


def running_user_counters_tws(stream):
    """T6 via the Spark 4 transformWithState API (update mode)."""
    return stream.groupBy("user_id").transformWithStateInPandas(
        RunningCounterProcessor(),
        outputStructType=COUNTER_OUTPUT_SCHEMA,
        outputMode="update",
        timeMode="none",
    )


# ---------------------------------------------------------------------------
# T6 with EVENT-TIME TIMEOUTS: custom sessionization where the state
# machine — not a built-in window — decides when a session closes.
# Each key accumulates (n, start, end); after every batch the timeout
# is re-armed to end + gap. When the watermark passes that stamp,
# Spark calls the function with state.hasTimedOut=True and NO input
# rows; the session is emitted and its state removed. State per key
# is three scalars — bounded by active keys inside the gap horizon,
# the property that keeps 100 TB/day sessionization in memory.
# ---------------------------------------------------------------------------

SESSION_OUTPUT_SCHEMA = (
    "user_id BIGINT, n_events BIGINT, session_start TIMESTAMP, "
    "session_end TIMESTAMP"
)
SESSION_STATE_SCHEMA = "n BIGINT, start TIMESTAMP, end TIMESTAMP"


def make_session_updater(gap_seconds: int):
    import datetime as dt

    gap = dt.timedelta(seconds=gap_seconds)

    def _emit_frame(key, sessions):
        return pd.DataFrame(
            {
                "user_id": pd.Series([key[0]] * len(sessions), dtype="int64"),
                "n_events": pd.Series([n for n, _, _ in sessions], dtype="int64"),
                "session_start": pd.Series(
                    [a for _, a, _ in sessions], dtype="datetime64[us]"
                ),
                "session_end": pd.Series(
                    [b for _, _, b in sessions], dtype="datetime64[us]"
                ),
            }
        )

    def _update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            n, start, end = state.get
            state.remove()
            yield _emit_frame(key, [(n, start, end)])
            return
        ts_all = []
        for pdf in pdfs:
            ts_all.extend(t.to_pydatetime() for t in pdf["ts"])
        ts_all.sort()
        if state.exists:
            n, start, end = state.get
        else:
            n, start, end = 0, None, None
        closed = []
        for t in ts_all:
            if end is None:
                n, start, end = 1, t, t
            elif t - end <= gap:
                n, end = n + 1, t
            else:
                closed.append((n, start, end))
                n, start, end = 1, t, t
        if n:
            state.update((n, start, end))
            # The tz-naive session timestamps are wall-clock values in
            # the pinned session timezone (UTC). A bare .timestamp()
            # would interpret them in the OS-local zone — correct only
            # on UTC hosts — so make the epoch conversion explicit.
            deadline = (end + gap).replace(tzinfo=datetime.timezone.utc)
            state.setTimeoutTimestamp(int(deadline.timestamp() * 1000))
        yield _emit_frame(key, closed)

    return _update


def timeout_sessions(stream, gap_seconds: int = 1800, watermark: str = "1 second"):
    """Sessions that CLOSE via event-time timeout — emitted only when
    the watermark proves no more events can join them (append-style
    finality from an update-mode stateful op)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            make_session_updater(gap_seconds),
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
