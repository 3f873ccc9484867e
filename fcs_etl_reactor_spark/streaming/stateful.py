"""Custom stateful streaming — SURVEY.md §2.10 T6.

Running per-key counters via ``applyInPandasWithState``: arbitrary
user state (count, sum, last-seen) maintained per user_id across
micro-batches. State lives in the executor state store; the operator
shuffles each micro-batch by key once.
"""

from __future__ import annotations

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
