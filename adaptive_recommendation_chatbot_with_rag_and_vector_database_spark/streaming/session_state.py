"""Keyed session state (SURVEY §2.9 T1) — the streaming restatement of
the reference's session store (/root/reference/AI.py:155-161 get-or-create,
AI.py:23-24,168,182 append, AI.py:29-30,232-235 clear).

State machine, per key (``user_id`` plays the session id):

- events are processed in ``event_id`` (arrival) order;
- ``signup`` is the **clear tombstone**: it resets the message buffer
  (``n_since_clear`` → 0) and bumps ``n_clears`` — the streaming twin of
  ``SimpleChatMessageHistory.clear``;
- every other event type appends (``n_since_clear`` += 1);
- ``total_events`` / ``last_ts`` track the full history.

The SAME pure replay loop backs both execution modes:

- **batch twin** (oracle-checkable): ``groupBy(user_id).applyInPandas`` —
  one Arrow batch per key, replayed in order;
- **streaming**: ``groupBy(user_id).applyInPandasWithState`` — identical
  replay seeded from the persisted ``GroupState``, so a key whose events
  arrive across many micro-batches converges to the same answer as the
  batch twin (asserted in tests/test_streaming.py).

Scale note: state is O(1) per key (four counters), never the message
list itself — at 100 TB / billions of sessions the state store stays
small; the full history remains addressable via the batch A6 query
(``q_session_history``).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame

OUTPUT_SCHEMA = (
    "user_id bigint, total_events bigint, n_clears bigint, "
    "n_since_clear bigint, last_ts timestamp"
)
# last_ts persisted as int64 microseconds: primitive state columns only.
STATE_SCHEMA = (
    "total_events bigint, n_clears bigint, n_since_clear bigint, last_ts_us bigint"
)

CLEAR_EVENT = "signup"

_US = 1_000_000


def _replay(
    pdf: pd.DataFrame,
    total: int = 0,
    clears: int = 0,
    since: int = 0,
    last_us: int | None = None,
) -> tuple[int, int, int, int | None]:
    """Replay one key's events (arrival order) over carried-in state.

    Vectorized but exactly the per-event machine: every event increments
    ``total``; a clear event increments ``clears`` and resets ``since``;
    any other event increments ``since``. Post-batch ``since`` is
    therefore the event count after the batch's last clear (all
    non-clear by construction), or carried ``since`` plus the batch size
    when the batch holds no clear."""
    n = len(pdf)
    if n == 0:
        return total, clears, since, last_us
    pdf = pdf.sort_values("event_id")
    ts_us = pdf["ts"].astype("int64") // 1000  # ns → µs (truncating, as DuckDB)
    is_clear = (pdf["event_type"] == CLEAR_EVENT).to_numpy()
    n_clear = int(is_clear.sum())
    total += n
    clears += n_clear
    if n_clear:
        import numpy as np

        since = n - int(np.flatnonzero(is_clear)[-1]) - 1
    else:
        since += n
    batch_max = int(ts_us.max())
    last_us = batch_max if last_us is None else max(last_us, batch_max)
    return total, clears, since, last_us


def _row(user_id: Any, total: int, clears: int, since: int, last_us: int | None):
    return pd.DataFrame(
        {
            "user_id": [user_id],
            "total_events": [total],
            "n_clears": [clears],
            "n_since_clear": [since],
            "last_ts": [pd.Timestamp(last_us * 1000) if last_us is not None else None],
        }
    )


def replay_sessions_batch(events: DataFrame) -> DataFrame:
    """Batch twin: full replay per key via grouped-map pandas (D3)."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        total, clears, since, last_us = _replay(pdf)
        return _row(pdf["user_id"].iloc[0], total, clears, since, last_us)

    return (
        events.select("user_id", "event_id", "event_type", "ts")
        .groupBy("user_id")
        .applyInPandas(fn, OUTPUT_SCHEMA)
    )


def replay_sessions_streaming(events_stream: DataFrame) -> DataFrame:
    """Streaming path: same replay, state carried across micro-batches."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            total, clears, since, last_us = state.get
        else:
            total, clears, since, last_us = 0, 0, 0, None
        for pdf in pdfs:
            total, clears, since, last_us = _replay(pdf, total, clears, since, last_us)
        state.update((total, clears, since, last_us))
        yield _row(key[0], total, clears, since, last_us)

    return (
        events_stream.select("user_id", "event_id", "event_type", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn, OUTPUT_SCHEMA, STATE_SCHEMA, "update", GroupStateTimeout.NoTimeout
        )
    )


def replay_sessions_tws(events_stream: DataFrame) -> DataFrame:
    """Streaming path on the Spark 4.x arbitrary-state API
    (``transformWithStateInPandas`` + typed ``ValueState``) — the
    successor to ``applyInPandasWithState`` with composable named state,
    TTL, and timers. Same ``_replay`` machine, so all THREE execution
    forms (batch grouped-map, GroupState, TWS ValueState) converge to
    identical answers (asserted in tests/test_streaming.py).

    At scale TWS is the preferred form: named state objects are stored
    per-key in RocksDB with changelog checkpointing, and schema
    evolution of the state is supported — operational requirements for
    month-long 100 TB streaming jobs that the legacy GroupState tuple
    cannot meet.

    Runtime dependency: the TWS state protocol speaks protobuf between
    the JVM and the Python driver worker — running this path requires
    the ``protobuf`` package (absent in the test container, where the
    equality test skips and the GroupState twin pins the semantics).

    **Ships unexercised**: as of round 4 this function has never been
    EXECUTED in this environment (``pip install`` is disallowed and
    protobuf is not baked in, re-verified 2026-08-14), only
    imported/compiled. The ``_replay`` core it wraps IS exercised —
    batch grouped-map and GroupState forms are equality-tested and
    driver-hash-verified — so the residual risk is confined to the TWS
    handle wiring. Run ``tests/test_streaming.py`` (the one skipped
    test) once in any protobuf-capable environment before relying on
    this path in production."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _SessionProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("session", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            if self._state.exists():
                total, clears, since, last_us = tuple(self._state.get())
            else:
                total, clears, since, last_us = 0, 0, 0, None
            for pdf in rows:
                total, clears, since, last_us = _replay(
                    pdf, total, clears, since, last_us
                )
            self._state.update((total, clears, since, last_us))
            yield _row(key[0], total, clears, since, last_us)

        def close(self) -> None:
            pass

    return (
        events_stream.select("user_id", "event_id", "event_type", "ts")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=_SessionProcessor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
