"""Arbitrary stateful streaming operator (SURVEY.md §2 B54).

Per-key cursor semantics beyond what watermarks express — the streaming
generalization of the reference's etl_cursor (ref main.py:239-243): for
each key, track the running high-watermark and event count across
micro-batches with ``applyInPandasWithState``.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, max_event_id long"
STATE_SCHEMA = "n_events long, max_event_id long"


def _track_cursor(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, max_id = state.get if state.exists else (0, -1)
    for pdf in pdfs:
        n += len(pdf)
        if len(pdf):
            max_id = max(max_id, int(pdf["event_id"].max()))
    state.update((n, max_id))
    yield pd.DataFrame({"user_id": [user_id], "n_events": [n], "max_event_id": [max_id]})


try:  # Spark >= 4.0
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor
except ImportError:  # pragma: no cover — older Spark
    StatefulProcessor = object  # type: ignore[assignment,misc]


class CursorProcessor(StatefulProcessor):
    """transformWithState processor: same per-key cursor semantics as
    ``per_key_cursor`` on the Spark 4 ``transformWithStateInPandas`` API
    (typed state handles, timers, TTL — the successor of
    applyInPandasWithState; requires the RocksDB state store)."""

    def init(self, handle) -> None:
        self._cursor = handle.getValueState("cursor", STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        (user_id,) = key
        n, max_id = self._cursor.get() if self._cursor.exists() else (0, -1)
        for pdf in rows:
            n += len(pdf)
            if len(pdf):
                max_id = max(max_id, int(pdf["event_id"].max()))
        self._cursor.update((n, max_id))
        yield pd.DataFrame({"user_id": [user_id], "n_events": [n], "max_event_id": [max_id]})

    def close(self) -> None:
        pass


def per_key_cursor_tws(events: DataFrame) -> DataFrame:
    """``per_key_cursor`` on transformWithStateInPandas. State lives in
    the RocksDB state store (changelog-checkpointed at scale), so state
    size is bounded by disk, not executor memory — the right substrate
    for billions of keys."""
    proc = CursorProcessor()
    return (
        events.select("user_id", "event_id")
        .groupBy("user_id")
        .transformWithStateInPandas(
            proc,
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )


# ---------------------------------------------------------------------------
# Timer-driven session windows on transformWithStateInPandas (r4 — the
# protobuf un-gate made the full TWS surface testable, so the timer API
# gets a real operator, not just the cursor port). Event-time TIMERS are
# the capability TWS adds over applyInPandasWithState's timeout enum:
# a session closes exactly when the WATERMARK passes last_event + gap,
# emitted from handleExpiredTimer — no poll, no per-batch re-scan of
# idle keys. State per key is one (start, end, n) triple + one timer;
# RocksDB-backed, so billions of concurrent sessions bound by disk.
# ---------------------------------------------------------------------------

SESSION_OUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, n_events long"
)
SESSION_STATE_SCHEMA = "start_ms long, end_ms long, n long"


class SessionProcessor(StatefulProcessor):
    """Gap-based sessionization with event-time timers.

    State is a LIST of open sessions ``(start, end, n)`` per key, so
    out-of-order (but in-watermark) events are handled with the same
    merge semantics as Spark's built-in ``session_window``:

    - an event within ``gap`` of an open session extends it on BOTH
      sides (``start = min``, ``end = max``) and neighboring sessions
      that come within ``gap`` of each other merge;
    - a session is only emitted once the WATERMARK has passed
      ``end + gap`` — either inline (when the batch's watermark already
      cleared it) or from ``handleExpiredTimer``. A gap-jumping batch
      never force-closes a session early, so a later in-watermark event
      that lands between two open sessions still merges them;
    - one timer per open session at ``end + gap`` (stale timers for
      merged/extended sessions are rebuilt on every input batch).
    Append-mode semantics: a session row is emitted exactly once."""

    def __init__(self, gap_ms: int):
        self._gap = gap_ms

    def init(self, handle) -> None:
        self._handle = handle
        self._sessions = handle.getListState("sessions", SESSION_STATE_SCHEMA)

    def _emit(self, user_id, start_ms, end_ms, n) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": [user_id],
                "session_start": [pd.Timestamp(start_ms, unit="ms")],
                "session_end": [pd.Timestamp(end_ms, unit="ms")],
                "n_events": [n],
            }
        )

    def _load(self) -> list:
        if not self._sessions.exists():
            return []
        return sorted(tuple(map(int, s)) for s in self._sessions.get())

    def _store(self, sessions: list) -> None:
        if sessions:
            self._sessions.put(sessions)
        else:
            self._sessions.clear()

    def _flush_closed(self, user_id, sessions, watermark_ms):
        """Emit every session the watermark has cleared; return the rest."""
        keep = []
        for s, e, n in sessions:
            if e + self._gap <= watermark_ms:
                yield self._emit(user_id, s, e, n)
            else:
                keep.append((s, e, n))
        sessions[:] = keep

    def handleInputRows(self, key, rows, timerValues):
        (user_id,) = key
        sessions = self._load()
        for pdf in rows:
            for t in pdf["ts"].astype("int64") // 1_000_000:
                t = int(t)
                sessions.append((t, t, 1))
                sessions.sort()
                merged = [sessions[0]]
                for s, e, n in sessions[1:]:
                    ps, pe, pn = merged[-1]
                    if s <= pe + self._gap:
                        merged[-1] = (ps, max(pe, e), pn + n)
                    else:
                        merged.append((s, e, n))
                sessions = merged
        yield from self._flush_closed(
            user_id, sessions, timerValues.getCurrentWatermarkInMs()
        )
        self._store(sessions)
        for t in self._handle.listTimers():
            self._handle.deleteTimer(t)
        for s, e, n in sessions:
            self._handle.registerTimer(e + self._gap)

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        (user_id,) = key
        sessions = self._load()
        wm = max(
            expiredTimerInfo.getExpiryTimeInMs(),
            timerValues.getCurrentWatermarkInMs(),
        )
        yield from self._flush_closed(user_id, sessions, wm)
        self._store(sessions)

    def close(self) -> None:
        pass


def session_windows_tws(events: DataFrame, gap_seconds: int = 300) -> DataFrame:
    """Sessionize a watermarked event stream with event-time timers.
    Input needs ``withWatermark`` on ``ts`` (timeMode EventTime); each
    closed session emits (user_id, session_start, session_end,
    n_events) exactly once."""
    proc = SessionProcessor(gap_ms=gap_seconds * 1000)
    return (
        events.select("user_id", "ts")
        .groupBy("user_id")
        .transformWithStateInPandas(
            proc,
            outputStructType=SESSION_OUT_SCHEMA,
            outputMode="Append",
            timeMode="EventTime",
        )
    )


def per_key_cursor(events: DataFrame) -> DataFrame:
    """Running (count, high-watermark) per user across micro-batches.

    State is one tuple per key — O(|keys|) memory regardless of event
    volume; exactly the cursor-table profile at cluster scale."""
    return (
        events.select("user_id", "event_id")
        .groupBy("user_id")
        .applyInPandasWithState(
            _track_cursor,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Streaming ordered funnel: the batch q_funnel state machine as per-key
# streaming state. State per user is THREE timestamps — O(|users|)
# memory regardless of event volume, the same bounded-state argument as
# the cursor above.
# ---------------------------------------------------------------------------

FUNNEL_OUT_SCHEMA = "user_id long, stage int"
FUNNEL_STATE_SCHEMA = "t1 long, t2 long, t3 long"  # epoch micros; -1 = unset


def _advance_funnel(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Sequential view→click→purchase matcher. Batches are assumed
    time-ordered across triggers (the streaming contract; within a
    batch rows are sorted here) — a late row older than the recorded
    stage times cannot retro-qualify, the standard streaming-funnel
    tradeoff vs the batch recompute."""
    (user_id,) = key
    t1, t2, t3 = state.get if state.exists else (-1, -1, -1)
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"])
        for r in pdf.itertuples():
            ts = int(r.ts.value // 1000)  # pandas Timestamp -> micros
            if r.event_type == "view" and t1 < 0:
                t1 = ts
            elif r.event_type == "click" and t2 < 0 and 0 <= t1 < ts:
                t2 = ts
            elif r.event_type == "purchase" and t3 < 0 and 0 <= t2 < ts:
                t3 = ts
    state.update((t1, t2, t3))
    stage = 3 if t3 >= 0 else 2 if t2 >= 0 else 1 if t1 >= 0 else 0
    yield pd.DataFrame({"user_id": [user_id], "stage": [stage]})


def streaming_funnel(events: DataFrame) -> DataFrame:
    """Per-user funnel stage, updated each micro-batch."""
    return (
        events.select("user_id", "ts", "event_id", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            _advance_funnel,
            outputStructType=FUNNEL_OUT_SCHEMA,
            stateStructType=FUNNEL_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
