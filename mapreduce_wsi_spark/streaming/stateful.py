"""Custom stateful streaming operators (applyInPandasWithState).

The window/session operators in streaming/windows.py cover everything the
built-in incremental aggregations can express. This module is the escape
hatch for genuinely custom per-key state machines — the Structured
Streaming analogue of the reference's user-supplied reducers
(MapReduceWSI.java:81-105), except the state survives across microbatches
instead of living only within one sorted reduce call.

State is per-key and Arrow-batched: one pandas DataFrame per key per
microbatch, state encoded as a tuple matching ``state_schema``. Scale
posture: state lives in the state store partitioned by key hash across
executors; a 100 TB keyspace shards horizontally like any shuffle.

Dual-API: Spark 4's successor API (``transformWithStateInPandas`` —
typed value/list/map state, timers, TTL, RocksDB-backed) exists in
this PySpark build but its driver-side worker hard-imports
``google.protobuf``, which is not installed in this sandbox (verified:
query start crashes with STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE
/ ImportError in StateMessage_pb2). Both operators therefore ship BOTH
implementations behind an ``api=`` knob: ``"apiws"`` (default — the
only path this repo's CI has actually executed; ADVICE r7), ``"tws"``
to force the successor API, and ``"auto"`` as an explicit opt-in that
picks ``transformWithStateInPandas`` when protobuf is importable and
falls back to ``applyInPandasWithState`` otherwise. The two paths
carry identical state semantics — the pytest suite pins the fallback;
the TWS twins share the same merge/flush helpers so the logic cannot
drift. Flip the default to "auto" only after the TWS twin has run
green in a CI environment with protobuf installed.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.streaming.stateful_processor import (
    ExpiredTimerInfo,
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)


def tws_available() -> bool:
    """True when ``transformWithStateInPandas`` can actually start —
    i.e. the driver-side state-server protobuf dependency is present.
    PySpark ships the API unconditionally; the hard import happens at
    query start, so probe the dependency, not the method."""
    try:
        import google.protobuf  # noqa: F401
        return True
    except ImportError:
        return False


def _resolve_api(api: str) -> str:
    if api == "auto":
        # "auto" prefers the newer transformWithStateInPandas path ONLY
        # as an opt-in: the default stays "apiws" (ADVICE r7) because on
        # clusters where protobuf happens to be importable "auto" would
        # silently self-enable a path this environment has never
        # executed (the tws parity test self-skips without protobuf).
        # Flip the default once the tws twin has run green in a CI
        # environment with protobuf installed.
        return "tws" if tws_available() else "apiws"
    if api == "tws" and not tws_available():
        raise RuntimeError(
            "api='tws' requires google.protobuf (the "
            "transformWithStateInPandas state-server dependency); "
            "install protobuf or use api='apiws' / 'auto'")
    if api not in ("tws", "apiws"):
        raise ValueError(f"api must be auto|tws|apiws, got {api!r}")
    return api


_STATS_OUT = "user_id long, n_events long, total_value double"
_STATS_STATE = "n long, total double"


def _stats_fold(n: int, total: float,
                pdfs: Iterator[pd.DataFrame]) -> tuple[int, float]:
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    return n, total


class _RunningUserStatsProcessor(StatefulProcessor):
    """transformWithStateInPandas twin of ``running_user_stats``: the
    (n, total) pair moves from an ``applyInPandasWithState`` tuple to a
    typed ValueState; the fold itself is the shared ``_stats_fold``."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._agg = handle.getValueState("agg", _STATS_STATE)

    def handleInputRows(self, key: tuple, rows: Iterator[pd.DataFrame],
                        timerValues: TimerValues) -> Iterator[pd.DataFrame]:
        n, total = self._agg.get() if self._agg.exists() else (0, 0.0)
        n, total = _stats_fold(n, total, rows)
        self._agg.update((n, total))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                            "total_value": [total]})

    def close(self) -> None:
        pass


def running_user_stats(events: DataFrame,
                       watermark: str = "10 minutes",
                       api: str = "apiws") -> DataFrame:
    """Cumulative per-user event count + value sum, emitted every
    microbatch the user appears in (update semantics).

    Equivalent batch query: ``SELECT user_id, count(*), sum(value) GROUP
    BY user_id`` — the streaming version carries (n, total) as state so
    each microbatch does O(batch) work, not O(history).

    ``api``: "apiws" (default — the only path exercised by this repo's
    CI; see ADVICE r7), "tws" (transformWithStateInPandas, requires
    protobuf), or "auto" (opt-in: tws when available, else apiws).
    """
    grouped = events.withWatermark("ts", watermark).groupBy("user_id")
    if _resolve_api(api) == "tws":
        return grouped.transformWithStateInPandas(
            _RunningUserStatsProcessor(),
            outputStructType=_STATS_OUT,
            outputMode="update",
            timeMode="eventTime")

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        n, total = _stats_fold(n, total, pdfs)
        state.update((n, total))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                            "total_value": [total]})

    return grouped.applyInPandasWithState(
        fn,
        outputStructType=_STATS_OUT,
        stateStructType=_STATS_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout)


_SESS_OUT = ("user_id long, session_start_ms long, "
             "session_end_ms long, n_events long")
_SESS_STATE = "starts array<long>, lasts array<long>, ns array<long>"


def _merge_new_events(intervals: list[list[int]],
                      pdfs: Iterator[pd.DataFrame],
                      gap_ms: int) -> list[list[int]]:
    """Fold incoming event timestamps into the per-key interval list and
    gap-merge. Shared by both API paths so the sessionization logic
    cannot drift between them."""
    for pdf in pdfs:
        for t in pd.to_datetime(pdf["ts"]):
            ms = int(t.value // 10**6)
            intervals.append([ms, ms, 1])
    if not intervals:
        return []
    intervals.sort(key=lambda iv: iv[0])
    merged = [intervals[0]]
    for iv in intervals[1:]:
        cur = merged[-1]
        if iv[0] - cur[1] <= gap_ms:
            cur[1] = max(cur[1], iv[1])
            cur[2] += iv[2]
        else:
            merged.append(iv)
    return merged


def _split_closed(merged: list[list[int]], wm: int,
                  gap_ms: int) -> tuple[list, list]:
    """A session may only close once the watermark passes end + gap —
    earlier, a late-but-admissible event could still bridge it to a
    neighbor. Several can stay open while the watermark lags."""
    closed = [(s, e, n) for s, e, n in merged if e + gap_ms <= wm]
    open_ivs = [(s, e, n) for s, e, n in merged if e + gap_ms > wm]
    return closed, open_ivs


class _InactivitySessionsProcessor(StatefulProcessor):
    """transformWithStateInPandas twin of ``inactivity_sessions``: the
    open-interval lists live in a typed ValueState; the event-time
    timeout becomes an explicit registered timer, re-armed to the
    earliest open session's end + gap after every batch."""

    def __init__(self, gap_ms: int):
        self._gap_ms = gap_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._ivs = handle.getValueState("open_intervals", _SESS_STATE)

    def _advance(self, key: tuple, pdfs: Iterator[pd.DataFrame],
                 wm: int) -> Iterator[pd.DataFrame]:
        intervals: list[list[int]] = []
        if self._ivs.exists():
            starts, lasts, ns = self._ivs.get()
            intervals = [[s, e, n] for s, e, n in zip(starts, lasts, ns)]
        merged = _merge_new_events(intervals, pdfs, self._gap_ms)
        closed, open_ivs = _split_closed(merged, wm, self._gap_ms)
        for t in self._handle.listTimers():
            self._handle.deleteTimer(t)
        if open_ivs:
            self._ivs.update(([iv[0] for iv in open_ivs],
                              [iv[1] for iv in open_ivs],
                              [iv[2] for iv in open_ivs]))
            self._handle.registerTimer(
                min(iv[1] for iv in open_ivs) + self._gap_ms)
        else:
            self._ivs.clear()
        if closed:
            yield pd.DataFrame(
                [(key[0], s, e, n) for s, e, n in closed],
                columns=["user_id", "session_start_ms",
                         "session_end_ms", "n_events"])

    def handleInputRows(self, key: tuple, rows: Iterator[pd.DataFrame],
                        timerValues: TimerValues) -> Iterator[pd.DataFrame]:
        yield from self._advance(
            key, rows, timerValues.getCurrentWatermarkInMs())

    def handleExpiredTimer(self, key: tuple, timerValues: TimerValues,
                           expiredTimerInfo: ExpiredTimerInfo
                           ) -> Iterator[pd.DataFrame]:
        yield from self._advance(
            key, iter(()), timerValues.getCurrentWatermarkInMs())

    def close(self) -> None:
        pass


def inactivity_sessions(events: DataFrame,
                        gap_ms: int = 30 * 60 * 1000,
                        watermark: str = "10 minutes",
                        api: str = "apiws") -> DataFrame:
    """Custom sessionization: emit one row per closed session per user,
    where a session closes after ``gap_ms`` of event-time inactivity.

    Unlike ``session_window`` (streaming/windows.py), the session state
    here is explicit — (start, last_seen, n) — so arbitrary per-session
    logic can ride along; the built-in covers only windowed aggregates.
    Uses event-time timeout: a key with no events past
    ``last_seen + gap`` (relative to the watermark) times out and its
    session is flushed.

    Event time arrives out of order across microbatches, so
    sessionization is a gap-tolerant interval merge (``_merge_new_events``
    / ``_split_closed``, shared with the transformWithStateInPandas
    twin). ``api`` as in :func:`running_user_stats`.
    """
    grouped = events.withWatermark("ts", watermark).groupBy("user_id")
    if _resolve_api(api) == "tws":
        return grouped.transformWithStateInPandas(
            _InactivitySessionsProcessor(gap_ms),
            outputStructType=_SESS_OUT,
            outputMode="append",
            timeMode="eventTime")

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        # The same flow serves both data batches and timeout wake-ups
        # (pdfs is empty on timeout).
        intervals: list[list[int]] = []
        if state.exists:
            starts, lasts, ns = state.get
            intervals = [[s, e, n] for s, e, n in zip(starts, lasts, ns)]
        merged = _merge_new_events(intervals, pdfs, gap_ms)
        closed, open_ivs = _split_closed(merged, state.getCurrentWatermarkMs(),
                                         gap_ms)
        if open_ivs:
            state.update(([iv[0] for iv in open_ivs],
                          [iv[1] for iv in open_ivs],
                          [iv[2] for iv in open_ivs]))
            state.setTimeoutTimestamp(
                min(iv[1] for iv in open_ivs) + gap_ms)
        elif state.exists:
            state.remove()
        if closed:
            yield pd.DataFrame(
                [(key[0], s, e, n) for s, e, n in closed],
                columns=["user_id", "session_start_ms",
                         "session_end_ms", "n_events"])

    return grouped.applyInPandasWithState(
        fn,
        outputStructType=_SESS_OUT,
        stateStructType=_SESS_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout)

