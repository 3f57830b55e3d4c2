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

Documented-out boundary: Spark 4's successor API
(``transformWithStateInPandas`` — typed value/list/map state, timers,
TTL, RocksDB-backed) exists in this PySpark build but its
driver-side worker hard-imports ``google.protobuf``, which is not
installed here (verified: query start crashes with
STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE / ImportError in
StateMessage_pb2). The operators below therefore stay on
``applyInPandasWithState``, which expresses the same per-key state
machines; porting to the new API when protobuf is available is a
mechanical init/handleInputRows re-wrap, no semantic change.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_user_stats(events: DataFrame,
                       watermark: str = "10 minutes") -> DataFrame:
    """Cumulative per-user event count + value sum, emitted every
    microbatch the user appears in (update semantics).

    Equivalent batch query: ``SELECT user_id, count(*), sum(value) GROUP
    BY user_id`` — the streaming version carries (n, total) as state so
    each microbatch does O(batch) work, not O(history).
    """
    def fn(key: tuple, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                            "total_value": [total]})

    return (events
            .withWatermark("ts", watermark)
            .groupBy("user_id")
            .applyInPandasWithState(
                fn,
                outputStructType="user_id long, n_events long, total_value double",
                stateStructType="n long, total double",
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout))


def inactivity_sessions(events: DataFrame,
                        gap_ms: int = 30 * 60 * 1000,
                        watermark: str = "10 minutes") -> DataFrame:
    """Custom sessionization: emit one row per closed session per user,
    where a session closes after ``gap_ms`` of event-time inactivity.

    Unlike ``session_window`` (streaming/windows.py), the session state
    here is explicit — (start, last_seen, n) — so arbitrary per-session
    logic can ride along; the built-in covers only windowed aggregates.
    Uses event-time timeout: a key with no events past
    ``last_seen + gap`` (relative to the watermark) times out and its
    session is flushed.
    """
    def fn(key: tuple, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        # Event time arrives out of order across microbatches, so
        # sessionization is a gap-tolerant interval merge. A session may
        # only close once the watermark passes its end + gap (earlier, a
        # late-but-admissible event could still bridge it to a neighbor),
        # and several sessions can be open at once while the watermark
        # lags — hence list-valued state. The same flow serves both data
        # batches and timeout wake-ups (pdfs is empty on timeout).
        closed: list[tuple] = []
        intervals: list[list[int]] = []
        if state.exists:
            starts, lasts, ns = state.get
            intervals = [[s, e, n] for s, e, n in zip(starts, lasts, ns)]
        for pdf in pdfs:
            for t in pd.to_datetime(pdf["ts"]):
                ms = int(t.value // 10**6)
                intervals.append([ms, ms, 1])
        if intervals:
            intervals.sort(key=lambda iv: iv[0])
            merged = [intervals[0]]
            for iv in intervals[1:]:
                cur = merged[-1]
                if iv[0] - cur[1] <= gap_ms:
                    cur[1] = max(cur[1], iv[1])
                    cur[2] += iv[2]
                else:
                    merged.append(iv)
            wm = state.getCurrentWatermarkMs()
            open_ivs = []
            for s, e, n in merged:
                if e + gap_ms <= wm:
                    closed.append((key[0], s, e, n))
                else:
                    open_ivs.append((s, e, n))
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
                closed, columns=["user_id", "session_start_ms",
                                 "session_end_ms", "n_events"])

    return (events
            .withWatermark("ts", watermark)
            .groupBy("user_id")
            .applyInPandasWithState(
                fn,
                outputStructType=("user_id long, session_start_ms long, "
                                  "session_end_ms long, n_events long"),
                stateStructType=("starts array<long>, lasts array<long>, "
                                 "ns array<long>"),
                outputMode="append",
                timeoutConf=GroupStateTimeout.EventTimeTimeout))

