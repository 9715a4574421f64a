"""Custom stateful streaming operator via ``applyInPandasWithState``.

The built-in ``session_window`` (streaming/windows.py) covers gap
sessionization; this module implements the SAME semantics as a
hand-written stateful operator to exercise the custom-state surface the
engine exposes for operators Spark lacks (SURVEY §2.3 streaming row:
"applyInPandasWithState for custom stateful operators").

Semantics (identical to the batch gap-and-island answer,
queries/stream.py q_stream_sessionize):

  - per ``user_id``, events ≤ ``gap`` apart belong to one session;
  - a session is EMITTED when a later event of the same user arrives
    more than ``gap`` after it (closed by data), or when the event-time
    watermark passes ``session_end + gap`` (closed by timeout) — so every
    session is emitted exactly once, and state per user is one open
    session, evicted by the watermark. State size is O(active users
    within the watermark horizon), the bound a 100 TB/day stream needs.

Arrival-order assumption: like the built-in session_window in append
mode, in-order arrival per micro-batch suffices; late events within the
watermark that belong to an ALREADY gap-closed session re-open a new
session (the built-in merges instead) — replay_events emits time-ordered
slices, so the two agree there (verified in tests/test_streaming.py).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType

OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start_us", LongType()),
        StructField("session_end_us", LongType()),
        StructField("n_events", LongType()),
    ]
)

#: open session carried between micro-batches: (start_us, end_us, n_events)
STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("n", LongType()),
    ]
)


def running_user_stats(events: DataFrame) -> DataFrame:
    """Continuously-updated per-user profile via ``transformWithStateInPandas``
    (Spark 4 arbitrary-state API — the successor surface to
    applyInPandasWithState; the engine exercises both).

    Emits (user_id, cnt, sum_val) after every micro-batch touching the
    user; in update mode the latest emission is the running total — the
    "live feature store" shape of a training-data pipeline. State is one
    value row per user.

    Environment note: the transformWithState Python runner requires
    ``google.protobuf`` (absent in this container — the streaming query
    fails at start with STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE)
    and the RocksDB state store provider. The operator is real and its
    test runs wherever protobuf is installed
    (tests/test_streaming.py skips otherwise); `sessionize_stateful`
    above covers the custom-state surface on the dependency-free
    applyInPandasWithState API.
    """
    import pandas as pd  # noqa: F811 — local so the module imports without Arrow
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
    from pyspark.sql.types import DoubleType, StructType as T_, StructField as F_

    out_schema = T_(
        [
            F_("user_id", LongType()),
            F_("cnt", LongType()),
            F_("sum_val", DoubleType()),
        ]
    )
    state_schema = T_([F_("cnt", LongType()), F_("sum_val", DoubleType())])

    class UserStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("totals", state_schema)

        def handleInputRows(self, key, rows, timerValues):
            cnt, total = self._state.get() if self._state.exists() else (0, 0.0)
            for pdf in rows:
                cnt += len(pdf)
                total += float(pdf["value"].sum())
            self._state.update((cnt, total))
            yield pd.DataFrame(
                {"user_id": [key[0]], "cnt": [cnt], "sum_val": [total]}
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserStats(),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )


def sessionize_stateful(
    events: DataFrame, gap_minutes: int = 30, watermark: str = "1 minute"
) -> DataFrame:
    """Gap-sessionize a stream with hand-managed per-user state."""
    gap_us = gap_minutes * 60 * 1_000_000

    def fn(
        key: Tuple[Any], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start_us, end_us, n = state.get
            state.remove()
            yield pd.DataFrame(
                [
                    {
                        "user_id": user_id,
                        "session_start_us": start_us,
                        "session_end_us": end_us,
                        "n_events": n,
                    }
                ]
            )
            return

        ts_us = sorted(
            int(t.value) // 1_000  # pandas Timestamp ns → µs
            for pdf in pdfs
            for t in pdf["ts"]
        )
        cur = state.get if state.exists else None  # (start, end, n)
        closed: list[tuple[int, int, int]] = []
        for t in ts_us:
            if cur is None:
                cur = (t, t, 1)
            elif t - cur[1] <= gap_us:
                cur = (cur[0], max(cur[1], t), cur[2] + 1)
            else:
                closed.append(cur)
                cur = (t, t, 1)
        state.update(cur)
        # event-time timeout: fire when the watermark passes end + gap
        state.setTimeoutTimestamp((cur[1] + gap_us) // 1_000)
        if closed:
            yield pd.DataFrame(
                [
                    {
                        "user_id": user_id,
                        "session_start_us": s,
                        "session_end_us": e,
                        "n_events": n,
                    }
                    for s, e, n in closed
                ]
            )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn, OUT_SCHEMA, STATE_SCHEMA, "append", GroupStateTimeout.EventTimeTimeout
        )
    )
