"""Stateful streaming operators (SURVEY.md §2.2-I / §2.2-J).

- ``dedup_stream``: watermarked dropDuplicates — state holds one entry
  per key until the watermark passes it.
- ``running_user_totals``: arbitrary stateful processing via
  ``applyInPandasWithState`` — the custom-operator escape hatch when
  built-in windows can't express the semantics. State is a per-user
  (count, sum) pair; each micro-batch folds its rows into state and
  emits the updated totals.

Scale notes: state is hash-partitioned by key across executors and
checkpointed via the state store; watermarks (dedup) or timeouts
(applyInPandasWithState) bound its growth. The pandas hook receives
Arrow batches per key group — vectorized, not per-row Python.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T


def dedup_stream(
    events: DataFrame,
    keys: list[str],
    watermark_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup on `keys` with bounded state."""
    return events.withWatermark(watermark_col, watermark).dropDuplicates(
        [*keys, watermark_col] if watermark_col not in keys else keys
    )


_TOTALS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("s", T.DoubleType()),
    ]
)


def _fold_user(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, s = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
    state.update((n, s))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "sum_value": [s]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum(value)) maintained in the state
    store; emits the updated totals every micro-batch."""
    return events.groupBy("user_id").applyInPandasWithState(
        _fold_user,
        outputStructType=_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start_us", T.LongType()),
        T.StructField("session_end_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("closed_by", T.StringType()),
    ]
)

_SESSION_STATE = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def _session_fold(gap_us: int):
    def fold(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        # timeout fires when the watermark passes last_event + gap with
        # NO new data for the key: close and emit the open session
        if state.hasTimedOut:
            start_us, last_us, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start_us": [start_us],
                    "session_end_us": [last_us],
                    "n_events": [n],
                    "closed_by": ["timeout"],
                }
            )
            return
        ts_us = (
            pd.concat([p["ts"] for p in pdfs]).astype("int64") // 1000
        ).sort_values()
        out = []
        if state.exists:
            start_us, last_us, n = state.get
        else:
            start_us, last_us, n = int(ts_us.iloc[0]), int(ts_us.iloc[0]), 0
        for t in ts_us:
            t = int(t)
            if t - last_us > gap_us:
                # in-batch gap: close the running session immediately
                out.append((start_us, last_us, n, "gap"))
                start_us, n = t, 0
            last_us = t
            n += 1
        state.update((start_us, last_us, n))
        # arm the timeout: close if the watermark passes last + gap
        state.setTimeoutTimestamp(last_us // 1000 + gap_us // 1000)
        if out:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(out),
                    "session_start_us": [o[0] for o in out],
                    "session_end_us": [o[1] for o in out],
                    "n_events": [o[2] for o in out],
                    "closed_by": [o[3] for o in out],
                }
            )

    return fold


def timeout_sessions(
    events: DataFrame,
    gap: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Custom gap-sessionization with EVENT-TIME TIMEOUTS — the
    arbitrary-stateful operator `session_window` cannot replace when
    you need per-session custom payloads and explicit close reasons:
    state holds (start, last, n) per user; an in-batch gap closes a
    session inline, and an idle key's session is closed by the state
    timeout when the watermark passes last_event + gap. Output rows
    are CLOSED sessions only (append semantics).

    Scale: state is one tuple per ACTIVE user, expired by timeouts —
    bounded by concurrent-user cardinality, not history.
    """
    gap_us = int(pd.Timedelta(gap).total_seconds() * 1_000_000)
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fold(gap_us),
            outputStructType=_SESSION_SCHEMA,
            stateStructType=_SESSION_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
