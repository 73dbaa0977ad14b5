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
