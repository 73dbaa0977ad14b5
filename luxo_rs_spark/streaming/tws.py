"""Arbitrary stateful processing via ``transformWithStateInPandas``
(Spark 4 StatefulProcessor API — SURVEY.md §2.2-I custom-operator
escape hatch, next generation).

Where ``applyInPandasWithState`` gives one opaque state tuple per key,
the StatefulProcessor handle exposes TYPED state primitives — value /
list / map state, optional per-state TTL, and registered timers — all
backed by the state store (RocksDB REQUIRED for this API; see
``streaming.state.rocksdb_state``). That composability is what a real
pipeline's per-entity operators need: the map state below would be a
serialization hack in the old API.

Scale notes: keys are hash-partitioned across executors exactly like
any stateful operator; each state primitive is a separate column family
in RocksDB, so a hot map state does not rewrite the value state's
files. Arrow batches per key group — vectorized, not per-row Python.

Environment gate: the TWS Python runner needs ``google.protobuf``
(state-server wire protocol). Where that package is absent the query
still PLANS (analysis, schema, grouping are exercised in tests) but
micro-batch execution fails at runner bootstrap — the tests detect
this and verify plan-level behavior only, the same honest-gating
policy as the codec-less media decoders.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

#: output schema of :func:`running_user_profile`
PROFILE_SCHEMA = (
    "user_id long, n_events long, sum_value double, n_types long"
)


class _UserProfile(StatefulProcessor):
    """Per-user running profile: (count, sum) in VALUE state plus a
    per-event-type counter in MAP state — the distinct-type cardinality
    is exact and incrementally maintained without re-reading history."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._agg = handle.getValueState("agg", "n long, s double")
        self._types = handle.getMapState(
            "types", "event_type string", "c long"
        )

    def handleInputRows(
        self, key, rows, timerValues
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        n, s = self._agg.get() if self._agg.exists() else (0, 0.0)
        type_delta: dict[str, int] = {}
        for pdf in rows:
            n += len(pdf)
            s += float(pdf["value"].sum())
            for etype, cnt in pdf.groupby("event_type").size().items():
                type_delta[etype] = type_delta.get(etype, 0) + int(cnt)
        self._agg.update((n, s))
        for etype, cnt in type_delta.items():
            prev = (
                self._types.getValue((etype,))[0]
                if self._types.containsKey((etype,))
                else 0
            )
            self._types.updateValue((etype,), (prev + cnt,))
        n_types = sum(1 for _ in self._types.keys())
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "sum_value": [s],
                "n_types": [n_types],
            }
        )

    def close(self) -> None:
        pass


def running_user_profile(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum(value), distinct event types) via
    the StatefulProcessor API; emits the updated profile every
    micro-batch. Requires the RocksDB state store provider."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_UserProfile(),
        outputStructType=PROFILE_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
