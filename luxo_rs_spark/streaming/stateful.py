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
from pyspark.sql import functions as F
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


def dedup_stream_within_watermark(
    events: DataFrame,
    keys: list[str],
    watermark_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming dedup on `keys` ALONE with watermark-bounded state
    (``dropDuplicatesWithinWatermark``, Spark 3.5+).

    Differs from :func:`dedup_stream` in the key set: classic
    watermarked ``dropDuplicates`` must include the event-time column
    in its keys for state expiry, so the same business key at two
    different timestamps survives as two rows. This variant keeps ONE
    row per business key among all events whose event times fall within
    the watermark delay of each other — the semantics a real ingest
    pipeline wants for at-least-once upstream producers (retries carry
    a fresh timestamp but the same event id). State holds one entry per
    key, evicted once the watermark passes the key's last-seen event
    time, so it stays bounded at |distinct keys per watermark window|
    regardless of stream length.
    """
    return events.withWatermark(
        watermark_col, watermark
    ).dropDuplicatesWithinWatermark(keys)


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


_TREND_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.IntegerType()),
        T.StructField("item", T.StringType()),
        T.StructField("est_count", T.LongType()),
    ]
)

_TREND_STATE = T.StructType(
    [
        T.StructField("items", T.ArrayType(T.StringType())),
        T.StructField("counts", T.ArrayType(T.LongType())),
        T.StructField("seen", T.LongType()),
    ]
)


def _trend_fold(k: int):
    def fold(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (shard,) = key
        if state.exists:
            items, counts, seen = state.get
            counters = dict(zip(items, counts))
        else:
            counters, seen = {}, 0
        for pdf in pdfs:
            for v, c in pdf["item"].value_counts().items():
                c = int(c)
                seen += c
                if v in counters:
                    counters[v] += c
                elif len(counters) < k:
                    counters[v] = c
                else:
                    dec = min(c, min(counters.values()))
                    c -= dec
                    counters = {
                        it: ct - dec for it, ct in counters.items() if ct > dec
                    }
                    if c > 0 and len(counters) < k:
                        counters[v] = c
        state.update((list(counters), [counters[i] for i in counters], seen))
        yield pd.DataFrame(
            {
                "shard": [int(shard)] * len(counters),
                "item": list(counters),
                "est_count": list(counters.values()),
            }
        )

    return fold


def trending_items(
    events: DataFrame,
    item_col: str,
    k: int = 10,
    shards: int = 8,
) -> DataFrame:
    """Streaming heavy hitters with BOUNDED state: items hash-route to
    ``shards`` state groups, each maintaining a size-``k`` Misra-Gries
    summary (the streaming twin of ``operators.sketch.heavy_hitters``).
    Every micro-batch re-emits each shard's current candidate set with
    its (under-)estimate.

    Guarantees per shard (each item lives in exactly one shard): any
    item with true count > N_shard/k is PRESENT; estimates never exceed
    the true count and undercount by at most N_shard/(k+1) (total MG
    decrement bound). State is O(k) per shard FOREVER — the property
    that makes this runnable over an unbounded stream, where exact
    per-item counts grow without limit.

    100 TB/day note: shards bound parallelism as well as state; size
    ``shards`` to cores. A skewed hot item costs one shard one counter
    — no shuffle amplification.
    """
    # pmod, not abs(...)%: abs(Long.MIN_VALUE) overflows back to
    # negative and would mint a phantom negative shard
    routed = events.select(
        F.pmod(F.xxhash64(F.col(item_col)), F.lit(shards))
        .cast("int")
        .alias("shard"),
        F.col(item_col).cast("string").alias("item"),
    )
    return routed.groupBy("shard").applyInPandasWithState(
        _trend_fold(k),
        outputStructType=_TREND_SCHEMA,
        stateStructType=_TREND_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_QUANT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("n", T.LongType()),
        T.StructField("p50", T.DoubleType()),
        T.StructField("p95", T.DoubleType()),
    ]
)

_QUANT_STATE = T.StructType(
    [
        T.StructField("means", T.ArrayType(T.DoubleType())),
        T.StructField("weights", T.ArrayType(T.DoubleType())),
        T.StructField("mn", T.DoubleType()),
        T.StructField("mx", T.DoubleType()),
        T.StructField("total", T.DoubleType()),
    ]
)


def _quantile_fold(delta: float):
    import numpy as np

    from luxo_rs_spark.operators.tdigest import _digest_of, _merge_centroids

    def fold(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (k,) = key
        vals = pd.concat([p["value"] for p in pdfs]).to_numpy(dtype=float)
        d = _digest_of(vals, delta)
        if not d["total"] and not state.exists:
            return  # first batch for this key was all-null: no state yet
        if state.exists:
            means, weights, mn, mx, total = state.get
            if total and d["total"]:
                m, w = _merge_centroids(
                    np.concatenate([means, d["means"]]),
                    np.concatenate([weights, d["weights"]]),
                    delta,
                )
                d = {
                    "means": list(m), "weights": list(w),
                    "mn": min(mn, d["mn"]), "mx": max(mx, d["mx"]),
                    "total": total + d["total"],
                }
            elif total:
                d = {"means": list(means), "weights": list(weights),
                     "mn": mn, "mx": mx, "total": total}
        # state must hold pure-Python floats: the JVM state encoder
        # unpickles the tuple and rejects numpy scalar objects
        state.update(
            (
                [float(x) for x in d["means"]],
                [float(x) for x in d["weights"]],
                float(d["mn"]),
                float(d["mx"]),
                float(d["total"]),
            )
        )
        m = np.asarray(d["means"]); w = np.asarray(d["weights"])
        cum = np.cumsum(w) - w / 2
        xs = np.concatenate(([0.0], cum, [d["total"]]))
        ys = np.concatenate(([d["mn"]], m, [d["mx"]]))
        p50, p95 = np.interp(
            [0.5 * d["total"], 0.95 * d["total"]], xs, ys
        )
        yield pd.DataFrame(
            {"key": [k], "n": [int(d["total"])],
             "p50": [float(p50)], "p95": [float(p95)]}
        )

    return fold


def streaming_quantiles(
    events: DataFrame,
    key_col: str,
    value_col: str = "value",
    delta: float = 100.0,
) -> DataFrame:
    """Per-key streaming quantiles with BOUNDED state: a t-digest per
    key lives in the state store (O(delta) doubles forever), each
    micro-batch folds its values in (vectorized build + centroid
    merge, operators/tdigest.py) and re-emits the current p50/p95.
    The quantile member of the streaming sketch family: counts ->
    ``trending_items``, distincts -> HLL foreachBatch, quantiles ->
    this. The monitoring primitive for latency/value percentiles over
    unbounded streams, where exact percentiles would need unbounded
    buffering."""
    routed = events.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(value_col).cast("double").alias("value"),
    )
    return routed.groupBy("key").applyInPandasWithState(
        _quantile_fold(delta),
        outputStructType=_QUANT_SCHEMA,
        stateStructType=_QUANT_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
