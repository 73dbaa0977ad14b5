"""Stream-stream joins (SURVEY.md §2.2-I roadmap): watermarked
interval joins between two event streams.

The canonical use is attribution: match each `click` to the `view` by
the same user that happened at most `max_gap` earlier. Both sides carry
watermarks and the join predicate bounds event time on BOTH ends —
that pair of constraints is what lets Structured Streaming expire join
state instead of buffering both streams forever.

Scale notes (100 TB/day): state is partitioned by the equi-key
(user_id) across executors; each side's retained window is
watermark + max_gap. Without the time bounds Spark rejects the plan
outright (unbounded state) — the API here makes them mandatory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "l_ts",
    right_ts: str = "r_ts",
    max_gap: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Inner interval join: rows with equal `on` keys where
    ``left_ts - max_gap <= right_ts <= left_ts``.

    Both inputs must be streaming DataFrames whose event-time columns
    are already named `left_ts` / `right_ts` (rename before calling —
    the two sides must not share column names).
    """
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (lw[on] == rw[f"r_{on}"])
        & (rw[right_ts] <= lw[left_ts])
        & (rw[right_ts] >= lw[left_ts] - F.expr(f"INTERVAL {max_gap}"))
    )
    return lw.join(rw, cond, "inner")


def interval_join_streams_outer(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "l_ts",
    right_ts: str = "r_ts",
    max_gap: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """LEFT OUTER watermarked interval join: like
    :func:`interval_join_streams`, but an unmatched left row is emitted
    with nulls ONCE THE WATERMARK PROVES no match can still arrive
    (left_ts + max_gap falls behind the right-side watermark). That
    deferred-null emission is the semantic difference from a batch
    outer join, and the reason both time bounds are mandatory: they
    define when "no match" becomes a fact rather than a maybe.

    Use for attribution-with-fallback: every click row appears exactly
    once, matched or not.
    """
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (lw[on] == rw[f"r_{on}"])
        & (rw[right_ts] <= lw[left_ts])
        & (rw[right_ts] >= lw[left_ts] - F.expr(f"INTERVAL {max_gap}"))
    )
    return lw.join(rw, cond, "left_outer")


def interval_join_streams_full_outer(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "l_ts",
    right_ts: str = "r_ts",
    max_gap: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """FULL OUTER watermarked interval join — completes the streaming
    join matrix (inner / left / full): unmatched rows from EITHER side
    are emitted with nulls once the opposite side's watermark proves no
    partner can still arrive. Both time bounds are mandatory for the
    same reason as the left-outer form: they are what lets the state
    store expire a row as definitively unmatched instead of holding it
    forever. State stays bounded by (watermark + max_gap) per side.

    Use for reconciliation streams: every record from both feeds
    appears exactly once, matched or not — the streaming form of a
    ledger diff.
    """
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (lw[on] == rw[f"r_{on}"])
        & (rw[right_ts] <= lw[left_ts])
        & (rw[right_ts] >= lw[left_ts] - F.expr(f"INTERVAL {max_gap}"))
    )
    return lw.join(rw, cond, "full_outer")


def click_view_attribution(
    events: DataFrame, max_gap: str = "30 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Attribute each click to the views by the same user within
    `max_gap` before it: (click_id, view_id, user_id, gap_sec).

    `events` is one event stream (read_event_stream); the two sides are
    type-filtered projections of it.
    """
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id"),
        F.col("ts").alias("l_ts"),
    )
    views = events.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("r_user_id"),
        F.col("ts").alias("r_ts"),
    )
    joined = interval_join_streams(
        clicks, views, on="user_id", max_gap=max_gap, watermark=watermark
    )
    return joined.select(
        "click_id",
        "view_id",
        "user_id",
        (F.unix_micros("l_ts") - F.unix_micros("r_ts")).alias("gap_us"),
    )


def stream_static_enrich(
    stream: DataFrame,
    static: DataFrame,
    on: str | list[str],
    how: str = "left",
    broadcast: bool = False,
) -> DataFrame:
    """Stream-static join (SURVEY.md §2.2-I): enrich a live stream with
    a batch dimension table.

    The static side is re-read per micro-batch by Structured Streaming
    (no watermark needed — static rows never expire). By default the
    join strategy is left to Catalyst/AQE, which broadcasts the static
    side when it is under the autoBroadcastJoinThreshold; pass
    ``broadcast=True`` to force the hint ONLY when the caller knows the
    dim fits in executor memory (a forced broadcast of a large static
    side OOMs the driver/executors). This is the streaming analogue of
    the batch dim-broadcast pattern (q02): at 100 TB/day of stream, the
    only state is the in-flight micro-batch.
    """
    right = F.broadcast(static) if broadcast else static
    return stream.join(right, on, how)
