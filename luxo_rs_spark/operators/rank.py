"""Scalable global-order primitives (SURVEY.md §2.2-E/F at 100 TB):
exact global row_number / ntile / running-sum / lead WITHOUT an
unpartitioned window.

`Window.orderBy(...)` with no partitionBy funnels the whole input
through ONE task — fine over a pre-aggregated rollup (the documented
SCALING.md pattern, enforced by tests/test_plans.py's global sweep),
fatal over a fact table. These helpers implement the classic
distributed recipe instead:

1. `repartitionByRange` on the total order (range partitioner — sorted
   runs land in consecutive partitions) + `sortWithinPartitions`;
   the frame is `localCheckpoint`ed so every consumer sees ONE
   materialized partitioning (range sampling is never re-run).
2. A per-partition stats table (row count, value sum, first key) —
   |shuffle partitions| rows, aggregated in-plan.
3. Exclusive prefix offsets over the stats via an unpartitioned window
   — safe by construction: its input is the partition-count-sized
   Aggregate, never the data.
4. One broadcast equi-join of the offsets back onto the sorted frame;
   within-partition windows are partitioned by `spark_partition_id`,
   so no task ever sees more than one range slice.

The result is exact (identical to the single-task window, asserted in
tests/test_rank.py against Spark's own ntile/sum/lead) and every stage
is bounded by a partition, not the table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: synthetic columns added by :func:`range_ordered` / the stats join
PID = "__pid"
_ROW_OFF = "__row_off"
_SUM_OFF = "__sum_off"
_NEXT_FIRST = "__next_first"
_N_TOTAL = "__n_total"


def range_ordered(df: DataFrame, order_cols: list[Column | str]) -> DataFrame:
    """`df` range-partitioned and sorted by `order_cols` (a TOTAL order
    — include a unique tiebreak column), with `__pid` = the partition
    id. localCheckpoint(eager=True) pins one concrete partitioning so
    the stats pass and the main pass cannot diverge on re-sampled range
    boundaries."""
    ordered = (
        df.repartitionByRange(*order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn(PID, F.spark_partition_id())
    )
    # Eager checkpoint: materialize ONE concrete partitioning here, at
    # construction time. Round-3 advice fix — the previous eager=False
    # relied on the broadcast exchange's job running first to pin the
    # blocks, which is true under today's execution order but
    # incidental; eager=True makes "the range sampler never runs
    # twice" structural (the stats pass and the main pass read the
    # same materialized blocks by construction, regardless of job
    # scheduling). The cost — running the range shuffle when the
    # helper is called instead of at the first action — is the point.
    return ordered.localCheckpoint(eager=True)


def _with_offsets(
    ordered: DataFrame,
    order_cols: list[Column | str],
    value_col: Column | None,
    first_key: Column | None,
) -> DataFrame:
    """Join per-partition exclusive prefix offsets onto `ordered`:
    `__row_off` (rows before this partition), `__sum_off` (value sum
    before it), `__n_total` (grand row count), and — when `first_key`
    is given — `__next_first` (first key of the next non-empty
    partition, for lead stitching)."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("__s"))
    if first_key is not None:
        aggs.append(F.min(first_key).alias("__first"))
    stats = ordered.groupBy(PID).agg(*aggs)
    # unpartitioned windows here are SAFE: stats has one row per
    # shuffle partition (bounded by config, not data) and sits above
    # an Aggregate — the exact pre-agg pattern the plan sweep allows
    w_excl = Window.orderBy(PID).rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_all = Window.orderBy(PID).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cols = [
        F.col(PID),
        F.coalesce(F.sum("__n").over(w_excl), F.lit(0)).alias(_ROW_OFF),
        F.sum("__n").over(w_all).alias(_N_TOTAL),
    ]
    if value_col is not None:
        cols.append(F.sum("__s").over(w_excl).alias(_SUM_OFF))
    if first_key is not None:
        cols.append(
            F.lead("__first").over(Window.orderBy(PID)).alias(_NEXT_FIRST)
        )
    offsets = stats.select(*cols)
    return ordered.join(F.broadcast(offsets), PID)


def _pid_window(order_cols: list[Column | str]):
    return Window.partitionBy(PID).orderBy(*order_cols)


def global_row_number(
    df: DataFrame, order_cols: list[Column | str], out: str = "rn"
) -> DataFrame:
    """Exact 1-based global row_number over the total order, no
    single-task stage: within-partition row_number + partition row
    offset."""
    ordered = range_ordered(df, order_cols)
    joined = _with_offsets(ordered, order_cols, None, None)
    rn = F.row_number().over(_pid_window(order_cols)) + F.col(_ROW_OFF)
    return joined.withColumn(out, rn.cast("bigint")).drop(
        PID, _ROW_OFF, _N_TOTAL
    )


def global_ntile(
    df: DataFrame, order_cols: list[Column | str], n: int, out: str = "tile"
) -> DataFrame:
    """Exact SQL-standard ntile(n) over the total order (first
    N mod n buckets take the extra row), computed from the scalable
    global row_number — bit-identical to `ntile(n) OVER (ORDER BY ...)`
    without its single-task sort (asserted in tests/test_rank.py)."""
    ordered = range_ordered(df, order_cols)
    joined = _with_offsets(ordered, order_cols, None, None)
    r0 = (
        F.row_number().over(_pid_window(order_cols))
        + F.col(_ROW_OFF)
        - F.lit(1)
    )
    big = F.col(_N_TOTAL) % n          # buckets holding one extra row
    small_sz = F.floor(F.col(_N_TOTAL) / n)
    big_sz = small_sz + 1
    boundary = big * big_sz            # rows living in the big buckets
    tile = F.when(
        r0 < boundary, F.floor(r0 / big_sz) + 1
    ).otherwise(big + F.floor((r0 - boundary) / small_sz) + 1)
    return joined.withColumn(out, tile.cast("int")).drop(
        PID, _ROW_OFF, _N_TOTAL
    )


def global_running_sum(
    df: DataFrame,
    order_cols: list[Column | str],
    value: Column | str,
    out: str = "running_sum",
    exclusive: bool = False,
) -> DataFrame:
    """Exact global running sum of `value` over the total order:
    within-partition window sum + the exclusive sum of all preceding
    partitions. `exclusive=True` sums strictly-preceding rows only
    (the waterfall-allocation shape)."""
    v = F.col(value) if isinstance(value, str) else value
    ordered = range_ordered(df, order_cols)
    joined = _with_offsets(ordered, order_cols, v, None)
    upper = -1 if exclusive else 0
    local = F.sum(v).over(
        _pid_window(order_cols).rowsBetween(Window.unboundedPreceding, upper)
    )
    # SQL window-sum semantics (round-3 advice fix): sum over a frame
    # with NO non-null values is NULL, not 0 — so the stitched total is
    # NULL only when BOTH the local frame and every preceding partition
    # are all-NULL/empty; otherwise the NULL half contributes zero.
    total = F.when(
        local.isNull() & F.col(_SUM_OFF).isNull(), F.lit(None)
    ).otherwise(
        F.coalesce(local, F.lit(0)) + F.coalesce(F.col(_SUM_OFF), F.lit(0))
    )
    return joined.withColumn(out, total).drop(
        PID, _ROW_OFF, _SUM_OFF, _N_TOTAL
    )


def global_lead(
    df: DataFrame,
    order_cols: list[Column | str],
    key: Column | str,
    out: str = "next",
) -> DataFrame:
    """Exact global lead(key) over the total order: within-partition
    lead, with each partition's LAST row stitched to the first key of
    the next non-empty partition (broadcast from the stats table).
    `key` must be the leading sort column (its per-partition min is the
    partition's first value)."""
    k = F.col(key) if isinstance(key, str) else key
    ordered = range_ordered(df, order_cols)
    joined = _with_offsets(ordered, order_cols, None, k)
    nxt = F.coalesce(
        F.lead(k).over(_pid_window(order_cols)), F.col(_NEXT_FIRST)
    )
    return joined.withColumn(out, nxt).drop(PID, _ROW_OFF, _N_TOTAL, _NEXT_FIRST)
