"""Top-k operators.

Global top-k compiles to Catalyst's ``TakeOrderedAndProject`` (per-
partition heap + driver merge of k rows — no full sort, no full shuffle).
Per-group top-k is the ``row_number() OVER (PARTITION BY ...) <= k``
pattern: one shuffle on the group key, in-partition sort, early filter.

Scale note: per-group top-k at 100 TB wants the window form (this one),
NOT ``groupBy().agg(collect_list)`` — collect_list materializes every
group in memory; the window form streams sorted rows and Spark's
``WindowGroupLimit`` physical optimization (rank-limit pushdown) stops
per group after k rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def top_k(df: DataFrame, order_by: list[Column], k: int) -> DataFrame:
    """Global top-k -> TakeOrderedAndProject. Include a unique tiebreaker
    in `order_by` for deterministic results."""
    return df.orderBy(*order_by).limit(k)


def top_k_per_group(
    df: DataFrame,
    group_by: list[str],
    order_by: list[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Top-k rows per group, rank exposed as `rank_col` (BIGINT)."""
    w = Window.partitionBy(*group_by).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w).cast("bigint"))
        .filter(F.col(rank_col) <= k)
    )
