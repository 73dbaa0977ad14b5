"""Skew mitigation: salted join and salted two-stage aggregation.

Why this exists (SURVEY.md §4.2, SCALING.md): a shuffled join or agg
hash-partitions on the key, so one hot key lands its entire volume on
one reducer. AQE's runtime skew-join splitting (on by default in this
engine) handles the join case adaptively; these operators are the
*declarative* form for when the skew is known ahead of time — e.g. the
null key, a "logged-out user" sentinel, or a head domain in a crawl —
or when AQE is unavailable (streaming micro-batches).

Mechanics (the standard published recipe, e.g. Spark docs/AQE design):

- ``salted_join``: the skewed (big) side gets a deterministic salt in
  ``[0, buckets)`` derived from a high-entropy sibling column via
  ``pmod(xxhash64(...))`` — NOT ``rand()``, so retries/speculative
  tasks stay consistent; the small side is replicated ``buckets`` times
  with ``explode(sequence(...))``. Join on ``(key, salt)`` spreads each
  hot key over ``buckets`` reducers. Replication multiplies the small
  side by ``buckets`` — only use when that side stays broadcast-or-MB
  sized.
- ``salted_agg_count``: stage 1 aggregates on ``(key, salt)`` (spreads
  a hot key across reducers), stage 2 re-aggregates partials on
  ``key``. For algebraic aggregates (count/sum/min/max) the result is
  exactly the one-stage answer. Spark's HashAggregate already does a
  map-side partial, which usually suffices; explicit salting matters
  when the FIRST shuffle itself must be balanced (e.g. the partial
  state per key is large: collect_list, distinct accumulation).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, entropy: Column, buckets: int, col: str = "__salt") -> DataFrame:
    """Add a deterministic salt column in [0, buckets)."""
    return df.withColumn(col, F.pmod(F.xxhash64(entropy), F.lit(buckets)))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    entropy: Column,
    buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `big` ⋈ `small` on `on`, spreading each hot key of the
    big side across `buckets` reducers.

    entropy: a big-side column expression with per-row entropy (a row
    id, event id, line number) used to derive the deterministic salt.

    Supported join types: inner / left / left_semi / left_anti (big
    side preserved). right / full outer are rejected: the small side is
    replicated `buckets` times, so every small-side row UNMATCHED by
    the big side would surface once per replica — `buckets` duplicate
    null-padded rows.
    """
    if how.replace("_", "") in {"right", "rightouter", "full", "fullouter", "outer"}:
        raise ValueError(
            f"salted_join does not support how={how!r}: the replicated "
            "small side would emit each unmatched row `buckets` times. "
            "Use inner/left/left_semi/left_anti, or salt the other side."
        )
    b = with_salt(big, entropy, buckets)
    s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    ).withColumn("__salt", F.col("__salt").cast("bigint"))
    out = b.join(s, [on, "__salt"], how)
    return out.drop("__salt")


def salted_agg_count(
    df: DataFrame,
    key: str,
    entropy: Column,
    buckets: int = 8,
    value: str | None = None,
) -> DataFrame:
    """Two-stage salted count (and optional sum of `value`) per `key`:
    groupBy(key, salt) -> partials, then groupBy(key) -> exact totals."""
    aggs1 = [F.count(F.lit(1)).alias("__n")]
    aggs2 = [F.sum("__n").cast("bigint").alias("n")]
    if value is not None:
        aggs1.append(F.sum(value).alias("__s"))
        aggs2.append(F.sum("__s").alias(f"sum_{value}"))
    return (
        with_salt(df, entropy, buckets)
        .groupBy(key, "__salt")
        .agg(*aggs1)
        .groupBy(key)
        .agg(*aggs2)
    )
