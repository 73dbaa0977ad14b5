"""MERGE / upsert (SURVEY.md §2.2-A sinks adjunct): declarative
copy-on-write merge of an updates batch into a base table.

Spark-without-a-table-format has no transactional MERGE INTO; the
engine ships merge as a deterministic plan over immutable inputs —
exactly what Delta/Iceberg execute underneath (copy-on-write):

    result = (base rows whose key has NO update)      -- left-anti join
           UNION ALL (update rows not flagged delete)

Scale notes (100 TB): one anti-join keyed on the merge key (AQE-
skew-joinable) + a union — no driver state. With a real table format
the same plan runs file-pruned: only files containing touched keys are
rewritten. Update precedence: a key that is both updated and deleted
is DELETED (delete wins), matching MERGE's WHEN MATCHED THEN DELETE
evaluation order when the delete branch is listed first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    key: str,
    delete_col: str | None = None,
) -> DataFrame:
    """Merge `updates` into `base` by `key`.

    - key in both            -> the updates row wins (or is dropped when
                                `delete_col` is true: delete wins)
    - key only in base       -> base row kept
    - key only in updates    -> inserted (unless flagged delete)

    `updates` must carry the same columns as `base` (plus optionally
    `delete_col`); duplicate keys within `updates` are the caller's
    contract to avoid, as in SQL MERGE (nondeterministic otherwise).
    """
    untouched = base.join(updates.select(key), key, "left_anti")
    if delete_col is not None:
        survivors = updates.filter(~F.col(delete_col)).drop(delete_col)
    else:
        survivors = updates
    return untouched.unionByName(survivors)


def merge_agg_states(
    snapshot: DataFrame,
    delta: DataFrame,
    keys: list[str],
) -> DataFrame:
    """Merge two partial-aggregate states (the incremental
    materialized-view maintenance primitive): each input carries, per
    key, the mergeable accumulators ``n`` (count), ``s`` (sum),
    ``mn``/``mx`` (min/max). The merged state is exact for the union of
    the underlying rows — averages and other derived metrics recompute
    from (s, n) at read time.

    At 100 TB this is the difference between re-scanning a year of
    history and aggregating ONLY today's partition: the snapshot is
    bounded by key cardinality, so the merge is a key-sized join, not
    a fact-sized scan. The same algebra is why Spark's own
    HashAggregate can split partial/final across a shuffle.
    """
    both = snapshot.unionByName(delta)
    return both.groupBy(*keys).agg(
        F.sum("n").alias("n"),
        F.sum("s").alias("s"),
        F.min("mn").alias("mn"),
        F.max("mx").alias("mx"),
    )


def agg_state(df: DataFrame, keys: list[str], value: str) -> DataFrame:
    """Build the mergeable accumulator state for `value` per key."""
    return df.groupBy(*keys).agg(
        F.count(value).alias("n"),
        F.sum(value).alias("s"),
        F.min(value).alias("mn"),
        F.max(value).alias("mx"),
    )
