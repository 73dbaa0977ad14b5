"""Data-contract validation (SURVEY.md §2.2-K pipeline ops): declare
expectations over a table — not-null, uniqueness, range, set
membership, referential integrity — and get back one violations
report, the gate a production pipeline runs before publishing a
partition.

Design: every check compiles to ONE conditional aggregate over a
single scan of the table (count of rows violating the predicate);
uniqueness adds one groupBy on the key and referential integrity one
left-anti join per foreign key — nothing is row-materialized, so the
report costs O(one pass + one shuffle per unique/fk check) at any
scale and each check's cost is independently attributable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def check_report(
    df: DataFrame,
    row_checks: dict[str, Column],
    unique_keys: dict[str, list[str]] | None = None,
    foreign_keys: dict[str, tuple[DataFrame, list[str], list[str]]]
    | None = None,
) -> DataFrame:
    """(check, n_violations, pass) — one row per declared expectation.

    ``row_checks``: name -> boolean Column that must hold per row
    (NULL counts as a violation, matching SQL CHECK semantics under
    3VL where only TRUE passes).
    ``unique_keys``: name -> key columns that must be globally unique.
    ``foreign_keys``: name -> (parent_df, child_cols, parent_cols).
    """
    if not row_checks and not unique_keys and not foreign_keys:
        raise ValueError(
            "check_report: at least one of row_checks / unique_keys / "
            "foreign_keys must be non-empty"
        )
    aggs = [
        F.sum(
            F.when(F.coalesce(cond, F.lit(False)), 0).otherwise(1)
        ).cast("bigint").alias(f"__c{i}")
        for i, cond in enumerate(row_checks.values())
    ]
    parts = []
    if aggs:
        # Typed unpivot: build (check, n_violations) structs from literal
        # names + the aggregate columns and explode — check names are
        # carried as lit() values, never interpolated into SQL text, so
        # quotes/backticks in user-supplied names are inert.
        row_counts = df.agg(*aggs)
        pairs = F.array(
            *[
                F.struct(
                    F.lit(n).alias("check"),
                    F.col(f"__c{i}").alias("n_violations"),
                )
                for i, n in enumerate(row_checks)
            ]
        )
        parts.append(
            row_counts.select(F.explode(pairs).alias("kv")).select(
                "kv.check", "kv.n_violations"
            )
        )
    for name, keys in (unique_keys or {}).items():
        dup = (
            df.groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") > 1)
            .agg(
                F.coalesce(F.sum(F.col("__n") - 1), F.lit(0))
                .cast("bigint")
                .alias("n_violations")
            )
            .select(F.lit(name).alias("check"), "n_violations")
        )
        parts.append(dup)
    for name, (parent, child_cols, parent_cols) in (
        foreign_keys or {}
    ).items():
        cond = [
            df[c] == parent[p] for c, p in zip(child_cols, parent_cols)
        ]
        orphans = (
            df.join(parent, cond, "left_anti")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_violations"))
            .select(F.lit(name).alias("check"), "n_violations")
        )
        parts.append(orphans)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.withColumn("pass", F.col("n_violations") == 0)
