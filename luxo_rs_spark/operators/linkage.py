"""Record linkage / entity resolution (SURVEY.md §2.2-K corpus ops):
blocked candidate generation + Fellegi-Sunter-style additive agreement
scoring — the classic two-stage shape (Fellegi & Sunter 1969) that
every dedup-across-sources pipeline reduces to.

Scale shape: candidates come ONLY from equi-joins on blocking keys
(never all-pairs); per-block pair count is C(block size, 2), so the
blocking scheme is the knob that trades recall (band-boundary misses)
against join fan-out — identical economics to the LSH band trick.
Scores are integer-scaled (x10) so the rank order is exact across
engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def blocked_pairs(
    df: DataFrame,
    block_cols: list[str],
    id_col: str,
    keep_cols: list[str],
) -> DataFrame:
    """Candidate (a, b) pairs sharing every blocking key, a < b on id.
    ``keep_cols`` ride along aliased ``a_*`` / ``b_*`` for scoring."""
    left = df.select(
        F.col(id_col).alias("a"),
        *[F.col(c).alias(f"__bk_{c}") for c in block_cols],
        *[F.col(c).alias(f"a_{c}") for c in keep_cols],
    )
    right = df.select(
        F.col(id_col).alias("b"),
        *[F.col(c).alias(f"__bk_{c}") for c in block_cols],
        *[F.col(c).alias(f"b_{c}") for c in keep_cols],
    )
    return left.join(
        right, [f"__bk_{c}" for c in block_cols]
    ).filter(F.col("a") < F.col("b")).drop(
        *[f"__bk_{c}" for c in block_cols]
    )


def agreement_score(conditions: list[tuple[Column, int]]) -> Column:
    """Additive integer score: sum of weight-x10 points for each
    agreeing condition (disagreement contributes 0 — the simplified
    non-negative Fellegi-Sunter weight form)."""
    score = F.lit(0)
    for cond, weight_x10 in conditions:
        score = score + F.when(cond, weight_x10).otherwise(0)
    return score.cast("bigint")
