"""Vector math over ARRAY<FLOAT> embedding columns (SURVEY.md §2.2-K).

Built on higher-order functions (zip_with / aggregate) so the math runs
JVM-side with a sequential left-to-right DOUBLE accumulator — the same
order DuckDB folds lists, which keeps dot products bit-comparable for
the oracle.

Scale note: a 64-dim dot product is ~64 fused multiply-adds inside
codegen; brute-force top-k over N vectors is O(N) per query vector with
a TakeOrderedAndProject — the right baseline. The sub-linear path is
LSH bucketing (operators/similarity.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _dsum(arr: Column) -> Column:
    """Sequential double fold of an array (deterministic order)."""
    return F.aggregate(arr, F.lit(0.0).cast("double"), lambda acc, x: acc + x)


def dot(a: Column, b: Column) -> Column:
    return _dsum(F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")))


def norm(a: Column) -> Column:
    return F.sqrt(_dsum(F.transform(a, lambda x: x.cast("double") * x.cast("double"))))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
