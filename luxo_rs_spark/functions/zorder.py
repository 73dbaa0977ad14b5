"""Z-order (Morton) interleaved sort keys for multi-dimensional data
clustering (Morton 1966, "A computer oriented geodetic data base"; the
layout trick behind Delta Lake's OPTIMIZE ZORDER and Databricks/Iceberg
data skipping).

Why it matters at 100 TB: parquet min-max row-group stats prune on the
SORT key only. Sorting by (a, b) clusters a but scatters b; sorting by
the bit-interleaved z(a, b) keeps BOTH dimensions locally bounded in
every file, so range predicates on either column skip row groups.
Usage: ``df.repartitionByRange(N, z2(col_a, col_b)).sortWithinPartitions(...)``
before a parquet write.

The interleave is pure bitwise arithmetic (shiftleft/shiftright/AND/OR)
— whole-stage-codegen friendly, no UDF, and expressible verbatim in
ANSI SQL for the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def z2(a: Column, b: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of two non-negative ints:
    bit i of ``a`` lands at position 2i, bit i of ``b`` at 2i+1."""
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(a.cast("bigint"), i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(
                F.shiftright(b.cast("bigint"), i).bitwiseAND(F.lit(1)), 2 * i + 1
            )
        )
    return z


def z2_sql(a: str, b: str, bits: int = 16) -> str:
    """The identical interleave as an ANSI SQL expression (DuckDB/Spark
    dialect-portable: <<, >>, &, | operators)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


def equiwidth_bucket(c: Column, lo: int, hi: int, n: int) -> Column:
    """Map an integer column with global range [lo, hi] onto n
    equal-width buckets 0..n-1 — the normalization step before bit
    interleaving (Delta's OPTIMIZE ZORDER uses range-partition ids;
    equal width keeps the assignment an exact, oracle-replayable
    function of (value, lo, hi) at the cost of skew sensitivity).
    Pure codegen arithmetic, no UDF."""
    span = max(1, hi - lo + 1)
    b = F.floor(((c.cast("bigint") - F.lit(lo)) * n) / F.lit(span))
    return F.least(F.greatest(b, F.lit(0)), F.lit(n - 1)).cast("bigint")


def equiwidth_bucket_sql(c: str, lo: int, hi: int, n: int) -> str:
    """The identical bucket assignment as ANSI SQL (DuckDB-portable)."""
    span = max(1, hi - lo + 1)
    return (
        f"least(greatest(cast(floor((({c} - {lo}) * {n}) / {span}) "
        f"as bigint), 0), {n - 1})"
    )


def zn(cols: list[Column], bits: int = 16) -> Column:
    """N-dimensional Morton interleave: bit i of column j lands at
    position i*n + j (for n=2 this is exactly ``z2``). n*bits must fit
    a BIGINT (<= 62)."""
    n = len(cols)
    if n < 2:
        raise ValueError("zn needs at least two columns")
    if n * bits > 62:
        raise ValueError(f"{n} dims x {bits} bits exceeds a BIGINT")
    z = F.lit(0).cast("bigint")
    for j, c in enumerate(cols):
        for i in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(c.cast("bigint"), i).bitwiseAND(F.lit(1)),
                    i * n + j,
                )
            )
    return z


def zn_sql(cols: list[str], bits: int = 16) -> str:
    """The identical n-dim interleave as ANSI SQL."""
    n = len(cols)
    terms = []
    for j, c in enumerate(cols):
        for i in range(bits):
            terms.append(f"((({c} >> {i}) & 1) << {i * n + j})")
    return " | ".join(terms)
