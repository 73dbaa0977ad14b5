"""Distributed Bloom filter build/probe (SURVEY.md §4.2 scale lever).

Why: at 100 TB the cheapest way to prune a fact table against a
selective key set is a bit-set membership test applied MAP-SIDE before
any shuffle. Catalyst already injects runtime bloom filters for joins
(SPARK-32268, asserted in tests/test_plans.py); this operator is the
*declarative* form — build once, persist as a tiny table, reuse across
queries/days (the runtime filter is per-query and non-reusable).

Representation: the filter is a DataFrame of (word_idx BIGINT,
word BIGINT) — 63 usable bits per word (the sign bit is excluded so the
packing is portable across engines, mirroring q216's bitmap note). The
build is one explode + one bit_or aggregate: associative, partial-agg
map-side, shuffle = |set bits| not |rows|. The probe broadcasts the
word table (m/63 rows — a 1M-bit filter is ~16k rows) and verifies all
k positions map-side; no shuffle of the probed fact.

Guarantees: NO false negatives (every inserted key probes true); false
positive rate ~= (1 - e^{-kn/m})^k for n keys, m bits, k hashes —
pinned with a tolerance in tests/test_bloom.py. Exact pipelines follow
the probe with a real semi-join on the survivors (q268): the bloom
prunes, the join proves.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: usable bits per packed word (sign bit excluded for portability)
_WORD_BITS = 63


def _positions(col: Column, n_bits: int, n_hashes: int, seed: int) -> list[Column]:
    """k deterministic bit positions per value: pmod(xxhash64(value,
    salt_i), m). Seeded-salt double hashing, stable across retries."""
    return [
        F.pmod(F.xxhash64(col, F.lit(seed + i)), F.lit(n_bits))
        for i in range(n_hashes)
    ]


def bloom_build(
    keys: DataFrame,
    col: str,
    n_bits: int = 1 << 16,
    n_hashes: int = 4,
    seed: int = 7,
) -> DataFrame:
    """Build the (word_idx, word) filter table over `keys[col]`."""
    pos = F.explode(
        F.array(*_positions(F.col(col), n_bits, n_hashes, seed))
    ).alias("pos")
    return (
        keys.select(pos)
        .select(
            (F.col("pos") / _WORD_BITS).cast("bigint").alias("word_idx"),
            F.pmod(F.col("pos"), F.lit(_WORD_BITS)).cast("int").alias("bit"),
        )
        .groupBy("word_idx")
        # shiftleft with a COLUMN bit count needs the SQL form (the
        # PySpark wrapper only takes a literal int)
        .agg(F.bit_or(F.expr("shiftleft(1L, bit)")).alias("word"))
    )


def bloom_probe(
    df: DataFrame,
    col: str,
    bloom: DataFrame,
    id_col: str,
    n_bits: int = 1 << 16,
    n_hashes: int = 4,
    seed: int = 7,
) -> DataFrame:
    """Rows of `df` whose `col` MAY be in the filter (no false
    negatives). The word table is broadcast; each row checks its k bit
    positions and survives iff all are set."""
    pos = F.posexplode(
        F.array(*_positions(F.col(col), n_bits, n_hashes, seed))
    )
    probes = df.select(F.col(id_col), pos.alias("k", "pos")).select(
        id_col,
        (F.col("pos") / _WORD_BITS).cast("bigint").alias("word_idx"),
        F.pmod(F.col("pos"), F.lit(_WORD_BITS)).cast("int").alias("bit"),
    )
    hit = (
        F.coalesce(F.col("word"), F.lit(0)).bitwiseAND(
            F.expr("shiftleft(1L, bit)")
        )
        != 0
    )
    survivors = (
        probes.join(F.broadcast(bloom), "word_idx", "left")
        .select(id_col, hit.alias("hit"))
        .groupBy(id_col)
        .agg(F.bool_and("hit").alias("maybe"))
        .filter(F.col("maybe"))
        .select(id_col)
    )
    return df.join(survivors, id_col, "left_semi")
