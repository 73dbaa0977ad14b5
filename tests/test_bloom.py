"""Bloom filter operator: no false negatives, bounded false-positive
rate, and exactness of the bloom-then-verify pipeline."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from luxo_rs_spark.operators.bloom import bloom_build, bloom_probe


def test_bloom_no_false_negatives(spark):
    keys = spark.range(0, 500).select((F.col("id") * 3).alias("k"))
    bloom = bloom_build(keys, "k")
    probed = bloom_probe(
        keys.select(F.col("k").alias("id"), F.col("k")), "k", bloom, "id"
    )
    assert probed.count() == 500  # every inserted key must probe true


def test_bloom_false_positive_rate_bounded(spark):
    n, m, k = 500, 1 << 16, 4
    keys = spark.range(0, n).select((F.col("id") * 3).alias("k"))
    bloom = bloom_build(keys, "k", n_bits=m, n_hashes=k)
    # probe 2000 keys that were NOT inserted (offset domain)
    foreign = spark.range(10**6, 10**6 + 2000).select(
        F.col("id"), F.col("id").alias("k")
    )
    fp = bloom_probe(foreign, "k", bloom, "id", n_bits=m, n_hashes=k).count()
    expected = (1 - math.exp(-k * n / m)) ** k  # ~8.6e-7 at these params
    assert fp / 2000 <= max(5 * expected, 0.01)


def test_bloom_word_packing_portable(spark):
    """Words must never use the sign bit (63 bits/word, q216 note)."""
    keys = spark.range(0, 5000).select(F.col("id").alias("k"))
    bloom = bloom_build(keys, "k", n_bits=1 << 12)
    assert bloom.filter(F.col("word") < 0).count() == 0


def test_bloom_then_verify_is_exact(spark):
    """bloom_probe + real semi-join == plain semi-join (the q268
    pipeline): the bloom only prunes, the join proves."""
    big = spark.range(0, 3000).select(F.col("id"), (F.col("id") % 97).alias("k"))
    keyset = spark.range(0, 20).select((F.col("id") * 7).alias("k"))
    pruned = bloom_probe(big, "k", bloom_build(keyset, "k"), "id")
    got = sorted(
        r.id for r in pruned.join(keyset, "k", "left_semi").collect()
    )
    want = sorted(r.id for r in big.join(keyset, "k", "left_semi").collect())
    assert got == want
