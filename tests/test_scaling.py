"""Scale-regression guards (round-3 verdict items #1-#3).

The full measurement lives in tools/scale_bench.py (x1..x8 replica
corpora, committed to BENCH_SCALING.json); these tests are the CI-fast
versions that fail if a config change re-introduces the two measured
round-3 scale defects:

- banded-LSH candidates growing as a constant fraction of N^2 (the
  fixed 8x8 band config admitted ~3% of ALL pairs);
- SemDeDup block sizes growing linearly with the corpus (fixed
  n_clusters=16).
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from pyspark.sql import functions as F

from luxo_rs_spark.operators.similarity import derive_lsh_bands

pytestmark = pytest.mark.slow  # heavy suite: full-lane only


def test_derive_lsh_bands_occupancy_and_recall():
    """The adaptive derivation must (a) keep expected bucket occupancy
    ~constant (band_bits tracks log2 N), (b) keep the analytic recall
    at the design similarity above the target, and (c) pass explicit
    configs through untouched."""
    prev_bits = 0
    for n in [1_000, 10_000, 100_000, 1_000_000, 10_000_000]:
        n_bands, band_bits = derive_lsh_bands(n, None, None)
        assert band_bits >= prev_bits  # monotone in N
        prev_bits = band_bits
        # occupancy: N / 2^bits stays within a small constant band
        assert n / 2**band_bits <= 16, (n, band_bits)
        # analytic recall at the design point s=0.95 stays >= 0.95
        p = 1 - math.acos(0.95) / math.pi
        recall = 1 - (1 - p**band_bits) ** n_bands
        assert recall >= 0.95, (n, n_bands, band_bits, recall)
    # explicit values are never overridden
    assert derive_lsh_bands(10**9, 4, 16) == (16, 4)


def test_lsh_candidates_subquadratic_growth(spark):
    """Doubling a random corpus must grow the candidate set by well
    under 4x (quadratic). The adaptive config lengthens bands as N
    grows; a regression to any FIXED config makes this ratio ~4 (and
    >4 once band-count growth is also fixed)."""
    from luxo_rs_spark.operators.similarity import embedding_lsh_candidates

    rng = np.random.default_rng(3)

    def corpus(n):
        mat = rng.standard_normal((n, 64)).astype(np.float32)
        return spark.createDataFrame(
            [(i, mat[i].tolist()) for i in range(n)],
            "vec_id long, embedding array<float>",
        )

    n1, n2 = 4096, 8192
    c1 = embedding_lsh_candidates(corpus(n1)).count()
    c2 = embedding_lsh_candidates(corpus(n2)).count()
    assert c1 > 0
    assert c2 / c1 <= 3.0, (c1, c2)


def test_semantic_dedup_cluster_count_scales(spark):
    """The derived n_clusters must track the corpus (ceil(N/128), not
    a fixed 16): at N=4096 the assignment must actually use ids beyond
    15, and mean block size must stay near target_block."""
    from luxo_rs_spark.operators.similarity import semantic_dedup

    rng = np.random.default_rng(5)
    mat = rng.standard_normal((4096, 64)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, mat[i].tolist()) for i in range(4096)],
        "vec_id long, embedding array<float>",
    )
    flags = semantic_dedup(df, threshold=0.99).cache()
    sizes = [
        r["n"]
        for r in flags.groupBy("cluster").agg(F.count("*").alias("n")).collect()
    ]
    max_id = flags.agg(F.max("cluster")).head()[0]
    flags.unpersist()
    # 4096/128 = 32 derived clusters; a fixed-16 regression caps id at 15
    assert max_id >= 20, max_id
    assert sum(sizes) == 4096
    # blocks stay bounded: mean near target, no cluster hoarding half
    # the corpus (random data; kmeans imbalance tolerance is generous)
    assert sum(sizes) / len(sizes) <= 256
    assert max(sizes) <= 1024, max(sizes)
