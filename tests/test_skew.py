"""Salted join / salted agg (operators/skew.py): result equivalence
with the unsalted plan, and actual spreading of a hot key."""

from __future__ import annotations

from pyspark.sql import functions as F

from luxo_rs_spark.operators.skew import salted_agg_count, salted_join, with_salt


def test_salted_join_matches_plain_join(spark):
    # hot key: 90% of big-side rows share key 1
    big = spark.createDataFrame(
        [(1 if i % 10 else 2, i) for i in range(1000)], "k long, rid long"
    )
    small = spark.createDataFrame([(1, "hot"), (2, "cold")], "k long, tag string")
    got = salted_join(big, small, on="k", entropy=F.col("rid"), buckets=8)
    want = big.join(small, "k")
    assert sorted(r.rid for r in got.collect()) == sorted(
        r.rid for r in want.collect()
    )
    assert got.columns == want.columns


def test_salted_join_left_outer_keeps_unmatched(spark):
    big = spark.createDataFrame([(1, 1), (9, 2)], "k long, rid long")
    small = spark.createDataFrame([(1, "t")], "k long, tag string")
    got = salted_join(big, small, on="k", entropy=F.col("rid"), buckets=4, how="left")
    rows = {r.rid: r.tag for r in got.collect()}
    assert rows == {1: "t", 2: None}


def test_salted_join_rejects_right_and_full(spark):
    # right/full would emit each unmatched small-side row once per salt
    # replica — the function must refuse rather than silently duplicate.
    import pytest

    big = spark.createDataFrame([(1, 1)], "k long, rid long")
    small = spark.createDataFrame([(1, "t"), (2, "u")], "k long, tag string")
    for how in ["right", "right_outer", "full", "full_outer", "outer"]:
        with pytest.raises(ValueError, match="salted_join"):
            salted_join(big, small, on="k", entropy=F.col("rid"), how=how)


def test_salt_actually_spreads_hot_key(spark):
    big = spark.createDataFrame([(1, i) for i in range(500)], "k long, rid long")
    salted = with_salt(big, F.col("rid"), 8)
    n_buckets = salted.select("__salt").distinct().count()
    assert n_buckets == 8  # hot key now occupies 8 shuffle buckets


def test_salted_agg_exact_counts_and_sums(spark):
    df = spark.createDataFrame(
        [("a" if i % 20 else "b", i, float(i)) for i in range(400)],
        "k string, rid long, v double",
    )
    got = {
        r.k: (r.n, r.sum_v)
        for r in salted_agg_count(
            df, key="k", entropy=F.col("rid"), buckets=8, value="v"
        ).collect()
    }
    want = {
        r.k: (r.n, r.sum_v)
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sum_v"))
        .collect()
    }
    assert got == want
