"""Mergeable t-digest quantile tables (operators/tdigest.py):
determinism, rank-error bounds vs exact percentiles, and
incremental-merge stability."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from luxo_rs_spark.operators.tdigest import (
    merge_tdigest_tables,
    tdigest_quantiles,
    tdigest_table,
)
from luxo_rs_spark.sources.registry import load_table
from tests.conftest import SF_DIR_01


def _exact_quantiles(spark, df, col, qs):
    row = df.agg(
        F.expr(
            f"percentile({col}, array({', '.join(str(q) for q in qs)}))"
        ).alias("ps")
    ).collect()[0]
    return row["ps"]


def test_tdigest_rank_error_bound(spark):
    """p50/p95/p99 of lineitem prices per returnflag: the digest's
    answer must sit within 1% RANK error of the exact percentile
    (value compared via the exact CDF: count of values below)."""
    li = load_table(spark, SF_DIR_01, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    tbl = tdigest_table(li, ["l_returnflag"], "l_extendedprice", delta=100)
    got = tdigest_quantiles(tbl, [0.5, 0.95, 0.99]).collect()
    for r in got:
        flag = r["l_returnflag"]
        vals = np.array([
            x["l_extendedprice"]
            for x in li.filter(F.col("l_returnflag") == flag).collect()
        ])
        n = len(vals)
        for q, est in [(0.5, r["p50"]), (0.95, r["p95"]), (0.99, r["p99"])]:
            rank = (vals <= est).mean()
            assert abs(rank - q) <= 0.01, (flag, q, est, rank)


def test_tdigest_deterministic(spark):
    """Same rows -> bit-identical digest (fixed-order numpy, sorted
    centroid sweep) — required for re-run stability."""
    li = load_table(spark, SF_DIR_01, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    a = tdigest_table(li, ["l_returnflag"], "l_extendedprice").collect()
    b = tdigest_table(li, ["l_returnflag"], "l_extendedprice").collect()
    da = {r["l_returnflag"]: (r["means"], r["weights"]) for r in a}
    db = {r["l_returnflag"]: (r["means"], r["weights"]) for r in b}
    assert da == db


def test_tdigest_merge_tracks_direct(spark):
    """Incremental: merge(digest(first half), digest(second half)) must
    answer quantiles within the same 1% rank envelope as the direct
    digest — the property that makes stored daily digests roll up."""
    li = load_table(spark, SF_DIR_01, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_orderkey"
    )
    h1 = li.filter(F.col("l_orderkey") % 2 == 0)
    h2 = li.filter(F.col("l_orderkey") % 2 == 1)
    t1 = tdigest_table(h1, ["l_returnflag"], "l_extendedprice")
    t2 = tdigest_table(h2, ["l_returnflag"], "l_extendedprice")
    merged = merge_tdigest_tables(t1, t2, ["l_returnflag"])
    got = tdigest_quantiles(merged, [0.5, 0.99]).collect()
    for r in got:
        flag = r["l_returnflag"]
        vals = np.array([
            x["l_extendedprice"]
            for x in li.filter(F.col("l_returnflag") == flag).collect()
        ])
        for q, est in [(0.5, r["p50"]), (0.99, r["p99"])]:
            rank = (vals <= est).mean()
            assert abs(rank - q) <= 0.01, (flag, q, est, rank)
    # total row counts survive the merge exactly
    ns = {r["l_returnflag"]: r["n"] for r in got}
    exact = {
        r["l_returnflag"]: r["c"]
        for r in li.groupBy("l_returnflag").agg(
            F.count(F.lit(1)).alias("c")
        ).collect()
    }
    assert ns == exact


def test_tdigest_bounded_size(spark):
    """The digest must stay O(delta) however many rows go in."""
    li = load_table(spark, SF_DIR_01, "lineitem").select(
        F.lit("all").alias("k"), "l_extendedprice"
    )
    tbl = tdigest_table(li, ["k"], "l_extendedprice", delta=100).collect()
    assert len(tbl) == 1
    assert len(tbl[0]["means"]) <= 200  # ~delta centroids, 2x slack
