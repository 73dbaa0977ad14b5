"""operators/rank.py: the scalable global-order primitives must be
bit-identical to the single-task `Window.orderBy(...)` forms they
replace, across partition counts and including desc ordering, decimal
sums, and partition-boundary lead stitching."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from pyspark.sql import Window

from luxo_rs_spark.operators.rank import (
    global_lead,
    global_ntile,
    global_row_number,
    global_running_sum,
)


def _df(spark, n=500, parts=13):
    # adversarial: duplicate sort keys (tiebreak on id), negative and
    # zero values, many partitions so range slices stay small
    rows = [(i, (i * 37) % 50, float((-1) ** i * (i % 7))) for i in range(n)]
    return spark.createDataFrame(
        rows, "id long, k long, v double"
    ).repartition(parts)


def _order():
    return [F.col("k").desc(), F.col("id")]


def test_global_row_number_matches_window(spark):
    df = _df(spark)
    got = {
        r["id"]: r["rn"]
        for r in global_row_number(df, _order(), out="rn").collect()
    }
    want = {
        r["id"]: r["rn"]
        for r in df.withColumn(
            "rn", F.row_number().over(Window.orderBy(*_order()))
        ).collect()
    }
    assert got == want


@pytest.mark.parametrize("n_tiles", [3, 10, 17, 1000])
def test_global_ntile_matches_window(spark, n_tiles):
    # 1000 tiles > row count exercises the all-big-buckets branch
    df = _df(spark)
    got = {
        r["id"]: r["t"]
        for r in global_ntile(df, _order(), n_tiles, out="t").collect()
    }
    want = {
        r["id"]: r["t"]
        for r in df.withColumn(
            "t", F.ntile(n_tiles).over(Window.orderBy(*_order()))
        ).collect()
    }
    assert got == want


@pytest.mark.parametrize("exclusive", [False, True])
def test_global_running_sum_matches_window(spark, exclusive):
    # TRUE SQL semantics, no coalesce on the reference side: the
    # window sum of an empty/all-NULL frame is NULL (exclusive=True's
    # first global row), and the helper must reproduce exactly that
    # (round-3 advice fix — the old version coalesced NULL to 0)
    df = _df(spark).withColumn("dv", F.col("v").cast("decimal(18,2)"))
    got = {
        r["id"]: r["s"]
        for r in global_running_sum(
            df, _order(), "dv", out="s", exclusive=exclusive
        ).collect()
    }
    upper = -1 if exclusive else 0
    w = Window.orderBy(*_order()).rowsBetween(Window.unboundedPreceding, upper)
    want = {
        r["id"]: r["s"]
        for r in df.withColumn("s", F.sum("dv").over(w)).collect()
    }
    assert got == want


@pytest.mark.parametrize("exclusive", [False, True])
def test_global_running_sum_nullable_values(spark, exclusive):
    """A nullable value column, with an all-NULL leading run spanning
    the first range partitions: rows whose whole frame is NULL must get
    NULL (not 0), rows after the first non-null value get numbers —
    bit-identical to sum(v) OVER (ORDER BY ...)."""
    rows = [
        (i, None if i < 60 or i % 5 == 0 else float(i % 9 - 4))
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "id long, v double").repartition(11)
    order = [F.col("id")]
    got = {
        r["id"]: r["s"]
        for r in global_running_sum(
            df, order, "v", out="s", exclusive=exclusive
        ).collect()
    }
    upper = -1 if exclusive else 0
    w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, upper)
    want = {
        r["id"]: r["s"]
        for r in df.withColumn("s", F.sum("v").over(w)).collect()
    }
    assert got == want
    assert want[0] is None  # the NULL-frame case is actually exercised


def test_global_lead_matches_window_with_stitching(spark):
    # sparse keys -> partition boundaries fall between non-adjacent
    # keys, exercising the next-partition-first-key stitch
    df = (
        _df(spark, n=400)
        .filter(F.col("id") % 3 != 1)
        .select((F.col("id") * 7).alias("key"))
    )
    got = {
        r["key"]: r["nxt"]
        for r in global_lead(
            df, [F.col("key")], "key", out="nxt"
        ).collect()
    }
    want = {
        r["key"]: r["nxt"]
        for r in df.withColumn(
            "nxt", F.lead("key").over(Window.orderBy("key"))
        ).collect()
    }
    assert got == want  # includes the final row's NULL


def test_no_unpartitioned_data_window_in_plan(spark):
    """The data-sized windows are all partitioned by __pid; the only
    unpartitioned window runs over the per-partition stats Aggregate."""
    df = _df(spark)
    plan = (
        global_ntile(df, _order(), 10, out="t")
        ._jdf.queryExecution()
        .optimizedPlan()
    )

    def walk(node):
        yield node
        ch = node.children()
        for i in range(ch.size()):
            yield from walk(ch.apply(i))

    for node in walk(plan):
        if node.getClass().getSimpleName() != "Window":
            continue
        if node.partitionSpec().isEmpty():
            below = {
                n.getClass().getSimpleName() for n in walk(node)
            }
            assert "Aggregate" in below or "LogicalRDD" not in below
