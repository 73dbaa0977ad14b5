"""Bucketed-table co-located joins (SURVEY.md §4.2 partitioning /
SCALING.md): writing both fact tables bucketed BY the join key lets the
join run with ZERO shuffle — the physical plan must contain no Exchange
on either side. This is the 100 TB move for repeated fact-fact joins:
pay the shuffle once at write time, never again at read time.
"""

from __future__ import annotations

import shutil
import uuid
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from luxo_rs_spark.sources.registry import load_table

from conftest import SF_DIR

WAREHOUSE = Path("/root/repo/.tmp/warehouse")


@pytest.fixture(scope="module")
def bucketed(spark):
    """orders + lineitem written bucketed by the join key."""
    suffix = uuid.uuid4().hex[:8]
    names = {"orders": f"orders_b_{suffix}", "lineitem": f"lineitem_b_{suffix}"}
    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    lineitem = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    (
        orders.write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable(names["orders"])
    )
    (
        lineitem.write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable(names["lineitem"])
    )
    yield names
    for t in names.values():
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_join_has_no_shuffle(spark, bucketed):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            spark.table(bucketed["orders"])
            .join(
                spark.table(bucketed["lineitem"]),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .groupBy("o_orderpriority")
            .agg(F.sum("l_quantity").alias("qty"))
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        join_section = plan.split("HashAggregate")[-1]
        # co-located: the join reads bucketed scans directly — no
        # Exchange between the join and either scan
        assert "SortMergeJoin" in plan
        assert "Exchange" not in join_section
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_equals_plain_join(spark, bucketed):
    got = (
        spark.table(bucketed["orders"])
        .join(
            spark.table(bucketed["lineitem"]),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .count()
    )
    want = (
        load_table(spark, SF_DIR, "orders")
        .join(
            load_table(spark, SF_DIR, "lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .count()
    )
    assert got == want > 0
