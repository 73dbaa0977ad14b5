"""Partition-pruning plan audits (SURVEY.md §4.2): partitioned table
layout + Catalyst pruning is this engine's equivalent of the
reference's B+Tree index descent (src/algo/search.rs:51-124 — floor /
successor seeks choosing which subtree to read). Static pruning skips
directories at plan time; dynamic partition pruning (DPP) skips them at
RUNTIME from the join's build side — the 100 TB fact-dim pattern.
"""

from __future__ import annotations

import shutil
import uuid

import pytest
from pyspark.sql import functions as F

from luxo_rs_spark.sources.registry import load_table

from conftest import SF_DIR


@pytest.fixture(scope="module")
def partitioned_orders(spark):
    path = f"/root/repo/.tmp/orders_part_{uuid.uuid4().hex[:8]}"
    load_table(spark, SF_DIR, "orders").write.partitionBy(
        "o_orderpriority"
    ).mode("overwrite").parquet(path)
    yield spark.read.parquet(path)
    shutil.rmtree(path, ignore_errors=True)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_static_partition_pruning(spark, partitioned_orders):
    df = partitioned_orders.filter(
        F.col("o_orderpriority") == "1-URGENT"
    ).groupBy().count()
    plan = _plan(df)
    assert "PartitionFilters: [isnotnull(o_orderpriority" in plan


def test_dynamic_partition_pruning_from_dim_join(spark, partitioned_orders):
    dim = spark.createDataFrame([("1-URGENT",), ("2-HIGH",)], "prio string")
    joined = partitioned_orders.join(
        dim.filter(F.col("prio") >= "2"),
        partitioned_orders.o_orderpriority == F.col("prio"),
    )
    assert "dynamicpruning" in _plan(joined).lower()


def test_pruned_read_is_correct(spark, partitioned_orders):
    got = partitioned_orders.filter(
        F.col("o_orderpriority") == "1-URGENT"
    ).count()
    want = (
        load_table(spark, SF_DIR, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .count()
    )
    assert got == want > 0
