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


def test_repartition_by_range_writes_disjoint_files(spark, tmp_path):
    """repartitionByRange + sortWithinPartitions produces files with
    DISJOINT key ranges — the layout that makes parquet row-group
    min/max skipping effective for range predicates (the job the
    reference's B+Tree range scans did, SURVEY §1.1)."""
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from conftest import SF_DIR
    from luxo_rs_spark.sources.registry import load_table

    out = str(tmp_path / "orders_ranged")
    (
        load_table(spark, SF_DIR, "orders")
        .repartitionByRange(4, "o_custkey")
        .sortWithinPartitions("o_custkey")
        .write.mode("overwrite")
        .parquet(out)
    )
    import glob

    ranges = []
    for f in glob.glob(f"{out}/*.parquet"):
        pf = pq.ParquetFile(f)
        mins, maxs = [], []
        for rg in range(pf.metadata.num_row_groups):
            col = next(
                pf.metadata.row_group(rg).column(i)
                for i in range(pf.metadata.num_columns)
                if pf.metadata.row_group(rg).column(i).path_in_schema
                == "o_custkey"
            )
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    assert len(ranges) == 4
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2  # files cover disjoint key ranges
