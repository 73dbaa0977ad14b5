"""AQE skew-join audit (SURVEY.md §4.2 skew handling / SCALING.md):
a join with one pathologically hot key must be split by AQE at runtime
— the finalized adaptive plan carries `skew=true` on the join node.
This is the knob that stands in for manual salting on 100 TB hot keys.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def skew_confs(spark):
    # thresholds scaled down so a local-sized join exhibits skew
    saved = {}
    tuned = {
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "100KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "100KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    for k, v in tuned.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    yield
    for k, v in saved.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_aqe_splits_skewed_join(spark, skew_confs):
    # key 0 holds ~83% of all rows; keys 1..99 are uniform
    left = spark.range(600_000).select(
        F.when(F.col("id") < 500_000, 0)
        .otherwise((F.col("id") % 99) + 1)
        .alias("k"),
        F.col("id").alias("v"),
    )
    right = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("w")
    )
    j = left.join(right, "k").select(F.sum(F.col("v") + F.col("w")).alias("s"))
    [row] = j.collect()  # AQE decides at runtime -> must materialize first
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" in plan
    # and the answer is still exact
    want = sum(
        (v + (0 if v < 500_000 else ((v % 99) + 1) * 10))
        for v in range(600_000)
    )
    assert row.s == want
