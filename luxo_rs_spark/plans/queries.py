"""The declared query contract (SURVEY.md §2.3), DataFrame-first.

Each query is a callable ``(spark, sf_dir) -> DataFrame`` registered in
``QUERIES``; its DuckDB-equivalent ANSI SQL lives in
``luxo_rs_spark.plans.oracle.ORACLE_SQL`` under the same key, with
column names aligned so the driver's order-insensitive value-hash
matches.

Determinism rules applied here and in the oracle (SURVEY.md §2.3):
- every floating-point output is ``round(x, 2)`` (or 4 for cosine sims);
- timestamps are emitted as ``unix_micros`` BIGINT (``*_us`` columns) or
  ISO date strings — never raw timestamps;
- every query ends with a total ORDER BY with a unique tiebreaker;
- ambiguous integer widths are cast to BIGINT on both engines.

Plan-quality invariants (checked in tests/test_plans.py):
- dimension joins broadcast (region/nation/buckets are KB-sized);
- filters and column pruning reach the parquet scan;
- aggregations are partial (map-side) + final — automatic with
  ``HashAggregateExec``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from luxo_rs_spark.sources.registry import load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

#: queries whose semantics DuckDB cannot express (seeded fnv1a64 / LSH
#: signatures / stateful streaming); the driver records a rows-only check
#: and Spark-internal unit tests pin their semantics instead.
NO_ORACLE: set[str] = set()


def query(name: str):
    def deco(fn):
        QUERIES[name] = fn
        return fn

    return deco


def _r2(col) -> F.Column:
    return F.round(col, 2)


# ---------------------------------------------------------------------------
# Q01 — pricing summary (TPC-H Q1 adapted): scan -> filter -> agg -> sort.
# The filter is a range predicate on an ordered key — the job the
# reference's B+Tree floor/successor searches were built for
# (reference src/algo/search.rs:51-80,96-124); here it becomes a pushed
# parquet filter with row-group min-max skipping.
# ---------------------------------------------------------------------------
@query("q01_pricing_summary")
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _r2(F.sum("l_quantity")).alias("sum_qty"),
            _r2(F.sum("l_extendedprice")).alias("sum_base_price"),
            _r2(F.sum(disc_price)).alias("sum_disc_price"),
            _r2(F.sum(charge)).alias("sum_charge"),
            _r2(F.avg("l_quantity")).alias("avg_qty"),
            _r2(F.avg("l_extendedprice")).alias("avg_price"),
            _r2(F.avg("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
