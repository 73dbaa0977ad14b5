"""CBO table statistics (SURVEY §4.2 join-reordering row; round-8
verdict item 2): engine init collects catalog statistics and the tests
here pin BOTH halves of the commitment — the stats exist, and with
``spark.sql.cbo.enabled`` they visibly drive a PLAN-TIME decision that
the stats-blind planner gets wrong (documented vs AQE, which can only
re-plan at runtime stage boundaries after the feeding stages ran)."""

from __future__ import annotations

import re

import pytest

from luxo_rs_spark.engine import Engine

from conftest import SF_DIR_01

DB = "luxo_cbo_t"


@pytest.fixture(scope="module")
def cbo_engine(spark):
    eng = Engine(spark=spark)
    # register_dir is engine init's catalog hook; analyze=True is the
    # default — this is the SURVEY §4.2 "run ANALYZE TABLE … in engine
    # init" commitment executing
    eng.register_catalog(
        SF_DIR_01,
        tables=("orders", "lineitem", "customer", "nation"),
        database=DB,
    )
    return eng


def _stats_line(spark, table: str) -> str:
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {DB}.{table}").collect()
    for r in rows:
        if r.col_name == "Statistics":
            return r.data_type
    return ""


def test_analyze_collects_table_and_column_stats(spark, cbo_engine):
    """ANALYZE ran at registration: table-level stats carry an exact
    rowCount, and column-level stats carry distinct counts + min/max
    (the inputs FilterEstimation/JoinEstimation consume)."""
    stats = _stats_line(spark, "orders")
    m = re.search(r"(\d+) rows", stats)
    assert m, f"no rowCount in catalog stats: {stats!r}"
    n_orders = spark.table(f"{DB}.orders").count()
    assert int(m.group(1)) == n_orders

    cols = {
        r.info_name: r.info_value
        for r in spark.sql(
            f"DESCRIBE TABLE EXTENDED {DB}.orders o_orderstatus"
        ).collect()
    }
    assert cols.get("distinct_count") not in (None, "", "NULL")
    assert int(cols["distinct_count"]) >= 1
    # min/max are collected for orderable non-string types
    key_cols = {
        r.info_name: r.info_value
        for r in spark.sql(
            f"DESCRIBE TABLE EXTENDED {DB}.orders o_orderkey"
        ).collect()
    }
    assert key_cols.get("min") not in (None, "", "NULL")
    assert key_cols.get("max") not in (None, "", "NULL")


def test_cbo_stats_drive_plan_time_broadcast(spark, cbo_engine):
    """The load-bearing demonstration: a FILTERED orders side joined to
    lineitem, with the broadcast threshold set BETWEEN the filtered
    estimate and the raw table size.

    - CBO ON: FilterEstimation shrinks the filtered relation using the
      analyzed ndv (equality selectivity = 1/ndv) => its plan-time
      size drops under the threshold => BroadcastHashJoin chosen
      BEFORE anything runs.
    - CBO OFF: the size-only estimator passes the raw sizeInBytes
      through the Filter => over threshold => SortMergeJoin, and only
      AQE could rescue it at runtime AFTER both shuffle stages were
      already planned.

    That plan-time-vs-runtime gap is exactly what catalog stats buy at
    100 TB: the first shuffle of a many-join query is the one AQE can
    never un-plan."""
    # measure the planner's own estimate of the join's build side under
    # both settings (the size-only estimator already scales for column
    # pruning, so the threshold must sit between the two ESTIMATES, not
    # between raw file sizes)
    # equality on the analyzed HIGH-ndv column: CBO's selectivity is
    # 1/ndv(o_custkey) — a few rows — while the size-only estimator
    # passes the whole (column-pruned) relation size through the
    # Filter untouched. (A low-ndv predicate like o_orderstatus='F'
    # does NOT flip the strategy here: CBO's logical row-width
    # estimate is larger than the parquet-compressed size scaling, so
    # only a strongly selective predicate drops it below.)
    side_sql = (
        f"SELECT o_orderkey, o_orderpriority FROM {DB}.orders "
        "WHERE o_custkey = 370"
    )

    def plan_size(cbo: str) -> int:
        spark.conf.set("spark.sql.cbo.enabled", cbo)
        j = spark.sql(side_sql)._jdf.queryExecution().optimizedPlan()
        return int(str(j.stats().sizeInBytes()))

    saved_cbo = spark.conf.get("spark.sql.cbo.enabled", None)
    try:
        size_off = plan_size("false")
        size_on = plan_size("true")
    finally:
        if saved_cbo is None:
            spark.conf.unset("spark.sql.cbo.enabled")
        else:
            spark.conf.set("spark.sql.cbo.enabled", saved_cbo)
    assert size_on < size_off, (
        f"CBO filter estimation should shrink the estimate: "
        f"on={size_on} off={size_off}"
    )
    threshold = (size_on + size_off) // 2

    sql = f"""
        SELECT o.o_orderpriority, count(*) AS n
        FROM {DB}.lineitem l JOIN {DB}.orders o
          ON l.l_orderkey = o.o_orderkey
        WHERE o.o_custkey = 370
        GROUP BY o.o_orderpriority
    """
    conf = spark.conf
    saved = {
        k: conf.get(k, None)
        for k in (
            "spark.sql.cbo.enabled",
            "spark.sql.cbo.joinReorder.enabled",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", str(threshold))

        conf.set("spark.sql.cbo.enabled", "false")
        plan_off = spark.sql(sql)._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "simple"
            )
        )
        conf.set("spark.sql.cbo.enabled", "true")
        conf.set("spark.sql.cbo.joinReorder.enabled", "true")
        plan_on = spark.sql(sql)._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "simple"
            )
        )
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)

    assert "SortMergeJoin" in plan_off and "BroadcastHashJoin" not in (
        plan_off
    ), f"stats-blind plan should shuffle both sides:\n{plan_off}"
    assert "BroadcastHashJoin" in plan_on, (
        f"CBO + column stats should broadcast the filtered side at plan "
        f"time:\n{plan_on}"
    )


def test_cbo_filter_cardinality_visible_in_optimized_plan(spark, cbo_engine):
    """FilterEstimation's shrunken rowCount is visible on the optimized
    logical plan — the machine-readable face of 'sheds light on any
    query': with CBO on, the filtered relation's estimated rowCount is
    strictly below the analyzed table rowCount (and present at all,
    which the size-only estimator never provides)."""
    conf = spark.conf
    saved = conf.get("spark.sql.cbo.enabled", None)
    try:
        conf.set("spark.sql.cbo.enabled", "true")
        df = spark.sql(
            f"SELECT * FROM {DB}.orders WHERE o_orderstatus = 'F'"
        )
        stats = str(
            df._jdf.queryExecution().optimizedPlan().stats()
        )
        m = re.search(r"rowCount=(\d+)", stats)
        assert m, f"CBO should estimate a rowCount: {stats}"
        est = int(m.group(1))
        total = spark.table(f"{DB}.orders").count()
        assert 0 < est < total
    finally:
        if saved is None:
            conf.unset("spark.sql.cbo.enabled")
        else:
            conf.set("spark.sql.cbo.enabled", saved)


def test_histogram_stats_fix_skewed_range_estimate(spark, tmp_path):
    """Round-9 verdict item 9: equi-height histograms
    (register_catalog(histograms=True)) correct a plan-time decision
    that plain ndv/min-max stats get WRONG on a skewed column.

    The column: 95% of rows pile into v in [0, 9], 5% spread over
    [10, 100000]. A range filter v >= 50000 is ~2.5% selective, but the
    uniform (hi-lo)/(max-min) assumption estimates ~50%. With the
    broadcast threshold placed between the two estimates, histogram
    stats flip the join to a plan-time BroadcastHashJoin; min/max-only
    stats leave a SortMergeJoin."""
    import random

    db = "luxo_cbo_hist"
    rng = random.Random(7)
    rows = []
    for i in range(20000):
        v = rng.randrange(10) if i % 20 else 10 + rng.randrange(99990)
        rows.append((i, v, f"p{i % 97}"))
    skew_path = str(tmp_path / "skewed.parquet")
    spark.createDataFrame(
        rows, "id bigint, v bigint, tag string"
    ).coalesce(1).write.mode("overwrite").parquet(skew_path)
    big_path = str(tmp_path / "facts.parquet")
    spark.range(200000).selectExpr(
        "id % 20000 as id", "id as payload"
    ).write.mode("overwrite").parquet(big_path)

    q = spark.sql
    q(f"CREATE DATABASE IF NOT EXISTS {db}")
    conf = spark.conf
    saved = {
        k: conf.get(k, None)
        for k in (
            "spark.sql.cbo.enabled",
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.statistics.histogram.enabled",
        )
    }

    def register(with_hist: bool):
        for name, path in (("skewed", skew_path), ("facts", big_path)):
            q(f"DROP TABLE IF EXISTS {db}.{name}")
            q(
                f"CREATE TABLE {db}.{name} USING parquet "
                f"LOCATION '{path}'"
            )
        conf.set(
            "spark.sql.statistics.histogram.enabled",
            "true" if with_hist else "false",
        )
        q(f"ANALYZE TABLE {db}.skewed COMPUTE STATISTICS FOR COLUMNS id, v")
        q(f"ANALYZE TABLE {db}.facts COMPUTE STATISTICS FOR COLUMNS id")

    side_sql = f"SELECT id, tag FROM {db}.skewed WHERE v >= 50000"
    join_sql = f"""
        SELECT s.tag, count(*) AS n
        FROM {db}.facts f JOIN {db}.skewed s ON f.id = s.id
        WHERE s.v >= 50000
        GROUP BY s.tag
    """

    def est_rows() -> int:
        stats = str(
            spark.sql(side_sql)._jdf.queryExecution().optimizedPlan().stats()
        )
        # rowCount prints as plain ints OR scientific ("1.00E+4")
        m = re.search(r"rowCount=([0-9.]+(?:E[+-]?\d+)?)", stats)
        assert m, f"CBO should estimate a rowCount: {stats}"
        return int(float(m.group(1)))

    def est_size() -> int:
        j = spark.sql(side_sql)._jdf.queryExecution().optimizedPlan()
        return int(str(j.stats().sizeInBytes()))

    try:
        conf.set("spark.sql.cbo.enabled", "true")
        register(with_hist=False)
        rows_plain, size_plain = est_rows(), est_size()
        register(with_hist=True)
        rows_hist, size_hist = est_rows(), est_size()

        true_rows = spark.sql(side_sql).count()
        # uniform assumption wildly overestimates the skewed range;
        # the histogram lands within 2x of the truth
        assert rows_plain > 5 * true_rows, (rows_plain, true_rows)
        assert rows_hist < 2 * true_rows, (rows_hist, true_rows)

        # and that accuracy flips a plan-time join strategy
        threshold = (size_hist + size_plain) // 2
        conf.set("spark.sql.autoBroadcastJoinThreshold", str(threshold))
        register(with_hist=False)
        plan_plain = spark.sql(join_sql)._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "simple"
            )
        )
        register(with_hist=True)
        plan_hist = spark.sql(join_sql)._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "simple"
            )
        )
        assert "BroadcastHashJoin" not in plan_plain, plan_plain
        assert "BroadcastHashJoin" in plan_hist, plan_hist
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)
        q(f"DROP TABLE IF EXISTS {db}.skewed")
        q(f"DROP TABLE IF EXISTS {db}.facts")
        q(f"DROP DATABASE IF EXISTS {db}")


def test_cbo_join_reorder_flips_three_table_order(spark, cbo_engine):
    """Round-10 (r9 verdict item 7): with stats + histograms collected,
    CostBasedJoinReorder rewrites a deliberately-bad SYNTACTIC order —
    (lineitem JOIN orders) JOIN filtered-customer — into one that joins
    the filtered dimension first, so the big fact table meets an
    already-shrunk build side. Pinned on the optimized-plan JOIN TREE
    SHAPE (which relation pair joins innermost), not on timings."""
    q = f"""
        SELECT count(*) AS n
        FROM {DB}.lineitem l
        JOIN {DB}.orders o ON l.l_orderkey = o.o_orderkey
        JOIN {DB}.customer c ON o.o_custkey = c.c_custkey
        WHERE c.c_mktsegment = 'BUILDING'
    """
    conf = spark.conf

    def innermost_join_tables(enabled: str) -> set[str]:
        saved = {
            k: conf.get(k, None)
            for k in (
                "spark.sql.cbo.enabled",
                "spark.sql.cbo.joinReorder.enabled",
            )
        }
        try:
            conf.set("spark.sql.cbo.enabled", enabled)
            conf.set("spark.sql.cbo.joinReorder.enabled", enabled)
            plan = str(
                spark.sql(q)._jdf.queryExecution().optimizedPlan()
            )
        finally:
            for k, v in saved.items():
                if v is None:
                    conf.unset(k)
                else:
                    conf.set(k, v)
        # the innermost Join is the LAST 'Join' line; its subtree is
        # everything after it — the two base relations it joins are the
        # first two relations mentioned after that line
        lines = plan.splitlines()
        last_join = max(
            i for i, ln in enumerate(lines) if "Join" in ln
        )
        rels = []
        for ln in lines[last_join:]:
            for t in ("lineitem", "orders", "customer"):
                if f".{t}[" in ln:  # Relation spark_catalog.<db>.<t>[...]
                    rels.append(t)
        return set(rels[:2])

    # stats-blind syntactic order: lineitem joins orders innermost
    assert innermost_join_tables("false") == {"lineitem", "orders"}
    # CBO reorder: the filtered customer dimension joins orders first,
    # lineitem moves to the outer join against the shrunk build side
    reordered = innermost_join_tables("true")
    assert "customer" in reordered, (
        f"join reorder did not move the filtered dimension inward: "
        f"{reordered}"
    )
    assert "lineitem" not in reordered
    # semantics unchanged by the reorder
    n_cbo = spark.sql(q).first()["n"]
    assert n_cbo == spark.sql(q).first()["n"] and n_cbo > 0
