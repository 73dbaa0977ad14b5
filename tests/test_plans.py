"""Physical-plan audits: the plan-quality invariants from
plans/queries.py's module docstring, checked against the real optimizer
output. A correct-but-badly-planned query is a perf regression at
100 TB even when row counts match — these tests pin the plan shape.
"""

from __future__ import annotations

import pytest

from luxo_rs_spark.plans.queries import QUERIES

from conftest import SF_DIR


def plan_of(spark, name: str) -> str:
    df = QUERIES[name](spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


#: inclusive (min, max) Spark minor-version window on which the
#: optimizer-feature plan assertions below were hand-audited. A Spark
#: bump outside this window fails LOUDLY with re-audit instructions
#: instead of flaking on renamed plan nodes (round-2 verdict item #9).
_AUDITED_SPARK = ((3, 5), (4, 1))


def _require_audited_spark(feature: str, tracking: str) -> None:
    import pyspark

    v = tuple(int(x) for x in pyspark.__version__.split(".")[:2])
    lo, hi = _AUDITED_SPARK
    if not (lo <= v <= hi):
        pytest.fail(
            f"{feature}: this physical-plan assertion was audited on "
            f"Spark {lo[0]}.{lo[1]}..{hi[0]}.{hi[1]} but is running on "
            f"{v[0]}.{v[1]}. Optimizer plan shapes ({tracking}) drift "
            f"across minors — re-run the query with "
            f".explain('formatted'), confirm the expected node is still "
            f"emitted (or record the replacement), then extend "
            f"_AUDITED_SPARK deliberately."
        )


def test_q01_filter_pushed_to_scan(spark):
    plan = plan_of(spark, "q01_pricing_summary")
    assert "PushedFilters" in plan
    assert "l_shipdate" in plan.split("PushedFilters")[1][:200]


def test_q01_column_pruned_scan(spark):
    plan = plan_of(spark, "q01_pricing_summary")
    read = plan.split("ReadSchema")[1][:400]
    # only the referenced columns reach the scan
    assert "l_quantity" in read and "l_orderkey" not in read


def test_q02_dimensions_broadcast(spark):
    plan = plan_of(spark, "q02_join_chain")
    assert plan.count("BroadcastHashJoin") >= 2


def test_q04_semi_join_with_pushed_filter(spark):
    plan = plan_of(spark, "q04_semi_join")
    assert "LeftSemi" in plan
    assert "l_quantity" in plan.split("PushedFilters")[-1][:200] or \
        "GreaterThan(l_quantity" in plan


def test_q05_range_join_broadcast_not_cartesian(spark):
    plan = plan_of(spark, "q05_range_join")
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_q09_rank_limit_pushdown(spark):
    _require_audited_spark(
        "WindowGroupLimit rank-limit pushdown", "SPARK-37099"
    )
    plan = plan_of(spark, "q09_topk_per_group")
    assert "WindowGroupLimit" in plan  # only k rows per group survive sort


def test_q18_take_ordered_not_global_sort(spark):
    plan = plan_of(spark, "q18_topk_offset")
    assert "TakeOrderedAndProject" in plan


def test_q26_theta_join_hashes_on_equi_key(spark):
    plan = plan_of(spark, "q26_theta_join")
    # the equality on nationkey is a hash-join key; the inequality is a
    # post-join condition, NOT a nested-loop over the cross product
    assert "CartesianProduct" not in plan
    assert "Join" in plan


def test_whole_stage_codegen_everywhere(spark):
    """Scalar batteries must stay fully inside codegen (no Python eval
    nodes in the plan)."""
    for name in ("q12_string_battery", "q13_math_battery", "q14_date_battery",
                 "q27_case_coalesce", "q29_predicates"):
        df = QUERIES[name](spark, SF_DIR)
        df.collect()  # AQE finalizes THIS df's plan only on execution
        plan = df._jdf.queryExecution().executedPlan().toString()
        # '*(n)' is the WholeStageCodegen marker in plan toString()
        assert "*(" in plan, name
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, name


def test_aqe_enabled(engine):
    assert engine.spark.conf.get("spark.sql.adaptive.enabled") == "true"


def test_q67_hash_split_no_shuffle(spark):
    # hash split is a pure map-side projection: scan -> project (pandas
    # UDF hash) -> agg. The ONLY exchange is the final stats groupBy;
    # the split assignment itself adds none.
    plan = plan_of(spark, "q67_hash_split")
    assert plan.count("Exchange") <= 2  # partial/final agg pair only


def test_q71_contamination_aggregates_before_pair_join(spark):
    # the hot-shingle guard must be an aggregate feeding an anti join,
    # not a cartesian anything
    plan = plan_of(spark, "q71_contamination")
    assert "CartesianProduct" not in plan
    assert "LeftAnti" in plan


def test_q74_centroids_broadcast_join(spark):
    # per-dim centroid components are tiny (labels x dims) -> broadcast
    plan = plan_of(spark, "q74_label_centroids")
    assert "BroadcastHashJoin" in plan


def test_q78_disjunction_pushed_and_equijoin_kept(spark):
    plan = plan_of(spark, "q78_disjunctive_filter")
    # the OR brackets must not degrade the equi-join to a nested loop
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
    # per-side disjunction components are pushed to the scans
    assert "PushedFilters" in plan and "Or(" in plan


def test_q98_bm25_stats_broadcast(spark):
    """Corpus stats and document frequencies are 1-row/3-row aggregates:
    they must come back as broadcasts, leaving the term count as the only
    wide shuffle."""
    plan = plan_of(spark, "q98_bm25_topk")
    assert plan.count("BroadcastHashJoin") + plan.count(
        "BroadcastNestedLoopJoin"
    ) >= 2
    assert "CartesianProduct" not in plan


def test_q99_quantization_is_shuffle_free(spark):
    """Scalar quantization is a pure map: no exchange besides the final
    presentation sort, and no Python eval nodes."""
    df = QUERIES["q99_embedding_quantize"](spark, SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the only Exchange allowed is the rangepartitioning for ORDER BY
    import re

    exchanges = re.findall(r"Exchange (\w+)", plan)
    assert all(e == "rangepartitioning" for e in exchanges), exchanges


def test_q103_locf_window_is_unbounded_preceding(spark):
    """The LOCF fill must use a running frame (O(1) state per row), not a
    re-scan of the whole partition per row."""
    plan = plan_of(spark, "q103_locf_gapfill")
    assert "unboundedpreceding" in plan.lower().replace(" ", "")


def test_q109_topk_and_customer_broadcast(spark):
    plan = plan_of(spark, "q109_shipping_priority")
    assert "TakeOrderedAndProject" in plan  # top-10 never global-sorts
    assert "BroadcastHashJoin" in plan  # filtered customer key list


def test_q110_all_dims_broadcast(spark):
    plan = plan_of(spark, "q110_local_supplier_volume")
    # supplier, nation(+region) broadcast; only fact-side joins shuffle
    assert plan.count("BroadcastHashJoin") >= 2


def test_q115_agg_shuffle_reused_by_join(spark):
    plan = plan_of(spark, "q115_large_volume_orders")
    # the HAVING aggregate and the orders join share one hash
    # partitioning on the order key: exactly one exchange of lineitem
    assert plan.count("hashpartitioning(l_orderkey") <= 2  # agg partial->final


def test_q117_single_fact_scan_and_shuffle(spark):
    plan = plan_of(spark, "q117_majority_supplier")
    # the per-part total is a window over the aggregated set, so the
    # fact is scanned once and exchanged once (map-side partial agg);
    # a naive two-branch formulation scans lineitem twice
    assert plan.count("lineitem.parquet") == 1
    assert plan.count("Exchange hashpartitioning(l_partkey") == 2  # agg + window


def test_runtime_bloom_filter_semi_prunes_fact(spark):
    """Catalyst's runtime bloom-filter join (SPARK-32268): a selective
    dim-side filter materializes as a bloom filter applied to the fact
    scan BEFORE the shuffle — the 100 TB lever for cutting shuffle
    volume on selective fact-fact joins. Local fixture sizes sit under
    the production thresholds, so the audit lowers them for the plan
    check and restores afterwards."""
    from pyspark.sql import functions as F
    from luxo_rs_spark.sources.registry import load_table

    _require_audited_spark("runtime bloom-filter join", "SPARK-32268")

    conf = spark.conf
    saved = {
        k: conf.get(k, None)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        li = load_table(spark, SF_DIR, "lineitem")
        orders = load_table(spark, SF_DIR, "orders").filter(
            F.col("o_totalprice") > 400000
        )
        j = li.join(orders, li.l_orderkey == orders.o_orderkey).groupBy(
            "l_returnflag"
        ).count()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "bloom" in plan.lower()
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)


def test_q127_triple_range_pushdown(spark):
    """TPC-H Q6 shape: all three range conjuncts must reach the parquet
    scan as PushedFilters — at 100 TB this is the difference between
    reading every row group and skipping most of them on min-max stats."""
    from luxo_rs_spark.plans.queries import QUERIES

    df = QUERIES["q127_forecast_revenue"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    pushed = plan[plan.index("PushedFilters") :].split("]")[0]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, f"{col} not pushed to scan"


def test_q126_semi_join_with_theta_residual(spark):
    """TPC-H Q4 shape: the correlated EXISTS must plan as a LeftSemi
    hash/merge join on the equi key with the date comparison kept as a
    join residual — NOT a broadcast-nested-loop join."""
    from luxo_rs_spark.plans.queries import QUERIES

    df = QUERIES["q126_priority_exists"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q107_editdistance_joins_on_brand_hash_key(spark):
    """The blocked edit-distance self-join must hash/merge on the brand
    equi key (length prefilter + levenshtein as residuals), never fall
    to a nested loop over all part pairs."""
    plan = plan_of(spark, "q107_editdistance_neardup")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q144_salted_agg_is_two_stage(spark):
    """Salted heavy-hitter agg: stage 1 on (key, salt), stage 2 on key —
    four HashAggregate nodes (partial+final per stage), zero joins."""
    plan = plan_of(spark, "q144_salted_heavy_hitters")
    assert plan.count("HashAggregate") >= 4
    assert "Join" not in plan


def test_q167_basket_lift_broadcasts_counts(spark):
    """Market-basket: the per-part counts and the 1-row basket total
    must broadcast onto the pair counts — the only shuffled join is the
    items self-join on the basket key."""
    plan = plan_of(spark, "q167_market_basket")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan


def test_q173_bands_broadcast_single_fact_shuffle(spark):
    """Percentile-band segmentation: the bounds row joins the fact scan
    via broadcast (nested-loop on ONE build row is fine); the fact table
    itself must not be exchanged before the band groupBy's own shuffle."""
    plan = plan_of(spark, "q173_quartile_bands")
    assert "Broadcast" in plan
    # the only Exchange on the fact path feeds the final band agg
    assert plan.count("HashAggregate") >= 2


def test_q152_percent_of_total_reuses_agg_partitioning(spark):
    """Ratio-to-report: the window over (r_name) must run on the agg
    output (|nations| rows) — the plan has exactly one fact aggregation
    and a Window above it, not a second fact scan."""
    plan = plan_of(spark, "q152_percent_of_total")
    assert "Window" in plan
    assert plan.count("Scan parquet") <= 4  # li + 3 dims, no re-scan


# -- round-2: pin broadcast-vs-SMJ for the remaining TPC-H gallery joins
# (a conf/AQE drift must not silently introduce a full dim shuffle) ----------


def test_q111_dims_broadcast_no_smj(spark):
    plan = plan_of(spark, "q111_volume_shipping")
    assert plan.count("BroadcastHashJoin") >= 4  # cust+supp nations, dims
    assert "SortMergeJoin" not in plan
    assert plan.count("lineitem.parquet") == 1


def test_q112_market_share_single_fact_scan(spark):
    plan = plan_of(spark, "q112_market_share")
    assert plan.count("BroadcastHashJoin") >= 5
    assert "SortMergeJoin" not in plan
    assert plan.count("lineitem.parquet") == 1


def test_q113_returned_items_dims_broadcast(spark):
    plan = plan_of(spark, "q113_returned_items")
    assert plan.count("BroadcastHashJoin") >= 2  # customer+nation onto agg
    assert "SortMergeJoin" not in plan


def test_q114_promo_part_broadcast(spark):
    plan = plan_of(spark, "q114_promo_revenue")
    assert "BroadcastHashJoin" in plan  # part dim onto lineitem
    assert "SortMergeJoin" not in plan
    assert plan.count("lineitem.parquet") == 1


def test_q116_supplier_dim_broadcast(spark):
    plan = plan_of(spark, "q116_supplier_diversity")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_q118_window_best_price_single_scan(spark):
    """The best-price-per-part step is a window over the aggregated
    offers, NOT a self-join of two aggregates: one lineitem scan, no
    sort-merge join, window reuses the aggregate's partitioning."""
    plan = plan_of(spark, "q118_best_price_supplier")
    assert plan.count("lineitem.parquet") == 1
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 3
    assert plan.count("Exchange hashpartitioning(l_partkey") <= 1


def test_q128_profit_dims_broadcast_single_scan(spark):
    plan = plan_of(spark, "q128_nation_year_profit")
    assert plan.count("BroadcastHashJoin") >= 3  # part, supplier, nation
    assert "SortMergeJoin" not in plan
    assert plan.count("lineitem.parquet") == 1


def test_plan_report_structure(engine):
    """plan_report surfaces the plan facts a perf review needs: scan
    pushdown, join strategy, shuffle count, codegen spans."""
    from pyspark.sql import functions as F

    from conftest import SF_DIR

    li = engine.load(SF_DIR, "lineitem").filter(F.col("l_quantity") > 45)
    orders = engine.load(SF_DIR, "orders")
    df = (
        li.join(F.broadcast(orders), li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .count()
    )
    rep = engine.plan_report(df, executed=True)
    assert rep["n_scans"] == 2
    pushed = [f for s in rep["scans"] for f in s["pushed_filters"]]
    assert any("l_quantity" in f for f in pushed)
    assert "BroadcastHashJoin" in rep["joins"]
    assert not rep["has_cartesian"]
    assert rep["n_codegen_spans"] >= 1
    # broadcast join + partial agg: only the final agg exchange remains
    assert rep["n_exchanges"] <= 2


def test_q270_prefix_join_broadcasts_sizes(spark):
    """PPJoin: the size tables ride as broadcasts; no cartesian
    anywhere; the shingle scan happens a bounded number of times
    (cached logical subtree reused across prefix/verify)."""
    plan = plan_of(spark, "q270_setsim_prefix_join")
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") >= 2


def test_q275_triangle_edges_cached_no_cartesian(spark):
    plan = plan_of(spark, "q275_triangle_count")
    assert "CartesianProduct" not in plan
    # support-thresholded edge build: the lineitem pair join keys on
    # l_orderkey (equi), never a nested loop
    assert "BroadcastNestedLoopJoin" not in plan


def test_q284_checksum_single_scan_single_shuffle(spark):
    """Anti-entropy checksum: one scan of orders, one exchange for the
    per-day agg — the O(1)-output reconciliation shape."""
    plan = plan_of(spark, "q284_partition_checksum")
    assert plan.count("orders.parquet") == 1
    assert plan.count("Exchange") <= 3  # partial+final agg + final sort


def test_q286_incremental_merge_no_history_rescan(spark):
    """The merged state plan scans orders at most twice (hist + delta
    slices of the same file here) and joins NOTHING fact-sized — the
    merge is a union of two key-cardinality states."""
    plan = plan_of(spark, "q286_incremental_rollup")
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q360_heavy_hitters_broadcast_semi_join(spark):
    """The candidate verify pass must broadcast the (tiny) MG candidate
    set into a semi-join — a shuffled semi-join here would defeat the
    whole candidate+verify design at 100 TB."""
    plan = plan_of(spark, "q360_heavy_hitters")
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "SortMergeJoin" not in plan


def test_q359_hll_rollup_partial_agg(spark):
    """Sketch build must be a partial+final HashAggregate (map-side
    sketch merge before the shuffle) — that is what makes the sketch
    table cheaper than shipping raw user_ids."""
    plan = plan_of(spark, "q359_hll_rollup")
    assert "HashAggregate" in plan
    assert plan.count("hll_sketch_agg") >= 2  # partial + final stages


def test_q361_projection_is_pure_map(spark):
    """JL projection adds no shuffle: the only exchanges in the plan
    belong to the top-k sort and the broadcast of the query vector."""
    plan = plan_of(spark, "q361_random_projection_topk")
    assert "TakeOrderedAndProject" in plan
    # one broadcast exchange (query vector); no repartition-by-column
    assert "hashpartitioning" not in plan.lower()


def test_q362_png_decode_map_side_only(spark):
    """Real-PNG decode is map-side: the single wide exchange is the
    final ORDER BY (rangepartitioning), never a join/agg shuffle."""
    plan = plan_of(spark, "q362_png_decode")
    assert "SortMergeJoin" not in plan and "HashAggregate" not in plan
    assert plan.lower().count("hashpartitioning") == 0


def test_q394_q395_jpeg_decode_map_side_only(spark):
    """4:2:0-with-restarts (q394) and progressive (q395) JPEG decode
    are map-side like q362/q393: the single wide exchange is the final
    ORDER BY (rangepartitioning), never a join/agg shuffle."""
    for name in ("q394_jpeg_420_restart_decode", "q395_jpeg_progressive_decode"):
        plan = plan_of(spark, name)
        assert "SortMergeJoin" not in plan and "HashAggregate" not in plan, name
        assert plan.lower().count("hashpartitioning") == 0, name


def test_q396_probe_partition_pruned(spark):
    """The LSH-probe read of the persisted signature table must reach
    the scan as PartitionFilters on the band directory column AND
    PushedFilters on the file-sorted bsig column — at 100 TB this is
    what turns an ANN probe into a handful of row-group reads instead
    of a signature-table scan (SURVEY §6 'LSH-band pushdown')."""
    plan = plan_of(spark, "q396_lsh_bucketed_probe")
    sig_scan = [
        seg
        for seg in plan.split("FileScan parquet")
        if "lsh_sigs" in seg.split("ReadSchema")[0]
    ]
    assert sig_scan, "signature-table scan missing from plan"
    seg = sig_scan[0]
    part = seg.split("PartitionFilters: [")[1].split("ReadSchema")[0]
    assert "band" in part and part.strip() != "],"
    pushed = seg.split("PushedFilters: [")[1][:400]
    assert "EqualTo(bsig" in pushed


def test_q09_window_group_limit_partial(spark):
    """Per-group top-k must hit Spark's WindowGroupLimit rank-limit
    pushdown in BOTH Partial (map-side, pre-shuffle) and Final stages —
    the optimization that keeps per-group top-k from shuffling whole
    groups at 100 TB."""
    _require_audited_spark(
        "WindowGroupLimit rank-limit pushdown", "SPARK-37099"
    )
    plan = plan_of(spark, "q09_topk_per_group")
    assert "WindowGroupLimit" in plan
    assert "Partial" in plan and "Final" in plan


def _walk_jplan(jnode):
    yield jnode
    ch = jnode.children()
    for i in range(ch.size()):
        yield from _walk_jplan(ch.apply(i))


#: logical nodes that make a global (unpartitioned) window SAFE when
#: found beneath it: the window input is provably bounded — an
#: aggregation rollup, an explicit limit, or a literal/driver-built
#: relation. LogicalRDD is deliberately NOT here (round-3 advice fix):
#: a localCheckpoint of a FULL fact table also lowers to LogicalRDD,
#: so exempting it would let a future single-task window over
#: checkpointed facts through silently. The scalable rank helpers
#: satisfy the invariant without it — their one unpartitioned window
#: sits above the per-partition stats Aggregate.
_BOUNDED_BELOW = {
    "Aggregate",        # the pre-agg pattern (SCALING.md)
    "GlobalLimit",
    "LocalLimit",
    "Deduplicate",
    "LocalRelation",    # literal in-memory table
    "OneRowRelation",
}


@pytest.mark.slow
def test_all_queries_plan_hygiene(spark):
    """Global sweep: EVERY registered query's plan must be free of

    - CartesianProduct (unbounded pair blowup at scale),
    - row-at-a-time Python evaluation (BatchEvalPython),
    - and — the round-2 verdict's added invariant — any Window with an
      EMPTY partitionSpec whose input is not provably bounded (an
      Aggregate / limit / literal relation beneath it). An
      unpartitioned window funnels its whole input through ONE task;
      that is only acceptable over pre-aggregated rollups, never over
      a fact table.

    UDTF queries are exempt from the Python check (UDTFs are row-based
    by definition, §2.2-J); there is deliberately NO Cartesian
    whitelist — even the cross-join queries keep a broadcast side
    (BroadcastNestedLoopJoin)."""
    py_ok = {
        "q49_udtf_tokens",
        "q171_python_udtf",
        "q378_polymorphic_udtf",
    }
    bad = []
    for name in sorted(QUERIES):
        df = QUERIES[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        if "CartesianProduct" in plan:
            bad.append((name, "CartesianProduct"))
        if "BatchEvalPython" in plan and name not in py_ok:
            bad.append((name, "BatchEvalPython"))
        # unpartitioned-window audit over the optimized LOGICAL plan
        # (stable node names, AQE-independent)
        logical = df._jdf.queryExecution().optimizedPlan()
        for node in _walk_jplan(logical):
            if node.getClass().getSimpleName() != "Window":
                continue
            if not node.partitionSpec().isEmpty():
                continue
            below = {
                n.getClass().getSimpleName()
                for n in _walk_jplan(node)
            } - {"Window"}
            if not below & _BOUNDED_BELOW:
                bad.append((name, "unpartitioned Window over unbounded input"))
    assert not bad, bad


def test_q430_ivf_probe_partition_pruned(spark):
    """The persisted-IVF probe must reach its index scan with
    PartitionFilters on the ivf_cluster directory column — the probe
    reads ~n_probe/n_centroids of the corpus at 100 TB (the q396
    pushdown story applied to the IVF posting-list layout)."""
    plan = plan_of(spark, "q430_ivf_pruned_probe")
    idx_scan = [
        seg
        for seg in plan.split("FileScan parquet")
        if "ivf_index" in seg.split("ReadSchema")[0]
    ]
    assert idx_scan, "IVF index scan missing from plan"
    part = idx_scan[0].split("PartitionFilters: [")[1].split("ReadSchema")[0]
    assert "ivf_cluster" in part and part.strip() != "],"


def test_q439_ivf_adc_probe_pruned_and_codes_only(spark):
    """The persisted IVF+ADC probe must (a) reach BOTH index scans with
    PartitionFilters on ivf_cluster — directory pruning, the q430
    contract — and (b) read ONLY (vec_id, codes) in the ADC stage:
    parquet column pruning past the float vectors is the bytes-read
    economy the layout exists for. Plus a filesystem economy check:
    the probed cluster directories hold well under the whole index."""
    import os

    plan = plan_of(spark, "q439_ivf_adc_pruned_probe")
    idx_scans = [
        seg
        for seg in plan.split("FileScan parquet")
        if "ivf_adc_index" in seg.split("ReadSchema")[0]
        and "_adc_meta" not in seg.split("ReadSchema")[0]
    ]
    assert len(idx_scans) == 2, f"expected 2 index scans, plan:\n{plan}"
    codes_scans = 0
    for seg in idx_scans:
        part = seg.split("PartitionFilters: [")[1].split("ReadSchema")[0]
        assert "ivf_cluster" in part and part.strip() != "],"
        schema = seg.split("ReadSchema: ")[1].splitlines()[0]
        if "codes" in schema:
            codes_scans += 1
            assert "embedding" not in schema, (
                "ADC scan must column-prune the raw vectors: " + schema
            )
        else:
            assert "embedding" in schema  # the re-rank scan
    assert codes_scans == 1, plan
    # filesystem economy: 4 probed clusters of 16 -> the pruned bytes
    # are a strict minority of the index even before column pruning
    root = os.path.join(
        "/tmp/luxo_rs_spark_sink",
        os.path.basename(SF_DIR.rstrip("/")),
        "ivf_adc_index",
    )
    sizes = {}
    for d in os.listdir(root):
        if not d.startswith("ivf_cluster="):
            continue
        sizes[d] = sum(
            os.path.getsize(os.path.join(root, d, f))
            for f in os.listdir(os.path.join(root, d))
            if not f.startswith((".", "_"))
        )
    assert len(sizes) > 4
    probed = [
        seg for seg in plan.split("PartitionFilters: [")[1:]
    ][0].split("]")[0]
    import re

    probe_ids = set(re.findall(r"\b(\d+)\b", probed))
    probed_bytes = sum(
        v for d, v in sizes.items() if d.split("=")[1] in probe_ids
    )
    assert probed_bytes < sum(sizes.values()) / 2


def test_q452_ivf_pq_probe_pruned_codes_only_and_udf_free(spark):
    """The trained-PQ probe inherits q439's plan contract — both index
    scans PartitionFilter on ivf_cluster, the ADC scan reads ONLY
    (vec_id, codes) — and adds one of its own: the probe path is pure
    JVM Column algebra (broadcast distance tables + element_at folds),
    so NO Python evaluation of any kind may appear in the probe plan
    (the encode UDF runs at index-WRITE time only)."""
    plan = plan_of(spark, "q452_ivf_pq_trained_probe")
    idx_scans = [
        seg
        for seg in plan.split("FileScan parquet")
        if "ivf_pq_index" in seg.split("ReadSchema")[0]
        and "_pq_codebooks" not in seg.split("ReadSchema")[0]
        and "_ivf_centroids" not in seg.split("ReadSchema")[0]
    ]
    assert len(idx_scans) == 2, f"expected 2 index scans, plan:\n{plan}"
    codes_scans = 0
    for seg in idx_scans:
        part = seg.split("PartitionFilters: [")[1].split("ReadSchema")[0]
        assert "ivf_cluster" in part and part.strip() != "],"
        schema = seg.split("ReadSchema: ")[1].splitlines()[0]
        if "codes" in schema:
            codes_scans += 1
            assert "embedding" not in schema, (
                "ADC scan must column-prune the raw vectors: " + schema
            )
        else:
            assert "embedding" in schema  # the re-rank scan
    assert codes_scans == 1, plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "pythonUDF"):
        assert marker not in plan, f"probe plan must be UDF-free: {marker}"
