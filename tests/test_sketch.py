"""Mergeable-sketch operators (operators/sketch.py): HLL rollup
accuracy + merge identity, Misra-Gries superset guarantee, and exact
heavy hitters vs a straight groupBy."""

from __future__ import annotations

from pyspark.sql import functions as F

from luxo_rs_spark.operators.sketch import (
    heavy_hitters,
    hll_rollup,
    hll_sketch_table,
    misra_gries_candidates,
)
from luxo_rs_spark.sources.registry import load_table
from tests.conftest import SF_DIR_01


def test_hll_estimate_error_bound(spark):
    """lg_k=14 -> ~0.8% RSE; assert every per-type estimate is within
    2% of the exact distinct count."""
    ev = load_table(spark, SF_DIR_01, "events").select(
        "event_type", F.to_date("ts").alias("day"), "user_id"
    )
    daily = hll_sketch_table(ev, ["event_type", "day"], "user_id")
    est = {
        r["event_type"]: r["estimate"]
        for r in hll_rollup(daily, ["event_type"]).collect()
    }
    exact = {
        r["event_type"]: r["d"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("d"))
        .collect()
    }
    assert set(est) == set(exact)
    for t, d in exact.items():
        assert abs(est[t] - d) <= max(2, 0.02 * d), (t, est[t], d)


def test_hll_union_matches_direct_sketch(spark):
    """Merge identity: unioning per-day sketches must equal sketching
    the whole table directly (HLL union = per-bucket max, associative)
    — this is what makes the rollup table answer coarser grains without
    raw data."""
    ev = load_table(spark, SF_DIR_01, "events").select(
        "event_type", F.to_date("ts").alias("day"), "user_id"
    )
    daily = hll_sketch_table(ev, ["event_type", "day"], "user_id")
    merged = {
        r["event_type"]: r["estimate"]
        for r in hll_rollup(daily, ["event_type"]).collect()
    }
    direct = {
        r["event_type"]: r["estimate"]
        for r in hll_rollup(
            hll_sketch_table(ev, ["event_type"], "user_id"), ["event_type"]
        ).collect()
    }
    assert merged == direct


def test_misra_gries_superset_guarantee(spark):
    """Crafted skew: items with global count > N/k MUST appear in the
    candidate set, even when scattered across partitions."""
    n_hot, n_cold = 400, 600
    rows = [("hot%d" % (i % 2),) for i in range(n_hot)] + [
        ("cold%d" % i,) for i in range(n_cold)
    ]
    df = spark.createDataFrame(rows, "term string").repartition(8)
    # N=1000, k=10 -> threshold 100; hot0/hot1 have 200 each
    cands = {r["term"] for r in misra_gries_candidates(df, "term", 10).collect()}
    assert {"hot0", "hot1"} <= cands
    # summary stays small: <= k per partition
    assert len(cands) <= 8 * 10


def test_heavy_hitters_exact_vs_groupby(spark):
    """The candidate+verify path returns EXACTLY the groupBy/HAVING
    answer on the documents fixture."""
    from luxo_rs_spark.functions.text import words

    tok = (
        load_table(spark, SF_DIR_01, "documents")
        .select(F.explode(words("text")).alias("term"))
        .filter(F.col("term") != "")
    )
    k = 50
    total = tok.count()
    got = {
        (r["term"], r["cnt"])
        for r in heavy_hitters(tok, "term", k).collect()
    }
    want = {
        (r["term"], r["cnt"])
        for r in tok.groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") > total / k)
        .collect()
    }
    assert got == want
    assert len(want) > 0  # fixture actually has heavy tokens


def test_hll_intersect_estimate_error_band(spark):
    """Inclusion-exclusion intersection estimate: within a few percent
    of exact for overlapping sets, clamped >= 0 for disjoint ones."""
    from luxo_rs_spark.operators.sketch import (
        hll_intersect_estimate,
        hll_sketch_table,
    )

    # A = [0, 20000), B = [10000, 30000) -> |A ∩ B| = 10000
    a = spark.range(0, 20000).select(
        F.lit("g").alias("g"), F.col("id").alias("v")
    )
    b = spark.range(10000, 30000).select(
        F.lit("g").alias("g"), F.col("id").alias("v")
    )
    sa = hll_sketch_table(a, ["g"], "v")
    sb = hll_sketch_table(b, ["g"], "v")
    row = hll_intersect_estimate(sa, sb, ["g"]).collect()[0]
    assert abs(row["est_intersect"] - 10000) / 10000 < 0.05
    assert abs(row["est_union"] - 30000) / 30000 < 0.02
    # disjoint: clamp keeps the estimate non-negative
    c = spark.range(50000, 70000).select(
        F.lit("g").alias("g"), F.col("id").alias("v")
    )
    sc = hll_sketch_table(c, ["g"], "v")
    row2 = hll_intersect_estimate(sa, sc, ["g"]).collect()[0]
    assert row2["est_intersect"] >= 0
    assert row2["est_intersect"] < 1500  # ~0 up to union-error noise


def test_cms_relation_merges_and_overestimates(spark):
    """Count-Min as a relation: (a) sketch(A ∪ B) == groupBy-sum of
    sketch(A) + sketch(B) — the mergeability that makes it a rollup
    table; (b) estimates are one-sided (est >= true for EVERY key);
    (c) absent keys estimate from cold cells only."""
    from pyspark.sql import functions as F

    from luxo_rs_spark.operators.sketch import cms_estimate, cms_table

    rows_a = [(str(i % 37),) for i in range(400)]
    rows_b = [(str(i % 53),) for i in range(300)]
    a = spark.createDataFrame(rows_a, "k string")
    b = spark.createDataFrame(rows_b, "k string")
    d, w = 4, 32

    merged = (
        cms_table(a, "k", d, w)
        .unionByName(cms_table(b, "k", d, w))
        .groupBy("depth", "col")
        .agg(F.sum("cnt").alias("cnt"))
    )
    direct = cms_table(a.unionByName(b), "k", d, w)
    as_map = lambda df: {
        (r.depth, r.col): r.cnt for r in df.collect()
    }
    assert as_map(merged) == as_map(direct)

    both = a.unionByName(b)
    truth = both.groupBy("k").agg(F.count(F.lit(1)).alias("true_cnt"))
    est = cms_estimate(direct, truth.select("k"), "k", d, w)
    j = {r.k: (r.true_cnt, r.cms_est) for r in truth.join(est, "k").collect()}
    assert len(j) == 53
    assert all(e >= t for t, e in j.values())  # one-sided, no exception
    assert any(e > t for t, e in j.values())   # collisions are real at 4x32


def test_cms_streaming_incremental_merge(spark, tmp_path):
    """The relational CMS is a streaming rollup: foreachBatch merges
    each micro-batch's sketch into a parquet store; after the stream
    drains, the accumulated store equals the batch-built sketch of the
    whole input (exactly-once via batch-id overwrite semantics)."""
    from pyspark.sql import functions as F

    from luxo_rs_spark.operators.sketch import cms_table

    rows = [(i, str(i % 41)) for i in range(600)]
    src = spark.createDataFrame(rows, "i long, k string").repartition(3)
    in_dir = str(tmp_path / "in")
    src.write.parquet(in_dir)
    store = str(tmp_path / "cms_store")
    d, w = 4, 32

    def upsert(batch_df, batch_id):
        sk = cms_table(batch_df, "k", d, w).withColumn(
            "ingest_batch", F.lit(batch_id)
        )
        sk.write.partitionBy("ingest_batch").mode("append").parquet(store)

    stream = (
        spark.readStream.schema("i long, k string")
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = (
        stream.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    accumulated = (
        spark.read.parquet(store)
        .groupBy("depth", "col")
        .agg(F.sum("cnt").alias("cnt"))
    )
    direct = cms_table(src, "k", d, w)
    as_map = lambda df: {(r.depth, r.col): r.cnt for r in df.collect()}
    assert as_map(accumulated) == as_map(direct)
