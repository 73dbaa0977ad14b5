"""Semantics tests for dedup operators (exact/jaccard/minhash/simhash).

Boundary-case style per the reference's tests (first/last/middle/
absent/empty fixtures — reference src/algo/search.rs:126-373 pattern,
FIXTURES.md §2)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from luxo_rs_spark.functions.fnv1a import fnv1a64_bytes_py
from luxo_rs_spark.operators.dedup import (
    NUM_PERM,
    exact_dedup,
    exact_dedup_stats,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_neardup_pairs,
    minhash_signatures,
    shingle_table,
    simhash,
    simhash_neardup_pairs,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy cat"),  # near-dup of 0
        (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
        (3, "completely different words entirely here now"),
        (4, "xy"),  # fewer than 3 words -> zero shingles
        (5, ""),  # empty text
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_keeps_min_id(docs):
    kept = {r.doc_id for r in exact_dedup(docs).collect()}
    assert 0 in kept and 2 not in kept  # 2 is a dup of 0, min id survives
    assert {1, 3, 4, 5} <= kept


def test_exact_dedup_stats(docs):
    row = exact_dedup_stats(docs).collect()[0]
    assert row.n_docs == 6 and row.n_unique == 5


def test_shingles_boundary_cases(docs, spark):
    sh = shingle_table(docs).groupBy("doc_id").count().collect()
    counts = {r.doc_id: r["count"] for r in sh}
    # 9-word doc -> 7 shingles, all distinct
    assert counts[0] == 7
    # short and empty docs produce no shingle rows at all
    assert 4 not in counts and 5 not in counts


def test_jaccard_exact_pairs(docs):
    pairs = {(r.da, r.db): r.jac for r in jaccard_pairs(docs, 0.0).collect()}
    assert pairs[(0, 2)] == 1.0  # identical docs
    # docs 0 and 1 share 6 of 8 distinct shingles -> 6/8
    assert abs(pairs[(0, 1)] - 6 / 8) < 1e-12
    assert (0, 3) not in pairs  # nothing shared


def test_minhash_identical_signatures(docs):
    sig = minhash_signatures(docs).collect()
    by_id = {r.doc_id: [r[f"m{i}"] for i in range(NUM_PERM)] for r in sig}
    assert by_id[0] == by_id[2]  # identical text -> identical signature
    assert by_id[0] != by_id[3]


@pytest.mark.slow
def test_lsh_candidates_contain_neardups(docs):
    cands = {
        (r.da, r.db)
        for r in lsh_candidate_pairs(minhash_signatures(docs)).collect()
    }
    assert (0, 2) in cands
    assert (0, 1) in cands  # jaccard 0.56 -> found w/ 32x4 bands virtually always


@pytest.mark.slow
def test_minhash_pipeline_matches_exact(docs):
    exact = {
        (r.da, r.db, round(r.jac, 6))
        for r in jaccard_pairs(docs, 0.5).collect()
    }
    lsh = {
        (r.da, r.db, round(r.jac, 6))
        for r in minhash_neardup_pairs(docs, 0.5).collect()
    }
    assert exact == lsh


@pytest.mark.slow
def test_simhash_golden_and_pairs(docs):
    sims = {r.doc_id: r.simhash for r in simhash(docs).collect()}
    assert sims[0] == sims[2]  # identical docs -> identical fingerprint
    # near-dup pair found at generous hamming threshold? 0 vs 1 share
    # most shingles; their simhashes must be closer than 0 vs 3
    ham = lambda a, b: bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")
    assert ham(sims[0], sims[1]) < ham(sims[0], sims[3])
    pairs = {
        (r.da, r.db): r.hamming
        for r in simhash_neardup_pairs(docs, max_hamming=3).collect()
    }
    assert pairs[(0, 2)] == 0


def test_simhash_rejects_wide_hamming(docs):
    with pytest.raises(ValueError):
        simhash_neardup_pairs(docs, max_hamming=4)


def test_fingerprint_golden(spark):
    """q40's fp_min/fp_max are min/max fnv1a64 over 3-gram shingles —
    pin one value against the scalar reference implementation."""
    df = spark.createDataFrame(
        [(0, "a b c d")], "doc_id long, text string"
    )
    sh = [b"a b c", b"b c d"]
    expected = [fnv1a64_bytes_py(s) for s in sh]
    to_signed = lambda u: u - (1 << 64) if u >= 1 << 63 else u
    row = (
        shingle_table(df)
        .select(
            F.min(
                __import__(
                    "luxo_rs_spark.functions.fnv1a", fromlist=["fnv1a64_col"]
                ).fnv1a64_col("shingle")
            ).alias("fp_min")
        )
        .collect()[0]
    )
    assert row.fp_min == min(to_signed(e) for e in expected)


@pytest.mark.slow
def test_neardup_clusters_connected_components(docs):
    """0-1 near-dup, 0-2 exact dup -> one component {0,1,2} labeled by
    min id 0; everything else is its own singleton cluster."""
    from luxo_rs_spark.operators.dedup import neardup_clusters, neardup_survivors

    by_id = {
        r.doc_id: r.cluster_id
        for r in neardup_clusters(docs, threshold=0.5).collect()
    }
    assert by_id[0] == by_id[1] == by_id[2] == 0
    assert by_id[3] == 3 and by_id[4] == 4 and by_id[5] == 5
    kept = {r.doc_id for r in neardup_survivors(docs, threshold=0.5).collect()}
    assert kept == {0, 3, 4, 5}


def test_neardup_clusters_chain_converges(spark):
    """A transitive CHAIN a~b~c (a and c NOT directly similar) must end
    up in one component — the fixpoint iteration, not a single join."""
    from luxo_rs_spark.operators.dedup import neardup_clusters

    rows = [
        (10, "alpha beta gamma delta epsilon zeta eta theta"),
        (11, "alpha beta gamma delta epsilon zeta eta iota"),
        (12, "alpha beta gamma delta epsilon zeta kappa iota"),
        (13, "totally unrelated content lives in this row"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # exact pairs isolate the clustering fixpoint from LSH recall
    # (at jaccard ~0.5 the 32x4 band config misses a pair w.p. ~0.13)
    by_id = {
        r.doc_id: r.cluster_id
        for r in neardup_clusters(
            docs, pairs=jaccard_pairs(docs, threshold=0.45)
        ).collect()
    }
    assert by_id[10] == by_id[11] == by_id[12] == 10
    assert by_id[13] == 13


def test_approx_sketches_error_bounds(spark):
    """q50's sketches are engine-specific (rows-only at the driver), so
    pin their accuracy Spark-internally: HLL++ within its default 5%
    rsd of the exact count-distinct, approx median within the exact
    p40-p60 band."""
    from luxo_rs_spark.sources.registry import load_table
    from conftest import SF_DIR_01
    from pyspark.sql import functions as F

    li = load_table(spark, SF_DIR_01, "lineitem")
    got = (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_suppkey").alias("approx_supp"),
            F.percentile_approx("l_extendedprice", 0.5).alias("approx_median"),
            F.countDistinct("l_suppkey").alias("exact_supp"),
            F.expr("percentile(l_extendedprice, 0.4)").alias("p40"),
            F.expr("percentile(l_extendedprice, 0.6)").alias("p60"),
        )
        .collect()
    )
    assert len(got) > 0
    for r in got:
        assert abs(r.approx_supp - r.exact_supp) <= 0.05 * r.exact_supp + 2
        assert r.p40 <= r.approx_median <= r.p60


@pytest.mark.slow
def test_cc_star_long_chain_converges_in_log_rounds(spark):
    """Round-2 verdict item: a 1,000-node CHAIN has diameter 999 —
    min-label propagation would need ~999 rounds, the large-star/
    small-star variant must label every node 0 within its O(log n)
    round budget (40)."""
    from luxo_rs_spark.operators.dedup import neardup_clusters

    n = 1000
    docs = spark.range(n).select(F.col("id").alias("doc_id"), F.lit("x").alias("text"))
    chain = spark.range(n - 1).select(
        F.col("id").alias("da"), (F.col("id") + 1).alias("db")
    )
    labels = {
        r.doc_id: r.cluster_id
        for r in neardup_clusters(docs, pairs=chain, algorithm="star").collect()
    }
    assert len(labels) == n
    assert set(labels.values()) == {0}


@pytest.mark.slow
def test_cc_star_equals_label_prop(spark):
    """Both CC algorithms must produce identical components on a mixed
    graph (two cliques, a chain, singletons)."""
    from luxo_rs_spark.operators.dedup import neardup_clusters

    edges = [
        (1, 2), (2, 3), (1, 3),        # clique {1,2,3}
        (10, 11),                      # pair
        (20, 21), (21, 22), (22, 23),  # chain {20..23}
    ]
    docs = spark.createDataFrame(
        [(i,) for i in [1, 2, 3, 10, 11, 20, 21, 22, 23, 99]], "doc_id long"
    ).withColumn("text", F.lit("x"))
    pairs = spark.createDataFrame(edges, "da long, db long")
    star = {
        r.doc_id: r.cluster_id
        for r in neardup_clusters(docs, pairs=pairs, algorithm="star").collect()
    }
    prop = {
        r.doc_id: r.cluster_id
        for r in neardup_clusters(docs, pairs=pairs, algorithm="label_prop").collect()
    }
    assert star == prop
    assert star[99] == 99 and star[23] == 20 and star[3] == 1


def test_deletion_neighborhood_recall(spark):
    """SymSpell guarantee: every Levenshtein-distance<=2 pair shares a
    depth-2 deletion variant, so candidate generation has 100% recall
    — checked against brute-force distances on a crafted set covering
    substitution / insertion / deletion / transposition / distance-3."""
    from pyspark.sql import functions as F

    from luxo_rs_spark.operators.dedup import editdistance_candidate_pairs

    rows = [
        (1, "analytics"),
        (2, "analytcs"),    # deletion (d=1)
        (3, "analytixs"),   # substitution (d=1)
        (4, "aanalytics"),  # insertion (d=1)
        (5, "anaytlics"),   # transposition-ish (d=2)
        (6, "анаlytic"),    # mixed, d=2 from "analytic"
        (7, "zzzzzzzzz"),   # far from everything
        (8, "analytic"),    # deletion (d=1)
    ]
    df = spark.createDataFrame(rows, "id long, s string")
    cand = {
        (r.ida, r.idb)
        for r in editdistance_candidate_pairs(df, "id", "s").collect()
    }
    # brute-force truth
    import itertools

    def lev(x, y):
        prev = list(range(len(y) + 1))
        for i, cx in enumerate(x, 1):
            cur = [i]
            for j, cy in enumerate(y, 1):
                cur.append(
                    min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (cx != cy))
                )
            prev = cur
        return prev[-1]

    truth = {
        (i, j)
        for (i, x), (j, y) in itertools.combinations(rows, 2)
        if lev(x, y) <= 2
    }
    assert truth <= cand          # 100% recall for d<=2
    assert (1, 7) not in cand      # far pair not generated


def test_segment_boilerplate_flags_shared_segments(spark):
    """CCNet-style segment dedup: a 3-token segment shared by >=2 docs
    is boilerplate; clean_md5 fingerprints the doc with those segments
    removed, order preserved."""
    import hashlib

    from luxo_rs_spark.operators.dedup import segment_boilerplate

    rows = [
        (1, "subscribe to our newsletter real content one here now"),
        (2, "subscribe to our newsletter other body text goes here"),
        (3, "totally unique document body nothing shared at all ok"),
        (4, "xy"),  # shorter than one segment -> single ragged segment
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in segment_boilerplate(df).collect()}

    # docs 1 and 2 share segments "subscribe to our" and a ragged tail?
    # tokens: doc1 = 9 tokens -> 3 segments; first segment shared.
    assert out[1].n_seg == 3 and out[2].n_seg == 3
    assert out[1].n_boiler == 1 and out[2].n_boiler == 1
    assert out[1].boiler_frac == pytest.approx(0.3333, abs=1e-4)
    # clean text = doc with the shared first segment removed
    clean1 = "newsletter real content one here now"
    assert out[1].clean_md5 == hashlib.md5(clean1.encode()).hexdigest()
    # unique doc: nothing flagged, clean text == original
    assert out[3].n_boiler == 0
    assert out[3].clean_md5 == hashlib.md5(rows[2][1].encode()).hexdigest()
    # sub-segment doc still yields exactly one segment
    assert out[4].n_seg == 1 and out[4].n_boiler == 0


def test_substring_dup_spans_exact(spark):
    """Crafted corpus: a 30-char string shared across two docs marks a
    single maximal span in each; within-doc repetition marks both
    occurrences; a clean doc reports zeros. k=10."""
    from luxo_rs_spark.operators.dedup import substring_dup_spans

    shared = "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123"  # 30 chars
    docs = spark.createDataFrame(
        [
            (1, "xx" + shared + "yyyyyyyyyy"),
            (2, "qqqqq" + shared + "ppp"),
            (3, "zzz" + "R" * 25 + "www"),  # self-repeating run
            (4, "entirely unique text with no repeats at all"),
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in substring_dup_spans(docs, k=10).collect()
    }
    # doc 1: shared occupies pos 3..32 -> grams at 3..23 dup -> span
    # [3, 32], 30 chars
    assert rows[1]["n_dup_spans"] == 1 and rows[1]["dup_chars"] == 30
    # doc 2: span [6, 35]
    assert rows[2]["n_dup_spans"] == 1 and rows[2]["dup_chars"] == 30
    # doc 3: "R"*25 repeats its own 10-gram internally -> one span of 25
    assert rows[3]["n_dup_spans"] == 1 and rows[3]["dup_chars"] == 25
    assert rows[4]["n_dup_spans"] == 0 and rows[4]["dup_chars"] == 0
    assert rows[4]["dup_frac"] == 0.0
