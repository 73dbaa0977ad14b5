"""Boundary-case battery (reference test style, SURVEY §5.2: first /
last / absent / EMPTY): every public operator must survive an empty or
minimal input without crashing — the failure mode round-1 ADVICE found
in the n-gram builders (sequence(1,0) descending on short docs)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def empty_docs(spark):
    return spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string, n_chars long"
    )


@pytest.fixture(scope="module")
def tiny_docs(spark):
    return spark.createDataFrame(
        [
            (1, "a", "en", "web", 1),          # single short token
            (2, "", "en", "web", 0),            # empty text
            (3, "b c d e f g h", "en", "web", 13),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


@pytest.fixture(scope="module")
def empty_emb(spark):
    return spark.createDataFrame(
        [], "vec_id long, embedding array<float>, label int"
    )


def test_exact_dedup_empty(empty_docs):
    from luxo_rs_spark.operators.dedup import exact_dedup

    assert exact_dedup(empty_docs).count() == 0


def test_ngram_pairs_short_docs(tiny_docs):
    """Shingle builders on docs SHORTER than n: no descending-sequence
    crash, no pairs from un-shingleable docs."""
    from luxo_rs_spark.operators.dedup import jaccard_pairs

    out = jaccard_pairs(tiny_docs, threshold=0.5, n=3)
    assert out.count() == 0


def test_minhash_empty(empty_docs):
    from luxo_rs_spark.operators.dedup import minhash_neardup_pairs

    assert minhash_neardup_pairs(empty_docs, threshold=0.5).count() == 0


@pytest.mark.slow
def test_neardup_clusters_minimal(tiny_docs):
    from luxo_rs_spark.operators.dedup import neardup_clusters

    out = neardup_clusters(tiny_docs, threshold=0.9).collect()
    # every doc is its own singleton cluster
    assert {(r[0], r[1]) for r in out} == {(1, 1), (2, 2), (3, 3)}


def test_asof_join_empty_build(spark):
    from luxo_rs_spark.operators.asof import asof_join

    probe = spark.createDataFrame([(1, 1, 10)], "pid long, k long, pt long")
    build = spark.createDataFrame([], "k long, bt long, val long")
    out = asof_join(
        probe, build, on="k", probe_time="pt", build_time="bt",
        payload={"val": "val"},
    ).collect()
    assert len(out) == 1 and out[0].val is None


def test_topk_empty(spark):
    from luxo_rs_spark.operators.topk import top_k, top_k_per_group

    e = spark.createDataFrame([], "g long, v double")
    assert top_k(e, order_by=[F.col("v").desc()], k=5).count() == 0
    assert (
        top_k_per_group(e, ["g"], [F.col("v").desc()], k=2).count() == 0
    )


def test_cosine_topk_empty_corpus(spark, empty_emb):
    from luxo_rs_spark.operators.similarity import cosine_topk

    one = spark.createDataFrame(
        [(1, [1.0, 0.0], 0)], "vec_id long, embedding array<float>, label int"
    )
    # corpus of one vector, query excludes itself -> empty result
    assert cosine_topk(one, target_id=1, k=5).count() == 0


def test_knn_join_empty_queries(spark, empty_emb):
    from luxo_rs_spark.operators.similarity import knn_join

    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0], 0), (2, [0.0, 1.0], 0)],
        "vec_id long, embedding array<float>, label int",
    )
    assert knn_join(corpus, empty_emb, k=2).count() == 0


def test_merge_upsert_empty_updates(spark):
    from luxo_rs_spark.operators.merge import merge_upsert

    base = spark.createDataFrame([(1, "x")], "k long, v string")
    updates = spark.createDataFrame([], "k long, v string")
    got = merge_upsert(base, updates, key="k").collect()
    assert [(r.k, r.v) for r in got] == [(1, "x")]


def test_merge_agg_states_empty_delta(spark):
    from luxo_rs_spark.operators.merge import agg_state, merge_agg_states

    base = spark.createDataFrame([(1, 2.0), (1, 4.0)], "g long, v double")
    snap = agg_state(base, ["g"], "v")
    empty = spark.createDataFrame([], "g long, v double")
    merged = merge_agg_states(snap, agg_state(empty, ["g"], "v"), ["g"]).collect()
    assert merged[0].n == 2 and merged[0].s == 6.0


def test_bloom_empty_keys(spark):
    from luxo_rs_spark.operators.bloom import bloom_build, bloom_probe

    keys = spark.createDataFrame([], "k long")
    bloom = bloom_build(keys, "k")
    probe = spark.createDataFrame([(1, 1)], "k long, id long")
    # empty filter: nothing can pass (no false negatives requirement
    # is vacuous; empty build must not crash)
    assert bloom_probe(probe, "k", bloom, "id").count() == 0


def test_corpus_ops_empty(empty_docs):
    from luxo_rs_spark.operators.corpus import (
        hash_split,
        inverted_index,
        tfidf_topk,
    )

    assert hash_split(empty_docs).count() == 0
    assert tfidf_topk(empty_docs).count() == 0
    assert inverted_index(empty_docs).count() == 0


def test_salted_join_empty_sides(spark):
    from luxo_rs_spark.operators.skew import salted_join

    big = spark.createDataFrame([], "k long, a long")
    small = spark.createDataFrame([(1, 2)], "k long, b long")
    assert salted_join(big, small, on="k", entropy=F.col("a"), buckets=4).count() == 0


def test_heavy_hitters_empty(spark):
    from luxo_rs_spark.operators.sketch import heavy_hitters

    df = spark.createDataFrame([], "term string")
    assert heavy_hitters(df, "term", 10).count() == 0


def test_misra_gries_single_value(spark):
    from luxo_rs_spark.operators.sketch import misra_gries_candidates

    df = spark.createDataFrame([("x",)] * 7, "term string").repartition(3)
    got = {r["term"] for r in misra_gries_candidates(df, "term", 2).collect()}
    assert got == {"x"}


def test_hll_rollup_single_group(spark):
    from luxo_rs_spark.operators.sketch import hll_rollup, hll_sketch_table

    df = spark.createDataFrame([(1, "a")], "uid long, g string")
    tbl = hll_sketch_table(df, ["g"], "uid")
    got = hll_rollup(tbl, ["g"]).collect()
    assert len(got) == 1 and got[0]["estimate"] == 1


def test_tdigest_empty_and_singleton(spark):
    from luxo_rs_spark.operators.tdigest import (
        tdigest_quantiles,
        tdigest_table,
    )

    empty = spark.createDataFrame([], "g string, v double")
    assert tdigest_table(empty, ["g"], "v").count() == 0

    one = spark.createDataFrame([("a", 5.0)], "g string, v double")
    got = tdigest_quantiles(
        tdigest_table(one, ["g"], "v"), [0.5, 0.99]
    ).collect()
    assert got[0]["n"] == 1
    assert got[0]["p50"] == 5.0 and got[0]["p99"] == 5.0


def test_tdigest_all_null_group(spark):
    from luxo_rs_spark.operators.tdigest import tdigest_quantiles, tdigest_table

    df = spark.createDataFrame(
        [("a", None), ("a", None), ("b", 1.0)], "g string, v double"
    )
    got = {
        r["g"]: (r["n"], r["p50"])
        for r in tdigest_quantiles(tdigest_table(df, ["g"], "v"), [0.5]).collect()
    }
    assert got["b"] == (1, 1.0)
    assert got["a"][0] == 0 and got["a"][1] is None


def test_random_projection_empty(spark):
    from luxo_rs_spark.operators.similarity import random_projection

    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert random_projection(empty, 64, 8).count() == 0


def test_versioned_table_unwritten_reads_none(spark, tmp_path):
    from luxo_rs_spark.streaming.sinks import VersionedParquetTable

    t = VersionedParquetTable(str(tmp_path / "t"))
    assert t.read(spark) is None
    assert t.last_batch_id() == -1 and t.current_version() == -1


def test_substring_dup_spans_edges(spark, empty_docs, tiny_docs):
    """Docs shorter than k yield no grams (sequence guard), empty
    corpus yields empty output with the right schema."""
    from luxo_rs_spark.operators.dedup import substring_dup_spans

    assert substring_dup_spans(empty_docs, k=10).count() == 0
    rows = {r["doc_id"]: r for r in substring_dup_spans(tiny_docs, k=10).collect()}
    assert all(r["n_dup_spans"] == 0 for r in rows.values())


def test_bigram_lm_edges(spark, empty_docs, tiny_docs):
    """Empty/one-token docs produce no bigrams; scoring against an
    empty model backs off everywhere without dividing by zero."""
    from luxo_rs_spark.functions.ngram_lm import (
        score_bigram_perplexity,
        train_bigram_lm,
    )

    uni, bi = train_bigram_lm(tiny_docs)
    assert bi.filter(F.col("w1") == "a").count() == 0  # doc 1 has 1 token
    scored = score_bigram_perplexity(tiny_docs, uni, bi)
    assert all(r["oov_bigrams"] >= 0 for r in scored.collect())
    uni0, bi0 = train_bigram_lm(empty_docs)
    assert uni0.count() == 0 and bi0.count() == 0


def test_triangle_count_edges(spark):
    from luxo_rs_spark.operators.graph import triangle_count

    empty = spark.createDataFrame([], "src long, dst long")
    assert triangle_count(empty).count() == 0
    # two nodes, one edge: no triangles
    one = spark.createDataFrame([(1, 2)], "src long, dst long")
    assert triangle_count(one).count() == 0


def test_chunk_documents_edges(spark, empty_docs, tiny_docs):
    from luxo_rs_spark.operators.corpus import chunk_documents

    assert chunk_documents(empty_docs, 8, 2).count() == 0
    rows = chunk_documents(tiny_docs, 8, 2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc.get(1, [])) == 1      # one short chunk
    assert 2 not in by_doc                  # empty text -> no chunks
    import pytest as _pt

    with _pt.raises(ValueError):
        chunk_documents(tiny_docs, 8, 8)


def test_unigram_edges(spark, empty_docs):
    """Empty corpus: the distributed trainer has nothing to learn from
    and the sequential reference agrees (empty model)."""
    from luxo_rs_spark.functions.unigram import (
        text_word_freqs,
        train_unigram,
        viterbi,
    )

    probs = train_unigram(text_word_freqs([]))
    assert probs == {}
    assert viterbi("abc", probs) == ["a", "b", "c"]  # fallback singles


def test_gif_minimal_images():
    import numpy as np

    from luxo_rs_spark.multimodal.media import _decode_gif, _pixels_to_gif

    pal = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    for h, w in ((1, 1), (1, 40), (40, 1)):
        idx = np.zeros((h, w), dtype=np.uint8)
        d = _decode_gif(_pixels_to_gif(idx, pal, interlace=h > 1))
        assert (d["height"], d["width"]) == (h, w)
        assert d["payload"] == pal[idx].tobytes()
