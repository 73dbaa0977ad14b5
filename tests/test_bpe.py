"""BPE train/apply semantics: hand-computed merges on a micro corpus
(the Sennrich Algorithm-1 contract), greedy lowest-rank apply, and
determinism."""

from __future__ import annotations

import pytest

from luxo_rs_spark.functions.bpe import (
    EOW,
    _encode_word,
    bpe_tokenize,
    train_bpe,
    train_bpe_distributed,
)


def test_train_merges_hand_computed(spark):
    docs = spark.createDataFrame(
        [(1, "aa aa aa ab")], "doc_id long, text string"
    )
    # alphabet {a, b, EOW}; vocab 5 allows 2 merges:
    # (a,a) x3 beats (a,EOW) x3 lexicographically, then (aa,EOW) x3
    merges = train_bpe(docs, vocab_size=5)
    assert merges == [("a", "a"), ("aa", EOW)]


def test_train_stops_below_min_frequency(spark):
    # every pair occurs once -> no merge reaches the >=2 floor
    docs = spark.createDataFrame([(1, "xy")], "doc_id long, text string")
    assert train_bpe(docs, vocab_size=100) == []


def test_encode_word_greedy_lowest_rank():
    ranks = {("a", "a"): 0, ("aa", EOW): 1}
    assert _encode_word("aa", ranks) == ["aa" + EOW]
    assert _encode_word("aaab", ranks) == ["aa", "a", "b", EOW]
    assert _encode_word("b", {}) == ["b", EOW]


def test_tokenize_distributed_matches_driver(spark):
    rows = [(i, "the cat sat on the mat " * (i % 3 + 1)) for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    merges = train_bpe(docs, vocab_size=40)
    got = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe_tokenize(docs, merges).collect()
    }
    ranks = {p: i for i, p in enumerate(merges)}
    for did, text in rows:
        want = []
        for w in text.split():
            want.extend(_encode_word(w, ranks))
        assert got[did] == want
    # round-trip: concatenated tokens minus EOW reproduce the text
    sample = "".join(got[0]).replace(EOW, " ").strip()
    assert sample == rows[0][1].strip()


@pytest.mark.slow
def test_distributed_train_identical_merges(spark):
    # the scale path (Spark-agg pair counting, argmax-only driver) must
    # learn the EXACT merge list of the driver path on the same corpus,
    # including tie-breaks
    rows = [
        (i, "the cat sat on the mat " * (i % 3 + 1)) for i in range(20)
    ] + [(100, "aa aa aa ab")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    m_driver = train_bpe(docs, vocab_size=40)
    m_dist = train_bpe_distributed(docs, vocab_size=40)
    assert m_dist == m_driver and len(m_dist) > 0


def test_distributed_train_hand_computed(spark):
    docs = spark.createDataFrame(
        [(1, "aa aa aa ab")], "doc_id long, text string"
    )
    assert train_bpe_distributed(docs, vocab_size=5) == [
        ("a", "a"),
        ("aa", EOW),
    ]


def test_eow_marker_in_corpus_is_stripped(spark):
    # U+2581 inside corpus text is reserved: stripped before shingling,
    # so no merge can span it and round-trip stays coherent
    docs = spark.createDataFrame(
        [(1, f"aa{EOW}aa aa{EOW}aa aa xx")], "doc_id long, text string"
    )
    merges = train_bpe(docs, vocab_size=6)
    for a, b in merges:
        assert EOW not in a  # marker only ever terminal via (x, EOW)
    toks = bpe_tokenize(docs, merges).collect()[0]["bpe_tokens"]
    assert "".join(toks).replace(EOW, " ").strip() == "aaaa aaaa aa xx"


def test_train_deterministic(spark):
    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma doc{i} alpha beta") for i in range(50)],
        "doc_id long, text string",
    )
    m1 = train_bpe(docs, vocab_size=64)
    m2 = train_bpe(docs.repartition(7), vocab_size=64)
    assert m1 == m2 and len(m1) > 0
