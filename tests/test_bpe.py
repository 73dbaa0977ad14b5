"""BPE train/apply semantics: hand-computed merges on a micro corpus
(the Sennrich Algorithm-1 contract), greedy lowest-rank apply, and
determinism."""

from __future__ import annotations

from luxo_rs_spark.functions.bpe import (
    EOW,
    _encode_word,
    bpe_tokenize,
    train_bpe,
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


def test_train_deterministic(spark):
    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma doc{i} alpha beta") for i in range(50)],
        "doc_id long, text string",
    )
    m1 = train_bpe(docs, vocab_size=64)
    m2 = train_bpe(docs.repartition(7), vocab_size=64)
    assert m1 == m2 and len(m1) > 0
