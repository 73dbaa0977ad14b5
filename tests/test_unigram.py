"""Unigram-LM tokenizer (functions/unigram.py): sequential-vs-
distributed bit-identity (the BPE contract), EM semantics on a
hand-checkable corpus, Viterbi determinism."""

from __future__ import annotations

import pytest


def test_unigram_em_learns_morphemes_and_viterbi():
    from luxo_rs_spark.functions.unigram import (
        text_word_freqs,
        train_unigram,
        viterbi,
    )

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the lazy dog sleeps while the quick fox runs",
        "internationalization and internationalism are international",
        "tokenization tokenizes tokens into token pieces",
    ] * 3
    probs = train_unigram(
        text_word_freqs(texts), seed_multi=64, target_multi=32
    )
    assert abs(sum(probs.values()) - 1.0) < 1e-9
    multis = {p for p in probs if len(p) > 1}
    # EM should promote real morphemes of this corpus
    assert "token" in multis and "the" in multis
    seg = viterbi("internationalization", probs)
    assert "".join(seg) == "internationalization"
    assert len(seg) < len("internationalization")  # better than chars
    # unsegmentable characters fall back to singles
    assert viterbi("zzz", {"z": 0.5}) == ["z", "z", "z"]


def test_unigram_distributed_identity(spark):
    """Distributed EM == sequential reference, bit for bit: the
    nanocount quantization makes every Spark sum an exact integer."""
    from luxo_rs_spark.functions.unigram import (
        segment_counts,
        text_word_freqs,
        train_unigram,
        train_unigram_distributed,
        viterbi,
    )

    texts = [
        "aaa bbb aaabbb ababab",
        "the cat the hat the mat",
        "prefix prefixes prefixed unrelated",
    ] * 5
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    seq = train_unigram(text_word_freqs(texts), seed_multi=48, target_multi=24)
    dist = train_unigram_distributed(docs, seed_multi=48, target_multi=24)
    assert seq == dist  # identical pieces AND identical probabilities

    got = {
        r["doc_id"]: r["n_pieces"]
        for r in segment_counts(docs, seq).collect()
    }
    want = {
        i: sum(len(viterbi(w, seq)) for w in t.split())
        for i, t in enumerate(texts)
    }
    assert got == want


def test_unigram_tie_rules_are_pinned():
    from luxo_rs_spark.functions.unigram import prune, select_seed, viterbi

    # seed/prune ties: count desc, then piece ASC
    picked = select_seed({"a": 5, "bb": 3, "aa": 3, "cc": 3}, n_multi=2)
    assert set(picked) == {"a", "aa", "bb"}
    pruned = prune({"a": 1, "zz": 2, "yy": 2, "xx": 1}, n_multi=2)
    assert set(pruned) == {"a", "yy", "zz"}
    # viterbi exact tie -> longest last piece (single path here)
    probs = {"ab": 0.25, "a": 0.5, "b": 0.5}
    assert viterbi("ab", probs) == ["ab"]  # 0.25 == 0.5*0.5 tie
