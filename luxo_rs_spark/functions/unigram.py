"""Unigram-LM subword tokenizer (Kudo 2018, the SentencePiece model)
trained by distributed EM — the modern counterpart to the BPE trainer
in ``functions/bpe.py`` (SURVEY.md §2.2-K tokenizer family).

The model is a probability over subword pieces; training alternates:

- E-step: per word, forward-backward over the segmentation lattice
  yields each piece's expected count. Embarrassingly parallel — on
  Spark it is one pandas-UDF pass over the DISTINCT-WORD relation
  (corpus size only enters through the word frequencies).
- M-step: piece probabilities = normalized expected counts — a
  groupBy-sum.

Exactness contract: expected counts are quantized to integer
NANOCOUNTS per (word, piece) before summation, so the distributed
sums are order-independent exact longs and the distributed trainer is
BIT-IDENTICAL to the sequential reference (``train_unigram``) — the
same identity the BPE trainer proves for its merge list. Model state
between iterations is the vocabulary itself (a few hundred rows), the
same bounded-driver-state shape as BPE's one-argmax-per-round.

Determinism rules: seed/prune ties break (count desc, piece asc);
Viterbi ties keep the longest last piece; single-character pieces are
never pruned and never starve (zero counts floor at 1 nano).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_PIECE_LEN = 6
NANO = 1_000_000_000


def word_substrings(word: str, max_len: int = MAX_PIECE_LEN):
    """Every substring occurrence (with multiplicity) up to max_len."""
    n = len(word)
    for i in range(n):
        for j in range(i + 1, min(i + max_len, n) + 1):
            yield word[i:j]


def seed_counts(freqs: dict[str, int], max_len: int = MAX_PIECE_LEN) -> dict:
    counts: dict[str, int] = {}
    for w, f in freqs.items():
        for s in word_substrings(w, max_len):
            counts[s] = counts.get(s, 0) + f
    return counts


def select_seed(
    counts: dict[str, int], n_multi: int = 512
) -> dict[str, int]:
    """All single chars + the top n_multi multi-char substrings by
    (count desc, piece asc); values stay raw counts (the caller
    normalizes)."""
    singles = {p: c for p, c in counts.items() if len(p) == 1}
    multis = sorted(
        ((p, c) for p, c in counts.items() if len(p) > 1),
        key=lambda pc: (-pc[1], pc[0]),
    )[:n_multi]
    vocab = dict(singles)
    vocab.update(multis)
    return vocab


def normalize(nanocounts: dict[str, int]) -> dict[str, float]:
    """Nanocounts -> probabilities; single chars floor at 1 nano so
    every word stays segmentable; zero-count multis drop out."""
    floored = {}
    for p, c in nanocounts.items():
        if len(p) == 1:
            floored[p] = max(c, 1)
        elif c > 0:
            floored[p] = c
    total = float(sum(floored.values()))
    return {p: c / total for p, c in sorted(floored.items())}


def word_expected_nanocounts(
    word: str, probs: dict[str, float], max_len: int = MAX_PIECE_LEN
) -> dict[str, float]:
    """E-step for ONE word: forward-backward over the piece lattice;
    returns expected count per piece (unweighted by frequency).
    Pure-Python doubles — the SAME function runs inside the Spark
    pandas UDF and the sequential reference, so both paths are
    bit-identical by construction."""
    n = len(word)
    alpha = [0.0] * (n + 1)
    alpha[0] = 1.0
    for j in range(1, n + 1):
        a = 0.0
        for i in range(max(0, j - max_len), j):
            p = probs.get(word[i:j])
            if p is not None and alpha[i] > 0.0:
                a += alpha[i] * p
        alpha[j] = a
    if alpha[n] <= 0.0:
        return {}
    beta = [0.0] * (n + 1)
    beta[n] = 1.0
    for i in range(n - 1, -1, -1):
        b = 0.0
        for j in range(i + 1, min(i + max_len, n) + 1):
            p = probs.get(word[i:j])
            if p is not None and beta[j] > 0.0:
                b += p * beta[j]
        beta[i] = b
    z = alpha[n]
    exp: dict[str, float] = {}
    for i in range(n):
        if alpha[i] <= 0.0:
            continue
        for j in range(i + 1, min(i + max_len, n) + 1):
            p = probs.get(word[i:j])
            if p is not None and beta[j] > 0.0:
                e = alpha[i] * p * beta[j] / z
                if e > 0.0:
                    piece = word[i:j]
                    exp[piece] = exp.get(piece, 0.0) + e
    return exp


def em_nanocounts(
    freqs: dict[str, int], probs: dict[str, float],
    max_len: int = MAX_PIECE_LEN,
) -> dict[str, int]:
    """Sequential E-step over all words -> exact integer nanocounts."""
    out: dict[str, int] = {}
    for w, f in freqs.items():
        for piece, e in word_expected_nanocounts(w, probs, max_len).items():
            out[piece] = out.get(piece, 0) + int(round(e * f * NANO))
    return out


def prune(
    nanocounts: dict[str, int], n_multi: int
) -> dict[str, int]:
    """Keep all single chars + top n_multi multis (count desc, piece
    asc)."""
    singles = {p: c for p, c in nanocounts.items() if len(p) == 1}
    multis = sorted(
        ((p, c) for p, c in nanocounts.items() if len(p) > 1 and c > 0),
        key=lambda pc: (-pc[1], pc[0]),
    )[:n_multi]
    out = dict(singles)
    out.update(multis)
    return out


def train_unigram(
    freqs: dict[str, int],
    seed_multi: int = 512,
    target_multi: int = 256,
    max_len: int = MAX_PIECE_LEN,
) -> dict[str, float]:
    """Sequential reference trainer: seed -> EM -> prune -> EM."""
    probs = normalize(
        {p: c * NANO for p, c in select_seed(seed_counts(freqs, max_len),
                                             seed_multi).items()}
    )
    probs = normalize(em_nanocounts(freqs, probs, max_len))
    probs = normalize(prune(em_nanocounts(freqs, probs, max_len),
                            target_multi))
    probs = normalize(em_nanocounts(freqs, probs, max_len))
    return probs


def viterbi(
    word: str, probs: dict[str, float], max_len: int = MAX_PIECE_LEN
) -> list[str]:
    """Best segmentation by probability product; on exact ties the
    longest last piece wins (ascending-i strictly-greater update)."""
    n = len(word)
    best = [0.0] * (n + 1)
    back = [0] * (n + 1)
    best[0] = 1.0
    for j in range(1, n + 1):
        for i in range(max(0, j - max_len), j):
            p = probs.get(word[i:j])
            if p is not None and best[i] > 0.0:
                s = best[i] * p
                if s > best[j]:
                    best[j] = s
                    back[j] = i
    if best[n] <= 0.0:  # unsegmentable (char outside the vocab)
        return list(word)
    pieces = []
    j = n
    while j > 0:
        i = back[j]
        pieces.append(word[i:j])
        j = i
    return pieces[::-1]


def text_word_freqs(texts) -> dict[str, int]:
    """Whitespace word frequencies — the sequential twin of
    ``words_relation`` (same split, no normalization)."""
    freqs: dict[str, int] = {}
    for t in texts:
        for w in (t or "").split():
            freqs[w] = freqs.get(w, 0) + 1
    return freqs


# --------------------------- distributed path ------------------------------


def words_relation(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) — the only relation EM iterates over; corpus size
    enters through freq only."""
    return (
        docs.select(
            F.explode(
                F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("f"))
    )


def train_unigram_distributed(
    docs: DataFrame,
    text_col: str = "text",
    seed_multi: int = 512,
    target_multi: int = 256,
    max_len: int = MAX_PIECE_LEN,
) -> dict[str, float]:
    """Distributed trainer, bit-identical to ``train_unigram``:
    seeding and every E-step are pandas-UDF passes over the words
    relation emitting exact integer (nano)counts that Spark sums
    order-independently; only the vocabulary (a few hundred rows)
    ever reaches the driver — the documented bounded collect, same as
    the BPE trainer's per-round argmax row."""
    import pandas as pd

    words = words_relation(docs, text_col).persist()

    def run_step(probs: dict[str, float] | None):
        def gen(batches):
            for pdf in batches:
                acc: dict[str, int] = {}
                for w, f in zip(pdf["w"], pdf["f"]):
                    if probs is None:  # seed pass: raw substring counts
                        for s in word_substrings(w, max_len):
                            acc[s] = acc.get(s, 0) + int(f)
                    else:
                        for piece, e in word_expected_nanocounts(
                            w, probs, max_len
                        ).items():
                            acc[piece] = acc.get(piece, 0) + int(
                                round(e * int(f) * NANO)
                            )
                yield pd.DataFrame(
                    {"piece": list(acc), "c": list(acc.values())}
                )

        agg = (
            words.mapInPandas(gen, "piece string, c long")
            .groupBy("piece")
            .agg(F.sum("c").alias("c"))
        )
        if probs is None:
            # seed selection stays IN Spark (TakeOrderedAndProject):
            # all single chars + top seed_multi multis — only the
            # selected vocabulary reaches the driver
            singles = agg.filter(F.length("piece") == 1)
            multis = (
                agg.filter(F.length("piece") > 1)
                .orderBy(F.col("c").desc(), "piece")
                .limit(seed_multi)
            )
            agg = singles.unionByName(multis)
        return {r["piece"]: r["c"] for r in agg.collect()}

    probs = normalize(
        {p: c * NANO for p, c in run_step(None).items()}
    )
    probs = normalize(run_step(probs))
    probs = normalize(prune(run_step(probs), target_multi))
    probs = normalize(run_step(probs))
    words.unpersist()
    return probs


def segment_counts(
    docs: DataFrame,
    probs: dict[str, float],
    text_col: str = "text",
    id_col: str = "doc_id",
    max_len: int = MAX_PIECE_LEN,
) -> DataFrame:
    """Per doc: Viterbi piece count under the trained model (exact
    integer — the oracle-checkable output)."""
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            cache: dict[str, int] = {}
            out = []
            for did, t in zip(pdf[id_col], pdf[text_col]):
                n = 0
                for w in (t or "").split():
                    c = cache.get(w)
                    if c is None:
                        c = len(viterbi(w, probs, max_len))
                        cache[w] = c
                    n += c
                out.append({"doc_id": int(did), "n_pieces": n})
            yield pd.DataFrame(out)

    return docs.select(id_col, text_col).mapInPandas(
        gen, "doc_id long, n_pieces long"
    )
