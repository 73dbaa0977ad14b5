"""Byte-pair encoding: real train + distributed apply (SURVEY.md
§2.2-K text analysis — the actual subword tokenizer, not the
"BPE-ish regex" approximation of q39).

Train/apply split follows the IVF recipe (operators/similarity.py):
TRAIN on a bounded, deterministic driver-side sample (BPE training is
inherently sequential — each merge depends on the counts after the
previous one — and vocab sizes are tiny next to the corpus), then
APPLY the learned merge table distributed via an Arrow-batched pandas
UDF with the merge ranks broadcast in the closure. The apply side is
the classic greedy merge loop (lowest-rank pair first), identical to
the published BPE reference (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units", Algorithm 1).

Determinism: sampling is by lowest id (no RNG); merge ties break
lexicographically on the pair, so the same corpus always yields the
same vocab.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

#: end-of-word marker (kept out of the raw char alphabet).
#: Corpus text that itself contains U+2581 would corrupt segmentation
#: (merges could span the marker), so BOTH train and apply strip it
#: from raw words first — the marker is reserved, by construction.
EOW = "▁"


def _clean_word(w: str) -> str:
    """Reserve the EOW marker: strip any literal U+2581 from corpus
    words before shingling (train and apply use the same rule, so the
    learned merges and the applied segmentation agree)."""
    return w.replace(EOW, "") if EOW in w else w


def _word_freqs(texts) -> Counter:
    freqs: Counter = Counter()
    for t in texts:
        for w in (t or "").split():
            w = _clean_word(w)
            if w:
                freqs[w] += 1
    return freqs


def train_bpe(
    docs: DataFrame,
    vocab_size: int = 512,
    text_col: str = "text",
    id_col: str = "doc_id",
    sample_rows: int = 4096,
) -> list[tuple[str, str]]:
    """Learn up to ``vocab_size - |alphabet|`` merges from the
    ``sample_rows`` lowest-id docs. Returns the ordered merge list
    (rank = position)."""
    sample = [
        r[0]
        for r in docs.select(text_col)
        .orderBy(id_col)
        .limit(sample_rows)
        .collect()
    ]
    return train_from_freqs(_word_freqs(sample), vocab_size)


def train_from_freqs(
    freqs: Counter, vocab_size: int
) -> list[tuple[str, str]]:
    """The sequential merge loop over a word->frequency table — pure
    Python, no Spark: shared by :func:`train_bpe` and the DuckDB
    oracle's independent driver-side recomputation (plans/oracle.py
    q380), so both paths pin the same Sennrich Algorithm-1 semantics."""
    # symbol sequences per word: chars + end-of-word marker
    words = {w: tuple(w) + (EOW,) for w in freqs}
    alphabet = {s for seq in words.values() for s in seq}
    merges: list[tuple[str, str]] = []
    n_merges = max(0, vocab_size - len(alphabet))
    for _ in range(n_merges):
        pair_counts: Counter = Counter()
        for w, seq in words.items():
            f = freqs[w]
            for i in range(len(seq) - 1):
                pair_counts[(seq[i], seq[i + 1])] += f
        if not pair_counts:
            break
        # most frequent pair; ties break lexicographically-first
        # (max over a sorted list keeps the FIRST maximum — determinism)
        best = max(sorted(pair_counts), key=lambda p: pair_counts[p])
        if pair_counts[best] < 2:
            break
        merges.append(best)
        merged = best[0] + best[1]
        new_words = {}
        for w, seq in words.items():
            out = []
            i = 0
            while i < len(seq):
                if (
                    i < len(seq) - 1
                    and seq[i] == best[0]
                    and seq[i + 1] == best[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            new_words[w] = tuple(out)
        words = new_words
    return merges


def train_bpe_distributed(
    docs: DataFrame,
    vocab_size: int = 512,
    text_col: str = "text",
    id_col: str = "doc_id",
    sample_rows: int | None = None,
) -> list[tuple[str, str]]:
    """Scale-path BPE train: word frequencies are a distributed agg
    over the WHOLE corpus (no driver doc collect), and each round's
    pair counting is a Spark aggregation over the distinct-word table
    — the driver only receives the single argmax row per round. This
    removes both driver bottlenecks of :func:`train_bpe` (doc sample
    collect, O(sample) per-round Python pair loop) and trains on 100k+
    docs with bounded driver memory (the merge list itself).

    Semantics are pinned identical to :func:`train_bpe` (same corpus →
    same merge list; asserted in tests/test_bpe.py): the per-round
    segmentation is re-derived by greedy lowest-rank apply of the
    merges learned so far — equivalent to the training-loop's
    iterative resegmentation, and re-deriving from the checkpointed
    word table keeps the plan depth CONSTANT across rounds (the
    PageRank lineage-truncation lesson).

    Cost model: one Spark job per merge round over |distinct words|
    rows. Use :func:`train_bpe` when the corpus fits a driver sample;
    use this when it doesn't.
    """
    base = docs
    if sample_rows is not None:
        base = docs.orderBy(id_col).limit(sample_rows)
    wf = (
        base.select(
            F.explode(F.split(F.col(text_col), r"\s+")).alias("w")
        )
        .select(F.regexp_replace("w", EOW, "").alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("f"))
        .localCheckpoint(eager=True)
    )
    # alphabet = distinct chars across words + EOW (split('') yields a
    # trailing '' element on some versions — filtered)
    n_alpha = (
        wf.select(F.explode(F.split("w", "")).alias("c"))
        .filter(F.col("c") != "")
        .select("c")
        .distinct()
        .count()
    ) + 1  # + EOW
    merges: list[tuple[str, str]] = []
    n_merges = max(0, vocab_size - n_alpha)
    for _ in range(n_merges):
        ranks = {pair: i for i, pair in enumerate(merges)}

        @pandas_udf("array<struct<a:string,b:string>>")
        def adj_pairs(ws: pd.Series) -> pd.Series:
            def pairs_of(w):
                seq = _encode_word(w, ranks)
                return [
                    {"a": seq[i], "b": seq[i + 1]}
                    for i in range(len(seq) - 1)
                ]

            return ws.map(pairs_of)

        best = (
            wf.select("f", F.explode(adj_pairs("w")).alias("p"))
            .groupBy("p.a", "p.b")
            .agg(F.sum("f").alias("c"))
            # max count, ties broken lexicographically-FIRST — the
            # exact tie rule of train_bpe's `max(sorted(...))`
            .orderBy(F.desc("c"), "a", "b")
            .limit(1)
            .collect()
        )
        if not best or best[0]["c"] < 2:
            break
        merges.append((best[0]["a"], best[0]["b"]))
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    word = _clean_word(word)
    if not word:
        return []
    seq = list(word) + [EOW]
    while len(seq) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(seq) - 1):
            r = ranks.get((seq[i], seq[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best_i = i
        if best_rank is None:
            break
        seq[best_i : best_i + 2] = [seq[best_i] + seq[best_i + 1]]
    return seq


def bpe_tokenize(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Append ``out_col`` (array<string>) with the greedy lowest-rank
    BPE segmentation of each whitespace word. The merge table rides the
    UDF closure (broadcast once per executor); per-word results are
    memoized per batch — Zipf's law makes the cache hit rate high."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    @pandas_udf("array<string>")
    def encode(texts: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}

        def enc_text(t):
            out: list[str] = []
            for w in (t or "").split():
                hit = cache.get(w)
                if hit is None:
                    hit = _encode_word(w, ranks)
                    cache[w] = hit
                out.extend(hit)
            return out

        return texts.map(enc_text)

    return df.withColumn(out_col, encode(F.col(text_col)))
