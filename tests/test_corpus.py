"""Semantics tests for corpus-management operators (hash split,
stratified sampling, incremental dedup, contamination, vocabulary /
TF-IDF / inverted index / PMI).

Boundary-case style per the reference's tests (small hand-built
fixtures, exact expected values — reference src/algo/search.rs:126-373
pattern)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from luxo_rs_spark.functions.fnv1a import fnv1a64_int_py
from luxo_rs_spark.operators.corpus import (
    contamination_pairs,
    hash_split,
    incremental_dedup,
    inverted_index,
    pmi_pairs,
    stratified_sample,
    tfidf_topk,
    token_table,
    vocabulary,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "alpha beta gamma", "en", "w1", 16),
        (1, "alpha beta gamma", "en", "w1", 16),  # exact dup of 0
        (2, "alpha beta delta", "en", "w2", 16),
        (3, "epsilon zeta", "de", "w2", 12),
        (4, "alpha alpha alpha", "de", "w1", 17),
        (5, "", "de", "w2", 0),  # empty text
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars int"
    )


# -- hash split -------------------------------------------------------------


def test_hash_split_matches_reference_hash(docs):
    out = {r.doc_id: r.split for r in hash_split(docs).collect()}
    for doc_id in range(6):
        bucket = fnv1a64_int_py(doc_id, 8) % 10
        want = "train" if bucket < 8 else ("val" if bucket == 8 else "test")
        assert out[doc_id] == want, (doc_id, bucket)


def test_hash_split_is_stable_under_repartition(docs):
    a = {r.doc_id: r.split for r in hash_split(docs).collect()}
    b = {r.doc_id: r.split for r in hash_split(docs.repartition(7)).collect()}
    assert a == b


# -- stratified sample ------------------------------------------------------


def test_stratified_sample_k_per_stratum(docs):
    out = stratified_sample(docs, "lang", k=2).groupBy("lang").count().collect()
    counts = {r.lang: r["count"] for r in out}
    assert counts == {"en": 2, "de": 2}


def test_stratified_sample_deterministic_order(docs):
    # rank key (id*48271) % 65536: en ids 0,1,2 -> 0, 48271, 31006
    ids = {r.doc_id for r in stratified_sample(docs, "lang", k=2).collect() if r.lang == "en"}
    assert ids == {0, 2}


# -- incremental dedup ------------------------------------------------------


def test_incremental_dedup_against_corpus_and_batch(docs):
    corpus = docs.filter(F.col("doc_id") == 0)  # "alpha beta gamma"
    batch = docs.filter(F.col("doc_id") > 0)
    kept = {r.doc_id for r in incremental_dedup(batch, corpus).collect()}
    # 1 dups corpus text; 2/3/4/5 are fresh and unique within batch
    assert kept == {2, 3, 4, 5}


def test_incremental_dedup_within_batch_min_id(spark):
    corpus = spark.createDataFrame([(100, "old")], "doc_id long, text string")
    batch = spark.createDataFrame(
        [(7, "x"), (3, "x"), (9, "old")], "doc_id long, text string"
    )
    kept = {r.doc_id for r in incremental_dedup(batch, corpus).collect()}
    assert kept == {3}  # min-id wins within batch; corpus text dropped


# -- contamination ----------------------------------------------------------


@pytest.mark.slow
def test_contamination_shared_ngrams(spark):
    corpus = spark.createDataFrame(
        [
            (1, "one two three four five six seven eight nine ten"),
            (2, "totally unrelated words that share no long grams at all"),
        ],
        "doc_id long, text string",
    )
    eval_set = spark.createDataFrame(
        [(10, "one two three four five six seven eight different tail")],
        "doc_id long, text string",
    )
    out = contamination_pairs(corpus, eval_set, n=8, max_shingle_df=100).collect()
    assert len(out) == 1
    row = out[0]
    # exactly one shared 8-gram: words 1..8
    assert (row.corpus_id, row.eval_id, row.n_shared) == (1, 10, 1)


@pytest.mark.slow
def test_contamination_hot_shingle_guard(spark):
    text = "a b c d e f g h"
    corpus = spark.createDataFrame(
        [(i, text) for i in range(5)], "doc_id long, text string"
    )
    eval_set = spark.createDataFrame([(99, text)], "doc_id long, text string")
    # the single shared shingle has corpus df=5 > ceiling=3 -> dropped
    assert contamination_pairs(corpus, eval_set, n=8, max_shingle_df=3).count() == 0
    assert contamination_pairs(corpus, eval_set, n=8, max_shingle_df=10).count() == 5


# -- vocabulary / tfidf / inverted index / pmi ------------------------------


def test_vocabulary_counts(docs):
    out = {r.token: (r.doc_freq, r.total_count) for r in vocabulary(docs).collect()}
    assert out["alpha"] == (4, 6)  # docs 0,1,2,4; doc 4 has it 3x
    assert out["beta"] == (3, 3)
    assert out["zeta"] == (1, 1)
    assert "" not in out  # empty doc contributes nothing


def test_tfidf_idf_and_ranking(docs):
    out = tfidf_topk(docs, k=1).collect()
    best = {r.doc_id: (r.token, r.tfidf) for r in out}
    # doc 3: epsilon/zeta tie on tf*idf -> token asc tiebreak
    assert best[3][0] == "epsilon"
    n_docs, df_eps = 6, 1
    want = (1 / 2) * math.log((n_docs + 1) / (df_eps + 1))
    assert best[3][1] == pytest.approx(want)
    # doc 4 is all alpha (high tf, low idf beats nothing else present)
    assert best[4][0] == "alpha"


def test_inverted_index_band_and_postings(docs):
    # n_docs=6; band 0.34..0.67 -> df in {3,4} with 6 docs -> beta(3), alpha(4)
    out = {
        r.token: (r.doc_freq, r.postings)
        for r in inverted_index(docs, 0.34, 0.67).collect()
    }
    assert out["beta"] == (3, "0,1,2")
    assert out["alpha"] == (4, "0,1,2,4")
    assert "gamma" not in out  # df=2 below band


def test_pmi_positive_for_perfect_cooccurrence(spark):
    rows = [(i, "x y") for i in range(4)] + [(10, "x z"), (11, "w z")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r.ta, r.tb): (r.n_pair, r.pmi) for r in pmi_pairs(df, min_df=1).collect()}
    n_pair, pmi = out[("x", "y")]
    assert n_pair == 4
    # pmi = ln(4*6/(5*4)) = ln(1.2)
    assert pmi == pytest.approx(math.log(4 * 6 / (5 * 4)))


def test_token_table_drops_empties(docs):
    toks = token_table(docs)
    assert toks.filter(F.col("token") == "").count() == 0
    assert toks.filter(F.col("doc_id") == 5).count() == 0


# -- merge / upsert ---------------------------------------------------------


def test_merge_upsert_semantics(spark):
    from luxo_rs_spark.operators.merge import merge_upsert

    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    updates = spark.createDataFrame(
        [(2, "B", False), (3, "x", True), (4, "d", False)],
        "k long, v string, del boolean",
    )
    out = {r.k: r.v for r in merge_upsert(base, updates, "k", "del").collect()}
    # 1 untouched, 2 updated, 3 deleted, 4 inserted
    assert out == {1: "a", 2: "B", 4: "d"}


def test_merge_upsert_without_deletes(spark):
    from luxo_rs_spark.operators.merge import merge_upsert

    base = spark.createDataFrame([(1, "a")], "k long, v string")
    updates = spark.createDataFrame([(1, "A"), (2, "b")], "k long, v string")
    out = {r.k: r.v for r in merge_upsert(base, updates, "k").collect()}
    assert out == {1: "A", 2: "b"}


# -- sequence packing / filter funnel / mixture weights ---------------------


def test_sequence_packing_contiguous(spark):
    from luxo_rs_spark.operators.corpus import sequence_packing

    rows = [(i, "w " * 100, "en") for i in range(5)]  # 100 tokens each
    df = spark.createDataFrame(
        [(i, t.strip(), l) for i, t, l in rows], "doc_id long, text string, lang string"
    )
    out = {r.doc_id: (r.tok_offset, r.seq_id) for r in
           sequence_packing(df, budget=250, by="lang").collect()}
    # offsets 0,100,200,300,400 -> seqs 0,0,0,1,1
    assert out == {0: (0, 0), 1: (100, 0), 2: (200, 0), 3: (300, 1), 4: (400, 1)}


def test_filter_funnel_monotonic(docs):
    from luxo_rs_spark.operators.corpus import filter_funnel

    row = filter_funnel(docs, min_chars=5, min_quality=0.0).collect()[0]
    assert row.n_total >= row.n_len_ok >= row.n_lang_ok >= row.n_quality_ok
    assert row.n_total == 6


def test_mixture_weights_math(docs):
    from luxo_rs_spark.operators.corpus import mixture_weights

    out = {r.domain: r for r in mixture_weights(docs, {"w1": 0.75}, by="source").collect()}
    # w1 has 3 of 6 docs -> actual 0.5, factor 1.5; w2 untargeted -> 0
    assert out["w1"].actual_frac == pytest.approx(0.5)
    assert out["w1"].factor == pytest.approx(1.5)
    assert out["w2"].target_frac == 0.0 and out["w2"].factor == 0.0


def test_passage_grams_short_doc_guard(spark, tmp_path):
    # Regression (round-2 ADVICE): q135/q160's gram expressions used
    # sequence(1, greatest(size-k, 0)) — Spark's sequence(1, 0) yields
    # the DESCENDING [1, 0], so a doc with < k+1 words crashed at
    # slice/element_at(.., 0). The queries must now treat short docs
    # as zero-gram, matching DuckDB's empty generate_series(1, 0).
    from luxo_rs_spark.plans.queries import QUERIES

    docs = spark.createDataFrame(
        [
            (1, "one", "en", "web", 3),
            (2, "", "en", "web", 0),
            (3, "a b c d e f g h i j", "en", "web", 19),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf_dir = str(tmp_path)
    docs.write.parquet(f"{sf_dir}/documents.parquet")
    # q135: only doc 3 has >= 8 words -> its 3 passages are unique ->
    # no passage crosses docs -> empty result, but NO runtime error.
    assert QUERIES["q135_passage_dedup"](spark, sf_dir).count() == 0
    # q160: docs 1 and 2 contribute no bigrams; doc 3 contributes 9.
    rows = QUERIES["q160_vocab_growth"](spark, sf_dir).collect()
    assert all(r.first_doc != 1 and r.first_doc != 2 for r in rows)


def test_compression_ratio_bands(spark):
    """zlib compressibility: repeated text compresses hard, random-ish
    hex barely; None/empty yield null. Deterministic across calls."""
    from luxo_rs_spark.functions.text import compression_ratio

    import hashlib

    junk = "".join(
        hashlib.sha256(str(i).encode()).hexdigest() for i in range(40)
    )
    df = spark.createDataFrame(
        [
            (1, "spam spam spam " * 100),
            (2, junk),
            (3, None),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["r"]
        for r in df.select(
            "doc_id", compression_ratio("text").alias("r")
        ).collect()
    }
    assert got[1] < 0.1          # boilerplate: extreme compression
    assert got[2] > 0.5          # hex noise: barely compresses
    assert got[3] is None and got[4] is None
    again = {
        r["doc_id"]: r["r"]
        for r in df.select(
            "doc_id", compression_ratio("text").alias("r")
        ).collect()
    }
    assert got == again


def test_substring_dup_coverage_semantics(spark):
    """Hand-built corpus, n=3 grams: doc a and b share one 3-word span;
    doc c repeats its own gram (within-doc repeat is NOT cross-doc dup);
    doc d is shorter than n and must be absent."""
    from luxo_rs_spark.operators.corpus import substring_dup_coverage

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),   # grams: tqb qbf bfj... 3 grams
            (2, "a quick brown fox sat down"),  # shares "quick brown fox"
            (3, "x y z w x y z w"),             # 6 grams, self-repeats only
            (4, "too short"),                   # < 3 words -> no grams
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_grams"], r["n_dup_grams"], r["dup_bps"])
        for r in substring_dup_coverage(docs, n=3).collect()
    }
    # doc1: 3 grams, 1 shared ("quick brown fox") -> 3333 bps
    assert got[1] == (3, 1, 3333)
    # doc2: 4 grams, 1 shared -> 2500 bps
    assert got[2] == (4, 1, 2500)
    # doc3: 6 positions, zero cross-doc dup despite internal repeats
    assert got[3] == (6, 0, 0)
    assert 4 not in got


def test_linkage_blocked_pairs_and_score(spark):
    from luxo_rs_spark.operators.linkage import agreement_score, blocked_pairs

    df = spark.createDataFrame(
        [(1, "x", "A", 10.0), (2, "x", "A", 30.0), (3, "x", "B", 10.0),
         (4, "y", "A", 10.0)],
        "id long, blk string, seg string, bal double",
    )
    pairs = blocked_pairs(df, ["blk"], "id", ["seg", "bal"])
    got = {(r["a"], r["b"]) for r in pairs.collect()}
    # only within-block pairs, a < b
    assert got == {(1, 2), (1, 3), (2, 3)}
    scored = pairs.withColumn(
        "s",
        agreement_score(
            [(F.col("a_seg") == F.col("b_seg"), 20),
             (F.abs(F.col("a_bal") - F.col("b_bal")) <= 5.0, 15)]
        ),
    )
    s = {(r["a"], r["b"]): r["s"] for r in scored.collect()}
    assert s == {(1, 2): 20, (1, 3): 15, (2, 3): 0}


def test_check_report_hostile_names_and_empty(spark):
    # names with quotes/backticks are inert (typed lit(), no SQL text);
    # all-empty checks raise instead of IndexError
    import pytest

    from luxo_rs_spark.operators.contracts import check_report

    df = spark.createDataFrame([(1,), (2,)], "v long")
    hostile = "it's a `weird', name\" -- x"
    rows = check_report(df, row_checks={hostile: F.col("v") > 0}).collect()
    assert rows[0]["check"] == hostile and rows[0]["n_violations"] == 0
    with pytest.raises(ValueError, match="at least one"):
        check_report(df, row_checks={})


def test_check_report_counts_seeded_violations(spark):
    from luxo_rs_spark.operators.contracts import check_report

    child = spark.createDataFrame(
        [(1, 10.0, "A"), (2, -5.0, "A"), (2, None, "Z"), (4, 3.0, "B")],
        "id long, amt double, code string",
    )
    parent = spark.createDataFrame([("A",), ("B",)], "code string")
    got = {
        r["check"]: (r["n_violations"], r["pass"])
        for r in check_report(
            child,
            row_checks={
                "amt_positive": F.col("amt") > 0,   # -5 and NULL violate
                "code_not_null": F.col("code").isNotNull(),
            },
            unique_keys={"id_unique": ["id"]},       # id=2 twice -> 1
            foreign_keys={"code_fk": (parent, ["code"], ["code"])},  # Z
        ).collect()
    }
    assert got == {
        "amt_positive": (2, False),
        "code_not_null": (0, True),
        "id_unique": (1, False),
        "code_fk": (1, False),
    }


def test_bigram_lm_counts_and_backoff(spark):
    """Hand-checkable stupid-backoff LM: train on two tiny docs, score
    a third; every count and the backoff arithmetic verified exactly."""
    from pyspark.sql import functions as F

    from luxo_rs_spark.functions.ngram_lm import (
        score_bigram_perplexity,
        train_bigram_lm,
    )

    train = spark.createDataFrame(
        [(1, "the cat sat"), (2, "the cat ran")], "doc_id long, text string"
    )
    uni, bi = train_bigram_lm(train)
    uc = {r["w"]: r["c"] for r in uni.collect()}
    assert uc == {"the": 2, "cat": 2, "sat": 1, "ran": 1}
    bc = {(r["w1"], r["w2"]): r["c"] for r in bi.collect()}
    assert bc == {("the", "cat"): 2, ("cat", "sat"): 1, ("cat", "ran"): 1}

    # "the cat sat" -> S(cat|the)=2/2=1, S(sat|cat)=1/2
    # "dog the" -> backoff 0.4*1/6 (dog unseen), then S(the|dog) backoff
    # 0.4*2/6; zero bigrams for a 1-token doc -> row absent
    score = spark.createDataFrame(
        [(10, "the cat sat"), (11, "dog the"), (12, "x")],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in score_bigram_perplexity(score, uni, bi).collect()
    }
    assert set(rows) == {10, 11}
    assert rows[10]["n_bigrams"] == 2 and rows[10]["oov_bigrams"] == 0
    import math

    exp10 = round(-(math.log(1.0) + math.log(0.5)) / 2, 3)
    assert rows[10]["log_ppl"] == exp10
    assert rows[11]["n_bigrams"] == 1 and rows[11]["oov_bigrams"] == 1
    exp11 = round(-math.log(0.4 * 2 / 6), 3)
    assert rows[11]["log_ppl"] == exp11


def test_chunk_documents_windows_and_edges(spark):
    """Window arithmetic pinned: exact multiples, remainders shorter
    than the overlap, single-window docs, empty docs (absent)."""
    from luxo_rs_spark.operators.corpus import chunk_documents

    def words(n, tag):
        return " ".join(f"{tag}{i}" for i in range(n))

    docs = spark.createDataFrame(
        [
            (1, words(10, "a")),   # one window (n <= chunk)
            (2, words(16, "b")),   # chunk=8, overlap=2 -> windows at 0,6,12
            (3, words(8, "c")),    # exactly one full window
            (4, ""),               # no tokens -> no rows
        ],
        "doc_id long, text string",
    )
    ch = chunk_documents(docs, chunk_tokens=8, overlap=2)
    rows = sorted(
        (r["doc_id"], r["chunk_idx"], r["n_tokens"])
        for r in ch.collect()
    )
    assert rows == [
        (1, 0, 8), (1, 1, 4),          # 10 tokens: 8 + remainder 4 @ step 6
        (2, 0, 8), (2, 1, 8), (2, 2, 4),
        (3, 0, 8),
    ]
    texts = {
        (r["doc_id"], r["chunk_idx"]): r["chunk_text"]
        for r in ch.collect()
    }
    assert texts[(2, 1)].split() == [f"b{i}" for i in range(6, 14)]


def test_trained_lang_id_learns_and_agrees_with_heuristic(spark):
    """Round-8 verdict item 9 — the trained char-trigram NB, validated
    where validation is possible: the driver fixtures' lang label is
    synthetic (the text is the same English-ish word salad for every
    label, so NO model can beat chance there — the q456 oracle checks
    the math, not the label). This test builds a corpus with REAL
    per-language signal (distinct function words + per-language
    vocabulary), then pins: (a) exact-integer determinism, (b)
    held-out accuracy >= 0.95 where the heuristic's stopword sets give
    each language a genuine character-level distribution, (c)
    agreement >= 0.95 with q37's heuristic on rows the heuristic calls
    unambiguously."""
    import random

    from pyspark.sql import functions as F

    from luxo_rs_spark.functions.langid import (
        score_char_trigram_lid,
        train_char_trigram_lid,
    )
    from luxo_rs_spark.functions.text import STOPWORDS, lang_id

    vocab = {
        "en": ["stream", "window", "batch", "query", "shuffle"],
        "de": ["strasse", "zeitung", "schnell", "wirklich", "zwischen"],
        "es": ["cancion", "trabajo", "siempre", "despues", "ciudad"],
        "fr": ["toujours", "travail", "chanson", "lumiere", "fenetre"],
    }
    rng = random.Random(42)
    rows = []
    did = 0
    for lang in sorted(vocab):
        for _ in range(80):
            toks = []
            for _w in range(30):
                pool = (
                    STOPWORDS[lang] if rng.random() < 0.5 else vocab[lang]
                )
                toks.append(pool[rng.randrange(len(pool))])
            rows.append((did, lang, " ".join(toks)))
            did += 1
    docs = spark.createDataFrame(
        rows, "doc_id long, lang string, text string"
    ).cache()

    model, denoms = train_char_trigram_lid(
        docs.filter(F.col("doc_id") % 5 != 0)
    )
    scored = score_char_trigram_lid(docs, model, denoms).cache()

    # (a) deterministic exact-integer scores: two runs identical
    a = sorted(tuple(r) for r in scored.collect())
    b = sorted(
        tuple(r)
        for r in score_char_trigram_lid(docs, model, denoms).collect()
    )
    assert a == b

    # (b) held-out accuracy
    held = scored.filter(F.col("doc_id") % 5 == 0)
    n_held = held.count()
    acc = held.filter("correct").count() / n_held
    assert n_held >= 60
    assert acc >= 0.95, f"held-out accuracy {acc:.3f}"

    # (c) agreement with the q37 stopword heuristic where it is
    # unambiguous (its vote matches the label)
    heur = docs.select(
        "doc_id", "lang", lang_id("text").alias("heur_lang")
    ).filter(F.col("heur_lang") == F.col("lang"))
    both = scored.join(heur.select("doc_id", "heur_lang"), "doc_id")
    n_unamb = both.count()
    n_agree = both.filter(F.col("pred_lang") == F.col("heur_lang")).count()
    assert n_unamb >= 100
    assert n_agree / n_unamb >= 0.95, f"{n_agree}/{n_unamb}"

    # the fixture-label chance floor documented above, pinned so a
    # future fixture WITH real language signal flips this reminder
    from luxo_rs_spark.sources.registry import load_table

    from conftest import SF_DIR_01

    fx = load_table(spark, SF_DIR_01, "documents")
    fm, fd = train_char_trigram_lid(fx.filter(F.col("doc_id") % 5 != 0))
    facc_rows = score_char_trigram_lid(fx, fm, fd).filter(
        F.col("doc_id") % 5 == 0
    )
    facc = facc_rows.filter("correct").count() / facc_rows.count()
    assert facc < 0.6, (
        "fixture text now carries real language signal - raise the "
        "q456 quality claims"
    )


def test_lang_id_model_broadcast_is_aqe_gated_not_forced(spark):
    """Round-9 verdict item 6: the scoring join must not FORCE a model
    broadcast. At fixture scale AQE flips it to a broadcast hash join
    at runtime from the model's actual size; a corpus-scale model
    (simulated with a 10^6-row synthetic trigram table) must execute
    through the same code path without a forced driver-side collect of
    the big side."""
    from pyspark.sql import functions as F

    from luxo_rs_spark.functions.langid import (
        score_char_trigram_lid,
        train_char_trigram_lid,
    )

    docs = spark.createDataFrame(
        [(i, "en", f"streaming window batch doc {i}") for i in range(50)],
        "doc_id long, lang string, text string",
    )
    model, denoms = train_char_trigram_lid(docs)
    scored = score_char_trigram_lid(docs, model, denoms)
    scored.collect()
    plan = scored._jdf.queryExecution().executedPlan().toString()
    # AQE chose broadcast for the small trained model at runtime
    assert "BroadcastHashJoin" in plan

    # synthetic 10^6-trigram model: the join still executes (shuffle
    # fallback allowed) and scores stay exact on the overlap
    big_model = (
        spark.range(1_000_000)
        .select(
            F.concat(F.lit("g"), F.col("id")).alias("g"),
            F.lit("xx").alias("lang"),
            F.lit(1).cast("bigint").alias("c"),
            F.lit(1000).cast("bigint").alias("logc_fp"),
        )
        .unionByName(model.select("g", "lang", "c", "logc_fp"))
    )
    import math

    from luxo_rs_spark.functions.langid import FP

    xx_logden = int(round(math.log(2_000_000) * FP))
    big_denoms = denoms.unionByName(
        spark.createDataFrame(
            [("xx", 10**6, xx_logden)], "lang string, t long, logden_fp long"
        )
    )
    out = score_char_trigram_lid(docs, big_model, big_denoms)
    assert out.count() == 50
    # the genuine languages still win over the never-matching filler
    assert out.filter("pred_lang = 'xx'").count() == 0
