"""Trained character-trigram language identification (round 8,
verdict item 9 — the CCNet-practice upgrade over q37's heuristic).

Model shape follows the q413 recipe (Brants 2007 / CCNet: every
statistic is a COUNT, counts are mergeable relations): per language,
char-trigram counts over the labeled train split, Laplace-smoothed
naive-Bayes scoring. The one twist making the whole pipeline
oracle-exact under distributed execution: log probabilities are
FIXED-POINT INTEGERS baked into the model at train time —
``logc_fp = round(ln(c+1) * 1e6)`` per (lang, trigram) and
``logden_fp = round(ln(T_lang + V) * 1e6)`` per language — so scoring
sums BIGINTs, which are associative and order-free across partitions
(a raw double ln-sum would vary in the last ulp with partition order
and could never hash-match a sequential oracle). An unseen trigram's
Laplace numerator is ln(0+1) = 0, so OOV terms vanish from the sum by
construction and only the per-language denominator scales with doc
length.

100 TB shape: training is two map-side-combinable shuffles (trigram
explode -> (lang, g) counts); the model is a plain parquet-shippable
relation. Scoring is ONE hash join instances->model on the trigram
key (AQE broadcasts small models), then an integer groupBy; the
5-language fan-out happens on the doc-level aggregate (tiny), never
on the trigram instances.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from luxo_rs_spark.functions.spread import spread

FP = 1_000_000  # fixed-point scale for log counts

#: scoring-join broadcast gate: a counted model at or under this many
#: (g, lang, logc_fp) rows (~30 MB serialized) broadcasts statically;
#: anything bigger is left to AQE's shuffle fallback (the OOM valve)
_BROADCAST_MODEL_MAX_ROWS = 1_000_000


def char_trigrams(col: Column) -> Column:
    """All overlapping 3-char substrings (code-point based, no
    normalization — normalization choices like lower() diverge across
    engines on non-ASCII; raw trigrams keep query and oracle
    byte-identical)."""
    return F.expr(
        "CASE WHEN char_length(coalesce({c}, '')) < 3 THEN array() "
        "ELSE transform(sequence(1, char_length({c}) - 2), "
        "i -> substr({c}, i, 3)) END".format(c=col._jc.toString())
    )


def train_char_trigram_lid(
    docs: DataFrame, lang_col: str = "lang", text_col: str = "text"
) -> tuple[DataFrame, DataFrame]:
    """Train on the labeled split: returns (model, denoms).

    model:  (lang, g, c BIGINT, logc_fp BIGINT)   — per-lang trigram
            counts with the fixed-point smoothed log numerator.
    denoms: (lang, t BIGINT, logden_fp BIGINT)    — per-lang totals
            against the GLOBAL train vocabulary V (Laplace)."""
    # spread before the explode: the single-row-group fixture scan is
    # one task, and the trigram explode + map-side partial count is the
    # heavy part of training (guide §2.5; same rationale as scoring).
    # Guarded (no-op on already-parallel scans) and keyed on the TEXT
    # (the only high-cardinality column here — lang has ~5 values and
    # would collapse the spread; text hashes evenly and is
    # retry-deterministic). Counts are integers, so the partition
    # assignment cannot affect the trained model.
    tri = spread(
        docs.select(F.col(lang_col).alias("lang"), F.col(text_col)),
        text_col,
    ).select(
        "lang",
        F.explode(char_trigrams(F.col(text_col))).alias("g"),
    )
    model = (
        tri.groupBy("lang", "g")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .withColumn(
            "logc_fp",
            F.round(F.log(F.col("c") + 1) * FP).cast("bigint"),
        )
    )
    # the trained model is consumed by THREE plan branches (vocab
    # count, denominators, and the scoring join) — checkpoint it once
    # so training runs once instead of once per consumer (the q376
    # lineage-truncation pattern; cost shows up as construction time)
    model = model.localCheckpoint(eager=True)
    vocab = model.select("g").distinct().count()
    denoms = (
        model.groupBy("lang")
        .agg(F.sum("c").cast("bigint").alias("t"))
        .withColumn(
            "logden_fp",
            F.round(F.log(F.col("t") + F.lit(vocab)) * FP).cast("bigint"),
        )
    )
    return model, denoms


def score_char_trigram_lid(
    docs: DataFrame,
    model: DataFrame,
    denoms: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
) -> DataFrame:
    """Score every doc (with >= 1 trigram) against every trained
    language; emit the argmax. Columns: doc_id, lang (true label),
    pred_lang, n_trigrams, best_score_fp, correct. Ties break to the
    lexicographically smallest language (deterministic)."""
    # spread the instance branch BEFORE the explode (optimization
    # guide §2.5: the documents fixture is one parquet row group, so
    # the scan is a single task and the explode -> model join ->
    # partial aggregation over ~10^6 trigram instances would run on
    # one core; the repartition shuffles only the tiny (id, text)
    # rows and is keyed for retry-determinism — at cluster scale the
    # scan already has many splits and the guard skips the shuffle
    # entirely)
    inst = spread(
        docs.select(F.col(id_col), F.col(text_col)), id_col
    ).select(
        F.col(id_col),
        F.explode(char_trigrams(F.col(text_col))).alias("g"),
    )
    # the trigram COUNT needs no explode at all: it is
    # max(char_length - 2, 0) — a scalar expression per doc (dropping
    # the second evaluation of the 1.5M-row explode branch)
    n_tri = docs.select(
        F.col(id_col),
        F.greatest(
            F.char_length(F.coalesce(F.col(text_col), F.lit(""))) - 2,
            F.lit(0),
        )
        .cast("bigint")
        .alias("n_trigrams"),
    ).filter(F.col("n_trigrams") >= 1)
    # ONE join on the trigram key, with an EXPLICIT size gate (round
    # 10, r9 verdict item 6): the model side is bounded, so count it
    # once — under the threshold it gets a static F.broadcast plan (no
    # pre-flip shuffle write of the 10^6-row instance side, the cost
    # AQE's runtime flip was paying at fixture scale); over the
    # threshold NO hint is applied and AQE keeps the OOM valve — a
    # corpus-scale multi-language model (10^6+ trigrams x many
    # languages) falls back to a shuffle join instead of blowing the
    # driver. Langs with zero overlapping trigrams for a doc are
    # restored by the doc x lang frame below.
    model_sel = model.select("g", "lang", "logc_fp")
    if model_sel.count() <= _BROADCAST_MODEL_MAX_ROWS:
        model_sel = F.broadcast(model_sel)
    hits = (
        inst.join(model_sel, "g")
        .groupBy(id_col, "lang")
        .agg(F.sum("logc_fp").cast("bigint").alias("s"))
    )
    per_lang = (
        n_tri.crossJoin(F.broadcast(denoms))
        .join(hits, [id_col, "lang"], "left")
        .select(
            id_col,
            "lang",
            (
                F.coalesce(F.col("s"), F.lit(0))
                - F.col("n_trigrams") * F.col("logden_fp")
            ).alias("score_fp"),
            "n_trigrams",
        )
    )
    # argmax with the deterministic (score desc, lang asc) tie-break:
    # a window rank over doc-id partitions — bounded groups of n_langs
    # rows sitting above an Aggregate, the SCALING.md pre-agg pattern
    from pyspark.sql.window import Window

    w = Window.partitionBy(id_col).orderBy(
        F.col("score_fp").desc(), F.col("lang").asc()
    )
    ranked = per_lang.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") == 1
    )
    truth = docs.select(id_col, F.col(lang_col).alias("true_lang"))
    return (
        ranked.join(truth, id_col)
        .select(
            id_col,
            F.col("true_lang").alias("lang"),
            F.col("lang").alias("pred_lang"),
            "n_trigrams",
            F.col("score_fp").alias("best_score_fp"),
            (F.col("lang") == F.col("true_lang")).alias("correct"),
        )
    )
