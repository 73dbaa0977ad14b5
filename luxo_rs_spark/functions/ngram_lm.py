"""Distributed n-gram language model with stupid backoff + CCNet-style
perplexity scoring (SURVEY.md §2.2-K text-quality battery).

Brants et al. 2007 ("Large Language Models in Machine Translation")
introduced stupid backoff precisely because it suits MapReduce-shaped
systems: every statistic the model needs is a COUNT, counts are
mergeable relations, and there are no normalization passes. Wenzek et
al. 2020 (CCNet) made LM scoring over web documents the canonical
quality signal for crawl curation. This module composes the two,
Spark-first:

- ``train_bigram_lm``: one explode over the train split's tokens ->
  unigram counts; one explode over adjacent pairs -> bigram counts.
  Two shuffles, both on count keys and map-side combinable (skewed
  head words — the/of/and — collapse in the partial aggregate). Both
  tables are plain key-partitioned relations: shippable as parquet,
  mergeable by groupBy-sum across corpus shards, exactly the
  sketch-family contract.
- ``score_bigram_perplexity``: the held-out split's bigrams LEFT-join
  the two count relations; S(w2|w1) = c(w1 w2)/c(w1), backing off to
  alpha * c(w2)/N (unseen unigram -> alpha/N). Per document: exact
  bigram/backoff counters plus the negative mean ln S (the
  log-perplexity CCNet tertiles on).

Scale notes (100 TB): no driver state, no collect anywhere; the
vocabulary rides the shuffle keys. Scoring is two standard hash joins
that AQE can broadcast when a trained model is small enough; per-doc
aggregation reuses the explode's doc_id grouping.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BACKOFF_ALPHA = 0.4  # Brants et al. 2007's fixed backoff weight


def tokens(col: Column) -> Column:
    """Lowercased alphabetic tokens as an array column."""
    return F.filter(F.split(F.lower(col), "[^a-z]+"), lambda t: t != "")


def bigrams(toks: Column) -> Column:
    """Adjacent-pair structs (w1, w2) from a token array — built by
    zipping the array with its own shift, so the whole thing stays one
    row-local expression (no posexplode self-join)."""
    n = F.greatest(F.size(toks) - 1, F.lit(0))
    return F.arrays_zip(
        F.slice(toks, 1, n).alias("w1"),
        F.slice(toks, 2, n).alias("w2"),
    )


def train_bigram_lm(
    docs: DataFrame, text_col: str = "text"
) -> tuple[DataFrame, DataFrame]:
    """(unigram counts ``w, c``, bigram counts ``w1, w2, c``)."""
    toks = docs.select(tokens(F.col(text_col)).alias("toks"))
    uni = (
        toks.select(F.explode("toks").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    bi = (
        toks.select(F.explode(bigrams(F.col("toks"))).alias("bg"))
        .select(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    return uni, bi


def score_bigram_perplexity(
    docs: DataFrame,
    uni: DataFrame,
    bi: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = BACKOFF_ALPHA,
) -> DataFrame:
    """Per-document stupid-backoff log-perplexity over ``docs``:
    ``doc_id, n_bigrams, oov_bigrams, log_ppl`` where the counters are
    exact integers (they pin the joins) and log_ppl = -mean ln S."""
    b = docs.select(
        F.col(id_col),
        F.explode(bigrams(tokens(F.col(text_col)))).alias("bg"),
    ).select(
        id_col, F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2")
    )
    n_tok = uni.agg(F.sum("c").cast("double").alias("n_tok"))
    joined = (
        b.join(bi.withColumnRenamed("c", "bc"), ["w1", "w2"], "left")
        .join(
            uni.select(F.col("w").alias("w1"), F.col("c").alias("c1")),
            "w1",
            "left",
        )
        .join(
            uni.select(F.col("w").alias("w2"), F.col("c").alias("c2")),
            "w2",
            "left",
        )
        .crossJoin(F.broadcast(n_tok))
    )
    p = F.when(F.col("bc").isNotNull(), F.col("bc") / F.col("c1")).otherwise(
        F.lit(alpha) * F.coalesce(F.col("c2"), F.lit(1)) / F.col("n_tok")
    )
    return (
        joined.select(
            id_col,
            p.alias("p"),
            F.col("bc").isNull().cast("int").alias("oov"),
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.sum("oov").cast("bigint").alias("oov_bigrams"),
            F.round(F.avg(-F.log("p")), 3).alias("log_ppl"),
        )
    )
