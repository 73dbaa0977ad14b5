"""Text-analysis column builders (SURVEY.md §2.2-K).

Everything here is a pure ``Column`` expression built from Spark
built-ins — no UDFs — so the whole text pipeline stays inside
whole-stage codegen and scales linearly with bytes scanned. The same
formulas are expressible in ANSI SQL, which is what makes these ops
oracle-checkable against DuckDB.

Design note (100 TB): these are the map-side primitives of a training-
data pipeline; they add no shuffle. Shuffles only appear downstream
(dedup joins, per-source aggregations).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: tiny per-language stopword inventories for the n-gram/stopword
#: language heuristic. Deliberately small and frozen: they are part of
#: the declared, oracle-checkable contract.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it"],
    "de": ["der", "die", "das", "und", "ist", "ein", "nicht", "mit"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es"],
    "fr": ["le", "la", "de", "et", "un", "est", "que", "pour"],
}

#: the "BPE-ish" token regex: letter runs, single digits, single
#: punctuation marks — a deterministic stand-in for a real tokenizer.
TOKEN_REGEX = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def words(text: Column | str) -> Column:
    """Whitespace tokens, lowercased. split on \\s+ after trim."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.lower(F.trim(c)), r"\s+")


def shingles(text: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles (default 3). Empty array when the
    document has fewer than n words (Spark's sequence() would count
    backwards on a negative span, hence the guard)."""
    w = words(text)
    idx = F.sequence(F.lit(0), F.size(w) - F.lit(n))
    gram = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(w, i + F.lit(j + 1)) for j in range(n)]
        ),
    )
    return F.when(F.size(w) >= n, F.array_distinct(gram)).otherwise(
        F.array().cast("array<string>")
    )


def word_count(text: Column | str) -> Column:
    return F.size(words(text)).cast("bigint")


def token_count(text: Column | str) -> Column:
    """BPE-ish token count via TOKEN_REGEX (JVM regex, no UDF)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit(TOKEN_REGEX), F.lit(0))).cast(
        "bigint"
    )


def stopword_hits(text: Column | str, lang: str = "en") -> Column:
    """Count of distinct words that are stopwords of `lang`."""
    wd = F.array_distinct(words(text))
    stop = F.array(*[F.lit(s) for s in STOPWORDS[lang]])
    return F.size(F.array_intersect(wd, stop)).cast("bigint")


def lang_id(text: Column | str) -> Column:
    """Stopword-vote language heuristic with a fixed priority-order
    tiebreak (en > de > es > fr, else 'und'). Deterministic and
    SQL-expressible by construction."""
    scores = {lang: stopword_hits(text, lang) for lang in STOPWORDS}
    best = F.greatest(*scores.values())
    out = F.lit("und")
    # reversed() so earlier languages win ties after the fold
    for lang in reversed(list(STOPWORDS)):
        out = F.when(
            (scores[lang] > 0) & (scores[lang] == best), F.lit(lang)
        ).otherwise(out)
    return out


def quality_metrics(text: Column | str) -> dict[str, Column]:
    """Quality-scoring components (length / punct / stopword ratios).

    All ratios divide exact integers, so the resulting doubles are
    bit-identical across engines (no rounding needed).
    """
    c = F.col(text) if isinstance(text, str) else text
    n_chars = F.length(c).cast("bigint")
    n_words = word_count(c)
    nonspace = F.length(F.regexp_replace(c, r"\s", "")).cast("bigint")
    alnum = F.length(F.regexp_replace(c, r"[^A-Za-z0-9\s]", "")).cast("bigint")
    n_punct = F.length(c) - alnum
    stop_ratio = stopword_hits(c, "en") / n_words
    return {
        "n_chars": n_chars,
        "n_words": n_words,
        "avg_word_len": nonspace / n_words,
        "punct_ratio": n_punct / n_chars,
        "stopword_ratio": stop_ratio,
        # composite score: bounded word count + stopword evidence
        # - punctuation noise; weights are part of the contract
        "quality": (
            F.least(n_words / F.lit(100.0), F.lit(1.0)) * 0.5
            + F.least(stop_ratio * 10, F.lit(1.0)) * 0.3
            + (F.lit(1.0) - F.least(n_punct / n_chars * 10, F.lit(1.0))) * 0.2
        ),
    }


def compression_ratio(text: Column | str) -> Column:
    """zlib compression ratio of the UTF-8 bytes (compressed/raw) — the
    cheap repetition/noise detector corpus filters pair with Gopher
    rules: boilerplate compresses far below prose, random junk barely
    compresses at all. The ONE text primitive here that needs Python
    (DuckDB/Spark have no SQL zlib), so it is an Arrow-batched pandas
    UDF, map-side only; output is deterministic (zlib level 6 bytes are
    fully specified for a given input)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def zratio(texts):
        import zlib

        def ratio(t):
            if not t:
                return None
            b = t.encode("utf-8")
            return len(zlib.compress(b, 6)) / len(b)

        return texts.map(ratio)

    c = F.col(text) if isinstance(text, str) else text
    return zratio(c)
