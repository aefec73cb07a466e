"""Text analysis operators (SURVEY.md §2.12 L4/L6): language ID,
quality scoring, token stats, fingerprinting.

All pure column expressions (JVM codegen, no UDFs) so they run at scan
throughput — on 100 TB these are map-only passes with full predicate
pushdown preserved.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from xlearning_spark.functions import (
    fingerprint,
    punct_count,
    stopword_count,
    token_count,
    tokens,
)

# Tiny per-language marker lexicons for heuristic n-gram-free language
# ID (the real signal at scale would be char-ngram profiles; markers
# keep this a pure JVM expression).
_LANG_MARKERS = {
    "en": ("the", "and", "of", "is"),
    "es": ("el", "la", "de", "que"),
    "de": ("der", "die", "und", "das"),
    "fr": ("le", "la", "et", "les"),
    "zh": ("的", "是", "了", "在"),
}


def lang_score_columns(text_col: str) -> list[Column]:
    """One marker-hit-count column per language: ``score_<lang>``."""
    t = tokens(text_col)
    cols = []
    for lang, markers in _LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        cols.append(
            F.size(F.filter(t, lambda x: F.array_contains(arr, x))).alias(
                f"score_{lang}"
            )
        )
    return cols


def guess_lang(text_col: str) -> Column:
    """argmax over marker scores; 'und' when nothing matches."""
    t = tokens(text_col)
    scored = []
    for lang, markers in _LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        score = F.size(F.filter(t, lambda x: F.array_contains(arr, x)))
        scored.append(F.struct(score.alias("s"), F.lit(lang).alias("l")))
    best = F.array_max(F.array(*scored))
    return F.when(best.getField("s") > 0, best.getField("l")).otherwise(F.lit("und"))


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds n_tokens / n_punct / n_stopwords / avg_token_len / fp."""
    t = tokens(text_col)
    return (
        df.withColumn("n_tokens", token_count(text_col))
        .withColumn("n_punct", punct_count(text_col))
        .withColumn("n_stopwords", stopword_count(text_col))
        .withColumn(
            "avg_token_len",
            F.aggregate(t, F.lit(0), lambda a, x: a + F.length(x)).cast("double")
            / F.size(t),
        )
        .withColumn("fp", fingerprint(text_col))
    )


def quality_score(text_col: str = "text") -> Column:
    """Heuristic quality in [0,1]: penalize extreme length, high symbol
    ratio, high repetition (distinct-token ratio), like Gopher/C4-style
    filters. Deterministic, expression-only."""
    t = tokens(text_col)
    n = F.size(t).cast("double")
    distinct_ratio = F.size(F.array_distinct(t)).cast("double") / F.greatest(
        n, F.lit(1.0)
    )
    symbol_ratio = punct_count(text_col).cast("double") / F.greatest(
        F.length(text_col).cast("double"), F.lit(1.0)
    )
    length_ok = (n >= 5) & (n <= 10000)
    score = (
        F.when(length_ok, F.lit(0.4)).otherwise(F.lit(0.0))
        + F.lit(0.3) * distinct_ratio
        + F.lit(0.3) * (F.lit(1.0) - F.least(symbol_ratio * 10, F.lit(1.0)))
    )
    return F.round(score, 6)
