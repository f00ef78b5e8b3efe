"""Text analysis operators: token counting, quality scoring, language ID,
document fingerprinting. All pure JVM-side expressions (regexp/length/md5) —
vectorized, codegen'd, and bit-replayable by the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kylin_on_parquet_v2_spark.pipeline.dedup import normalize_text

#: tiny embedded stopword lists for the n-gram language heuristic
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "a"],
    "de": ["der", "die", "und", "ist", "das"],
    "fr": ["le", "la", "et", "les", "des"],
}


def token_count(col: Column) -> Column:
    """Whitespace token count."""
    return F.size(F.split(normalize_text(col), " "))


def bpe_ish_token_count(col: Column) -> Column:
    """BPE-ish subword proxy: count of letter-runs, digit-runs and
    punctuation marks (a cheap, deterministic stand-in for a real tokenizer;
    regexp_count is JVM-side)."""
    return (
        F.regexp_count(col, F.lit(r"[A-Za-z]{1,4}"))
        + F.regexp_count(col, F.lit(r"[0-9]"))
        + F.regexp_count(col, F.lit(r"[^\sA-Za-z0-9]"))
    )


def quality_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation-ratio / stopword-ratio quality features plus a
    composite score in [0,1]."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_tokens = token_count(t)
    n_punct = F.regexp_count(t, F.lit(r"[^\sA-Za-z0-9]"))
    n_stop = F.regexp_count(
        F.concat(F.lit(" "), normalize_text(t), F.lit(" ")),
        F.lit(r" (the|and|of|to|a|in|is|it) "),
    )
    punct_ratio = F.round(n_punct / F.greatest(n_chars, F.lit(1)), 6)
    stop_ratio = F.round(n_stop / F.greatest(n_tokens, F.lit(1)), 6)
    avg_token_len = F.round(n_chars / F.greatest(n_tokens, F.lit(1)), 6)
    score = F.round(
        F.least(n_tokens / F.lit(100.0), F.lit(1.0)) * 0.4
        + F.least(stop_ratio * F.lit(5.0), F.lit(1.0)) * 0.4
        + (F.lit(1.0) - F.least(punct_ratio * F.lit(10.0), F.lit(1.0))) * 0.2,
        6,
    )
    return docs.select(
        "doc_id",
        n_chars.alias("n_chars_m"),
        n_tokens.alias("n_tokens"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stop_ratio"),
        avg_token_len.alias("avg_token_len"),
        score.alias("quality_score"),
    )


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language heuristic: argmax of per-language stopword hit
    counts; 'und' (unknown) when nothing matches."""
    t = F.concat(F.lit(" "), normalize_text(F.col(text_col)), F.lit(" "))
    scores = {
        lang: F.regexp_count(t, F.lit(" (" + "|".join(words) + ") "))
        for lang, words in _LANG_MARKERS.items()
    }
    best = F.greatest(*scores.values())
    # deterministic tie-break: alphabetical language order, first max wins
    chain = None
    for lang in sorted(scores):
        cond = (scores[lang] > 0) & (scores[lang] == best)
        chain = F.when(cond, F.lit(lang)) if chain is None else chain.when(cond, F.lit(lang))
    pred = chain.otherwise(F.lit("und"))
    return docs.select(
        "doc_id",
        "lang",
        pred.alias("lang_pred"),
        *[F.coalesce(scores[lang], F.lit(0)).alias(f"score_{lang}") for lang in sorted(scores)],
    )


def fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Content fingerprints: full-text digest + head/tail digests (cheap
    containment/rolling-hash stand-ins, portable across engines)."""
    t = normalize_text(F.col(text_col))
    return docs.select(
        "doc_id",
        F.md5(t.cast("binary")).alias("fp_full"),
        F.md5(F.substring(t, 1, 64).cast("binary")).alias("fp_head"),
        F.md5(F.substring(F.reverse(t), 1, 64).cast("binary")).alias("fp_tail"),
        F.length(t).alias("n_norm_chars"),
    )
