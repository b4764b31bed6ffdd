"""Text analysis operators: language-ID, quality scoring, token counting,
document fingerprinting. All but fingerprinting are pure JVM expressions
(Catalyst-optimizable, DuckDB-oracle-able)."""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf

# stopword marker sets per language (tiny n-gram-free heuristic: the driver
# corpus is synthetic; the operator shape — per-language score columns +
# argmax — is what matters at scale)
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it", "was", "for"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "auf", "zu"],
    "fr": ["le", "la", "les", "et", "est", "une", "que", "pour", "dans", "pas"],
    "es": ["el", "la", "los", "las", "es", "una", "que", "por", "con", "para"],
}


def _lang_score(words_col, lang: str):
    markers = F.array(*[F.lit(w) for w in LANG_MARKERS[lang]])
    return F.size(F.filter(words_col, lambda w: F.array_contains(markers, F.lower(w))))


def language_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, lang_guess, score columns). Argmax of marker-word hit counts;
    ties resolve alphabetically, zero hits -> 'und' (undetermined)."""
    words = F.split(F.col(text_col), " ")
    scored = df.select(
        F.col(id_col).alias("id"),
        *[_lang_score(words, lg).alias(f"score_{lg}") for lg in sorted(LANG_MARKERS)],
    )
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col(f"score_{lg}") for lg in langs])
    guess = F.when(best <= 0, F.lit("und"))
    for lg in langs:
        guess = guess.when(F.col(f"score_{lg}") == best, F.lit(lg))
    return scored.withColumn("lang_guess", guess)


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Length / punctuation / stopword / uppercase ratios + a composite
    quality score in [0,1] (classic pretraining-filter features)."""
    t = F.col(text_col)
    n_chars = F.length(t)
    words = F.split(t, " ")
    n_words = F.size(words)
    mean_word_len = n_chars / F.greatest(n_words, F.lit(1))
    en = F.array(*[F.lit(w) for w in LANG_MARKERS["en"]])
    stop_ratio = F.size(F.filter(words, lambda w: F.array_contains(en, F.lower(w)))) / F.greatest(
        n_words, F.lit(1)
    )
    punct_ratio = (
        F.length(F.regexp_replace(t, "[^!-/:-@\\[-`{-~]", "")) / F.greatest(n_chars, F.lit(1))
    )
    upper_ratio = F.length(F.regexp_replace(t, "[^A-Z]", "")) / F.greatest(n_chars, F.lit(1))
    digit_ratio = F.length(F.regexp_replace(t, "[^0-9]", "")) / F.greatest(n_chars, F.lit(1))
    score = (
        F.when(n_words < 5, 0.0)
        .when(mean_word_len < 2, 0.2)
        .when(mean_word_len > 12, 0.2)
        .otherwise(
            F.least(
                F.lit(1.0),
                F.lit(0.4)
                + stop_ratio * 2
                - punct_ratio
                - F.greatest(upper_ratio - F.lit(0.3), F.lit(0.0))
                - digit_ratio,
            )
        )
    )
    return df.select(
        F.col(id_col).alias("id"),
        n_words.alias("n_words"),
        F.round(mean_word_len, 4).alias("mean_word_len"),
        F.round(stop_ratio, 4).alias("stop_ratio"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(upper_ratio, 4).alias("upper_ratio"),
        F.round(digit_ratio, 4).alias("digit_ratio"),
        F.round(F.greatest(score, F.lit(0.0)), 4).alias("quality"),
    )


def token_count(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace + BPE-ish regex token counts (JVM regexp_extract_all)."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col).alias("id"),
        F.size(F.split(t, "\\s+")).alias("ws_tokens"),
        F.size(
            F.regexp_extract_all(t, F.lit(r"[A-Za-z]+|[0-9]{1,3}|[^A-Za-z0-9\s]"), 0)
        ).alias("bpe_ish_tokens"),
    )


def fingerprint(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    window: int = 16,
) -> DataFrame:
    """Winnowing document fingerprints (rolling k-gram hashes, per-window
    minima). (id, fingerprints array<bigint>) — shared fingerprints across
    docs indicate clone fragments."""

    @pandas_udf("array<long>")
    def _fp(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            b = (t or "").encode("utf-8", "ignore")
            if len(b) < k:
                out.append([zlib.crc32(b)])
                continue
            hs = np.array(
                [zlib.crc32(b[i : i + k]) for i in range(len(b) - k + 1)], dtype=np.int64
            )
            if len(hs) <= window:
                out.append([int(hs.min())])
                continue
            # per-window minima via stride trick
            sw = np.lib.stride_tricks.sliding_window_view(hs, window)
            out.append(sorted(set(map(int, sw.min(axis=1)))))
        return pd.Series(out)

    return df.select(F.col(id_col).alias("id"), _fp(F.col(text_col)).alias("fingerprints"))


def fingerprint_pairs(
    sigs: DataFrame, min_shared: int = 2, max_bucket_size: int | None = None
) -> DataFrame:
    """Clone-pair join over winnowing fingerprints: (id_a, id_b, shared_count)
    for doc pairs sharing >= min_shared fingerprints, id_a < id_b.

    Shape: explode -> groupBy(fp) bucket join -> pair aggregation. Only docs
    colliding on a fingerprint value meet, so candidate volume is bounded by
    bucket sizes (same scale discipline as the MinHash/SimHash suite).
    ``max_bucket_size`` applies dedup._cap_buckets to the fp buckets: one
    hot fingerprint (the crc of an empty/boilerplate fragment shared by n
    docs) otherwise turns its bucket self-join quadratic — same guard, same
    logged-exclusion semantics as the MinHash/SimHash caps."""
    from .dedup import _cap_buckets

    ex = sigs.select("id", F.explode("fingerprints").alias("fp")).distinct()
    ex = _cap_buckets(ex, ["fp"], max_bucket_size)
    l, r = ex.alias("l"), ex.alias("r")
    return (
        l.join(r, on=[F.col("l.fp") == F.col("r.fp"), F.col("l.id") < F.col("r.id")])
        .groupBy(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("shared_count"))
        .filter(F.col("shared_count") >= min_shared)
    )
