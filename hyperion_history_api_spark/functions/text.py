"""Text-analysis column expressions for the training-data pipeline.

All JVM-side built-ins (whole-stage codegen) — no Python UDFs in the
hot path. Each returns a Column usable in select/withColumn; the
matching oracle SQL lives next to each registered query.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Marker stopwords per language for the n-gram/stopword language-ID
# heuristic. Deterministic and cheap; real corpora would use char
# n-gram profiles — the plumbing (argmax over per-language scores in
# one scan) is identical.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to"],
    "es": ["el", "la", "de", "los", "que"],
    "fr": ["le", "la", "les", "des", "que"],
    "de": ["der", "die", "das", "und", "nicht"],
    "zh": ["de", "shi", "le", "bu", "zai"],
}


def tokens(col: Column) -> Column:
    """Whitespace tokenization (token counting baseline)."""
    return F.split(F.trim(col), r"\s+")


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def word_shingles(col: Column, n: int = 3) -> Column:
    """n-gram word shingles as a distinct array — input to MinHash /
    Jaccard dedup. Built entirely from array built-ins: slide an index
    window over the token array."""
    toks = tokens(col)
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    return F.array_distinct(
        F.when(
            F.size(toks) >= n,
            F.transform(
                idx, lambda i: F.concat_ws(" ", *[F.element_at(toks, i + k + 1) for k in range(n)])
            ),
        ).otherwise(F.array(F.concat_ws(" ", toks)))
    )


def normalized(col: Column) -> Column:
    """Canonical form for fingerprinting: lowercase, collapse
    whitespace, strip."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def fingerprint(col: Column) -> Column:
    """Deterministic document fingerprint = md5 of the normalized text
    (rolling-hash stand-in; md5 is available in both engines)."""
    return F.md5(normalized(col))


def punct_ratio(col: Column) -> Column:
    return F.round(
        F.regexp_count(col, F.lit(r"[^\w\s]")) / F.greatest(F.length(col), F.lit(1)), 4
    )


def stopword_ratio(col: Column, stopwords: list[str]) -> Column:
    pat = r"\b(" + "|".join(stopwords) + r")\b"
    return F.round(
        F.regexp_count(F.lower(col), F.lit(pat))
        / F.greatest(token_count(col), F.lit(1)),
        4,
    )


def lang_scores(col: Column) -> dict[str, Column]:
    """Per-language marker-hit counts (one regexp scan per language,
    all fused in one projection)."""
    out: dict[str, Column] = {}
    for lang, words in LANG_MARKERS.items():
        pat = r"\b(" + "|".join(words) + r")\b"
        out[lang] = F.regexp_count(F.lower(col), F.lit(pat))
    return out
