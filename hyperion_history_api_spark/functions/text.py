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


def hashed_word_shingles(tok_col: Column, n: int = 3) -> Column:
    """Distinct 64-bit n-gram shingle hashes from a MATERIALIZED
    token-array column — the hashed twin of :func:`word_shingles`
    without the per-shingle string build: ``xxhash64(t_i, .., t_i+n-1)``
    hashes the n token fields directly. Tokens come from a ``\\s+``
    split, so they cannot contain whitespace and the tuple hash is
    injective exactly where the space-joined string was; short docs
    (< n tokens) hash the whole token array (the one-shingle case).

    Round-14 measurement (guide §1/§2.3): the old form
    ``transform(word_shingles(text), s -> xxhash64(s))`` re-evaluated
    the captured ``split(text)`` subexpression PER ELEMENT inside the
    interpreted higher-order lambda (three ``element_at(split(..))``
    per shingle position), then built and hashed a string per shingle.
    Feeding a bound (post-exchange) token-array column and hashing the
    token triple measured 3.5x faster on the shingle leg (0.60 ->
    0.17 s at sf0.1, interleaved A/B). The input MUST be a bound
    column, not an inline ``tokens()`` expression — projection
    collapse would re-inline the split into every element evaluation.

    Hash-space note: every in-repo consumer of hashed shingles (LSH
    signatures, Jaccard-over-hashes verification, hashed
    decontamination grams) derives from THIS helper, so the scheme is
    consistent engine-wide; the DuckDB oracles re-derive grams from
    text on their own side and never see these values. Jaccard over
    distinct hashes equals Jaccard over shingle strings modulo 64-bit
    collisions (~|union|^2/2^64 per pair — negligible, unchanged from
    the string-hash scheme)."""
    idx = F.sequence(F.lit(0), F.size(tok_col) - n)
    return F.array_distinct(
        F.when(
            F.size(tok_col) >= n,
            F.transform(
                idx,
                lambda i: F.xxhash64(
                    *[F.element_at(tok_col, i + k + 1) for k in range(n)]
                ),
            ),
        ).otherwise(F.array(F.xxhash64(tok_col)))
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
