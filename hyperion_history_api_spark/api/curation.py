"""Training-corpus curation queries: deterministic sampling/splits and
the composed quality→dedup→split pipeline — the end-to-end shape a
100 TB pretraining-data build runs (beyond-reference, first-class per
the build brief).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import fingerprint, stopword_ratio, token_count
from ..operators.sampling import (
    hash_sample,
    hash_split,
    sample_pred_sql,
    split_case_sql,
)
from ..registry import register, _t

_SPLIT_SQL = split_case_sql("doc_id")
_SAMPLE_SQL = sample_pred_sql("doc_id", 0.1)
_FP_SQL = "md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))"
_TOKENS_SQL = "len(string_split_regex(trim(text), '\\s+'))"
_STOP_SQL = (
    "round(len(regexp_extract_all(lower(text), '\\b(the|a|of|and|to)\\b')) "
    f"* 1.0 / greatest({_TOKENS_SQL}, 1), 4)"
)


@register(
    "doc_hash_split",
    f"""
    SELECT {_SPLIT_SQL} AS split,
           count(*) AS n_docs,
           CAST(sum({_TOKENS_SQL}) AS BIGINT) AS total_tokens
    FROM documents
    GROUP BY split ORDER BY split
    """,
    "curation: deterministic train/val/test hash split (salted md5 "
    "bucket; same id -> same split on any cluster/run)",
)
def doc_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir)["documents"]
    return (
        hash_split(docs, "doc_id")
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(token_count(F.col("text")).cast("long")).alias("total_tokens"),
        )
        .orderBy("split")
    )


@register(
    "doc_hash_sample",
    f"""
    SELECT doc_id, lang FROM documents
    WHERE {_SAMPLE_SQL}
    ORDER BY doc_id LIMIT 500
    """,
    "curation: deterministic 10% Bernoulli sample by salted id hash "
    "(reproducible, partition-independent — unlike df.sample)",
)
def doc_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir)["documents"]
    return (
        hash_sample(docs, "doc_id", 0.1)
        .select("doc_id", "lang")
        .orderBy("doc_id")
        .limit(500)
    )


@register(
    "training_corpus_curation",
    f"""
    WITH scored AS (
        SELECT doc_id, text, lang,
               {_TOKENS_SQL} AS tokens,
               {_STOP_SQL} AS stop_ratio,
               {_FP_SQL} AS fp
        FROM documents
    ), kept AS (
        SELECT * FROM scored
        WHERE lang = 'en' AND tokens >= 30 AND stop_ratio >= 0.02
    ), deduped AS (
        SELECT * FROM (
            SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
            FROM kept
        ) WHERE rn = 1
    )
    SELECT {_SPLIT_SQL} AS split,
           count(*) AS n_docs,
           CAST(sum(tokens) AS BIGINT) AS total_tokens,
           CAST(min(doc_id) AS BIGINT) AS first_doc
    FROM deduped
    GROUP BY split ORDER BY split
    """,
    "curation: composed pipeline — quality filter (tokens/stopword "
    "ratio) -> language filter -> exact dedup (keeper=min id per "
    "fingerprint) -> deterministic split, per-split token budget",
)
def training_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical pretraining-data build as ONE Catalyst plan:
    every stage is a narrow projection except the dedup window (one
    shuffle on the 128-bit fingerprint) and the final rollup. At
    100 TB: filters push to the scan, the fingerprint shuffle carries
    (fp, doc_id, tokens) — never the text — and the split column is a
    free projection."""
    docs = _t(spark, sf_dir)["documents"]
    scored = docs.select(
        "doc_id",
        "lang",
        token_count(F.col("text")).alias("tokens"),
        stopword_ratio(F.col("text"), ["the", "a", "of", "and", "to"]).alias(
            "stop_ratio"
        ),
        fingerprint(F.col("text")).alias("fp"),
    )
    kept = scored.where(
        (F.col("lang") == "en")
        & (F.col("tokens") >= 30)
        & (F.col("stop_ratio") >= 0.02)
    )
    w = Window.partitionBy("fp").orderBy("doc_id")
    deduped = (
        kept.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
    )
    return (
        hash_split(deduped, "doc_id")
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("tokens").cast("long")).alias("total_tokens"),
            F.min("doc_id").alias("first_doc"),
        )
        .orderBy("split")
    )
