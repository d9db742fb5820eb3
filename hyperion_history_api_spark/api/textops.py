"""Training-data pipeline operators over ``documents`` /
``embeddings`` — beyond-reference components (dedup, similarity
search, text analysis), first-class per the build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import (
    fingerprint,
    punct_ratio,
    stopword_ratio,
    token_count,
)
from ..registry import register, _t


@register(
    "doc_token_stats",
    """
    SELECT doc_id,
           CAST(len(string_split_regex(trim(text), '\\s+')) AS INT) AS tokens,
           CAST(length(text) AS BIGINT) AS chars
    FROM documents ORDER BY doc_id LIMIT 2000
    """,
    "text-analysis: token counting (whitespace)",
)
def doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir)["documents"]
    return (
        docs.select(
            "doc_id",
            token_count(F.col("text")).alias("tokens"),
            F.length("text").cast("long").alias("chars"),
        )
        .orderBy("doc_id")
        .limit(2000)
    )


@register(
    "doc_fingerprint",
    """
    SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
    FROM documents ORDER BY doc_id LIMIT 2000
    """,
    "text-analysis: document fingerprinting (md5 of normalized text)",
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir)["documents"]
    return (
        docs.select("doc_id", fingerprint(F.col("text")).alias("fp"))
        .orderBy("doc_id")
        .limit(2000)
    )


@register(
    "dedup_exact",
    """
    SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp,
           CAST(min(doc_id) AS BIGINT) AS keeper,
           count(*) AS copies
    FROM documents
    GROUP BY 1 HAVING count(*) >= 1
    ORDER BY keeper
    """,
    "dedup: exact (hash-groupBy on normalized-text fingerprint)",
    headline=True,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup at scale: one shuffle on the 128-bit fingerprint
    (never on the full text); keeper = min doc_id per group."""
    docs = _t(spark, sf_dir)["documents"]
    return (
        docs.select(fingerprint(F.col("text")).alias("fp"), "doc_id")
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keeper"), F.count("*").alias("copies"))
        .orderBy("keeper")
    )


@register(
    "doc_quality_score",
    """
    SELECT doc_id,
           CAST(len(string_split_regex(trim(text), '\\s+')) AS INT) AS tokens,
           round(len(regexp_extract_all(text, '[^a-zA-Z0-9_\\s]')) * 1.0
                 / greatest(length(text), 1), 4) AS punct_ratio,
           round(len(regexp_extract_all(lower(text),
                     '\\b(the|a|of|and|to)\\b')) * 1.0
                 / greatest(len(string_split_regex(trim(text), '\\s+')), 1), 4)
               AS stopword_ratio
    FROM documents ORDER BY doc_id LIMIT 2000
    """,
    "text-analysis: quality scoring (length/punct/stopword ratios)",
)
def doc_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir)["documents"]
    return (
        docs.select(
            "doc_id",
            token_count(F.col("text")).alias("tokens"),
            punct_ratio(F.col("text")).alias("punct_ratio"),
            stopword_ratio(F.col("text"), ["the", "a", "of", "and", "to"]).alias(
                "stopword_ratio"
            ),
        )
        .orderBy("doc_id")
        .limit(2000)
    )


@register(
    "embedding_cosine_topk",
    """
    WITH probes AS (
        SELECT vec_id AS probe_id, CAST(embedding AS DOUBLE[]) AS pe
        FROM embeddings WHERE vec_id < 5
    ), scored AS (
        SELECT probe_id, vec_id,
               round(
                 list_dot_product(pe, CAST(embedding AS DOUBLE[])) /
                 (sqrt(list_dot_product(pe, pe)) *
                  sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                        CAST(embedding AS DOUBLE[])))), 4)
               AS cosine
        FROM probes CROSS JOIN embeddings
        WHERE vec_id <> probe_id
    )
    SELECT probe_id, vec_id, cosine FROM (
        SELECT probe_id, vec_id, cosine,
               row_number() OVER (PARTITION BY probe_id
                                  ORDER BY cosine DESC, vec_id ASC) AS rn
        FROM scored
    ) WHERE rn <= 10 ORDER BY probe_id, rn
    """,
    "similarity: brute-force cosine top-k (ANN baseline)",
    headline=True,
)
def embedding_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: probes broadcast against the corpus,
    dot product via zip_with/aggregate (JVM-side, codegen'd — no
    Python). At 100 TB this exact plan is the per-partition scoring
    leg of the IVF/LSH variant (`ann_lsh_topk`); only the candidate
    set changes."""
    emb = _t(spark, sf_dir)["embeddings"].select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    probes = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("probe_id"), F.col("e").alias("pe")
    )

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
        )

    scored = (
        F.broadcast(probes)
        .crossJoin(emb)
        .where(F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "vec_id",
            F.round(
                dot(F.col("pe"), F.col("e"))
                / (F.sqrt(dot(F.col("pe"), F.col("pe"))) * F.sqrt(dot(F.col("e"), F.col("e")))),
                4,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 10)
        .orderBy("probe_id", "rn")
        .select("probe_id", "vec_id", "cosine")
    )
