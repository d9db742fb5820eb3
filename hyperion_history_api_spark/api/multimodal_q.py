"""Registered multimodal-pipeline queries: binary payloads through the
Arrow/Pandas-UDF feature extractor, checked exactly against DuckDB
(the stub features are md5-derived, reproducible in SQL)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register, _t
from ..sources.multimodal import documents_as_media, extract_features, frame_sample


@register(
    "multimodal_feature_extract",
    """
    SELECT doc_id AS media_id,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           md5(text) AS digest
    FROM documents ORDER BY media_id LIMIT 2000
    """,
    "multimodal: binary payload -> features via Arrow mapInPandas "
    "(decode stubbed; plumbing real)",
)
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text bytes stand in for media blobs; n_bytes/digest are
    byte-exact in both engines (ASCII corpus), embedding is checked by
    the unit tests (not SQL-expressible as a vector)."""
    docs = _t(spark, sf_dir)["documents"]
    feats = extract_features(documents_as_media(docs))
    return feats.select("media_id", "n_bytes", "digest").orderBy("media_id").limit(2000)


@register(
    "multimodal_frame_sample",
    """
    SELECT doc_id AS media_id,
           unnest(generate_series(0, greatest(CAST(floor(n_chars * 10 / 1000) AS INT) - 1, 0)))
             AS frame_idx
    FROM documents
    WHERE doc_id < 50
    ORDER BY media_id, frame_idx
    """,
    "multimodal: video frame sampling (stub demux; 1 row per frame)",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir)["documents"].where(F.col("doc_id") < 50)
    frames = frame_sample(documents_as_media(docs), every_ms=1000)
    return frames.select("media_id", "frame_idx").orderBy("media_id", "frame_idx")


@register(
    "multimodal_resize",
    """
    WITH media AS (
        SELECT doc_id AS media_id, text,
               CAST(320 + doc_id % 960 AS INT) AS width,
               CAST(240 + (doc_id * 7) % 720 AS INT) AS height
        FROM documents
    ), dims AS (
        SELECT media_id, text, width, height,
               CASE WHEN width >= height THEN 224
                    ELSE CAST((width * 224) // height AS INT) END AS out_w,
               CASE WHEN width >= height
                    THEN CAST((height * 224) // width AS INT)
                    ELSE 224 END AS out_h
        FROM media
    )
    SELECT media_id, out_w, out_h,
           CAST(out_w AS BIGINT) * out_h * 3 AS out_bytes,
           md5(md5(text) || '-' || CAST(out_w AS VARCHAR) || 'x'
               || CAST(out_h AS VARCHAR)) AS digest
    FROM dims ORDER BY media_id LIMIT 2000
    """,
    "multimodal: aspect-fit image resize via Arrow mapInPandas — "
    "integer target-dim math real, pixel resample stubbed, digest "
    "chain verifies the transform end-to-end",
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize-to-224-box over the media adapter: metadata-only dims
    computation + payload digest chain, all inside one Arrow-batched
    ``mapInPandas`` pass (the shape the real PIL path would run)."""
    from ..sources.multimodal import resize_media

    docs = _t(spark, sf_dir)["documents"]
    out = resize_media(documents_as_media(docs), box=224)
    return out.orderBy("media_id").limit(2000)
