"""Multimodal column handling: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched Pandas UDFs
over ``mapInPandas``.

The decode step itself is STUBBED (no image/audio libs in this
container): ``decode_stub=True`` computes deterministic fake features
(byte length, sha-ish digest, fixed-dim pseudo-embedding) so the
Spark-side plumbing — schema, batch shape, partitioning — is real and
tested; ``decode_stub=False`` raises NotImplementedError where a real
``PIL.Image.open``/``librosa.load`` call would go.

Scale notes:
- binary payloads ride in Arrow record batches (zero pickling);
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds batch memory
  for fat blobs.
- mapInPandas streams batches — no per-group materialization, so one
  partition never holds more than a batch of decoded frames.
- metadata (mime, width, height, duration) is a typed struct column;
  filters on it prune BEFORE any decode happens.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, n_bytes long, digest string, embedding array<double>"
)

EMBED_DIM = 8


def extract_features(df: DataFrame, *, decode_stub: bool = True) -> DataFrame:
    """media rows -> feature rows via Arrow-batched mapInPandas.

    The UDF closure is fully self-contained (locals + stdlib only) so
    cloudpickle ships it BY VALUE — Python workers need neither this
    package on their path nor any cluster-side deployment. Keep it
    that way: a module-global helper here would pickle by reference
    and break under any session whose workers can't import the repo.
    """
    embed_dim = EMBED_DIM

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl

        import pandas as _pd

        def fake_decode(payload: bytes) -> list[float]:
            # deterministic stand-in for the real decoder: pseudo-
            # features from the md5 digest, scaled to [0,1]
            d = _hl.md5(payload).digest()
            return [b / 255.0 for b in d[:embed_dim]]

        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real decode needs PIL/librosa/av — not in this container; "
                    "run with decode_stub=True"
                )
            payloads = pdf["payload"]
            yield _pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "digest": payloads.map(lambda b: _hl.md5(b).hexdigest()),
                    "embedding": payloads.map(fake_decode),
                }
            )

    return df.select("media_id", "payload").mapInPandas(run, FEATURE_SCHEMA)


def frame_sample(df: DataFrame, every_ms: int = 1000, *, decode_stub: bool = True) -> DataFrame:
    """Video frame sampling: one output row per sampled frame. The
    stub emits frame indices from metadata duration without decoding;
    the real path would demux with ``av`` per batch."""
    if not decode_stub:
        raise NotImplementedError("real frame sampling needs the `av` package")
    frames = F.sequence(
        F.lit(0),
        F.greatest((F.col("meta.duration_ms") / every_ms).cast("int") - 1, F.lit(0)),
    )
    return df.select("media_id", F.explode(frames).alias("frame_idx")).withColumn(
        "ts_ms", F.col("frame_idx") * every_ms
    )


def resize_media(df: DataFrame, box: int = 224, *, decode_stub: bool = True) -> DataFrame:
    """Image resize plumbing: fit each media item into a ``box``×``box``
    square preserving aspect ratio. The TARGET-DIMENSION math is real
    (integer aspect-fit, what a preprocessing pipeline stores alongside
    the tensor); the pixel resample itself is the stubbed decode step —
    the real path would PIL ``Image.resize`` per Arrow batch inside the
    same ``mapInPandas`` loop, same schema, same batch shape.

    Output digest chains the input payload digest with the computed
    dims so the oracle can verify the transform end-to-end without
    pixel data. Pure map over the scan: metadata (width/height) rides
    in a struct column, so a filter on dims prunes before any decode.
    """
    schema = "media_id long, out_w int, out_h int, out_bytes long, digest string"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import numpy as np

        if not decode_stub:
            raise NotImplementedError(
                "real resize needs PIL — not in this container; "
                "run with decode_stub=True"
            )
        for pdf in batches:
            w = pdf["width"].to_numpy(dtype="int64")
            h = pdf["height"].to_numpy(dtype="int64")
            landscape = w >= h
            out_w = np.where(landscape, box, (w * box) // h).astype("int64")
            out_h = np.where(landscape, (h * box) // w, box).astype("int64")
            digests = [
                hashlib.md5(
                    f"{hashlib.md5(p).hexdigest()}-{ow}x{oh}".encode()
                ).hexdigest()
                for p, ow, oh in zip(pdf["payload"], out_w, out_h)
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "out_w": out_w.astype("int32"),
                    "out_h": out_h.astype("int32"),
                    "out_bytes": out_w * out_h * 3,
                    "digest": digests,
                }
            )

    flat = df.select(
        "media_id", "payload", F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )
    return flat.mapInPandas(run, schema=schema)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: treat the documents table's text bytes as media blobs
    so the multimodal path is exercisable on driver testdata.
    Deterministic synthetic dimensions stand in for decoded image
    metadata (resize / dimension-filter coverage)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            (320 + F.col("doc_id") % 960).cast("int").alias("width"),
            (240 + (F.col("doc_id") * 7) % 720).cast("int").alias("height"),
            (F.col("n_chars") * 10).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


from ..udf_compat import pickle_by_value as _pbv  # noqa: E402

_pbv(__name__)
