"""Streaming near-duplicate detection AT INGEST: the per-batch
incremental MinHash dedup (operators/dedup.incremental_pairs /
extend_dedup_index) wired into a Structured Streaming foreachBatch
sink, with the four ``DedupIndex`` frames persisted behind ONE
manifest pointer so probe and extend always see a consistent index
version.

This is the composition a 100-TB training-data pipeline actually
runs: documents arrive as micro-batches; each batch

1. probes the STORED index (history never re-signed — registered
   texts skip the shingle/sign passes entirely),
2. appends its near-dup pairs to a per-batch output directory
   (replay-idempotent, same ``ingest_batch=<id>`` overwrite
   discipline as streaming/ingest.make_ingest_sink),
3. extends the index (append-only union of the four frames) and
   commits the new version through an atomic manifest ``os.replace``
   (the streaming/state_store protocol — a crash between pairs-write
   and index-commit replays the batch against the OLD index and
   overwrites its own pairs dir, so the published (pairs, index)
   pair is always consistent).

The union of per-batch pair outputs over any ingest order equals the
one-shot full-corpus ``minhash_lsh_pairs`` (replay-order
independence, proven end-to-end through real streaming by
tests/test_streaming_dedup.py).
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import (
    DedupIndex,
    build_dedup_index,
    extend_dedup_index,
    incremental_pairs,
    minhash_lsh_pairs,
)

_FRAMES = ("bands", "hashes", "members", "registry")


class DedupIndexStore:
    """Manifest-pointer persistence for a :class:`DedupIndex`: each
    commit writes the four frames into a fresh ``v<NNNNNNNN>-<uuid>/``
    directory and atomically swaps ONE pointer file, so readers and
    the next batch's extend see all four frames from the same version
    — never bands of one version against a registry of another.
    Superseded versions are retained for ``keep_versions`` commits
    (in-flight reader protection), then GC'd."""

    MANIFEST = "MANIFEST.json"

    def __init__(
        self, spark: SparkSession, path: str, *, keep_versions: int = 2
    ) -> None:
        self.spark = spark
        self.path = path
        self.keep_versions = max(1, keep_versions)

    def _manifest_file(self) -> str:
        return os.path.join(self.path, self.MANIFEST)

    def read_manifest(self) -> dict | None:
        try:
            with open(self._manifest_file()) as f:
                return json.load(f)
        except (OSError, ValueError):
            return None

    def read(self) -> DedupIndex | None:
        m = self.read_manifest()
        if m is None:
            return None
        base = os.path.join(self.path, m["snapshot"])
        return DedupIndex(
            **{
                f: self.spark.read.parquet(os.path.join(base, f))
                for f in _FRAMES
            }
        )

    def commit(self, index: DedupIndex) -> None:
        m = self.read_manifest()
        version = (m["version"] + 1) if m else 1
        history = (m.get("history", []) + [m["snapshot"]]) if m else []
        snap = f"v{version:08d}-{uuid.uuid4().hex[:8]}"
        os.makedirs(self.path, exist_ok=True)
        for f in _FRAMES:
            getattr(index, f).write.mode("overwrite").parquet(
                os.path.join(self.path, snap, f)
            )
        keep = (
            history[-(self.keep_versions - 1):]
            if self.keep_versions > 1
            else []
        )
        gc = [h for h in history if h not in keep]
        tmp = self._manifest_file() + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as fh:
            json.dump(
                {"version": version, "snapshot": snap, "history": keep}, fh
            )
        os.replace(tmp, self._manifest_file())
        for h in gc:
            shutil.rmtree(os.path.join(self.path, h), ignore_errors=True)


def make_dedup_sink(
    spark: SparkSession,
    out_dir: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
):
    """foreachBatch sink: probe -> append pairs -> extend -> commit.
    Returns ``(sink, paths)`` like ``make_ingest_sink``."""
    store = DedupIndexStore(spark, os.path.join(out_dir, "dedup_index"))
    pairs_path = os.path.join(out_dir, "dup_pairs")

    def sink(batch: DataFrame, batch_id: int) -> None:
        batch = batch.select(id_col, text_col).persist()
        try:
            index = store.read()
            if index is None:
                # seed: the first batch pairs against itself and
                # becomes the initial index
                pairs = minhash_lsh_pairs(
                    batch, text_col, id_col, threshold=threshold
                )
                new_index = build_dedup_index(batch, text_col, id_col)
            else:
                pairs = incremental_pairs(
                    index, batch, text_col, id_col, threshold=threshold
                )
                new_index = extend_dedup_index(index, batch, text_col, id_col)
            pairs.write.mode("overwrite").parquet(
                os.path.join(pairs_path, f"ingest_batch={batch_id}")
            )
            store.commit(new_index)
        finally:
            batch.unpersist()

    return sink, {"pairs": pairs_path, "index": store.path}


def read_pairs(spark: SparkSession, pairs_path: str) -> DataFrame:
    """All pairs emitted so far (the per-batch union)."""
    return spark.read.parquet(pairs_path).drop("ingest_batch")
