"""End-to-end streaming incremental dedup (streaming/dedup_ingest.py):
documents arrive as real Structured-Streaming micro-batches; the union
of per-batch pair outputs equals the one-shot batch twin, and the
index store versions advance behind one atomic pointer."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from hyperion_history_api_spark.operators.dedup import minhash_lsh_pairs
from hyperion_history_api_spark.streaming.dedup_ingest import (
    DedupIndexStore,
    make_dedup_sink,
    read_pairs,
)
from hyperion_history_api_spark.tables import load_tables

SF_DIR = "/root/testdata/sf0.001"


def _pairs_set(df):
    return {(r["id_a"], r["id_b"], r["jaccard"]) for r in df.collect()}


def test_streaming_incremental_dedup_equals_batch(spark, tmp_path):
    docs = load_tables(spark, SF_DIR)["documents"].select("doc_id", "text")
    feed = tmp_path / "feed"
    for i in range(3):  # three deterministic arrival waves
        docs.where(F.col("doc_id") % 3 == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(feed / f"wave{i}"))
    sink, paths = make_dedup_sink(
        spark, str(tmp_path / "out"), threshold=0.5
    )
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(feed / "wave*"))
    )
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = _pairs_set(read_pairs(spark, paths["pairs"]))
    want = _pairs_set(
        minhash_lsh_pairs(docs, "text", "doc_id", threshold=0.5)
    )
    assert got == want and want

    # index advanced once per micro-batch behind one pointer; all four
    # frames resolve from the committed snapshot
    store = DedupIndexStore(spark, paths["index"])
    m = store.read_manifest()
    assert m is not None and m["version"] >= 3
    idx = store.read()
    assert idx.registry.count() > 0
    assert idx.members.count() == docs.count()

    # replay idempotency: re-running a batch id overwrites its own
    # pairs dir instead of double-appending
    n_before = read_pairs(spark, paths["pairs"]).count()
    replay = docs.where(F.col("doc_id") % 3 == 0)
    sink(replay, 0)
    assert read_pairs(spark, paths["pairs"]).count() >= n_before
    got2 = _pairs_set(read_pairs(spark, paths["pairs"]))
    assert got2 >= want  # replay may add already-known pairs, never lose
