"""Streamed end-to-end curation equals the one-shot batch build over
ANY arrival split (streaming/curation_ingest.py, round-6 item 6)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from hyperion_history_api_spark.streaming.curation_ingest import (
    curated_corpus,
    curation_filter,
    curation_rollup,
    make_curation_sink,
)
from hyperion_history_api_spark.tables import load_tables

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return load_tables(spark, SF_DIR)["documents"].select(
        "doc_id", "text", "lang"
    )


def _batch_keepers(spark):
    """The one-shot build's keeper set, exactly as
    corpus_curation_full composes it."""
    from hyperion_history_api_spark.operators.clustering import (
        cluster_keepers,
    )
    from hyperion_history_api_spark.operators.decontam import clean_corpus
    from hyperion_history_api_spark.operators.dedup import minhash_lsh_pairs

    docs = _docs(spark)
    kept = curation_filter(docs)
    clean = clean_corpus(
        kept.where(F.col("doc_id") % 20 != 7),
        docs.where(F.col("doc_id") % 20 == 7),
        "text",
        "doc_id",
        hashed=False,
        collapse=True,
    )
    pairs = minhash_lsh_pairs(clean, "text", "doc_id", threshold=0.7)
    return {
        (r["doc_id"], r["tokens"])
        for r in cluster_keepers(clean, pairs, "doc_id")
        .where(F.col("is_keeper") == 1)
        .select("doc_id", "tokens")
        .collect()
    }


def _stream(spark, tmp_path, wave_of, n_waves, tag):
    docs = _docs(spark)
    feed = tmp_path / f"feed_{tag}"
    for i in range(n_waves):
        docs.where(wave_of(F.col("doc_id")) == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(feed / f"wave{i}"))
    sink, paths = make_curation_sink(
        spark,
        str(tmp_path / f"out_{tag}"),
        docs.where(F.col("doc_id") % 20 == 7),
    )
    q = (
        spark.readStream.schema("doc_id long, text string, lang string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(feed / "wave*"))
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / f"cp_{tag}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    sink.close()
    return paths


def test_streamed_curation_equals_batch_over_two_different_splits(
    spark, tmp_path
):
    want = _batch_keepers(spark)
    assert want  # the fixture survives curation non-trivially

    # split A: round-robin by id (near-dups scattered across waves)
    pa = _stream(spark, tmp_path, lambda c: F.pmod(c, F.lit(3)), 3, "rr")
    got_a = {
        (r["doc_id"], r["tokens"])
        for r in curated_corpus(spark, pa)
        .select("doc_id", "tokens")
        .collect()
    }
    assert got_a == want

    # split B: contiguous ranges (history grows monotonically)
    pb = _stream(
        spark, tmp_path, lambda c: F.least(c / 170, F.lit(2)).cast("int"),
        3, "rng",
    )
    got_b = {
        (r["doc_id"], r["tokens"])
        for r in curated_corpus(spark, pb)
        .select("doc_id", "tokens")
        .collect()
    }
    assert got_b == want


def test_streamed_rollup_shape_and_index_versions(spark, tmp_path):
    paths = _stream(spark, tmp_path, lambda c: F.pmod(c, F.lit(2)), 2, "r")
    roll = curation_rollup(spark, paths).collect()
    assert [r["split"] for r in roll] == sorted({r["split"] for r in roll})
    assert all(r["n_docs"] > 0 and r["total_tokens"] > 0 for r in roll)
    # the dedup index advanced behind one pointer per micro-batch
    from hyperion_history_api_spark.streaming.dedup_ingest import (
        DedupIndexStore,
    )

    store = DedupIndexStore(spark, paths["index"])
    assert store.read_manifest()["version"] >= 2
    # replay idempotence: re-running a batch overwrites its own dirs
    assert {
        e
        for e in os.listdir(paths["clean"])
        if e.startswith("ingest_batch=")
    }


def test_sink_close_releases_pinned_executor_memory(spark, tmp_path):
    """Round-7 ADVICE: the sink persists the benchmark grams and (via
    cache_frames=True) the index store's frames for the life of the
    session unless torn down — ``sink.close()`` must unpersist both so
    a long-lived serving session doesn't leak executor memory per
    streaming query it ever ran."""
    docs = _docs(spark)
    sink, paths = make_curation_sink(
        spark, str(tmp_path / "out"), docs.where(F.col("doc_id") % 20 == 7)
    )
    sink(docs.where(F.col("doc_id") % 2 == 0), 0)
    sink(docs.where(F.col("doc_id") % 2 == 1), 1)
    # while live: the grams frame is pinned and the store caches frames
    assert sink._eval_grams.storageLevel.useMemory
    assert sink._store._frame_cache is not None
    sink.close()
    assert not sink._eval_grams.storageLevel.useMemory
    assert sink._store._frame_cache is None
    # the data itself stays durable — close releases memory, not state
    assert curated_corpus(spark, paths).count() > 0
