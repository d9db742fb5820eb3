"""End-to-end streaming search-index maintenance
(streaming/index_ingest.py): documents arrive as real micro-batches,
the sink delta-commits postings per wave, and BM25 served from the
stream-built store equals a one-shot full build — plus the
at-least-once replay guard on the index commits."""

from __future__ import annotations

from pyspark.sql import functions as F

from hyperion_history_api_spark.sources.inverted_index import (
    InvertedIndexStore,
)
from hyperion_history_api_spark.streaming.index_ingest import (
    indexed_bm25,
    make_index_sink,
)
from hyperion_history_api_spark.tables import load_tables

SF_DIR = "/root/testdata/sf0.001"
TERMS = ["merge", "window", "customer"]


def _rows(df):
    return [tuple(r) for r in df.collect()]


def test_streamed_index_equals_full_build(spark, tmp_path):
    docs = load_tables(spark, SF_DIR)["documents"].select("doc_id", "text")
    feed = tmp_path / "feed"
    for i in range(3):
        docs.where(F.col("doc_id") % 3 == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(feed / f"wave{i}"))
    sink, paths = make_index_sink(spark, str(tmp_path / "out"))
    q = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(feed / "wave*"))
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    full = InvertedIndexStore(spark, str(tmp_path / "full"))
    full.commit(docs)
    got = _rows(indexed_bm25(spark, paths, TERMS, 20))
    assert got == _rows(full.bm25(TERMS, 20))
    assert got  # non-empty page

    # the corpus log carries every arrived doc, replay-idempotently
    corpus = spark.read.parquet(paths["corpus"]).drop("ingest_batch")
    assert corpus.count() == docs.count()

    # index advanced once per wave behind one pointer
    store = InvertedIndexStore(spark, paths["index"])
    m = store.log.read_manifest()
    assert m is not None and int(m["version"]) == 3
    assert store.last_ingest_batch() == 2


def test_index_replay_of_applied_batch_is_noop(spark, tmp_path):
    """A retried micro-batch whose index commit already landed must
    not re-append postings or double-count df/n/sumdl (that would
    silently drift BM25 scores, not just bloat storage)."""
    docs = load_tables(spark, SF_DIR)["documents"].select("doc_id", "text")
    sink, paths = make_index_sink(spark, str(tmp_path / "out"))
    waves = [docs.where(F.col("doc_id") % 3 == i) for i in range(3)]
    for i, w in enumerate(waves):
        sink(w, i)
    store = InvertedIndexStore(spark, paths["index"])
    v_before = int(store.log.read_manifest()["version"])
    page_before = _rows(indexed_bm25(spark, paths, TERMS, 20))
    stats_before = _rows(store.read()["stats"])

    for bid in (0, 1, 2):  # replay every applied batch
        sink(waves[bid], bid)
    assert int(store.log.read_manifest()["version"]) == v_before
    assert _rows(store.read()["stats"]) == stats_before
    assert _rows(indexed_bm25(spark, paths, TERMS, 20)) == page_before

    # a genuinely new batch still commits and moves the guard
    sink(waves[2].limit(0), 3)
    assert store.last_ingest_batch() == 3
    assert int(store.log.read_manifest()["version"]) == v_before + 1
    assert _rows(indexed_bm25(spark, paths, TERMS, 20)) == page_before


def test_stream_fork_retraction_mid_ingest(spark, tmp_path):
    """S11 on the streaming indexer: waves land, a fork retracts the
    middle wave's docs, more waves land — serving must equal a full
    build over exactly the surviving corpus at every point."""
    docs = load_tables(spark, SF_DIR)["documents"].select("doc_id", "text")
    sink, paths = make_index_sink(spark, str(tmp_path / "out"))
    waves = [docs.where(F.col("doc_id") % 4 == i) for i in range(4)]
    sink(waves[0], 0)
    sink(waves[1], 1)
    store = InvertedIndexStore(spark, paths["index"])
    store.retract_ids(waves[1].select("doc_id"))  # fork rolls wave 1 back
    sink(waves[2], 2)
    sink(waves[3], 3)

    survivors = docs.where(F.col("doc_id") % 4 != 1)
    full = InvertedIndexStore(spark, str(tmp_path / "full"))
    full.commit(survivors)
    assert _rows(indexed_bm25(spark, paths, TERMS, 20)) == _rows(
        full.bm25(TERMS, 20)
    )
    assert _rows(store.read()["stats"]) == _rows(full.read()["stats"])


def test_stream_index_auto_compaction_keeps_probe_flat(spark, tmp_path):
    """compact_every: after K delta commits the store OPTIMIZEs —
    postings land word-clustered in few files, the live view is
    row-identical, and the manifest marks the rewrite."""
    docs = load_tables(spark, SF_DIR)["documents"].select("doc_id", "text")
    sink, paths = make_index_sink(
        spark, str(tmp_path / "out"), compact_every=3
    )
    waves = [docs.where(F.col("doc_id") % 5 == i) for i in range(5)]
    for i, w in enumerate(waves):
        sink(w, i)
    store = InvertedIndexStore(spark, paths["index"])
    m = store.log.read_manifest()
    # wave 3 was the 3rd delta commit -> compaction fired and reset
    # the counter; wave 4 is one fresh delta on top
    assert int(m["delta_commits"]) == 1
    full = InvertedIndexStore(spark, str(tmp_path / "full"))
    full.commit(docs)
    assert _rows(indexed_bm25(spark, paths, TERMS, 20)) == _rows(
        full.bm25(TERMS, 20)
    )
    # the guard survives the OPTIMIZE rewrite
    assert store.last_ingest_batch() == 4


def test_replay_guard_survives_compaction_and_retraction(spark, tmp_path):
    """The window that would break without carrying last_ingest_batch
    through OPTIMIZE/retraction publishes: a batch replayed right
    after either must still be recognized as applied."""
    docs = load_tables(spark, SF_DIR)["documents"].select("doc_id", "text")
    sink, paths = make_index_sink(
        spark, str(tmp_path / "out"), compact_every=2
    )
    waves = [docs.where(F.col("doc_id") % 3 == i) for i in range(3)]
    for i, w in enumerate(waves):
        sink(w, i)  # wave 2 = 2nd delta -> auto-compaction fires
    store = InvertedIndexStore(spark, paths["index"])
    assert store.log.read_manifest().get("compacted") is True
    assert store.last_ingest_batch() == 2
    stats_before = _rows(store.read()["stats"])
    sink(waves[2], 2)  # replay right after the compaction
    assert _rows(store.read()["stats"]) == stats_before

    store.retract_ids(waves[0].select("doc_id").limit(5))
    assert store.last_ingest_batch() == 2  # survives retraction too
