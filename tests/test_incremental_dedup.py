"""Incremental (per-batch) MinHash dedup against a persisted band
index (operators/dedup.py incremental_pairs)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hyperion_history_api_spark.operators.dedup import (
    hashed_shingles,
    incremental_pairs,
    minhash_bands,
    minhash_lsh_pairs,
)


def _pairs_set(df):
    return {(r["id_a"], r["id_b"], r["jaccard"]) for r in df.collect()}


def test_batched_ingest_equals_full_corpus(spark, sf_dir):
    """Ingesting the corpus in three batches and unioning each batch's
    incremental output (plus the pairs inside the seed index) equals
    the one-shot full-corpus pair set — the replay-order-independence
    a production per-batch dedup needs."""
    from hyperion_history_api_spark.tables import load_tables

    docs = load_tables(spark, sf_dir)["documents"].select("doc_id", "text")
    seed = docs.where(F.col("doc_id") % 3 == 0)
    b1 = docs.where(F.col("doc_id") % 3 == 1)
    b2 = docs.where(F.col("doc_id") % 3 == 2)

    got = _pairs_set(minhash_lsh_pairs(seed, "text", "doc_id", threshold=0.5))

    hashes = hashed_shingles(seed, "text", "doc_id", repartition=True)
    bands = minhash_bands(hashes, "doc_id")
    for batch in (b1, b2):
        got |= _pairs_set(
            incremental_pairs(bands, hashes, batch, "text", "doc_id", threshold=0.5)
        )
        bh = hashed_shingles(batch, "text", "doc_id", repartition=True)
        hashes = hashes.unionByName(bh)
        bands = bands.unionByName(minhash_bands(bh, "doc_id"))

    want = _pairs_set(minhash_lsh_pairs(docs, "text", "doc_id", threshold=0.5))
    assert got == want
    assert want, "fixture should contain near-dup pairs"


def test_batch_only_touches_batch(spark):
    """Output pairs always include a batch-side doc; pure
    history-history duplicates are not re-emitted."""
    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon zeta"),  # dup of 1 (history)
        (3, "one two three four five six"),
        (10, "one two three four five six seven"),  # near-dup of 3 (batch)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    hist = docs.where(F.col("doc_id") < 10)
    batch = docs.where(F.col("doc_id") >= 10)
    h = hashed_shingles(hist, "text", "doc_id", repartition=True)
    b = minhash_bands(h, "doc_id")
    out = _pairs_set(
        incremental_pairs(b, h, batch, "text", "doc_id", threshold=0.5)
    )
    assert {(a, bb) for a, bb, _ in out} == {(3, 10)}
