"""Training-shard output stage (operators/sharding.py): deterministic
byte-budget shards with a manifest — the dataloader-facing end of the
curation pipeline."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from hyperion_history_api_spark.operators.sharding import (
    grouped_running_total,
    shard_assignment,
    write_training_shards,
)
from hyperion_history_api_spark.tables import load_tables

SF_DIR = "/root/testdata/sf0.001"


def test_grouped_running_total_matches_naive(spark):
    """The grouped distributed prefix sum equals the naive per-group
    window for every chunking width (the invariant the value-derived
    chunk key must preserve)."""
    docs = load_tables(spark, SF_DIR)["documents"].select(
        "doc_id", "source", "n_chars"
    )
    from pyspark.sql import Window

    naive = docs.withColumn(
        "_naive",
        F.sum("n_chars").over(
            Window.partitionBy("source").orderBy("doc_id")
        ),
    )
    for n_parts in (1, 3, 8, 64):
        got = grouped_running_total(
            docs, ["source"], "doc_id", F.col("n_chars"), n_parts
        ).select("doc_id", "_cum")
        joined = naive.join(got, "doc_id")
        assert (
            joined.where(F.col("_naive") != F.col("_cum")).count() == 0
        ), n_parts


def test_shard_contents_are_contiguous_and_bounded(spark):
    docs = load_tables(spark, SF_DIR)["documents"].select(
        "doc_id", "source", "n_chars"
    )
    a = shard_assignment(docs, budget=2000, n_partitions=8)
    per = (
        a.groupBy("source", "shard")
        .agg(
            F.min("doc_id").alias("lo"),
            F.max("doc_id").alias("hi"),
            F.sum("n_chars").alias("w"),
            F.max("n_chars").alias("maxdoc"),
        )
        .collect()
    )
    # shard weight <= budget + one overflowing doc (first-fit by start
    # offset: only the doc that CROSSES the boundary can exceed it)
    assert all(r["w"] <= 2000 + r["maxdoc"] for r in per)
    # shards partition each source into contiguous id ranges
    by_src: dict = {}
    for r in per:
        by_src.setdefault(r["source"], []).append((r["lo"], r["hi"]))
    for src, ranges in by_src.items():
        ranges.sort()
        for (l1, h1), (l2, h2) in zip(ranges, ranges[1:]):
            assert h1 < l2, (src, ranges)


def test_write_training_shards_roundtrip(spark, tmp_path):
    docs = load_tables(spark, SF_DIR)["documents"].select(
        "doc_id", "source", "text"
    )
    out = str(tmp_path / "shards")
    manifest = write_training_shards(docs, out, budget=2000).collect()
    assert len(manifest) > len({r["source"] for r in manifest})  # >1/src
    # on-disk layout: source=<s>/shard=<n>/*.txt, one JSON line per doc
    seen = {}
    for r in manifest:
        d = os.path.join(out, f"source={r['source']}", f"shard={r['shard']}")
        lines = []
        for f in os.listdir(d):
            if f.endswith(".txt"):
                with open(os.path.join(d, f)) as fh:
                    lines += [json.loads(ln) for ln in fh]
        assert len(lines) == r["docs"]
        for obj in lines:
            seen[obj["doc_id"]] = obj["text"]
    want = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert seen == want  # every doc, byte-identical text, exactly once


def test_grouped_running_total_signed_weights(spark):
    """Same sign-safety as the ungrouped form: per-cell totals must be
    the last inclusive cum (max_by on order), not max()."""
    rows = [
        (i, ["a", "b", "c"][i % 3], ((i * 37) % 19) - 9)
        for i in range(1, 301)
    ]
    df = spark.createDataFrame(rows, "id: long, g: string, w: long")
    got = {
        (r["g"], r["id"]): r["_cum"]
        for r in grouped_running_total(
            df, ["g"], "id", F.col("w"), 8
        ).collect()
    }
    cums: dict[str, int] = {}
    for i, g, w in rows:
        cums[g] = cums.get(g, 0) + w
        assert got[(g, i)] == cums[g]
