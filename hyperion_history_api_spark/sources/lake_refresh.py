"""Incremental lake maintenance: apply newly-ingested events to the
stored nested tables WITHOUT rebuilding the whole lake.

The reference never reindexes history to absorb a new block: the
indexer routes each action/delta to its block-range partition index and
appends there (src/indexer/helpers/elastic-routes.ts:484-486), leaving
every other partition untouched. At 100 TB a full rebuild per ingest
batch is obviously impossible, so the lake needs the same property:
a batch of new blocks must touch only the ``block_part`` directories it
lands in.

Mechanism (parquet-only twin of a Delta MERGE + OPTIMIZE on a
partition subset):

1. Enrich ONLY the new events through the same builders the full lake
   uses (``hyperion_model.build_actions/build_deltas`` with the
   ``events`` override) — one narrow codegen pass over the batch.
2. Diff the touched ``block_part`` set (one tiny distinct over the
   batch — an ingest batch spans O(1) parts, not O(history)).
3. Build the next snapshot in a temp dir: every UNTOUCHED partition
   directory is carried over by hard links (metadata-only, no data
   copy, no read); each TOUCHED partition is rewritten as
   merge(existing rows of that partition, new rows) with the natural
   key deduplicated (replay idempotence — the at-least-once source can
   re-deliver a batch) and the reference index sort restored
   (index-templates.ts:29-40).
4. Publish with the same atomic ``os.rename`` as the full build —
   a reader sees the complete old snapshot or the complete new one.

Cost per batch: O(new rows + rows in touched partitions), independent
of table history size. That is the property that lets the lake track a
live chain continuously.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..commitlog import link_tree as _link_tree
from ..commitlog import replace_dir
from . import hyperion_model as hm
from .stats import invalidate_stats
from .lake import (
    BLOCK_PART_SIZE,
    LAKE_VERSION,
    _manifest_path,
    _sort_cols,
    lake_root,
    lake_table,
)

# natural key per partitioned table: merge dedupes on it so a replayed
# batch (at-least-once delivery) is absorbed, mirroring the reference's
# ES _id overwrite (elastic-routes.ts:60-65)
_NATURAL_KEY = {"actions": "global_sequence", "deltas": "event_id"}

_INCR_BUILDERS = {
    "actions": hm.build_actions,
    "deltas": hm.build_deltas,
}


def refresh_partitioned(
    spark: SparkSession, sf_dir: str, name: str, new_events: DataFrame
) -> DataFrame:
    """Apply ``new_events`` (schema of ``load_tables(...)["events"]``)
    to the stored partitioned table ``name``; returns the refreshed
    table. Only the ``block_part`` directories the batch lands in are
    rewritten — everything else is hard-linked into the new snapshot.
    """
    if name not in _INCR_BUILDERS:
        raise ValueError(f"not an incrementally-maintained table: {name}")
    # ensure a committed base snapshot exists (builds on first use)
    lake_table(spark, sf_dir, name)
    sf_name = os.path.basename(os.path.normpath(sf_dir))
    dest = lake_root() / sf_name / name

    new_rows = _INCR_BUILDERS[name](spark, sf_dir, events=new_events).withColumn(
        "block_part", (F.col("block_num") / F.lit(BLOCK_PART_SIZE)).cast("bigint")
    )
    changed = [r[0] for r in new_rows.select("block_part").distinct().collect()]
    if not changed:
        return spark.read.parquet(str(dest))

    key = _NATURAL_KEY[name]
    existing = spark.read.parquet(str(dest))
    merged = (
        existing.where(F.col("block_part").isin(changed))
        .unionByName(new_rows)
        .dropDuplicates([key])
    )

    tmp = dest.parent / f".{name}.refresh.{uuid.uuid4().hex[:8]}"
    try:
        # rewrite ONLY the touched partitions, index sort restored
        (
            merged.repartition("block_part")
            .sortWithinPartitions(F.col("block_part"), *_sort_cols(name))
            .write.mode("append")
            .partitionBy("block_part")
            .parquet(str(tmp))
        )
        changed_dirs = {f"block_part={int(p)}" for p in changed}
        for entry in dest.iterdir():
            if not entry.is_dir() or entry.name in changed_dirs:
                continue
            _link_tree(entry, tmp / entry.name)
        # carry the manifest forward: same freshness identity (version +
        # source fingerprint), plus an increment journal the freshness
        # check ignores
        try:
            manifest = json.loads(_manifest_path(dest).read_text())
        except (OSError, ValueError):
            manifest = {"version": LAKE_VERSION, "source": None, "extra": ""}
        manifest["increments"] = int(manifest.get("increments", 0)) + 1
        _manifest_path(tmp).write_text(json.dumps(manifest))
        replace_dir(tmp, dest)
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    # a committed increment changes row counts and NDVs: drop this
    # lake's cached planner statistics (sources/stats.py) so the next
    # chooser-planned query re-analyzes instead of deciding on stale
    # cardinalities — the refresh hook the stats module documents.
    invalidate_stats(sf_dir)
    return spark.read.parquet(str(dest))


def refresh_all(
    spark: SparkSession, sf_dir: str, new_events: DataFrame
) -> dict[str, DataFrame]:
    """Refresh every incrementally-maintained table with one batch."""
    return {
        name: refresh_partitioned(spark, sf_dir, name, new_events)
        for name in _INCR_BUILDERS
    }


def retract_blocks_above(
    spark: SparkSession, sf_dir: str, name: str, fork_block: int
) -> DataFrame:
    """Fork handling on the serving lake: drop every row with
    ``block_num > fork_block`` — the reference's delete-by-range over
    its indices when the chain reorganizes (SURVEY §2.1 S11; the state
    store twin is ``ParquetStateStore.retract_forked``).

    A fork can only invalidate the chain TIP, so only partitions at or
    above ``fork_block``'s part are rewritten (usually exactly one);
    the rest of history hard-links into the next snapshot unchanged.
    Same atomic publish as the refresh path.
    """
    if name not in _INCR_BUILDERS:
        raise ValueError(f"not an incrementally-maintained table: {name}")
    lake_table(spark, sf_dir, name)
    sf_name = os.path.basename(os.path.normpath(sf_dir))
    dest = lake_root() / sf_name / name
    fork_part = fork_block // BLOCK_PART_SIZE

    existing = spark.read.parquet(str(dest))
    survivors = existing.where(
        (F.col("block_part") == fork_part) & (F.col("block_num") <= fork_block)
    )

    tmp = dest.parent / f".{name}.refresh.{uuid.uuid4().hex[:8]}"
    try:
        (
            survivors.repartition("block_part")
            .sortWithinPartitions(F.col("block_part"), *_sort_cols(name))
            .write.mode("append")
            .partitionBy("block_part")
            .parquet(str(tmp))
        )
        for entry in dest.iterdir():
            if not entry.is_dir():
                continue
            try:
                part = int(entry.name.split("=", 1)[1])
            except (IndexError, ValueError):
                continue
            if part < fork_part:
                _link_tree(entry, tmp / entry.name)
        try:
            manifest = json.loads(_manifest_path(dest).read_text())
        except (OSError, ValueError):
            manifest = {"version": LAKE_VERSION, "source": None, "extra": ""}
        manifest["increments"] = int(manifest.get("increments", 0)) + 1
        manifest["retracted_above"] = int(fork_block)
        _manifest_path(tmp).write_text(json.dumps(manifest))
        replace_dir(tmp, dest)
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    invalidate_stats(sf_dir)  # retraction shrinks counts/NDVs too
    return spark.read.parquet(str(dest))


_EVENT_COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]


def refresh_from_ingest_log(
    spark: SparkSession,
    sf_dir: str,
    log_path: str,
    *,
    batch_ids: "list[int] | None" = None,
) -> dict[str, DataFrame]:
    """Close the ingest -> serving loop: apply micro-batches that the
    streaming sink appended (``streaming/ingest.make_ingest_sink``,
    ``ingest_batch=<id>`` layout) to the stored nested tables.

    This is the reference's indexer -> query-index hop (the bulk write
    lands in the partition index the API reads, elastic-routes.ts): the
    streaming sink gives durability + state MERGE per batch; this step
    folds the accumulated batches into the lake the interactive ``hyp_*``
    family serves. ``batch_ids`` limits the pass to newly-arrived
    batches (the caller tracks its high-water mark); replayed batches
    are absorbed by the natural-key dedup in the merge.
    """
    df = spark.read.parquet(log_path)
    if batch_ids is not None and "ingest_batch" in df.columns:
        df = df.where(F.col("ingest_batch").isin([int(b) for b in batch_ids]))
    return refresh_all(spark, sf_dir, df.select(*_EVENT_COLS))
