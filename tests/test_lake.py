"""Materialized-lake invariants (sources/lake.py): stored tables are
bit-identical to the on-the-fly enrichment, block-range predicates
prune partitions, and the cache invalidates on version/source change."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from hyperion_history_api_spark.sources import lake
from hyperion_history_api_spark.sources.hyperion_model import (
    build_actions,
    build_deltas,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.001")


def test_lake_actions_matches_enrichment(spark):
    stored = lake.lake_actions(spark, SF_DIR).drop("block_part")
    fresh = build_actions(spark, SF_DIR)
    assert stored.count() == fresh.count()
    assert stored.exceptAll(fresh).count() == 0
    assert fresh.exceptAll(stored).count() == 0


def test_lake_deltas_matches_enrichment(spark):
    stored = lake.lake_deltas(spark, SF_DIR).drop("block_part")
    fresh = build_deltas(spark, SF_DIR)
    assert stored.count() == fresh.count()
    assert stored.exceptAll(fresh).count() == 0


def test_block_range_prunes_partitions(spark):
    hi = lake.BLOCK_PART_SIZE - 1  # entirely inside partition 0
    df = lake.prune_block_range(lake.lake_actions(spark, SF_DIR), lo=1, hi=hi)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "block_part" in plan.split("PartitionFilters", 1)[1].split("]", 1)[0]


def test_block_num_filter_pushed_to_scan(spark):
    df = lake.prune_block_range(lake.lake_actions(spark, SF_DIR), lo=5, hi=9)
    plan = df._jdf.queryExecution().executedPlan().toString()
    pushed = plan.split("PushedFilters:", 1)[1].split("]", 1)[0]
    assert "GreaterThanOrEqual(block_num,5)" in pushed
    assert "LessThanOrEqual(block_num,9)" in pushed


def test_manifest_invalidates_on_version_change(spark):
    lake.lake_actions(spark, SF_DIR)  # ensure built
    dest = lake.lake_root() / os.path.basename(SF_DIR) / "actions"
    manifest = dest / "_lake_manifest.json"
    m = json.loads(manifest.read_text())
    assert m["version"] == lake.LAKE_VERSION
    manifest.write_text(json.dumps({**m, "version": -1}))
    assert not lake._is_fresh(dest, lake._source_fingerprint(SF_DIR))
    # next access rebuilds and restores a fresh manifest
    lake.lake_actions(spark, SF_DIR)
    assert json.loads(manifest.read_text())["version"] == lake.LAKE_VERSION


def test_no_lake_env_bypasses_storage(spark):
    os.environ["SPARK_GRAFT_NO_LAKE"] = "1"
    try:
        df = lake.lake_actions(spark, SF_DIR)
        assert "block_part" not in df.columns
    finally:
        del os.environ["SPARK_GRAFT_NO_LAKE"]


def test_stored_sort_is_index_sort(spark):
    """Within each stored file, actions are sorted global_sequence desc
    (index-templates.ts:29-40) — verified per input file via
    monotonically increasing row order in each parquet split."""
    from pyspark.sql import Window

    df = lake.lake_actions(spark, SF_DIR).select(
        "global_sequence", F.input_file_name().alias("f")
    )
    # spark preserves within-file row order for parquet scans of a
    # single file per partition; check non-increasing sequence per file
    w = Window.partitionBy("f").orderBy(F.monotonically_increasing_id())
    viol = (
        df.withColumn("prev", F.lag("global_sequence").over(w))
        .where(F.col("prev").isNotNull() & (F.col("global_sequence") > F.col("prev")))
        .count()
    )
    assert viol == 0
