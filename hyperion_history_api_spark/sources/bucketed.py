"""Bucketed lake tables — shuffle-free co-located joins and
aggregations on the bucket key.

The reference co-locates work by routing: RabbitMQ queues hash-route
blocks/actions to worker processes (SURVEY §2.1 S10;
master.ts:1088-1189 heatmap rebalancing) and Elasticsearch routes
documents to shards by the partition key
(elastic-routes.ts:484-486). Spark's storage-level analog is
BUCKETING: both sides of a recurring join/aggregation are written
pre-hashed into B buckets on the key, so every later
join/groupBy/MERGE on that key reads co-located buckets and the
planner drops the exchange entirely (SortMergeJoin over bucketed
scans, zero shuffle).

When to bucket at 100 TB (and what by):
- the trx-regroup self-join and trx lookups -> bucket actions by
  ``trx_id``;
- per-account history pages / account rollups -> bucket by
  ``user_id`` (the ES-routing twin);
- the state-store MERGE (updateByBlock keyed on the natural key) ->
  bucket both the state table and the per-batch updates.
Bucket count is a layout-time commitment (pick ~2-4x executor cores
at target scale; AQE cannot re-split a bucket), so bucketing is for
STABLE, hot join keys — ad-hoc keys keep the runtime exchange.

Tables register in the session catalog with an explicit ``path`` so
the files live in the lake directory alongside the partitioned
history; `tests/test_plan_shapes.py::test_bucketed_join_no_exchange`
pins the no-Exchange plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    keys: list[str],
    sort_keys: list[str] | None = None,
    buckets: int = 32,
    path: str | None = None,
) -> None:
    """Write ``df`` as a bucketed (+ per-bucket sorted) parquet table.

    ``sort_keys`` default to ``keys``: sorted buckets let a
    SortMergeJoin skip its per-task sort too, leaving a pure merge
    over pre-sorted co-located files.
    """
    w = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(buckets, *keys)
        .sortBy(*(sort_keys or keys))
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back (bucket metadata only survives via
    the catalog — a raw ``spark.read.parquet`` of the same files loses
    the bucket spec and reintroduces exchanges)."""
    return spark.table(table)
