"""The indexer loop end-to-end: ingest micro-batch → incremental lake
refresh → ES ``_bulk`` ops → per-item-acked POST — the reference's
indexer → elastic-routes hop (``src/indexer/helpers/elastic-routes.ts``
:488-529: the routed bulk write that lands each batch in the partition
index the API reads) driven as a Structured-Streaming ``foreachBatch``
sink.

Per micro-batch the sink does the reference's three writes:

1. **Lake refresh** (:func:`..sources.lake_refresh.refresh_partitioned`)
   — the batch's events are enriched through the same builders as the
   full lake and merged into ONLY the touched block partitions, with
   natural-key dedup (replay absorption).
2. **Action append ops** — the enriched batch rows formatted as
   ``{index:{_id: global_sequence, _index: chain-action-<router>}}``
   pairs (:func:`..sources.es_bulk.es_bulk_format`, JVM codegen) and
   POSTed with per-item ack/nack retry (:func:`..sources.es_bulk
   .post_bulk`).
3. **State upsert ops** — the batch's LATEST row per state key as
   ``updateByBlock`` scripted upserts (makeScriptedOp,
   elastic-routes.ts:23-28): the stored script's newer-block-wins
   guard makes replays and out-of-order batches converge, exactly the
   S6 ``updateByBlock`` discipline.

Delivery contract: foreachBatch is at-least-once — a crash AFTER the
POST but BEFORE the checkpoint commit replays the whole batch on
restart. Every op is id-addressed (index/update by ``_id``), so the
replay overwrites instead of duplicating; the crash/replay test
asserts doc count == lake count and state convergence after a
mid-batch failure (tests/test_es_indexer.py).

Scale shape: formatting is a narrow JVM projection over the batch;
the POST stage is ``mapInPandas`` from the executors (each task talks
to ES directly — N tasks fan out to the ES ingest nodes exactly like
the reference's N indexer workers); the lake refresh rewrites O(batch
partitions), never history. Nothing here collects data rows to the
driver — only the per-request summary frame (O(requests) rows).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import hyperion_model as hm
from ..sources import lake_refresh
from ..sources.es_bulk import block_router, es_bulk_format, post_bulk

#: the projection indexed per action doc — scalars only (the nested
#: structs stay lake-side; the reference's action docs carry the same
#: promoted scalar head, index-templates.ts:52-76)
ACTION_DOC_COLS = ["global_sequence", "block_num", "user_id", "event_type", "value"]


def action_bulk_ops(acts: DataFrame, *, span: int = 10_000_000) -> DataFrame:
    """Enriched action rows → append op pairs with block-range index
    routing (buildActionBulk + routerFunc, elastic-routes.ts:58-79)."""
    return es_bulk_format(
        acts.select(*ACTION_DOC_COLS),
        op="index",
        index_name="chain-action",
        id_col="global_sequence",
        router=block_router(F.col("block_num"), span=span),
    )


def state_upsert_ops(batch: DataFrame) -> DataFrame:
    """Batch events → ONE ``updateByBlock`` scripted upsert per state
    key, carrying the key's latest (block_num, value) in the batch —
    the S6 discipline: the stored script keeps the write iff its
    block_num >= the indexed one, so replay/out-of-order converge.
    One window shuffle on the state key, bounded by batch size."""
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("event_id").desc()
    )
    latest = (
        batch.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(
            F.concat_ws("-", "user_id", "event_type").alias("_state_id"),
            (F.floor(F.col("event_id") / 5) + 1).cast("long").alias("block_num"),
            "user_id",
            "event_type",
            F.round("value", 4).alias("value"),
        )
    )
    return es_bulk_format(
        latest,
        op="update_script",
        index_name="chain-state",
        id_col="_state_id",
        source_cols=["block_num", "user_id", "event_type", "value"],
    )


def make_es_indexer_sink(
    spark: SparkSession,
    sf_dir: str,
    es_url: str,
    *,
    router_span: int = 10_000_000,
    on_summary: Callable[[int, dict], None] | None = None,
    fail_hook: Callable[[int], None] | None = None,
) -> Callable[[DataFrame, int], None]:
    """Build the foreachBatch sink closing the ingest → lake → ES
    loop. ``on_summary(batch_id, summary)`` receives per-batch op/
    retry totals; ``fail_hook(batch_id)`` runs AFTER the ES writes but
    BEFORE the sink returns — the crash/replay test's injection point
    (a raise there leaves the checkpoint uncommitted, forcing the
    at-least-once replay the _id-addressed ops must absorb)."""

    def sink(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        batch = batch.localCheckpoint(eager=True)  # one source scan
        # Fail fast on a wrong-schema feed: parquet resolves columns
        # by NAME, so pointing the stream at a raw SHIP spool
        # (block_num/payload files) yields all-NULL declared columns —
        # without this guard the sink would null-key the lake merge
        # and the ES ops instead of erroring (one limit-1 probe).
        if batch.where(F.col("event_id").isNull()).limit(1).count() > 0:
            raise ValueError(
                "indexer feed has rows with NULL event_id — the spool "
                "is not the decoded-event shape this sink ingests (a "
                "raw SHIP block spool must be decoded first)"
            )
        # 1. lake merge (natural-key dedup absorbs replays)
        lake_refresh.refresh_partitioned(spark, sf_dir, "actions", batch)
        # 2. action append ops for THIS batch's enrichment only
        acts = hm.build_actions(spark, sf_dir, events=batch)
        append_summary = post_bulk(
            action_bulk_ops(acts, span=router_span), es_url
        ).collect()
        # 3. state scripted upserts (latest per key in the batch)
        upsert_summary = post_bulk(state_upsert_ops(batch), es_url).collect()
        if on_summary is not None:
            on_summary(
                batch_id,
                {
                    "append_ops": sum(r["ops"] for r in append_summary),
                    "upsert_ops": sum(r["ops"] for r in upsert_summary),
                    "retried": sum(
                        r["retried"]
                        for r in (*append_summary, *upsert_summary)
                    ),
                },
            )
        if fail_hook is not None:
            fail_hook(batch_id)

    return sink


def run_indexer(
    spark: SparkSession,
    sf_dir: str,
    spool_dir: str,
    es_url: str,
    checkpoint_dir: str,
    *,
    available_now: bool = True,
    **sink_kwargs,
):
    """Tail a DECODED-event spool directory (the normalized shape
    ``streaming/ingest.decode_and_enrich`` lands — NOT the raw SHIP
    block spool of ``sources/ship_ws.spool_range``, whose
    block_num/payload files share no columns with this schema and
    would read as all-NULL rows; the sink's null-key guard rejects
    that) into the indexer sink. Returns the started StreamingQuery."""
    events = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string"
        )
        .parquet(spool_dir)
    )
    writer = events.writeStream.foreachBatch(
        make_es_indexer_sink(spark, sf_dir, es_url, **sink_kwargs)
    ).option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
