"""Streaming ingest with the BINARY decode stage wired in (SURVEY
§3.2 steps 2-4 end-to-end on real binary).

The reference's deserializer sits inside the indexing pipeline: SHIP
blob -> per-action abieos decode (with fallback chain) -> ds_error
side-channel feeding the auto-blacklist -> blacklist check gates what
gets indexed (``deserializer.ts:869-908``, ``base-parser.ts:158-230``).
Round-1 ingest only had the ``from_json`` stand-in; this module runs
the full flow as one Structured Streaming query:

    binary feed -> decode UDF (Arrow-batched, fallback chain)
                -> failure side-output => blacklist window store
                -> anti-join against ALL known windows
                -> append surviving decoded rows (per-batch subdir,
                   replay-idempotent like make_ingest_sink)

Window-store semantics: windows accumulate across micro-batches (a
contract blacklisted in batch N is skipped from batch N+1 onward, and
batch N's own rows are filtered by its own discoveries — the
reference's in-pass marking). Rows ingested BEFORE a window was
discovered are the reference's behavior too: it skips from discovery
onward, relying on replay to clean history.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.abi_pipeline import (
    abi_version_table,
    apply_blacklist,
    auto_blacklist_windows,
    build_binary_actions,
    decode_actions,
)

_FEED_SCHEMA = (
    "global_sequence long, block_num long, contract string, "
    "action_name string, abi_from string, abi_to string, "
    "amount_units long, symbol string, memo string, points long, "
    "note string, abi_blob binary"
)


def write_binary_feed(spark: SparkSession, sf_dir: str, feed_path: str) -> int:
    """Materialize the synthetic SHIP feed (binary blobs) once — the
    stand-in for the chain's websocket output."""
    df = build_binary_actions(spark, sf_dir)
    df.write.mode("overwrite").parquet(feed_path)
    return df.count()


def run_decode_ingest(
    spark: SparkSession, sf_dir: str, out_dir: str
) -> dict[str, str]:
    """One availableNow pass of the decode-ingest flow. Returns sink
    paths: ``decoded_log`` (surviving decoded rows) and ``blacklist``
    (the accumulated window store)."""
    feed_path = os.path.join(out_dir, "binary_feed")
    write_binary_feed(spark, sf_dir, feed_path)

    log_path = os.path.join(out_dir, "decoded_log")
    bl_path = os.path.join(out_dir, "blacklist")
    abis = abi_version_table(spark)

    def sink(batch: DataFrame, batch_id: int) -> None:
        decoded = decode_actions(batch).persist()
        try:
            # failure side-output -> window registration (P16)
            new_windows = auto_blacklist_windows(decoded, abis)
            if os.path.exists(bl_path):
                known = spark.read.parquet(bl_path)
                all_windows = known.unionByName(new_windows).distinct()
            else:
                all_windows = new_windows
            all_windows = all_windows.persist()
            all_windows.count()  # materialize before overwriting the store
            (
                all_windows.coalesce(1)
                .write.mode("overwrite")
                .parquet(bl_path + "_next")
            )
            # the repo's swap protocol (commitlog.replace_dir): old dir
            # renamed ASIDE before the new renames in — the hand-rolled
            # rmtree-then-rename form had a crash window that deleted
            # every accumulated window before the replacement landed
            # (restart would then silently re-ingest blacklisted
            # contracts), and readers mid-swap saw FileNotFound
            from ..commitlog import replace_dir

            if os.path.exists(bl_path):
                replace_dir(bl_path + "_next", bl_path)
            else:
                os.rename(bl_path + "_next", bl_path)
            # blacklist gate + append (per-batch subdir => idempotent)
            kept = apply_blacklist(
                decoded.where(F.col("abi_blob").isNotNull()), all_windows
            )
            (
                kept.write.mode("overwrite")
                .parquet(os.path.join(log_path, f"ingest_batch={batch_id}"))
            )
            all_windows.unpersist()
        finally:
            decoded.unpersist()

    stream = (
        spark.readStream.schema(_FEED_SCHEMA).format("parquet").load(feed_path)
    )
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", os.path.join(out_dir, "_decode_checkpoint"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return {"decoded_log": log_path, "blacklist": bl_path}
