"""Action-trace regrouping with the reference's full canonical-ordinal
semantics (J3; ``src/indexer/helpers/action-dedup.ts:34-107``).

Antelope replays an action once per notified receiver: same
``act_digest``, distinct ``action_ordinal``, ``creator_action_ordinal``
pointing at the parent. Those must merge into ONE document with a
``receipts[]`` array. But two OTHER cases share a digest without being
notifications, and the reference's bug #148 fix distinguishes them:

- **independent duplicate roots** (same content sent twice,
  ``creator_action_ordinal = 0``): keep separate;
- **inline actions** (dispatched via ``.send()``: creator > 0 but the
  creator's OWN digest differs): each is the head of its own group.

The discriminator is a lookup of the CREATOR's digest: a notification
has ``digest[creator] == digest[self]``. The reference does this with
an in-memory ordinal→digest map per transaction (action-dedup.ts:43-58)
— imperative, per-trx. Spark-first it is a self-join:

    canonical = CASE WHEN creator > 0 AND creator_digest = digest
                     THEN creator ELSE action_ordinal END
    group key = (trx_id, act_digest, canonical)

The self-join is keyed (trx_id, ordinal) — both sides hash-partition on
trx_id, so at 100 TB it co-locates with the subsequent regroup shuffle
(one exchange feeds both) and no trx's traces ever cross executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def group_action_traces(traces: DataFrame) -> DataFrame:
    """Merge notification traces into receipts[] documents.

    Expects columns: ``trx_id``, ``action_ordinal``,
    ``creator_action_ordinal``, ``act_digest``, ``global_sequence``,
    ``receiver``. Returns one row per merged document carrying the
    canonical (head) trace's identity plus the merged, ordinal-ordered
    ``receipts`` array.
    """
    creators = traces.select(
        F.col("trx_id").alias("c_trx_id"),
        F.col("action_ordinal").alias("c_ordinal"),
        F.col("act_digest").alias("creator_digest"),
    )
    joined = traces.join(
        creators,
        (F.col("trx_id") == F.col("c_trx_id"))
        & (F.col("creator_action_ordinal") == F.col("c_ordinal")),
        "left",
    ).drop("c_trx_id", "c_ordinal")
    canonical = F.when(
        (F.col("creator_action_ordinal") > 0)
        & (F.col("creator_digest") == F.col("act_digest")),
        F.col("creator_action_ordinal"),
    ).otherwise(F.col("action_ordinal"))
    return (
        joined.withColumn("canonical_ordinal", canonical)
        .groupBy("trx_id", "act_digest", "canonical_ordinal")
        .agg(
            F.min("global_sequence").alias("global_sequence"),
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("action_ordinal").alias("ordinal"),
                        F.col("receiver").alias("receiver"),
                        F.col("global_sequence").alias("global_sequence"),
                    )
                )
            ).alias("receipts"),
        )
    )
