"""Training-shard output stage — deterministic byte-budget sharding of
a curated corpus into dataloader-ready JSONL shards with a manifest.

The last hop of a training-data pipeline: after curation the corpus
must land as size-capped shards whose ASSIGNMENT is deterministic
(re-running the pipeline reproduces byte-identical shards, so
dataloader order and resume points stay stable). Shard id = first-fit
by cumulative offset within each source: concatenate the source's
docs in id order and cut every ``budget`` weight units — the same
discipline as GPT-style sequence packing (operators/packing.py), one
level up (files instead of context windows).

Scale shape: the cumulative offset is the grouped form of packing.py's
two-phase distributed prefix sum — range-partition on (group, order),
per-partition running sums inside each group, then a BROADCAST of the
(partition x group) totals as exclusive offsets. No stage funnels the
corpus through one task, and no per-source single-partition window
exists (a 100 TB source would break the naive
``Window.partitionBy(source)`` form).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def grouped_running_total(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    weight: Column,
    n_partitions: int = 32,
) -> DataFrame:
    """Add ``_cum`` = running sum of ``weight`` within each group in
    ``order_col`` order (inclusive). ``order_col`` must be numeric and
    unique within a group. Distributed form: no group ever occupies a
    single task regardless of its size.

    The chunk key is DERIVED FROM THE DATA (``order_col`` value range
    split into ``n_partitions`` width-equal chunks), not from runtime
    partition ids: the frame is referenced twice (local cums + chunk
    totals), and a sampled ``repartitionByRange`` +
    ``spark_partition_id`` pair is NOT guaranteed to assign the same
    pids in both subtrees once AQE re-coalesces them independently —
    measured as mis-joined offsets at sf0.1 during round 9. Value-
    derived chunks are identical in every subtree by construction.
    Even chunk sizes rely on ``order_col`` being roughly dense
    (sequence ids are, by construction, in this domain)."""
    lo, hi = df.agg(
        F.min(order_col).alias("lo"), F.max(order_col).alias("hi")
    ).first()
    if lo is None:
        return df.withColumn("_w", weight).withColumn("_cum", F.col("_w"))
    width = max(1, (int(hi) - int(lo) + n_partitions) // n_partitions)
    d = df.withColumn("_w", weight).withColumn(
        "_chunk",
        F.floor((F.col(order_col) - F.lit(int(lo))) / F.lit(width)).cast(
            "long"
        ),
    )
    local = Window.partitionBy("_chunk", *group_cols).orderBy(order_col)
    d = d.withColumn("_local_cum", F.sum("_w").over(local))
    # (chunk x group) totals (= the LAST row's inclusive running sum
    # per cell — max_by on order, not max, so signed weights stay
    # correct) -> exclusive per-group offsets; this side is n_partitions x
    # |groups| rows — broadcast-sized by construction. Totals come from
    # the WINDOWED frame so this subtree shares the identical
    # Exchange(hash(_chunk, groups)) with the main side and
    # ReuseExchange evaluates the scan + weight expression once (a
    # pre-window groupBy plans a different partial-agg exchange and
    # re-computes the weight corpus-wide).
    totals = d.groupBy("_chunk", *group_cols).agg(
        F.max_by("_local_cum", F.col(order_col)).alias("_ptotal")
    )
    off_w = (
        Window.partitionBy(*group_cols)
        .orderBy("_chunk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.withColumn(
        "_offset", F.coalesce(F.sum("_ptotal").over(off_w), F.lit(0))
    ).select(
        F.col("_chunk").alias("_r_chunk"),
        *[F.col(g).alias(f"_r_{g}") for g in group_cols],
        "_offset",
    )
    # NULL-SAFE left join on purpose: an inner or plain-equality join
    # would infer isnotnull(keys) and push it into ONE side's scan (the
    # build side for left, the stream side for inner), so the two
    # subtrees canonicalize differently and ReuseExchange stops deduping
    # the shared shuffle — the scan + weight expression then run twice
    # corpus-wide (measured at sf0.1). `<=>` infers no null filters,
    # keeps both scans identical, and matches null groups correctly.
    cond = F.col("_chunk").eqNullSafe(F.col("_r_chunk"))
    for g in group_cols:
        cond = cond & F.col(g).eqNullSafe(F.col(f"_r_{g}"))
    return (
        d.join(F.broadcast(offsets), cond, "left")
        .withColumn(
            "_cum",
            F.coalesce(F.col("_offset"), F.lit(0)) + F.col("_local_cum"),
        )
        .drop(
            "_chunk",
            "_local_cum",
            "_offset",
            "_r_chunk",
            *[f"_r_{g}" for g in group_cols],
        )
    )


def shard_assignment(
    df: DataFrame,
    *,
    group_col: str = "source",
    order_col: str = "doc_id",
    weight: Column | None = None,
    budget: int = 10_000,
    n_partitions: int = 32,
) -> DataFrame:
    """Assign each doc its ``shard`` within its group: first-fit by the
    doc's cumulative START offset (``_cum - _w``), so a doc larger
    than ``budget`` still lands in exactly one shard and every shard's
    content is a contiguous id range — the property that makes shard
    boundaries stable under appends."""
    w = weight if weight is not None else F.col("n_chars")
    d = grouped_running_total(df, [group_col], order_col, w, n_partitions)
    return d.withColumn(
        "shard",
        F.floor((F.col("_cum") - F.col("_w")) / F.lit(float(budget))).cast(
            "long"
        ),
    )


def write_training_shards(
    df: DataFrame,
    out_dir: str,
    *,
    text_col: str = "text",
    group_col: str = "source",
    order_col: str = "doc_id",
    budget: int = 10_000,
    n_partitions: int = 32,
) -> DataFrame:
    """Land the corpus as JSONL shards partitioned by
    ``(source, shard)`` and return the shard manifest (source, shard,
    docs, shard_weight) — the index a dataloader (or a resume) reads
    instead of listing files. The JSON line is built JVM-side
    (``to_json``); the write is a narrow partitionBy append.

    The assignment frame feeds TWO actions (the shard write and the
    manifest aggregation), so it is persisted across them — without
    the cache each action re-runs the whole prefix-sum DAG (corpus
    scan, weight projection, chunked windows, broadcast offsets),
    doubling the dominant cost of the output stage. The manifest is
    O(shards) rows, so it is materialized eagerly and the cache
    released before returning (a lazily returned frame would pin the
    corpus-sized cache for the session's lifetime)."""
    assigned = shard_assignment(
        df,
        group_col=group_col,
        order_col=order_col,
        weight=F.length(F.col(text_col)).cast("long"),
        budget=budget,
        n_partitions=n_partitions,
    ).persist()
    try:
        line = F.to_json(F.struct(F.col(order_col), F.col(text_col)))
        (
            assigned.select(
                F.col(group_col), F.col("shard"), line.alias("value")
            )
            .repartition(F.col(group_col), F.col("shard"))
            .sortWithinPartitions(group_col, "shard", order_col)
            .write.mode("overwrite")
            .partitionBy(group_col, "shard")
            .text(out_dir)
        )
        manifest = (
            assigned.groupBy(group_col, "shard")
            .agg(
                F.count(F.lit(1)).alias("docs"),
                F.sum("_w").alias("shard_weight"),
                F.min(order_col).alias("first_doc"),
                F.max(order_col).alias("last_doc"),
            )
            .orderBy(group_col, "shard")
        )
        rows = manifest.collect()
        schema = manifest.schema
    finally:
        assigned.unpersist()
    return df.sparkSession.createDataFrame(rows, schema)
