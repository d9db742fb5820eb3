"""Sequence packing for training-data pipelines: assign documents to
fixed-token-budget packs by global token order (GPT-style "concatenate
the corpus and slice into context windows", where a document belongs to
the pack in which its first token lands).

The core primitive is a **distributed prefix sum**: a global running
total of a weight column in a stable order, computed WITHOUT a
single-partition window. Spark's own ``Window.orderBy`` with no
partition key moves the whole table through one task — fine for a
mismatch report, fatal for a 100 TB corpus. The classic two-phase
scan used here is the textbook fix:

1. split the order column's VALUE RANGE into N width-equal chunks
   (two scalar aggregates fold the bounds; ids are dense by
   construction in this domain, so chunks are even);
2. per-chunk running sum (window partitioned by chunk id — parallel,
   no cross-chunk traffic);
3. per-chunk totals (N rows) -> cumulative offsets behind a broadcast
   join — the only "global" step touches N rows, not N billion.

The chunk key is derived from the DATA, not from runtime partition
ids: the frame is referenced twice (local cums + chunk totals), and a
sampled ``repartitionByRange`` + ``spark_partition_id`` pair is not
guaranteed to assign identical pids in both subtrees once AQE
re-coalesces them independently (measured as mis-joined offsets at
sf0.1, round 9 — the grouped twin in operators/sharding.py hit it
first); a value-derived chunk is identical in every subtree by
construction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def running_total(
    df: DataFrame, order_col: str, weight: Column, n_partitions: int = 32
) -> DataFrame:
    """Add ``_cum`` = running sum of ``weight`` in ``order_col`` order
    (inclusive of the current row), via the two-phase distributed
    prefix sum described in the module docstring.

    ``order_col`` must be numeric and globally unique (ties would make
    the prefix sum order-dependent).
    """
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
    local = Window.partitionBy("_chunk").orderBy(order_col)
    d = d.withColumn("_local_cum", F.sum("_w").over(local))
    # N-row side: total per chunk (= the LAST row's inclusive running
    # sum — max_by on order, not max: plain max(_local_cum) is only the
    # total when every weight is non-negative, and this operator's
    # contract allows any numeric weight, e.g. signed deltas)
    # -> exclusive cumulative offset. Deriving totals from the WINDOWED
    # frame, not the pre-window frame, makes this subtree share the
    # identical Exchange(hash(_chunk)) with the main side, so
    # ReuseExchange evaluates the scan + weight expression once; a
    # groupBy on the pre-window frame plans a *different* exchange
    # (partial-agg child) and re-computes the weight over the whole
    # corpus. The single-partition window below runs over
    # n_partitions rows.
    totals = d.groupBy("_chunk").agg(
        F.max_by("_local_cum", F.col(order_col)).alias("_ptotal")
    )
    off_w = Window.orderBy("_chunk").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.withColumn(
        "_offset", F.coalesce(F.sum("_ptotal").over(off_w), F.lit(0))
    ).select("_chunk", "_offset")
    # LEFT join on purpose: every row's chunk exists in `offsets` by
    # construction, but an INNER join would infer isnotnull(_chunk) and
    # push it into the stream-side scan only — the two subtrees then
    # canonicalize differently and ReuseExchange stops deduping the
    # shared shuffle (measured: the weight expression re-evaluated
    # corpus-wide). Left join keeps both scans identical.
    return (
        d.join(F.broadcast(offsets), "_chunk", "left")
        .withColumn(
            "_cum",
            F.coalesce(F.col("_offset"), F.lit(0)) + F.col("_local_cum"),
        )
        .drop("_chunk", "_local_cum", "_offset")
    )


def pack_sequences(
    df: DataFrame,
    order_col: str,
    weight: Column,
    seq_len: int,
    n_partitions: int = 32,
) -> DataFrame:
    """Assign each row a ``pack_id``: the fixed-size token window its
    first token falls into when the corpus is concatenated in
    ``order_col`` order. Adds ``pack_id`` and keeps ``_w``/``_cum``
    (weight and inclusive running total) for downstream fill stats.
    """
    d = running_total(df, order_col, weight, n_partitions)
    return d.withColumn(
        "pack_id",
        F.floor((F.col("_cum") - F.col("_w")) / F.lit(float(seq_len))).cast(
            "long"
        ),
    )
