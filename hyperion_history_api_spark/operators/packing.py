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

1. range-partition by the order column (N even ranges, sampled
   boundaries — same machinery as a global sort);
2. per-partition running sum (window partitioned by partition id —
   parallel, no cross-partition traffic);
3. per-partition totals (N rows) -> cumulative offsets on the driver
   side of a broadcast join — the only "global" step touches N rows,
   not N billion.

The result is invariant to the sampled partition boundaries, so the
output is deterministic even though the partitioning is not.
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

    ``order_col`` must be globally unique (ties would make the prefix
    sum order-dependent).
    """
    d = (
        df.withColumn("_w", weight)
        .repartitionByRange(n_partitions, F.col(order_col))
        .withColumn("_pid", F.spark_partition_id())
    )
    local = Window.partitionBy("_pid").orderBy(order_col)
    d = d.withColumn("_local_cum", F.sum("_w").over(local))
    # N-row side: total per partition -> exclusive cumulative offset.
    # The single-partition window here runs over n_partitions rows.
    totals = d.groupBy("_pid").agg(F.sum("_w").alias("_ptotal"))
    off_w = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.withColumn(
        "_offset", F.coalesce(F.sum("_ptotal").over(off_w), F.lit(0))
    ).select("_pid", "_offset")
    return (
        d.join(F.broadcast(offsets), "_pid")
        .withColumn("_cum", F.col("_offset") + F.col("_local_cum"))
        .drop("_pid", "_local_cum", "_offset")
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
