"""As-of (validity-interval) join — SURVEY §2.3 J1 / §2.5 W2.

Hyperion resolves "which ABI version decodes this action" by fetching
the latest ABI with ``block <= N`` and the next one to get a
``valid_until`` (reference: deserializer.ts:701-758). That is a classic
as-of join. Two Spark-first strategies:

1. ``asof_join_interval`` — derive ``valid_until = lead(version)`` on
   the (small) right side, broadcast it, range-join on
   ``version <= v < valid_until``. Right side (ABI versions, dim
   snapshots) is tiny even at 100 TB of facts, so the broadcast avoids
   shuffling the fact table at all — the correct plan at scale.
2. ``asof_join`` (union trick) — when the right side is NOT small:
   union tagged rows, one window over (key, version), carry the last
   right-row forward with ``last(..., ignorenulls)``. One shuffle on
   the key, no cross product, no skew blowup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def asof_join_interval(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_version: str,
    right_version: str,
    *,
    how: str = "left",
) -> DataFrame:
    """Broadcast interval strategy: right side gets
    ``[version, lead(version))`` validity windows (W2,
    deserializer.ts:721-750 computes valid_until exactly this way)."""
    w = Window.partitionBy(*on).orderBy(F.col(right_version).asc())
    bounded = right.withColumn(
        "__valid_until", F.lead(right_version).over(w)
    )
    cond = [left[k] == bounded[k] for k in on]
    cond.append(left[left_version] >= bounded[right_version])
    join_pred = cond[0]
    for c in cond[1:]:
        join_pred = join_pred & c
    join_pred = join_pred & (
        bounded["__valid_until"].isNull() | (left[left_version] < bounded["__valid_until"])
    )
    out = left.join(broadcast(bounded), join_pred, how)
    return out.drop("__valid_until", *[bounded[k] for k in on])


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_version: str,
    right_version: str,
    right_payload: list[str],
) -> DataFrame:
    """Union-trick strategy for a big right side: single shuffle on
    ``on``, no broadcast requirement.

    Tags rows, sorts (key, version, is_left) and carries the most
    recent right payload onto each left row via
    ``last(payload, ignorenulls=True)``. Right rows at the same
    version sort before left rows (a version takes effect at its own
    coordinate, matching "latest ABI with block <= N").
    """
    lcols = left.columns
    tagged_l = left.select(
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[p].dataType).alias(f"__r_{p}") for p in right_payload],
        F.lit(1).alias("__is_left"),
        F.col(left_version).alias("__v"),
    )
    tagged_r = right.select(
        *[
            F.col(k) if k in right.columns else F.lit(None).alias(k)
            for k in lcols
        ],
        *[F.col(p).alias(f"__r_{p}") for p in right_payload],
        F.lit(0).alias("__is_left"),
        F.col(right_version).alias("__v"),
    )
    unioned = tagged_l.unionByName(tagged_r)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__v").asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *[F.col(c) for c in lcols],
        F.col("__is_left"),
        *[
            F.last(f"__r_{p}", ignorenulls=True).over(w).alias(f"__r_{p}")
            for p in right_payload
        ],
    )
    out = filled.where(F.col("__is_left") == 1).drop("__is_left")
    for p in right_payload:
        out = out.withColumnRenamed(f"__r_{p}", p)
    return out
