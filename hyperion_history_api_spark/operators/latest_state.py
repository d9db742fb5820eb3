"""Latest-state window operators (SURVEY §2.5 W1-W5).

Hyperion materializes "current state" from the append-only delta log
with a composite-agg + top_hits(1, block_num desc) per key
(reference: get_table_state.ts:22-78) and shields forks by keeping only
max-block docs (get_transaction.ts:105-115). Spark-first equivalent:
``row_number() over (partition by key order by version desc) = 1``.

Scale note: the window shuffles once on the key columns. At 100 TB the
right physical shape is exactly this — hash-partition by key, sort
within partition, emit first row; no driver involvement. AQE handles
key skew (one hot contract table) by splitting oversized partitions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_RN = "__rn"


def latest_row_per_key(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    *,
    tiebreakers: list[str] | None = None,
    as_of: Column | None = None,
) -> DataFrame:
    """Keep the newest row per key, optionally as-of a version bound.

    W1 (get_table_state.ts:34-66): ``where version <= N`` then latest
    per (scope, primary_key). ``tiebreakers`` make the pick total when
    ``order_col`` can tie (the reference relies on ES sort stability).
    """
    if as_of is not None:
        df = df.where(as_of)
    order = [F.col(order_col).desc()] + [F.col(t).desc() for t in (tiebreakers or [])]
    w = Window.partitionBy(*keys).orderBy(*order)
    return df.withColumn(_RN, F.row_number().over(w)).where(F.col(_RN) == 1).drop(_RN)


def first_row_per_key(
    df: DataFrame, keys: list[str], order_col: str, *, tiebreakers: list[str] | None = None
) -> DataFrame:
    """First row per key (W3 — first-action-per-trx enrichment,
    ds-pool.ts:460-469)."""
    order = [F.col(order_col).asc()] + [F.col(t).asc() for t in (tiebreakers or [])]
    w = Window.partitionBy(*keys).orderBy(*order)
    return df.withColumn(_RN, F.row_number().over(w)).where(F.col(_RN) == 1).drop(_RN)
