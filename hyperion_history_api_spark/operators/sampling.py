"""Deterministic hash sampling / dataset splitting — training-data
pipeline operators (beyond-reference, per the build brief).

A training pipeline needs REPRODUCIBLE sampling: the same document
must land in the same split on every run, on any cluster, regardless
of partitioning — so `rand()` and `df.sample` (partition-dependent)
are out. These operators key every decision on a salted md5 of the
row's stable id:

    bucket(id) = substr(md5(seed || id), 1, 4)    -- 16 bits, hex

and compare the HEX STRING against hex cutoffs — string comparison of
fixed-width lowercase hex is monotone in the integer value, and both
Spark and DuckDB produce identical md5 hex, so the assignment is
bit-reproducible across engines (which is exactly what the oracle
checks).

Scale: a single narrow projection per row (one md5 over the id, not
the payload); no shuffle, no state, trivially parallel at 100 TB.
Skew-free by construction (md5 uniformity).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = 1 << 16  # 4 hex digits


def _cutoff_hex(fraction: float) -> str:
    """Hex cutoff c such that P(bucket < c) ~ fraction (16-bit grid)."""
    return format(min(int(round(fraction * _BUCKETS)), _BUCKETS), "04x")


def hash_bucket(id_col: Column, seed: str) -> Column:
    return F.substring(F.md5(F.concat(F.lit(seed), id_col.cast("string"))), 1, 4)


def hash_sample(
    df: DataFrame, id_col: str, fraction: float, *, seed: str = "sample"
) -> DataFrame:
    """Deterministic Bernoulli sample: keep rows whose bucket falls
    under the fraction cutoff."""
    return df.where(hash_bucket(F.col(id_col), seed) < _cutoff_hex(fraction))


def hash_split(
    df: DataFrame,
    id_col: str,
    *,
    train: float = 0.8,
    val: float = 0.1,
    seed: str = "split",
    col_name: str = "split",
) -> DataFrame:
    """train/val/test assignment (test = remainder) as a derived
    column; same id -> same split everywhere, forever."""
    b = hash_bucket(F.col(id_col), seed)
    return df.withColumn(
        col_name,
        F.when(b < _cutoff_hex(train), "train")
        .when(b < _cutoff_hex(train + val), "val")
        .otherwise("test"),
    )


def split_case_sql(id_expr: str, *, train: float = 0.8, val: float = 0.1,
                   seed: str = "split") -> str:
    """The DuckDB-compatible SQL twin of :func:`hash_split` (shared by
    the oracle queries)."""
    t, v = _cutoff_hex(train), _cutoff_hex(train + val)
    b = f"substr(md5('{seed}' || CAST({id_expr} AS STRING)), 1, 4)"
    return (
        f"CASE WHEN {b} < '{t}' THEN 'train' "
        f"WHEN {b} < '{v}' THEN 'val' ELSE 'test' END"
    )


def sample_pred_sql(id_expr: str, fraction: float, *, seed: str = "sample") -> str:
    b = f"substr(md5('{seed}' || CAST({id_expr} AS STRING)), 1, 4)"
    return f"{b} < '{_cutoff_hex(fraction)}'"
