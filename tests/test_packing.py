"""Unit tests for the distributed prefix-sum / sequence-packing
operator (operators/packing.py)."""

import pytest
from pyspark.sql import functions as F

from hyperion_history_api_spark.operators.packing import (
    pack_sequences,
    running_total,
)


@pytest.fixture(scope="module")
def weighted(spark):
    rows = [(i, (i * 37) % 19 + 1) for i in range(1, 301)]
    return spark.createDataFrame(rows, "id: long, w: long")


def test_running_total_matches_serial(spark, weighted):
    got = {
        r["id"]: r["_cum"]
        for r in running_total(weighted, "id", F.col("w"), 8).collect()
    }
    cum = 0
    for i in range(1, 301):
        cum += (i * 37) % 19 + 1
        assert got[i] == cum


def test_pack_assignment_invariant_to_partitioning(spark, weighted):
    one = pack_sequences(weighted, "id", F.col("w"), 64, n_partitions=1)
    many = pack_sequences(weighted, "id", F.col("w"), 64, n_partitions=13)
    a = {r["id"]: r["pack_id"] for r in one.collect()}
    b = {r["id"]: r["pack_id"] for r in many.collect()}
    assert a == b


def test_pack_ids_contiguous_and_monotone(spark, weighted):
    packed = pack_sequences(weighted, "id", F.col("w"), 64, n_partitions=8)
    rows = sorted(
        (r["id"], r["pack_id"]) for r in packed.collect()
    )
    pids = [p for _, p in rows]
    assert pids[0] == 0
    assert all(b - a in (0, 1) for a, b in zip(pids, pids[1:]))
    # every pack holds the doc whose first token starts inside it
    total = sum((i * 37) % 19 + 1 for i in range(1, 301))
    assert pids[-1] == (total - ((300 * 37) % 19 + 1)) // 64


def test_running_total_signed_weights(spark):
    """The chunk total is the LAST row's inclusive cum (max_by), not
    max(): with signed weights the max of a prefix sum overshoots the
    total and every later chunk's offsets inflate silently."""
    rows = [(i, ((i * 37) % 19) - 9) for i in range(1, 301)]
    df = spark.createDataFrame(rows, "id: long, w: long")
    got = {
        r["id"]: r["_cum"]
        for r in running_total(df, "id", F.col("w"), 8).collect()
    }
    cum = 0
    for i, w in rows:
        cum += w
        assert got[i] == cum
