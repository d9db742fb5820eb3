"""In-engine coarse-quantizer training (operators/similarity.kmeans_*):
deterministic fixed-iteration Lloyd — the properties the trained-cell
oracle queries rely on."""

from __future__ import annotations

from pyspark.sql import functions as F

from hyperion_history_api_spark.operators.similarity import (
    kmeans_assign,
    kmeans_train,
)
from hyperion_history_api_spark.tables import load_tables

SF_DIR = "/root/testdata/sf0.001"


def _corpus(spark):
    return load_tables(spark, SF_DIR)["embeddings"].select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )


def test_kmeans_deterministic_and_partition_invariant(spark):
    c = _corpus(spark)
    a = kmeans_train(c, k=8, iters=3)
    b = kmeans_train(c.repartition(17), k=8, iters=3)
    assert a == b  # bit-identical codebook (6-dp rounded means)
    assert set(a) <= set(range(8))  # cells are init ids 0..k-1
    assert all(len(v) == 64 for v in a.values())


def test_kmeans_iteration_count_changes_codebook(spark):
    c = _corpus(spark)
    a = kmeans_train(c, k=8, iters=1)
    b = kmeans_train(c, k=8, iters=3)
    assert a != b  # fixed iteration count is part of the contract


def test_kmeans_assign_total_and_tie_to_lowest_cell(spark):
    c = _corpus(spark)
    cents = kmeans_train(c, k=8, iters=2)
    assigned = kmeans_assign(c, cents)
    assert assigned.count() == c.count()
    assert assigned.where(F.col("cell").isNull()).count() == 0
    # identical centroids => every row ties => all land in the lowest id
    dup = {3: cents[min(cents)], 5: cents[min(cents)]}
    forced = kmeans_assign(c, dup)
    assert forced.select("cell").distinct().collect()[0][0] == 3


def test_kmeans_empty_cells_drop_out(spark):
    # a corpus of identical vectors collapses to the single cell 0
    c = _corpus(spark).withColumn(
        "e", F.array(*[F.lit(1.0)] * 64)
    )
    cents = kmeans_train(c, k=4, iters=2)
    assert list(cents) == [0]
