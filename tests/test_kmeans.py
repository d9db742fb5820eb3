"""In-engine coarse-quantizer training (operators/similarity.kmeans_*):
deterministic fixed-iteration Lloyd — the properties the trained-cell
oracle queries rely on."""

from __future__ import annotations

from pyspark.sql import functions as F

from hyperion_history_api_spark.operators.similarity import (
    apply_cell_moves,
    cell_moves,
    kmeans_assign,
    kmeans_train,
    kmeans_warm_retrain,
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


# -- drift-triggered refresh (round-5 operators) -----------------------


def test_warm_retrain_with_first_k_init_equals_train(spark):
    """kmeans_train IS kmeans_warm_retrain seeded with the first-k
    init — retraining from the same seed must reproduce the cold
    train bit-for-bit (the docstring contract of both)."""
    c = _corpus(spark)
    seed_rows = c.where(F.col("vec_id") < 8).select("vec_id", "e").collect()
    seed = {int(r[0]): [float(x) for x in r[1]] for r in seed_rows}
    assert kmeans_warm_retrain(c, seed, iters=3) == kmeans_train(
        c, k=8, iters=3
    )


def test_apply_cell_moves_equals_fresh_assignment(spark):
    """MERGE semantics: applying the move-set between two real
    assignments to the stale table reproduces the fresh table
    row-for-row — the O(moves) maintenance path equals the rewrite."""
    c = _corpus(spark)
    stale_cb = kmeans_train(c, k=8, iters=1)
    fresh_cb = kmeans_train(c, k=8, iters=3)
    stale = kmeans_assign(c, stale_cb).select("vec_id", "cell")
    fresh = kmeans_assign(c, fresh_cb).select("vec_id", "cell")
    moves = cell_moves(stale, fresh)
    assert moves.count() > 0  # the fixture genuinely moves vectors
    merged = apply_cell_moves(stale, moves)
    assert merged.exceptAll(fresh).count() == 0
    assert fresh.exceptAll(merged).count() == 0


def test_empty_move_set_is_identity(spark):
    c = _corpus(spark)
    cells = kmeans_assign(c, kmeans_train(c, k=8, iters=2)).select(
        "vec_id", "cell"
    )
    merged = apply_cell_moves(cells, cell_moves(cells, cells))
    assert merged.exceptAll(cells).count() == 0
    assert cells.exceptAll(merged).count() == 0


def test_refresh_negative_undrifted_corpus_does_not_trigger(
    spark, monkeypatch, tmp_path
):
    """NEGATIVE drift case: when arrivals share the history's cell
    mix, _refresh_state must keep the stale codebook (triggered=False,
    refreshed IS stale). Exercised through _refresh_state itself with
    the drift split replaced by a uniform hash split — same corpus
    density on both sides, so per-cell drift stays under the gate."""
    from hyperion_history_api_spark.api import dedup_sim

    def uniform_split(sp, sf_dir):
        corpus, _ = dedup_sim._corpus_probes(sp, sf_dir)
        return corpus.withColumn(
            "is_batch", F.pmod(F.xxhash64("vec_id"), F.lit(4)) == 0
        )

    monkeypatch.setattr(dedup_sim, "_drift_corpus", uniform_split)
    monkeypatch.setattr(dedup_sim, "_KMR_CACHE", {})
    stale, refreshed, triggered = dedup_sim._refresh_state(spark, SF_DIR)
    assert triggered is False
    assert refreshed is stale  # frozen, not retrained


def test_refresh_triggers_on_sf_fixture(spark):
    """POSITIVE gate the oracle rows depend on (see _REFRESH_DRIFT
    note in api/dedup_sim.py): the sf fixture's anchor-cluster batch
    must fire the trigger, because the DuckDB twin always unrolls the
    warm retrain — a fixture change that stops triggering shows up
    here, not as a bare oracle hash mismatch."""
    from hyperion_history_api_spark.api import dedup_sim

    _stale, refreshed, triggered = dedup_sim._refresh_state(spark, SF_DIR)
    assert triggered is True
    assert refreshed is not _stale


# -- k-means|| init (realistic-k tier, round 6) ------------------------


def test_parallel_init_deterministic_and_partition_invariant(spark):
    from hyperion_history_api_spark.operators.similarity import (
        kmeans_parallel_init,
    )

    c = _corpus(spark)
    a = kmeans_parallel_init(c, 32)
    b = kmeans_parallel_init(c.repartition(13), 32)
    assert a == b  # salted-hash sampling, no RNG: bit-identical seeds
    assert len(a) == 32
    assert sorted(a) == list(range(32))  # renumbered 0..k-1


def test_parallel_init_caps_at_distinct_points(spark):
    from hyperion_history_api_spark.operators.similarity import (
        kmeans_parallel_init,
    )

    c = _corpus(spark).where(F.col("vec_id") < 10)
    seeds = kmeans_parallel_init(c, 64)
    assert 1 <= len(seeds) <= 10  # can't seed more cells than points


def test_parallel_init_spreads_better_than_first_k(spark):
    """The point of k-means||: seeds cover the space, so the trained
    codebook's inertia (sum of squared distances to the assigned
    centroid) is no worse than the naive first-k init at the same
    iteration budget — pinned on the deterministic fixture."""
    from hyperion_history_api_spark.operators.similarity import (
        kmeans_assign,
        kmeans_parallel_init,
        kmeans_warm_retrain,
        nearest_center_dist2,
    )

    c = _corpus(spark)
    k = 32

    def inertia(cb):
        cents = [v for _, v in sorted(cb.items())]
        assigned = kmeans_assign(c, cb)
        d = nearest_center_dist2(assigned, cents)
        return d.agg(F.sum("__d2")).first()[0]

    par = kmeans_warm_retrain(c, kmeans_parallel_init(c, k), iters=2)
    naive = kmeans_warm_retrain(c, kmeans_train(c, k=k, iters=0), iters=2)
    assert inertia(par) <= inertia(naive)
