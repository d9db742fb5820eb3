"""Connected-components clustering (operators/clustering.py)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from hyperion_history_api_spark.operators.clustering import (
    cluster_keepers,
    connected_components,
)


def _cc(spark, edges, **kw):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    return {
        (r["id"], r["component"])
        for r in connected_components(df, **kw).collect()
    }


def _union_find(edges):
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    # canonical: every node -> min of its component
    comp: dict[int, int] = {}
    for x in parent:
        r = find(x)
        comp[x] = min(comp.get(r, r), r)
    return {(x, find(x)) for x in parent}


def test_chain_merges_to_one_component(spark):
    # a 12-node chain needs multiple star rounds
    edges = [(i, i + 1) for i in range(12)]
    assert _cc(spark, edges) == {(i, 0) for i in range(13)}


def test_small_and_distributed_paths_agree(spark):
    """The size-adaptive cutoff is invisible: forcing the star-
    contraction path (small_graph_edges=0) labels identically to the
    driver union-find fast path."""
    rng = random.Random(7)
    edges = [(rng.randrange(40), rng.randrange(40)) for _ in range(60)]
    edges = [(u, v) for u, v in edges if u != v]
    assert _cc(spark, edges, small_graph_edges=0) == _cc(spark, edges)


def test_disjoint_components_and_orientation(spark):
    edges = [(5, 3), (3, 9), (20, 21), (40, 40)]  # self-loop dropped
    got = _cc(spark, edges)
    assert got == {(3, 3), (5, 3), (9, 3), (20, 20), (21, 20)}


def test_random_graphs_match_union_find(spark):
    rng = random.Random(42)
    for _ in range(3):
        edges = [
            (rng.randrange(60), rng.randrange(60)) for _ in range(50)
        ]
        edges = [(u, v) for u, v in edges if u != v]
        assert _cc(spark, edges) == _union_find(edges)


def test_cc_accepts_unmaterialized_lazy_checkpoint_input(spark):
    """The curation pipeline hands CC a pair frame that is itself a
    NOT-yet-materialized lazy local checkpoint (rep_pairs in
    operators/dedup.py); since round 14 CC's own edges checkpoint is
    lazy too, so the size probe materializes both in one job. Labels
    must match union-find on both the driver and distributed paths."""
    edges = [(1, 2), (2, 3), (7, 8), (9, 9), (8, 3)]
    df = spark.createDataFrame(edges, "id_a long, id_b long").localCheckpoint(
        eager=False
    )
    want = _union_find([(u, v) for u, v in edges if u != v])
    got_small = {
        (r["id"], r["component"]) for r in connected_components(df).collect()
    }
    df2 = spark.createDataFrame(edges, "id_a long, id_b long").localCheckpoint(
        eager=False
    )
    got_dist = {
        (r["id"], r["component"])
        for r in connected_components(df2, small_graph_edges=0).collect()
    }
    assert got_small == want
    assert got_dist == want


def test_small_graph_probe_fuses_checkpoint_job(spark):
    """Round-14 pin, relativized in round 15 (r14 ADVICE low — an
    absolute job count depends on AQE's stage-to-job decomposition and
    flakes across Spark upgrades): the production call (lazy edges
    checkpoint, materialized inside the size probe's own count() job)
    must not run MORE jobs than the same probe with an explicitly
    eager checkpoint, which pays a separate materialization job round.
    Guards eagerness regressions without pinning Spark's job split
    (the absolute counts were 4 vs 5 on Spark 4.1)."""
    from pyspark.sql import functions as F

    sc = spark.sparkContext
    tracker = sc.statusTracker()
    df = spark.createDataFrame([(1, 2), (2, 3), (5, 6)], "id_a long, id_b long")
    connected_components(df).collect()  # warm

    def _jobs(group: str, fn) -> int:
        sc.setJobGroup(group, group)
        fn()
        sc.setJobGroup("", "")
        return len(tracker.getJobIdsForGroup(group))

    def _eager_probe() -> None:
        # the same edge-canonicalization probe connected_components
        # runs, but with the checkpoint eager: one materialization job
        # plus the count job
        edges = (
            df.select(
                F.col("id_a").cast("long").alias("u"),
                F.col("id_b").cast("long").alias("v"),
            )
            .where(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        edges.count()

    lazy_jobs = _jobs("cc-fuse-pin-lazy", lambda: connected_components(df))
    eager_jobs = _jobs("cc-fuse-pin-eager", _eager_probe)
    # connected_components additionally collects the union-find input
    # (one job), so its probe portion is lazy_jobs - 1; the fused lazy
    # checkpoint must run STRICTLY fewer probe jobs than the eager
    # variant (which pays a separate materialization round)
    assert lazy_jobs - 1 < eager_jobs


def test_max_iter_raises(spark):
    df = spark.createDataFrame([(i, i + 1) for i in range(40)], "id_a long, id_b long")
    with pytest.raises(RuntimeError, match="no fixpoint"):
        connected_components(df, max_iter=1, small_graph_edges=0)


def test_cluster_keepers_singletons_and_flags(spark):
    docs = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    pairs = spark.createDataFrame([(1, 2), (2, 5), (6, 7)], "id_a long, id_b long")
    out = {
        (r["doc_id"], r["cluster"], r["is_keeper"])
        for r in cluster_keepers(docs, pairs, "doc_id").collect()
    }
    assert out == {
        (0, 0, 1),
        (1, 1, 1),
        (2, 1, 0),
        (3, 3, 1),
        (4, 4, 1),
        (5, 1, 0),
        (6, 6, 1),
        (7, 6, 0),
    }


def test_dedup_clusters_consistent_with_pairs(spark, sf_dir):
    """Every LSH pair lands in one cluster; keeper = component min."""
    from hyperion_history_api_spark.api.dedup_sim import dedup_clusters
    from hyperion_history_api_spark.operators.dedup import minhash_lsh_pairs
    from hyperion_history_api_spark.registry import _t

    out = dedup_clusters(spark, sf_dir).collect()
    cluster = {r["doc_id"]: r["cluster"] for r in out}
    docs = _t(spark, sf_dir)["documents"]
    prs = minhash_lsh_pairs(docs, "text", "doc_id", threshold=0.7).collect()
    assert prs, "fixture should contain near-dup pairs"
    for r in prs:
        assert cluster[r["id_a"]] == cluster[r["id_b"]]
    keepers = {r["doc_id"] for r in out if r["is_keeper"]}
    assert keepers == {c for c in cluster.values()}
