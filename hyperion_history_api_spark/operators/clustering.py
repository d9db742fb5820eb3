"""Connected-components clustering over near-duplicate pairs — the
final stage of the dedup pipeline: pairs -> components -> one keeper
per component.

Pair emitters (``operators/dedup.py``) produce edges; transitive
closure groups them (A~B, B~C => one cluster {A,B,C}) so the curation
pipeline can keep exactly one representative per duplicate *set*, not
per pair.

Algorithm: alternating large-star / small-star (Kiveris, Lattanzi,
Mirrokni, Rastogi, Vassilvitskii — "Connected Components in MapReduce
and Beyond", ACM SoCC 2014). Each round is two keyed shuffles over the
EDGE list only; no component is ever materialized on a single task, so
a 100-TB-scale graph with a billion-node component still balances
(contrast label propagation, which needs O(diameter) rounds, or
groupBy-collect_set designs that die on the largest component).
Converges in O(log^2 n) rounds; duplicate-cluster graphs in practice
converge in 2-4.

Per-round lineage is truncated with ``localCheckpoint`` — without it
the iterative plan doubles per round and analysis time dominates. On a
multi-executor cluster prefer ``spark.sparkContext.setCheckpointDir``
+ ``checkpoint()`` (reliable storage) for fault tolerance; the
algorithm is oblivious to which.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _min_per_node(nbrs: DataFrame) -> DataFrame:
    """m(u) = min(N(u) ∪ {u}) — one partial-aggregated shuffle on u."""
    return (
        nbrs.groupBy("u")
        .agg(F.min("v").alias("__mv"))
        .select("u", F.least("__mv", "u").alias("m"))
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every neighbor larger than u to m(u)."""
    nbrs = edges.union(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    m = _min_per_node(nbrs)
    return (
        nbrs.join(m, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient edges (max -> min); connect every smaller-or-equal
    neighbor, and u itself, to m(u)."""
    e = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).where(F.col("u") != F.col("v"))
    m = _min_per_node(e)
    joined = e.join(m, "u")
    out = joined.select(F.col("v").alias("u"), F.col("m").alias("v")).union(
        joined.select("u", F.col("m").alias("v"))
    )
    return out.where(F.col("u") != F.col("v")).distinct()


def _canon(edges: DataFrame) -> DataFrame:
    return edges.select(
        F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
    ).distinct()


def _driver_union_find(edges: DataFrame) -> DataFrame:
    """Small-graph fast path: collect the (already-deduped) edge list
    and label components with a path-compressing union-find keeping the
    MINIMUM id as every root, so labels are identical to the
    distributed fixpoint. One collect + one createDataFrame — no
    iterative jobs."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.setdefault(r, r) != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    pdf = edges.select("u", "v").toPandas()  # Arrow batch, not row-by-row
    for u, v in zip(pdf["u"].tolist(), pdf["v"].tolist()):
        ru, rv = find(u), find(v)
        if ru != rv:
            # smaller root wins => root == component minimum
            if ru < rv:
                parent[rv] = ru
            else:
                parent[ru] = rv
    rows = [(x, find(x)) for x in parent]
    return edges.sparkSession.createDataFrame(
        rows or [], "id long, component long"
    )


# Graphs under this many edges are labeled driver-side (~16 bytes/edge
# => tens of MB at the cap). The threshold plays the same role as the
# broadcast-join threshold: duplicate-pair graphs are usually tiny
# relative to the corpus, and the iterative path costs a fixed ~6-8
# Spark jobs per round, which dominates end-to-end latency whenever the
# graph fits on the driver. Past the cap the star-contraction path
# takes over with no semantic change.
SMALL_GRAPH_EDGES = 2_000_000


def connected_components(
    pairs: DataFrame,
    left: str = "id_a",
    right: str = "id_b",
    *,
    max_iter: int = 25,
    small_graph_edges: int = SMALL_GRAPH_EDGES,
) -> DataFrame:
    """(node, component) for every node appearing in ``pairs``;
    component = the smallest node id reachable from it.

    Size-adaptive: the edge count (whose job also materializes the
    lazy checkpoint) picks either the driver union-find fast path (small graphs — the
    common case for duplicate clusters) or the large-star/small-star
    contraction (arbitrarily large graphs). Both label a component by
    its minimum id, so the choice is invisible to callers.

    Convergence detection (distributed path) is two-tier: a one-job
    (count, hash-sum) probe per round, and — only when the probe
    reports no change — an EXACT set-difference confirmation, so the
    final verdict never rests on a hash (the output feeds a
    correctness gate) while steady rounds cost one aggregation job
    instead of three. ``max_iter`` is a safety rail far above the
    O(log^2 n) bound; hitting it raises rather than returning a
    partially-contracted graph.
    """

    def _stat(canon: DataFrame) -> tuple:
        # bit_xor: order-insensitive and overflow-free under ANSI mode
        # (a summed hash would overflow long)
        row = canon.agg(
            F.count("*").alias("n"),
            F.expr("bit_xor(xxhash64(u, v))").alias("h"),
        ).first()
        return (row["n"], row["h"])

    # round-15 (r14 ADVICE medium): the contraction loop's lazy
    # checkpoints on `edges` are MARKED ancestors of the `cur` frames
    # the probe actions run on, and with Spark's default
    # spark.checkpoint.checkpointAllMarkedAncestors=false doCheckpoint
    # stops at the nearest marked RDD — `edges` lineage was never
    # truncated (the checkpoint degraded to a plain persist; an
    # evicted block would recompute through multi-round lineage).
    # The switch is a thread-local property read when each RDD is
    # created, so setting it here scopes the fix to this call while
    # keeping the r14 job fusion: each probe job still materializes
    # the marked ancestors inside itself — no extra job round.
    sc = pairs.sparkSession.sparkContext
    _PROP = "spark.checkpoint.checkpointAllMarkedAncestors"
    prev_prop = sc.getLocalProperty(_PROP)
    sc.setLocalProperty(_PROP, "true")
    try:
        edges = (
            pairs.select(
                F.col(left).cast("long").alias("u"),
                F.col(right).cast("long").alias("v"),
            )
            .where(F.col("u") != F.col("v"))
            .distinct()
            # lazy: the count() below materializes the checkpoint blocks in
            # the SAME job, so every call saves one serialized job round
            # (r14 A/B: 7 -> 6 jobs per small-graph call, deterministic)
            .localCheckpoint(eager=False)
        )
        if edges.count() <= small_graph_edges:
            # round-14: the union-find labels ALREADY cover every node of
            # every edge (find() registers both endpoints), so the old
            # nodes-join was a no-op that cost two exchanges (canon
            # distinct + explode distinct) and a join per call — dropped.
            return _driver_union_find(edges)

        nodes = _canon(edges).select(
            F.explode(F.array("u", "v")).alias("id")
        ).distinct()

        # Same fusion in the contraction loop: each round's stat probe
        # finalizes the lazily-marked edges + canon checkpoints as part
        # of its own job (3 job rounds/iteration -> 1; the marked-
        # ancestors property above is what makes the edges finalization
        # actually happen).
        prev = _canon(edges).localCheckpoint(eager=False)
        prev_stat = _stat(prev)
        for _ in range(max_iter):
            edges = _small_star(_large_star(edges)).localCheckpoint(eager=False)
            cur = _canon(edges).localCheckpoint(eager=False)
            cur_stat = _stat(cur)
            if cur_stat == prev_stat and cur.exceptAll(prev).limit(1).count() == 0:
                break
            prev, prev_stat = cur, cur_stat
        else:
            raise RuntimeError(
                f"connected_components: no fixpoint in {max_iter} rounds"
            )
    finally:
        sc.setLocalProperty(_PROP, prev_prop)

    # At the fixpoint the graph is a star forest: every edge links a
    # node to its component minimum. Canonical orientation is
    # (min, max) = (component, node), so group by the GREATER endpoint.
    labels = (
        _canon(edges)
        .groupBy(F.col("v").alias("id"))
        .agg(F.min("u").alias("component"))
    )
    return (
        nodes.join(labels, "id", "left")
        .select("id", F.coalesce("component", "id").alias("component"))
    )


def cluster_keepers(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str,
    *,
    left: str = "id_a",
    right: str = "id_b",
) -> DataFrame:
    """Assign every document a duplicate-cluster id and a keeper flag.

    Docs not in any pair are their own singleton cluster. Keeper = the
    component minimum (deterministic; swap in any scoring policy by
    re-aggregating over ``cluster``). One broadcast-size join when the
    pair graph is sparse (dup clusters are tiny relative to the
    corpus), else a keyed shuffle on the id — either way the full
    corpus is touched exactly once.
    """
    labels = connected_components(pairs, left, right).withColumnRenamed(
        "id", "__cc_id"
    )
    return (
        docs.join(labels, docs[id_col] == F.col("__cc_id"), "left")
        .select(
            docs["*"],
            F.coalesce("component", docs[id_col]).alias("cluster"),
        )
        .withColumn(
            "is_keeper", (F.col("cluster") == F.col(id_col)).cast("int")
        )
    )
