"""Similarity search over an embedding column (array<float>).

Three tiers, same scoring leg:
- brute-force cosine top-k   — exact baseline; probes broadcast, one
  scan of the corpus, per-partition top-k then merge (TakeOrdered).
- IVF top-k                  — corpus pre-partitioned into cells by a
  coarse quantizer (any int cell id column); probes search only their
  cell: the scan and shuffle shrink by ~#cells. Exact within cell.
- LSH top-k                  — random-hyperplane signatures bucket the
  corpus; probes score only same-bucket candidates. Approximate;
  recall tuned by #planes / #bands.

Dot products run in zip_with/aggregate (JVM codegen) over
array<double>; no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def _topk(scored: DataFrame, k: int) -> DataFrame:
    from pyspark.sql import Window

    w = Window.partitionBy("probe_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def brute_force_topk(
    corpus: DataFrame, probes: DataFrame, k: int, *, id_col: str = "vec_id"
) -> DataFrame:
    """corpus(vec_id, e: array<double>), probes(probe_id, pe). Probes
    broadcast; corpus scanned once."""
    scored = (
        F.broadcast(probes)
        .crossJoin(corpus)
        .where(F.col(id_col) != F.col("probe_id"))
        .select(
            "probe_id",
            F.col(id_col).alias("vec_id"),
            F.round(cosine(F.col("pe"), F.col("e")), 4).alias("cosine"),
        )
    )
    return _topk(scored, k)


def ivf_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int,
    *,
    cell_col: str = "cell",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF: probes carry their cell assignment; equi-join on the cell
    id replaces the cross join, so each probe scores only its cell
    (nprobe=1). At 100 TB the corpus is written partitioned by cell ->
    partition pruning makes this a fraction-of-corpus scan."""
    scored = (
        corpus.join(F.broadcast(probes), on=cell_col)
        .where(F.col(id_col) != F.col("probe_id"))
        .select(
            "probe_id",
            F.col(id_col).alias("vec_id"),
            F.round(cosine(F.col("pe"), F.col("e")), 4).alias("cosine"),
        )
    )
    return _topk(scored, k)


def _plane_weights(dims: int, planes: int) -> list[list[float]]:
    """Deterministic +/-1 hyperplane weights from md5(plane|dim) —
    driver-side constants, so the projection compiles to a flat
    multiply-add chain (constant-folded, codegen'd)."""
    import hashlib

    return [
        [
            1.0 if hashlib.md5(f"pl{p}|{d}".encode()).digest()[0] % 2 == 0 else -1.0
            for d in range(dims)
        ]
        for p in range(planes)
    ]


def hyperplane_signature(vec_col: str, dims: int, planes: int) -> Column:
    """Random-hyperplane LSH signature (int bitmask) for an
    array<double> column: the sign of each plane projection sets one
    bit. Emitted as ONE SQL expression string — building planes*dims
    multiply-add Column objects costs ~2 s of py4j round-trips per
    call; one expr() parse is milliseconds. The +/-1 weights make each
    projection a signed sum, evaluated in a single zip_with/aggregate
    pass per plane."""
    weights = _plane_weights(dims, planes)
    projs = [
        (
            f"aggregate(zip_with({vec_col}, "
            f"array({', '.join(f'{w:.1f}D' for w in weights[p])}), "
            "(x, w) -> x * w), cast(0.0 as double), (a, x) -> a + x)"
        )
        for p in range(planes)
    ]
    bits = [
        f"if({projs[p]} > 0, cast({1 << p} as bigint), cast(0 as bigint))"
        for p in range(planes)
    ]
    return F.expr(" + ".join(["cast(0 as bigint)"] + bits))


def lsh_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int,
    *,
    dims: int,
    planes: int = 12,
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: candidates = same-signature bucket (probe
    signature computed with the same planes). Recall rises with more
    bands (re-run with different plane seeds and union) — single-band
    here; the oracle-checked exact variants bound correctness."""
    c = corpus.withColumn("__sig", hyperplane_signature("e", dims, planes))
    p = probes.withColumn("__sig", hyperplane_signature("pe", dims, planes))
    scored = (
        c.join(F.broadcast(p), on="__sig")
        .where(F.col(id_col) != F.col("probe_id"))
        .select(
            "probe_id",
            F.col(id_col).alias("vec_id"),
            F.round(cosine(F.col("pe"), F.col("e")), 4).alias("cosine"),
        )
    )
    return _topk(scored, k)
