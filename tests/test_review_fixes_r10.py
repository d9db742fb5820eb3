"""Regression tests for the round-10 operator-review findings:
zero-norm cosine, probe-side Jaccard symmetry, SimHash recall bound,
sparse-id k-means init, zero-mass temperature mixing, PQ dim
validation."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from hyperion_history_api_spark.operators.dedup import (
    ngram_jaccard_pairs,
    simhash_pairs,
)
from hyperion_history_api_spark.operators.sampling import temperature_mix
from hyperion_history_api_spark.operators.similarity import (
    brute_force_topk,
    cosine,
    kmeans_train,
    pq_train,
)


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, e array<double>")


def test_zero_vector_never_ranks_in_topk(spark):
    """A zero embedding used to score NaN cosine, and Spark sorts NaN
    above every real double — so the zero vector outranked every true
    neighbor in every top-k. It must now sort LAST (-inf)."""
    corpus = _emb(
        spark,
        [
            (0, [1.0, 0.0]),
            (1, [0.9, 0.1]),
            (2, [0.0, 0.0]),  # the zero vector
            (3, [-1.0, 0.0]),
        ],
    )
    probes = spark.createDataFrame(
        [(0, [1.0, 0.0])], "probe_id long, pe array<double>"
    )
    got = brute_force_topk(corpus, probes, 2).collect()
    ids = [r["vec_id"] for r in sorted(got, key=lambda r: -r["cosine"])]
    assert 2 not in ids and ids[0] == 1
    assert all(not math.isnan(r["cosine"]) for r in got)
    # the column-expression path (ivf/lsh/pq tiers) uses cosine():
    scored = corpus.select(
        "vec_id", cosine(F.col("e"), F.array(F.lit(1.0), F.lit(0.0))).alias("c")
    ).collect()
    byid = {r["vec_id"]: r["c"] for r in scored}
    assert byid[2] == float("-inf") and not math.isnan(byid[2])


def test_jaccard_probe_pairs_symmetric(spark):
    """probe_pred anchored probes to the a-side of an id_a < id_b
    join, silently dropping every pair whose probe id is LARGER —
    only down-set predicates (id < 40) dodged it."""
    rows = [
        (10, "alpha beta gamma delta epsilon"),
        (50, "alpha beta gamma delta epsilon"),  # probe, larger id
        (60, "unrelated words entirely different here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(
            docs,
            "text",
            "doc_id",
            threshold=0.5,
            probe_pred=F.col("doc_id") >= 40,
        ).collect()
    }
    assert (10, 50) in pairs  # probe has the larger id
    # probe-probe pairs emitted once, not twice
    counted = (
        ngram_jaccard_pairs(
            docs,
            "text",
            "doc_id",
            threshold=0.0,
            probe_pred=F.col("doc_id") >= 40,
        )
        .groupBy("id_a", "id_b")
        .count()
        .where(F.col("count") > 1)
        .count()
    )
    assert counted == 0


def test_simhash_rejects_unguaranteed_hamming(spark):
    """4x16-bit pigeonhole banding guarantees recall only for k <= 3;
    k=6 used to be the silent default while pairs at distance 4-6
    spread over all chunks vanished from the output."""
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a b d")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="max_hamming <= 3"):
        simhash_pairs(docs, "text", "doc_id", max_hamming=6)


def test_kmeans_sparse_ids_still_trains_k_cells(spark):
    """ids sparse in [0, k): the pushed-range init finds < k seeds and
    used to proceed with an under-sized codebook (2 giant cells
    instead of k) — it must fall back to the first k by id."""
    rows = [(0, [0.0, 0.0]), (1, [10.0, 0.0])] + [
        (1000 + i, [50.0 * (i + 1), 30.0 * (i % 7)]) for i in range(20)
    ]
    emb = _emb(spark, rows)
    cents = kmeans_train(emb, k=6, iters=1)
    # all six seed vectors are distinct corpus points, so every cell
    # keeps at least its own seed: the old min(k, 2) guard yielded 2
    assert len(cents) == 6


def test_temperature_mix_zero_mass_group_excluded(spark):
    """A source whose every doc weighs 0 made the keep-rate NaN, and
    least(1.0, NaN) = 1.0 kept the degenerate group in FULL; its
    m^(1/T) share is 0, so it must contribute nothing."""
    rows = [("good", i, 100) for i in range(40)] + [
        ("empty", 100 + i, 0) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "source string, doc_id long, n long")
    kept = temperature_mix(
        df,
        group_col="source",
        id_col="doc_id",
        weight_col="n",
        temperature=2.0,
        fraction=0.5,
    ).collect()
    assert kept, "non-degenerate source should sample"
    assert all(r["source"] == "good" for r in kept)


def test_pq_rejects_indivisible_dim(spark):
    """dim % m != 0 used to silently drop trailing dims at encode and
    crash the ADC UDF at query time — it must fail at train time."""
    emb = _emb(spark, [(i, [float(j) for j in range(20)]) for i in range(80)])
    with pytest.raises(ValueError, match="dim % m"):
        pq_train(emb, m=16, k=4, iters=1, sample=64)
