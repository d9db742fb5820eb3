"""Plan audits for the stored ANN artifacts (round-2 verdict items
1/2): the PQ candidate scan is codes-only, the IVF query plan contains
no centroid-training aggregation."""

from __future__ import annotations

import os
import re

from hyperion_history_api_spark.api.dedup_sim import (
    _corpus_probes,
    _ivf_cents,
    _pq_codebook,
    _pq_coded,
)
from hyperion_history_api_spark.operators.similarity import (
    ivf_nprobe_topk,
    ivfpq_topk,
    pq_topk,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.001")


def _scans(df) -> list[str]:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return re.findall(r"FileScan parquet \[([^\]]*)\]", plan)


def test_pq_candidate_scan_is_codes_only(spark):
    corpus, probes = _corpus_probes(spark, SF_DIR)
    df = pq_topk(
        corpus,
        probes,
        5,
        codebook=_pq_codebook(spark, SF_DIR),
        rerank=50,
        coded=_pq_coded(spark, SF_DIR),
    )
    scans = _scans(df)
    codes_scans = [s for s in scans if "codes" in s]
    assert codes_scans, scans
    # the codes scan must NOT carry the full-precision embedding column
    for s in codes_scans:
        assert "embedding" not in s and re.search(r"\be#", s) is None, s


def test_ivfpq_candidate_scan_is_codes_only(spark):
    corpus, probes = _corpus_probes(spark, SF_DIR, with_label=True)
    df = ivfpq_topk(
        corpus,
        probes,
        5,
        codebook=_pq_codebook(spark, SF_DIR),
        rerank=50,
        cell_col="label",
        coded=_pq_coded(spark, SF_DIR, with_label=True),
    )
    for s in [s for s in _scans(df) if "codes" in s]:
        assert "embedding" not in s, s


def test_ivf_query_plan_has_no_training_agg(spark):
    """With stored centroids the query plan reads the codebook parquet;
    there is no posexplode/aggregate training stage in the query path."""
    corpus, probes = _corpus_probes(spark, SF_DIR, with_label=True)
    df = ivf_nprobe_topk(
        corpus,
        probes.drop("label"),
        5,
        nprobe=2,
        cell_col="label",
        centroids=_ivf_cents(spark, SF_DIR),
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "posexplode" not in plan.lower()
    assert any("centroid" in s for s in _scans(df))


def test_stored_codes_match_inline_encoding(spark):
    from hyperion_history_api_spark.operators.similarity import pq_encode

    corpus, _ = _corpus_probes(spark, SF_DIR)
    inline = pq_encode(corpus, _pq_codebook(spark, SF_DIR)).select(
        "vec_id", "codes"
    )
    stored = _pq_coded(spark, SF_DIR).select("vec_id", "codes")
    assert stored.count() == inline.count()
    assert stored.exceptAll(inline).count() == 0


def test_extend_pq_codes_union_equals_full_rebuild(spark):
    """Incremental index growth is lossless: stored-history codes +
    a batch encoded with the frozen codebook == encoding the whole
    corpus in one go (so probes against the extended index are
    probes against the rebuild)."""
    from pyspark.sql import functions as F

    from hyperion_history_api_spark.api.dedup_sim import _pq_codes_hist
    from hyperion_history_api_spark.operators.similarity import (
        extend_pq_codes,
        pq_encode,
    )

    corpus, _ = _corpus_probes(spark, SF_DIR)
    cb = _pq_codebook(spark, SF_DIR)
    extended = extend_pq_codes(
        _pq_codes_hist(spark, SF_DIR),
        corpus.where(F.col("vec_id") % 10 == 0),
        cb,
    )
    rebuild = pq_encode(corpus, cb).select("vec_id", "codes")
    assert extended.count() == rebuild.count()
    assert extended.exceptAll(rebuild).count() == 0


def test_cell_drift_fractions_sum_to_one(spark):
    from hyperion_history_api_spark.api.dedup_sim import _km_cells
    from hyperion_history_api_spark.operators.similarity import (
        cell_population_drift,
    )
    from pyspark.sql import functions as F

    cells = _km_cells(spark, SF_DIR)
    d = cell_population_drift(
        cells.where(F.col("vec_id") % 10 != 0),
        cells.where(F.col("vec_id") % 10 == 0),
    )
    sums = d.agg(
        F.round(F.sum("frac_stored"), 2).alias("s"),
        F.round(F.sum("frac_batch"), 2).alias("b"),
    ).collect()[0]
    assert abs(sums["s"] - 1.0) < 0.02 and abs(sums["b"] - 1.0) < 0.02
    assert d.where(F.col("drift") < 0).count() == 0


def test_k256_serving_plan_scans_stored_artifacts_only(spark):
    """Realistic-k tier plan audit (round-6 verdict item 3): the
    serving plan reads the stored kbig cells + codebook parquet and
    contains neither a training aggregation nor any Python stage —
    the k-means|| init and the Lloyd rounds happened offline."""
    from hyperion_history_api_spark.registry import all_specs

    df = all_specs()["embedding_ivf_k256_topk"].spark_fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    scans = _scans(df)
    assert any("cell" in s for s in scans), scans       # kbig_cells
    assert any("centroid" in s for s in scans), scans   # kbig_centroids
    assert "posexplode" not in plan.lower()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
