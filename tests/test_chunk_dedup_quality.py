"""Behavioral tests for chunk-level dedup (removal + reassembly) and
the linear quality classifier — the invariants the oracle hash-gate
doesn't express directly."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from hyperion_history_api_spark.functions.quality_model import (
    QC_BIAS,
    QC_W_LEN,
    QC_WEIGHTS,
    quality_classify,
)
from hyperion_history_api_spark.operators.dedup import chunk_dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


class TestChunkDedup:
    def test_first_occurrence_survives_later_removed(self, spark):
        # doc 0 and doc 1 share an identical 4-token chunk; doc 0 is
        # the corpus-global first so keeps it, doc 1 loses it.
        shared = "a b c d"
        docs = _docs(
            spark,
            [(0, shared + " x y z w"), (1, shared + " p q r s")],
        )
        out = {
            r["doc_id"]: r
            for r in chunk_dedup(docs, chunk=4).collect()
        }
        assert out[0]["clean_text"] == shared + " x y z w"
        assert out[0]["kept_chunks"] == 2
        assert out[1]["clean_text"] == "p q r s"
        assert out[1]["kept_chunks"] == 1
        assert out[1]["n_chunks"] == 2

    def test_fully_duplicated_doc_collapses_to_empty(self, spark):
        docs = _docs(spark, [(0, "a b c d"), (1, "a b c d")])
        out = {r["doc_id"]: r for r in chunk_dedup(docs, chunk=4).collect()}
        assert out[1]["clean_text"] == ""
        assert out[1]["kept_chunks"] == 0

    def test_intra_doc_repetition_removed(self, spark):
        # the same chunk repeated WITHIN one doc is kept once.
        docs = _docs(spark, [(0, "a b a b")])
        out = chunk_dedup(docs, chunk=2).collect()[0]
        assert out["clean_text"] == "a b"
        assert out["n_chunks"] == 2 and out["kept_chunks"] == 1

    def test_chunk_order_preserved(self, spark):
        docs = _docs(spark, [(0, "p q r s t u v w")])
        out = chunk_dedup(docs, chunk=2).collect()[0]
        assert out["clean_text"] == "p q r s t u v w"

    def test_partition_invariance(self, spark):
        rows = [(i, f"tok{i % 3} fill{i} a b c d e f") for i in range(40)]
        docs = _docs(spark, rows)
        a = chunk_dedup(docs.repartition(1), chunk=4).orderBy("doc_id").collect()
        b = chunk_dedup(docs.repartition(13), chunk=4).orderBy("doc_id").collect()
        assert a == b


class TestQualityClassifier:
    def test_score_matches_reference_formula(self, spark):
        text = "spark fast slow the unknowntoken"
        docs = _docs(spark, [(0, text)])
        out = quality_classify(spark, docs).collect()[0]
        w = dict(QC_WEIGHTS)
        toks = text.split()
        s = sum(w.get(t, 0.0) for t in toks)
        z = QC_BIAS + s / len(toks) + QC_W_LEN * math.log(1.0 + len(toks))
        expect = round(1.0 / (1.0 + math.exp(-z)), 4)
        assert out["n_tokens"] == len(toks)
        assert abs(out["score"] - expect) < 1e-9
        assert out["label"] == int(expect >= 0.5)

    def test_oov_tokens_contribute_zero(self, spark):
        # a doc of only-OOV tokens scores exactly sigmoid(bias + w_len
        # feature): the join drops every token.
        docs = _docs(spark, [(0, "zz yy xx")])
        out = quality_classify(spark, docs).collect()[0]
        z = QC_BIAS + QC_W_LEN * math.log(4.0)
        assert abs(out["score"] - round(1.0 / (1.0 + math.exp(-z)), 4)) < 1e-9

    def test_weight_table_is_broadcast(self, spark):
        docs = _docs(spark, [(0, "spark fast")])
        plan = quality_classify(spark, docs)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
