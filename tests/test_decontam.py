"""Decontamination operator (operators/decontam.py)."""

from __future__ import annotations

from hyperion_history_api_spark.operators.decontam import (
    clean_corpus,
    decontaminate,
)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_overlap_counts(spark):
    ev = _mk(spark, [(100, "the quick brown fox jumps"), (101, "pack my box with jugs")])
    tr = _mk(
        spark,
        [
            (1, "the quick brown fox jumps over"),  # shares 3 trigrams w/ 100
            (2, "pack my box now"),  # shares 1 trigram w/ 101
            (3, "completely unrelated text here"),  # clean
            (4, "the quick brown fox pack my box and"),  # hits both
        ],
    )
    out = {
        r["doc_id"]: (r["hit_ngrams"], r["hit_eval_docs"])
        for r in decontaminate(tr, ev, "text", "doc_id").collect()
    }
    assert out == {1: (3, 1), 2: (1, 1), 4: (3, 2)}


def test_hashed_matches_string_join(spark):
    ev = _mk(spark, [(100, "a b c d e"), (101, "x y z w v")])
    tr = _mk(spark, [(1, "a b c d q"), (2, "q w e r t"), (3, "x y z w v")])
    s = set(decontaminate(tr, ev, "text", "doc_id", hashed=False).collect())
    h = set(decontaminate(tr, ev, "text", "doc_id", hashed=True).collect())
    assert s == h


def test_collapse_matches_direct(spark):
    """collapse=True (rep-only gram pass + member expansion) returns
    the identical per-doc hit counts — including for exact copies,
    which inherit their representative's verdict."""
    ev = _mk(spark, [(100, "the quick brown fox jumps")])
    tr = _mk(
        spark,
        [
            (1, "the quick brown fox jumps over"),
            (2, "the quick brown fox jumps over"),  # exact copy of 1
            (3, "completely unrelated text here"),
            (4, "the  quick   brown fox jumps over"),  # same token seq
        ],
    )
    direct = set(decontaminate(tr, ev, "text", "doc_id").collect())
    collapsed = set(
        decontaminate(tr, ev, "text", "doc_id", collapse=True).collect()
    )
    assert direct == collapsed
    assert {r[0] for r in direct} == {1, 2, 4}


def test_clean_corpus_drops_contaminated(spark):
    ev = _mk(spark, [(100, "the quick brown fox jumps")])
    tr = _mk(
        spark,
        [(1, "the quick brown fox sleeps"), (2, "unrelated clean document text")],
    )
    kept = [r["doc_id"] for r in clean_corpus(tr, ev, "text", "doc_id").collect()]
    assert kept == [2]


def test_plan_broadcasts_eval_side(spark):
    ev = _mk(spark, [(100, "a b c d e")])
    tr = _mk(spark, [(1, "a b c x y")])
    plan = decontaminate(tr, ev, "text", "doc_id")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
