"""BPE tokenizer (functions/bpe.py): training determinism, the classic
textbook merge behavior, and exact agreement between the distributed
Arrow-batched encode and the pure-Python reference encoder.
"""

from __future__ import annotations

from hyperion_history_api_spark.functions.bpe import (
    bpe_token_stats,
    encode_text,
    train_bpe,
)
from hyperion_history_api_spark.tables import load_tables

SF_DIR = "/root/testdata/sf0.001"

TOY = [
    "low low low low low",
    "lower lower",
    "newest newest newest newest newest newest",
    "widest widest widest",
]


def test_training_learns_frequent_pairs_first():
    merges = train_bpe(TOY, 10)
    # "newest" dominates: its pairs reach the top quickly; merges build
    # contiguous units (each merge's parts concatenate)
    assert len(merges) == 10
    joined = [a + b for a, b in merges]
    assert "est</w>" in joined  # the est</w> family forms ("newest" head)
    for a, b in merges:
        assert a and b


def test_training_is_deterministic():
    assert train_bpe(TOY, 25) == train_bpe(TOY, 25)


def test_encode_applies_merges_greedily():
    merges = train_bpe(TOY, 30)
    ranks = {p: i for i, p in enumerate(merges)}
    toks = encode_text("newest lowest", ranks)
    # every token is a contiguous piece; reconstruction round-trips
    assert "".join(toks).replace("</w>", "") == "newestlowest"
    # a word from the training set compresses below char count
    assert len(encode_text("newest", ranks)) < len("newest") + 1


def test_spark_encode_matches_reference(spark):
    docs = load_tables(spark, SF_DIR)["documents"]
    sample = docs.where(docs.doc_id < 40).select("doc_id", "text")
    texts = {r[0]: r[1] for r in sample.collect()}
    merges = train_bpe(list(texts.values()), 100)
    ranks = {p: i for i, p in enumerate(merges)}

    got = {
        r["doc_id"]: (r["bpe_tokens"], r["ws_tokens"])
        for r in bpe_token_stats(sample, merges).collect()
    }
    assert set(got) == set(texts)
    for doc_id, text in texts.items():
        ref = encode_text(text, ranks)
        assert got[doc_id] == (len(ref), len(text.split()))


def test_bpe_plan_is_arrow_batched(spark):
    from hyperion_history_api_spark import registry

    df = registry.all_specs()["doc_bpe_token_stats"].spark_fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan
