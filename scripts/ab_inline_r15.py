"""Round-15 interleaved A/B: OLD formulation (r14 registry code,
reconstructed inline) vs NEW registry code, alternating in ONE session
so host-window bimodality hits both arms equally (the r14 protocol).

    python scripts/ab_inline_r15.py [tfidf|bm25|bm25_indexed|abi] ...
        [--sf=DIR] [--pairs=N]

Per pair: A (old) then B (new), collect-timed, GC scrub between, the
bench's single-thread sentinel logged per sample.
"""

from __future__ import annotations

import gc
import json
import statistics
import sys
import time

import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from hyperion_history_api_spark.registry import _t, all_specs  # noqa: E402
from hyperion_history_api_spark.session import get_spark  # noqa: E402

_BM25_K1 = 1.2
_BM25_B = 0.75


def old_tfidf(spark, sf_dir):
    terms = ["merge", "window", "customer"]
    docs = _t(spark, sf_dir)["documents"]
    n_total = docs.agg(F.count(F.lit(1)).alias("total"))
    w = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    ).where(F.col("word").isin(terms))
    tf = w.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    df_t = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    return (
        tf.join(F.broadcast(df_t), "word")
        .crossJoin(F.broadcast(n_total))
        .groupBy("doc_id")
        .agg(
            F.round(
                F.sum(
                    F.col("tf")
                    * F.log(F.col("total").cast("double") / F.col("df"))
                ),
                4,
            ).alias("score")
        )
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(20)
    )


def old_bm25(spark, sf_dir):
    terms = ["merge", "window", "customer"]
    docs = _t(spark, sf_dir)["documents"]
    toks = docs.select("doc_id", F.split("text", " ").alias("ws"))
    stats = toks.agg(
        F.count(F.lit(1)).alias("n"), F.avg(F.size("ws")).alias("avgdl")
    )
    w = toks.select(
        "doc_id", F.size("ws").alias("dl"), F.explode("ws").alias("word")
    ).where(F.col("word").isin(terms))
    tf = w.groupBy("doc_id", "word", "dl").agg(F.count(F.lit(1)).alias("tf"))
    df_t = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    norm = F.col("tf") * F.lit(_BM25_K1 + 1) / (
        F.col("tf")
        + F.lit(_BM25_K1)
        * (F.lit(1.0 - _BM25_B) + F.lit(_BM25_B) * F.col("dl") / F.col("avgdl"))
    )
    return (
        tf.join(F.broadcast(df_t), "word")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.round(F.sum(idf * norm), 4).alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(20)
    )


def old_bm25_indexed(spark, sf_dir):
    from hyperion_history_api_spark.api.dedup_sim import _bm25_index_store
    from hyperion_history_api_spark.sources.inverted_index import (
        DF_FRAME,
        STATS_FRAME,
    )

    terms = ["merge", "window", "customer"]
    store = _bm25_index_store(spark, sf_dir)
    idx = store.read()
    p = store.live_postings(idx).where(F.col("word").isin(terms))
    d = idx[DF_FRAME].where(F.col("word").isin(terms))
    s = idx[STATS_FRAME]
    idf = F.log(
        F.lit(1.0)
        + (F.col("n") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    avgdl = F.col("sumdl") / F.col("n")
    norm = F.col("tf") * F.lit(_BM25_K1 + 1) / (
        F.col("tf")
        + F.lit(_BM25_K1)
        * (F.lit(1.0 - _BM25_B) + F.lit(_BM25_B) * F.col("dl") / avgdl)
    )
    return (
        p.join(F.broadcast(d), "word")
        .crossJoin(F.broadcast(s))
        .groupBy("doc_id")
        .agg(F.round(F.sum(idf * norm), 4).alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(20)
    )


def old_abi(spark, sf_dir):
    from hyperion_history_api_spark.operators.abi_pipeline import (
        _ENCODE_IN,
        _encode_blob,
        binary_action_scalars,
        decode_actions,
    )

    top = (
        binary_action_scalars(spark, sf_dir)  # no event_types pushdown
        .where(F.col("action_name") == "transfer")
        .orderBy("global_sequence")
        .limit(500)
    )
    npart = max(spark.sparkContext.defaultParallelism, 2)
    with_blob = top.repartition(npart, "global_sequence").withColumn(
        "abi_blob",
        _encode_blob(F.struct(*[f.name for f in _ENCODE_IN.fields])),
    )
    d = decode_actions(with_blob)
    return d.select(
        "global_sequence",
        F.col("decoded.from_account").alias("from_account"),
        F.col("decoded.to_account").alias("to_account"),
        F.round("decoded.amount", 4).alias("amount"),
        F.col("decoded.symbol").alias("symbol"),
        F.col("decoded.used_version").alias("used_version"),
    )


PAIRS = {
    "tfidf": (old_tfidf, "doc_search_tfidf"),
    "bm25": (old_bm25, "doc_search_bm25"),
    "bm25_indexed": (old_bm25_indexed, "doc_search_bm25_indexed"),
    "abi": (old_abi, "abi_binary_decode"),
}


def _sentinel() -> float:
    t0 = time.perf_counter()
    acc = 0
    for i in range(2_000_000):
        acc = (acc + i * i) % 1_000_003
    assert acc >= 0
    return time.perf_counter() - t0


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = dict(
        a[2:].split("=", 1) for a in sys.argv[1:] if a.startswith("--") and "=" in a
    )
    sf_dir = opts.get("sf", "/root/testdata/sf0.1")
    pairs = int(opts.get("pairs", "7"))
    names = args or list(PAIRS)

    spark = get_spark("ab-r15")
    spark.sparkContext.setLogLevel("ERROR")

    def _scrub() -> None:
        for _ in range(2):
            gc.collect()
            spark.sparkContext._jvm.System.gc()
            time.sleep(0.3)

    out: dict = {}
    for name in names:
        old_fn, new_name = PAIRS[name]
        new_fn = all_specs()[new_name].spark_fn
        # verify identical result sets before timing
        a = {tuple(r) for r in old_fn(spark, sf_dir).collect()}
        b = {tuple(r) for r in new_fn(spark, sf_dir).collect()}
        assert a == b, f"{name}: OLD and NEW results differ!"
        _scrub()
        A: list[float] = []
        B: list[float] = []
        sent: list[float] = []
        for i in range(pairs):
            sent.append(_sentinel())
            t0 = time.perf_counter()
            old_fn(spark, sf_dir).collect()
            A.append(time.perf_counter() - t0)
            _scrub()
            t0 = time.perf_counter()
            new_fn(spark, sf_dir).collect()
            B.append(time.perf_counter() - t0)
            _scrub()
            print(
                f"{name} pair {i}: old {A[-1]:.3f} new {B[-1]:.3f} "
                f"sentinel {sent[-1]:.3f}",
                file=sys.stderr,
                flush=True,
            )
        out[name] = {
            "pairs": pairs,
            "old_median": round(statistics.median(A), 4),
            "new_median": round(statistics.median(B), 4),
            "old_best": round(min(A), 4),
            "new_best": round(min(B), 4),
            "speedup_median": round(
                statistics.median(A) / statistics.median(B), 3
            ),
            "wins": sum(1 for x, y in zip(A, B) if y < x),
            "sentinel_median": round(statistics.median(sent), 3),
        }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
