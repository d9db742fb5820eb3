"""Throughput bench for the composed streaming curation pipeline
(round-6; streaming/curation_ingest.py): feed the documents corpus
through the foreachBatch sink — quality filter -> decontamination ->
incremental near-dup dedup vs the persisted index — in ``waves``
micro-batches and measure per-wave latency and docs/s.

What this quantifies: the round-5/6 streaming story's cost. Each wave
pays the narrow filter/decontam projections on the batch only, plus
the O(batch) index probe/extend (history hard-linked forward, never
re-signed). Steady state = median of the second half, after JVM and
index warmup; the first wave additionally pays the full index build.

Writes one JSON artifact (default ``STREAM_CURATION_BENCH_r06.json``).
Usage: python scripts/bench_stream_curation.py [sf_dir] [out_json]
       [waves]
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_json = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "STREAM_CURATION_BENCH_r06.json",
        )
    )
    waves = int(sys.argv[3]) if len(sys.argv) > 3 else 12

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from hyperion_history_api_spark.streaming.curation_ingest import (
        curated_corpus,
        make_curation_sink,
    )
    from hyperion_history_api_spark.tables import load_tables

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .appName("bench-stream-curation")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_tables(spark, sf_dir)["documents"].persist()
    n_docs = docs.count()
    # eval slice 1/500, NOT the oracle row's 1/20: the fixture corpus
    # draws from a tiny vocabulary, so a 250-doc eval frame's n-grams
    # blanket it and decontamination keeps ZERO docs at sf0.1 (true of
    # the batch pipeline too — the oracle row hash-matches that empty
    # result). A throughput bench needs survivors flowing through the
    # dedup-index stage, so it uses a 10-doc eval frame (~1/3 of
    # filtered docs still decontaminated away, so the stage stays
    # load-bearing).
    eval_docs = docs.where(F.col("doc_id") % 500 == 7).select(
        "doc_id", "text"
    )

    out_dir = tempfile.mkdtemp(prefix="curation-bench-")
    try:
        sink, paths = make_curation_sink(spark, out_dir, eval_docs)
        wave_secs: list[float] = []
        for w in range(waves):
            batch = docs.where(F.col("doc_id") % waves == w)
            t0 = time.monotonic()
            sink(batch, w)
            wave_secs.append(round(time.monotonic() - t0, 4))
        half = len(wave_secs) // 2
        steady = statistics.median(wave_secs[half:])
        sink.close()
        kept = curated_corpus(spark, paths).count()
        total_sec = sum(wave_secs)
        result = {
            "sf_dir": sf_dir,
            "waves": waves,
            "docs_in": n_docs,
            "docs_kept": kept,
            "wave_secs": wave_secs,
            "first_wave_sec": wave_secs[0],
            "steady_state_median_sec": round(steady, 4),
            "total_sec": round(total_sec, 4),
            "docs_per_sec": round(n_docs / total_sec, 1),
            "docs_per_sec_per_core": round(n_docs / total_sec / cpus, 2),
            "steady_docs_per_sec": round(
                (n_docs / waves) / steady, 1
            ),
        }
        with open(out_json, "w") as f:
            json.dump(result, f, indent=1)
        print("wrote", out_json)
        print(json.dumps(result))
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
