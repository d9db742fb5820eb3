"""Bench harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line:
    {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed once to warm (JVM/codegen/file listing), then
timed over ``RUNS`` runs taking the best — the steady-state number a
resident SparkSession server would serve.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hyperion_history_api_spark import registry  # noqa: E402
from hyperion_history_api_spark.session import get_spark  # noqa: E402

RUNS = 3


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("hyperion-bench")
    spark.sparkContext.setLogLevel("ERROR")

    headline = {n: s for n, s in registry.all_specs().items() if s.headline}
    timings: dict[str, float] = {}
    for name, spec in headline.items():
        df = spec.spark_fn(spark, sf_dir)
        df.collect()  # warm
        best = float("inf")
        for _ in range(RUNS):
            t0 = time.perf_counter()
            spec.spark_fn(spark, sf_dir).collect()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)

    # Ingest throughput (BASELINE part B: >= 10k events/s/core): one
    # batch backfill pass of the raw feed into the partitioned lake.
    import shutil
    import tempfile

    from hyperion_history_api_spark.streaming.ingest import batch_backfill

    tmp = tempfile.mkdtemp(prefix="hyperion_ingest_bench_")
    try:
        batch_backfill(spark, sf_dir, tmp)  # warm
        t0 = time.perf_counter()
        rows = batch_backfill(spark, sf_dir, tmp)
        ingest_sec = time.perf_counter() - t0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "ingest_sec": round(ingest_sec, 4),
                "ingest_events_per_sec": round(rows / ingest_sec),
            }
        )
    )


if __name__ == "__main__":
    main()
