"""Round-10 drift recheck (VERDICT r9 item 1): the driver's BENCH_r09
shows ingest 33.1k -> 23.6k ev/s/core (-29%), stream micro-batch
1.13 -> 1.49 s (+31%) and 9/27 rows +15-30%, while the builder's
controlled 3-scale benches are flat. Re-measure the flagged legs with
the r8 DRIFT method — each measurement in a FRESH process/JVM, n>=9,
isolated AND postwarm — so the artifact pins whether the regression
exists at HEAD under controlled conditions or is (again) the shared
driver-session condition.

    python scripts/drift_r10.py all          # assembles DRIFT_r10.json
    python scripts/drift_r10.py microbatch [n]   # one leg, one JSON line

isolated/postwarm/ingest legs are delegated to scripts/drift_r08.py
(same protocol, unchanged); the microbatch leg replicates bench.py's
exact streaming leg (8-file availableNow feed through the full ingest
sink, steady state = max of the last 4 batch latencies) n times in one
session, like the driver's bench does once per round.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
HERE = os.path.dirname(os.path.abspath(__file__))

QUERIES = ["abi_binary_decode", "date_histogram_daily", "user_sessions"]


def _microbatch(n: int) -> dict:
    import shutil
    import tempfile

    from hyperion_history_api_spark.session import get_spark
    from hyperion_history_api_spark.streaming.ingest import (
        decode_and_enrich,
        make_ingest_sink,
    )
    from hyperion_history_api_spark.tables import (
        EVENTS_SCHEMA_RAW,
        normalize_events,
    )

    spark = get_spark("drift-r10-mb")
    spark.sparkContext.setLogLevel("ERROR")
    steady: list[float] = []
    for rep in range(n):
        mb_out = tempfile.mkdtemp(prefix=f"drift_mb_{rep}_")
        try:
            feed_dir = os.path.join(mb_out, "feed")
            raw = spark.read.schema(EVENTS_SCHEMA_RAW).parquet(
                os.path.join(SF_DIR, "events.parquet")
            )
            raw.repartitionByRange(8, "event_id").write.mode(
                "overwrite"
            ).parquet(feed_dir)
            sink, _ = make_ingest_sink(spark, mb_out)
            latencies: list[float] = []

            def timed_sink(batch, batch_id):
                t0 = time.perf_counter()
                sink(batch, batch_id)
                latencies.append(time.perf_counter() - t0)

            stream = normalize_events(
                spark.readStream.schema(EVENTS_SCHEMA_RAW)
                .format("parquet")
                .option("maxFilesPerTrigger", 1)
                .load(feed_dir)
            )
            q = (
                decode_and_enrich(stream)
                .writeStream.foreachBatch(timed_sink)
                .option(
                    "checkpointLocation", os.path.join(mb_out, "_cp")
                )
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            steady.append(
                round(
                    max(latencies[-4:])
                    if len(latencies) >= 4
                    else max(latencies),
                    4,
                )
            )
        finally:
            shutil.rmtree(mb_out, ignore_errors=True)
    return {
        "mode": "microbatch",
        "sf_dir": SF_DIR,
        "steady_state_secs": steady,
        "median": round(statistics.median(steady), 4),
        "min": min(steady),
        "max": max(steady),
    }


def _run_r08(args: list[str]) -> dict:
    """One drift_r08 leg in a fresh process (fresh JVM)."""
    res = subprocess.run(
        [sys.executable, os.path.join(HERE, "drift_r08.py"), *args],
        capture_output=True,
        text=True,
        check=True,
        env={**os.environ, "SPARK_GRAFT_SF_DIR": SF_DIR},
    )
    return json.loads(res.stdout.strip().splitlines()[-1])


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    if mode == "microbatch":
        n = int(sys.argv[2]) if len(sys.argv) > 2 else 9
        print(json.dumps(_microbatch(n)))
        return
    assert mode == "all"
    out: dict = {"round": 10, "sf_dir": SF_DIR, "legs": {}}
    # fresh process per leg so JVM/page-cache state never leaks across
    out["legs"]["ingest"] = _run_r08(["ingest", "9"])
    res = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "microbatch", "9"],
        capture_output=True,
        text=True,
        check=True,
    )
    out["legs"]["microbatch"] = json.loads(
        res.stdout.strip().splitlines()[-1]
    )
    for q in QUERIES:
        out["legs"][f"{q}::isolated"] = _run_r08(["isolated", q, "9"])
        out["legs"][f"{q}::postwarm"] = _run_r08(["postwarm", q, "9"])
    path = os.path.join(os.path.dirname(HERE), "DRIFT_r10.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
