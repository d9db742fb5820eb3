"""Round-8 drift root-cause harness (VERDICT r7 item 2).

The r7 sf0.1 bench artifact shows `user_sessions` +74% and
`corpus_curation_full` +57% over r6 (builder medians), plus the ingest
leg dropping 37.2k -> 28.4k ev/s/core — yet `git log -L` shows neither
query's code path changed in round 7. Hypothesis: BENCH-SESSION
CONTAMINATION, not code. Round 7 (a) added a global warm pass that
executes EVERY headliner before any timing and (b) promoted several
state-heavy rows to headliner (indexed BM25 serving with
cache_frames=True persisted store frames, the k256 artifact path,
baseline JPEG decode) — so by the time the two queries and the ingest
leg run, the session carries far more pinned executor memory and JVM
heap history than the r6 session did at the same point.

Each mode below runs in a FRESH process/JVM so measurements compose:

  isolated <query> [n]   warm x2, then n timed runs of one query with
                         nothing else in the session
  postwarm <query> [n]   replicate bench.py's global headline warm
                         pass FIRST, then the same n timed runs
  ingest [n]             bench.py's exact ingest leg (2M-row replicated
                         backfill_write), best-of-3 reported n times

isolated ~= r6-bench conditions for an early-order query;
postwarm  = r7-bench conditions. If isolated matches the r6 number and
postwarm reproduces the r7 number, the cause is pinned session state,
and the fix is to size/scope what the warm pass leaves behind rather
than to touch the queries.

Writes one JSON line; scripts/drift_r08_run.sh assembles DRIFT_r08.json.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _spark():
    from hyperion_history_api_spark.session import get_spark

    spark = get_spark("drift-r08")
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _cpu_snapshot() -> tuple[int, int]:
    """(whole-machine BUSY jiffies, this-process-tree jiffies) — reuse
    bench.py's canary (idle+iowait excluded, LIVE descendant walk so
    the Spark JVM child is ours, not "external"), read per SAMPLE here
    so the artifact shows each timing's host state."""
    import bench

    return bench._cpu_snapshot()


def _engine_materialize(df) -> None:
    """Materialize every row ENGINE-side: count + full-width xxhash64
    checksum, one collected row. This is what a 100 TB pipeline pays
    for a large-output operator (the result lands in a table/agg, not
    a driver pickle) — the collect-timed protocol additionally pays
    Python row serialization of the whole output, which for
    dedup_minhash_lsh at the sf3 replica is ~60% of wall
    (r13 instrumentation)."""
    from pyspark.sql import functions as F

    try:
        df.agg(
            F.count(F.lit(1)),
            F.sum(
                F.xxhash64(*[F.col(c) for c in df.columns]).cast(
                    "decimal(38,0)"
                )
            ),
        ).collect()
    except Exception:
        df.count()


def _time_query(spark, name: str, n: int, engine: bool = False) -> dict:
    from hyperion_history_api_spark import registry

    spec = registry.all_specs()[name]
    run = (
        (lambda: _engine_materialize(spec.spark_fn(spark, SF_DIR)))
        if engine
        else (lambda: spec.spark_fn(spark, SF_DIR).collect())
    )
    run()
    # result cardinality on the record: large-output rows are where
    # collect-vs-engine timing diverges, and scale-step adjudication
    # (output growth vs plan growth) needs the row counts
    out_rows = spec.spark_fn(spark, SF_DIR).count()
    hz = os.sysconf("SC_CLK_TCK")
    ncpu = os.cpu_count() or 1
    samples, canary = [], []
    for _ in range(n):
        c0_total, c0_tree = _cpu_snapshot()
        t0 = time.perf_counter()
        run()
        dt = time.perf_counter() - t0
        c1_total, c1_tree = _cpu_snapshot()
        samples.append(round(dt, 4))
        # EXTERNAL cores busy during THIS sample: whole-machine
        # jiffies minus this process tree's (JVM included), per wall
        # second. Quiet host ~0; >>1 marks the sample contaminated.
        canary.append(
            round(
                max(
                    0.0,
                    ((c1_total - c0_total) - (c1_tree - c0_tree))
                    / hz
                    / max(dt, 1e-9),
                ),
                2,
            )
        )
    return {
        "samples": samples,
        "median": round(statistics.median(samples), 4),
        "min": min(samples),
        "max": max(samples),
        "timing": "engine" if engine else "collect",
        "result_rows": out_rows,
        "busy_cores_per_sample": canary,
        "host_cores": ncpu,
        "loadavg": round(os.getloadavg()[0], 2),
    }


def main() -> None:
    mode = sys.argv[1]
    out: dict = {"mode": mode, "sf_dir": SF_DIR}
    spark = _spark()
    if mode in ("isolated", "isolated_engine", "postwarm", "postwarm_scrub"):
        name = sys.argv[2]
        n = int(sys.argv[3]) if len(sys.argv) > 3 else 11
        out["query"] = name
        if mode.startswith("postwarm"):
            from hyperion_history_api_spark import registry

            t0 = time.perf_counter()
            for qn, spec in registry.all_specs().items():
                if spec.headline and qn != name:
                    spec.spark_fn(spark, SF_DIR).collect()
            out["warm_pass_sec"] = round(time.perf_counter() - t0, 2)
        if mode == "postwarm_scrub":
            # the scrub under test: drop Python-side refs to the warm
            # pass's frames, then ask both runtimes to collect so the
            # ContextCleaner releases unreferenced localCheckpoint
            # blocks and shuffle state before any timing starts
            import gc

            gc.collect()
            spark.sparkContext._jvm.System.gc()
            time.sleep(3)
        out.update(
            _time_query(spark, name, n, engine=mode == "isolated_engine")
        )
    elif mode == "ingest":
        n = int(sys.argv[2]) if len(sys.argv) > 2 else 3
        import shutil
        import tempfile

        from pyspark.sql import functions as F

        from hyperion_history_api_spark.streaming.ingest import (
            backfill_write,
            decode_and_enrich,
        )
        from hyperion_history_api_spark.tables import load_tables

        base = load_tables(spark, SF_DIR)["events"]
        base_n = base.count()
        copies = max(1, 2_000_000 // max(base_n, 1))
        span = base.agg(F.max("event_id")).first()[0] + 1
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
        feed = (
            base.repartition(cpus)
            .withColumn(
                "__rep", F.explode(F.array(*[F.lit(i) for i in range(copies)]))
            )
            .withColumn("event_id", F.col("event_id") + F.col("__rep") * F.lit(span))
            .drop("__rep")
        )
        decoded = decode_and_enrich(feed)
        rows = base_n * copies
        tmp = tempfile.mkdtemp(prefix="drift_ingest_")
        try:
            backfill_write(decoded, os.path.join(tmp, "warm"))
            bests = []
            for _ in range(n):
                best = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    backfill_write(decoded, os.path.join(tmp, "timed"))
                    best = min(best, time.perf_counter() - t0)
                bests.append(round(best, 4))
            out.update(
                {
                    "rows": rows,
                    "best_of_3_secs": bests,
                    "median_sec": round(statistics.median(bests), 4),
                    "median_ev_per_sec_per_core": round(
                        rows / statistics.median(bests) / cpus
                    ),
                }
            )
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
    else:
        raise SystemExit(f"unknown mode {mode}")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
