"""Bench harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line:
    {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed once to warm (JVM/codegen/file listing), then
timed over ``RUNS`` runs. ``queries`` keeps the best-run number (the
steady-state a resident SparkSession server would serve); round-4
robustness fields make a load-contended host visible in the artifact
instead of silently inflating it (round-3 verdict what's-wrong #4):

- ``queries_median`` / ``queries_spread``: per-query median and
  (max - min) across the timed runs;
- ``load_sentinel_sec``: a fixed single-thread busy-loop timed before
  and after the query block — a calibration constant for THIS code on
  ANY host, so two artifacts are comparable (a contended run shows a
  sentinel well above the quiet-host ~0.2 s and/or a wide spread);
- ``external_cpu_cores_avg`` / ``loadavg_start`` (round-10,
  DRIFT_r10.json): whole-machine contamination canary. The r9
  driver-session regression (ingest -29%, micro-batch +31%, flat
  under controlled re-measure) slipped past the sentinel because one
  thread can still get a full core while the other 31 are contended —
  this field is the /proc/stat busy delta NOT attributable to this
  bench's own process tree, in cores-average over the timed span.
  Quiet host ~0; read any bench row with external_cpu_cores_avg >> 1
  as contaminated rather than regressed.
- ``queries_engine_median`` (round-14, VERDICT r13 item 1): for rows
  whose output exceeds 50k rows at this SF, the median of an
  ENGINE-side materialization (count + full-width xxhash64 checksum,
  one collected row) — the cost a real pipeline pays, separated from
  the harness's driver-collect pickling. Collect-timed numbers remain
  the primary cross-round protocol; absent at sf0.1 where every
  headline output is small.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hyperion_history_api_spark import registry  # noqa: E402
from hyperion_history_api_spark.session import get_spark  # noqa: E402

RUNS = int(os.environ.get("SPARK_GRAFT_RUNS", "3"))


def _load_sentinel() -> float:
    """Seconds for a fixed pure-Python busy loop (~0.2 s quiet): a
    host-load canary, independent of Spark."""
    t0 = time.perf_counter()
    acc = 0
    for i in range(2_000_000):
        acc = (acc + i * i) % 1_000_003
    assert acc >= 0
    return time.perf_counter() - t0


def _cpu_snapshot() -> tuple[int, int]:
    """(total_busy_jiffies, our_tree_jiffies) from /proc — the
    whole-machine canary the single-thread sentinel cannot be
    (DRIFT_r10: the driver's contaminated r9 run shows a QUIET 0.18 s
    sentinel because one thread still gets a full core while the
    other 31 are contended). ``our_tree`` walks the live descendants
    of this process (the JVM, pyspark daemons/workers) and includes
    each pid's reaped-children time, so worker CPU is never
    misattributed to the host."""
    with open("/proc/stat") as f:
        parts = f.readline().split()
    v = [int(x) for x in parts[1:]]
    idle = v[3] + (v[4] if len(v) > 4 else 0)  # idle + iowait
    total_busy = sum(v) - idle

    children: dict[int, list[int]] = {}
    stats: dict[int, int] = {}
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        try:
            with open(f"/proc/{d}/stat") as f:
                s = f.read()
        except OSError:
            continue
        # fields after the parenthesized comm (which may hold spaces)
        rest = s[s.rindex(")") + 2 :].split()
        pid = int(d)
        ppid = int(rest[1])
        # utime+stime+cutime+cstime (rest idx 11..14 = stat 14..17)
        stats[pid] = sum(int(x) for x in rest[11:15])
        children.setdefault(ppid, []).append(pid)
    tree = 0
    stack = [os.getpid()]
    while stack:
        p = stack.pop()
        tree += stats.get(p, 0)
        stack.extend(children.get(p, ()))
    return total_busy, tree


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("hyperion-bench")
    spark.sparkContext.setLogLevel("ERROR")

    headline = {n: s for n, s in registry.all_specs().items() if s.headline}
    # Global JVM warm pass (round-7): one untimed run of the whole
    # headline set BEFORE any timing. A fresh session's first ~4 query
    # executions sit on a JIT/codegen plateau ~30% above steady state
    # (measured in DRIFT_r07.json), so without this pass whichever
    # queries happen to run first eat the plateau and the artifact's
    # per-query numbers change whenever the registry ORDER changes.
    # Steady state is the honest serving number for a resident session
    # and is order-independent.
    for spec in headline.values():
        spec.spark_fn(spark, sf_dir).collect()

    # Post-warm scrub + per-query scrub (round-8, DRIFT_r08.json): the
    # warm pass and every localCheckpoint-bearing query leave
    # unreferenced checkpoint/shuffle blocks that the ContextCleaner
    # only releases on a GC cycle — left alone, that cycle lands INSIDE
    # later timed regions (user_sessions measured 1.8 s isolated vs
    # 3.0 s post-warm-pass; 2.1 s with the scrub). Collecting both
    # runtimes OUTSIDE the timed regions is steady-state housekeeping a
    # resident session does anyway; here it just stops GC timing from
    # being attributed to whichever query runs next.
    import gc
    import time as _time

    def _scrub() -> None:
        # two rounds: the first python collect releases the py4j
        # handles of dead DataFrames, the JVM gc then frees their
        # RDDs, which queues ContextCleaner block removals — a second
        # round (after a beat) reaps what the cleaner just
        # unreferenced. One round measured enough at sf0.1 but left
        # ~2x ingest debt at sf3 (SCALE_r08 recheck: 16.1k in-bench
        # vs 35.4k isolated).
        for _ in range(2):
            gc.collect()
            spark.sparkContext._jvm.System.gc()
            _time.sleep(0.3)

    _scrub()
    sentinel_before = _load_sentinel()
    cpu_total0, cpu_tree0 = _cpu_snapshot()
    loadavg0 = os.getloadavg()[0]
    wall0 = time.perf_counter()
    timings: dict[str, float] = {}
    medians: dict[str, float] = {}
    spreads: dict[str, float] = {}
    engine_medians: dict[str, float] = {}

    def _engine_materialize(df) -> None:
        # count + full-width xxhash64 checksum, one collected row:
        # every row evaluated engine-side, zero driver pickling
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

    for name, spec in headline.items():
        df = spec.spark_fn(spark, sf_dir)
        warm_rows = df.collect()  # warm
        _scrub()
        samples: list[float] = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            spec.spark_fn(spark, sf_dir).collect()
            samples.append(time.perf_counter() - t0)
        timings[name] = round(min(samples), 4)
        medians[name] = round(statistics.median(samples), 4)
        spreads[name] = round(max(samples) - min(samples), 4)
        # Engine-side timing twin (round-14, VERDICT r13 item 1): when
        # a row's OUTPUT is large enough that the harness collect()
        # dominates wall (Python row pickling — something no 100 TB
        # pipeline does; results land in tables/aggs), also time a
        # count+checksum materialization. The collect-timed number
        # stays the primary protocol (comparable across rounds); this
        # secondary number is the engine's own cost. Only triggers at
        # the scale replicas (sf0.1 headline outputs are all small).
        if len(warm_rows) >= 50_000:
            del warm_rows
            _scrub()
            esamples: list[float] = []
            for _ in range(RUNS):
                t0 = time.perf_counter()
                _engine_materialize(spec.spark_fn(spark, sf_dir))
                esamples.append(time.perf_counter() - t0)
            engine_medians[name] = round(statistics.median(esamples), 4)
    sentinel_after = _load_sentinel()

    # Ingest throughput (BASELINE part B: >= 10k events/s/core).
    # Round-1 advice applied: (a) amortize fixed per-pass costs by
    # replicating the feed to a ~2M-row job, (b) keep the verification
    # count OUT of the timed region (backfill_write only), (c) report
    # events/s/core.
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from hyperion_history_api_spark.streaming.ingest import (
        backfill_write,
        decode_and_enrich,
    )
    from hyperion_history_api_spark.tables import load_tables

    cpus_env = os.environ.get("SPARK_GRAFT_CPUS", "32")
    cpus = int(cpus_env) if cpus_env.isdigit() else 32
    base = load_tables(spark, sf_dir)["events"]
    base_n = base.count()  # outside the timed region
    copies = max(1, 2_000_000 // max(base_n, 1))
    span = base.agg(F.max("event_id")).first()[0] + 1
    # replicate via explode: ONE scan (vs a plan with a scan per copy)
    # expanded by a codegen'd Generate (vs a row-at-a-time broadcast
    # nested-loop join — measured 5x slower). repartition first so the
    # single-file scan doesn't serialize the expansion onto one task.
    feed = (
        base.repartition(cpus)
        .withColumn("__rep", F.explode(F.array(*[F.lit(i) for i in range(copies)])))
        .withColumn("event_id", F.col("event_id") + F.col("__rep") * F.lit(span))
        .drop("__rep")
    )
    decoded = decode_and_enrich(feed)
    rows = base_n * copies

    tmp = tempfile.mkdtemp(prefix="hyperion_ingest_bench_")
    try:
        backfill_write(decoded, os.path.join(tmp, "warm"))  # warm
        _scrub()  # ingest runs LAST of the query block: same GC story
        ingest_sec = float("inf")
        # best-of-3: the ingest number is the most load-sensitive metric
        # in the suite (round-3 measurement: the same build swings
        # 9.6k-37k ev/s/core with host load); more samples make the
        # recorded best robust to a noisy neighbor during one run.
        for i in range(3):
            t0 = time.perf_counter()
            backfill_write(decoded, os.path.join(tmp, "timed"))
            ingest_sec = min(ingest_sec, time.perf_counter() - t0)
        written = spark.read.parquet(os.path.join(tmp, "timed")).count()
        assert written == rows, f"ingest wrote {written} != {rows}"
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    # Streaming micro-batch latency (BASELINE part B: <= 2 s trigger-to-
    # visible): split the feed into 8 files -> 8 micro-batches through
    # the full sink (append + state MERGE + rollups); steady state =
    # max of the last 4 batches (first batches pay JVM/stage warmup).
    from hyperion_history_api_spark.streaming.ingest import make_ingest_sink
    from hyperion_history_api_spark.tables import (
        EVENTS_SCHEMA_RAW,
        normalize_events,
    )

    mb_out = tempfile.mkdtemp(prefix="hyperion_mb_bench_")
    try:
        feed_dir = os.path.join(mb_out, "feed")
        raw = spark.read.schema(EVENTS_SCHEMA_RAW).parquet(
            os.path.join(sf_dir, "events.parquet")
        )
        raw.repartitionByRange(8, "event_id").write.mode("overwrite").parquet(feed_dir)
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
        from hyperion_history_api_spark.streaming.ingest import decode_and_enrich

        q = (
            decode_and_enrich(stream)
            .writeStream.foreachBatch(timed_sink)
            .option("checkpointLocation", os.path.join(mb_out, "_cp"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        microbatch_sec = max(latencies[-4:]) if len(latencies) >= 4 else max(latencies)
    finally:
        shutil.rmtree(mb_out, ignore_errors=True)

    cpu_total1, cpu_tree1 = _cpu_snapshot()
    wall = time.perf_counter() - wall0
    hz = os.sysconf("SC_CLK_TCK")
    # CPU-cores-average burned by processes OUTSIDE this bench's tree
    # over the whole timed span (queries + ingest + microbatch). A
    # quiet host reads ~0; the r9 driver-session contamination that a
    # full-core single-thread sentinel missed reads as multiple cores.
    external_cores = max(
        0.0,
        ((cpu_total1 - cpu_total0) - (cpu_tree1 - cpu_tree0)) / hz / wall,
    )
    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "queries_median": medians,
                "queries_spread": spreads,
                "load_sentinel_sec": round(
                    max(sentinel_before, sentinel_after), 4
                ),
                "external_cpu_cores_avg": round(external_cores, 2),
                "loadavg_start": round(loadavg0, 2),
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "ingest_sec": round(ingest_sec, 4),
                "ingest_rows": rows,
                "ingest_events_per_sec": round(rows / ingest_sec),
                "ingest_events_per_sec_per_core": round(rows / ingest_sec / cpus),
                "stream_microbatch_sec": round(microbatch_sec, 4),
                **(
                    {"queries_engine_median": engine_medians}
                    if engine_medians
                    else {}
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
