"""Round-15 per-query profiler: the round-14 protocol (bench-identical
warm pass + GC scrub + best/median of N + job/stage counts) plus the
EXECUTED plan (post-collect, AQE-final) — the evidence the r14 verdict
asked for on stage-reuse claims (initial plans cannot show runtime
ReusedExchange; the executed plan can).

    python scripts/profile_r15.py [QUERY ...] [--sf=DIR] [--runs=N]
        [--explain=plans/r15 --suffix=_before] [--executed=1]
        [--json=out.json]

With --explain, writes <query><suffix>.txt with explain("formatted")
of the INITIAL plan; with --executed=1 additionally appends the
executed (AQE-final) plan string after a separator, captured after a
collect() of the same DataFrame instance.
"""

from __future__ import annotations

import gc
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hyperion_history_api_spark import registry  # noqa: E402
from hyperion_history_api_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = dict(
        a[2:].split("=", 1) for a in sys.argv[1:] if a.startswith("--") and "=" in a
    )
    sf_dir = opts.get("sf", "/root/testdata/sf0.1")
    runs = int(opts.get("runs", "5"))
    explain_dir = opts.get("explain")
    suffix = opts.get("suffix", "_before")
    executed = opts.get("executed") == "1"

    spark = get_spark("hyperion-profile-r15")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    specs = {n: s for n, s in registry.all_specs().items() if s.headline}
    if args:
        specs = {n: s for n, s in registry.all_specs().items() if n in args}

    # global warm pass (bench protocol)
    for name, spec in specs.items():
        spec.spark_fn(spark, sf_dir).collect()

    def _scrub() -> None:
        for _ in range(2):
            gc.collect()
            sc._jvm.System.gc()
            time.sleep(0.3)

    def _fmt(df) -> str:
        return df._jdf.queryExecution().explainString(
            sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )

    out: dict[str, dict] = {}
    for name, spec in specs.items():
        df = spec.spark_fn(spark, sf_dir)
        initial_plan = _fmt(df) if explain_dir else None
        df.collect()  # warm (also finalizes AQE on this instance)
        if explain_dir:
            os.makedirs(explain_dir, exist_ok=True)
            with open(os.path.join(explain_dir, f"{name}{suffix}.txt"), "w") as f:
                f.write(initial_plan)
                if executed:
                    f.write("\n\n=== EXECUTED (AQE-final) ===\n")
                    f.write(
                        df._jdf.queryExecution().executedPlan().toString()
                    )
        _scrub()
        samples: list[float] = []
        job_counts: list[int] = []
        stage_counts: list[int] = []
        for _ in range(runs):
            group = f"prof-{name}-{time.monotonic_ns()}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            spec.spark_fn(spark, sf_dir).collect()
            samples.append(time.perf_counter() - t0)
            sc.setJobGroup("", "")
            jids = tracker.getJobIdsForGroup(group)
            job_counts.append(len(jids))
            nstages = 0
            for j in jids:
                ji = tracker.getJobInfo(j)
                if ji:
                    nstages += len(ji.stageIds)
            stage_counts.append(nstages)
        out[name] = {
            "best": round(min(samples), 4),
            "median": round(statistics.median(samples), 4),
            "spread": round(max(samples) - min(samples), 4),
            "jobs": job_counts[-1],
            "stages": stage_counts[-1],
        }
        print(
            f"{name:42s} best {out[name]['best']:7.3f}  med {out[name]['median']:7.3f}"
            f"  spread {out[name]['spread']:6.3f}  jobs {out[name]['jobs']:3d}"
            f"  stages {out[name]['stages']:3d}",
            flush=True,
        )
    total = sum(v["best"] for v in out.values())
    print(f"TOTAL(best) {total:.3f}s over {len(out)} queries")
    if opts.get("json"):
        with open(opts["json"], "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
