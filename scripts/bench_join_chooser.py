"""A/B bench for the cost-gated join chooser on its serving path
(VERDICT r4 item 7 / r6 item 7): time `hyp_notified_enrichment`'s
exploded notified-receiver enrichment join three ways at a given
scale point (meant for the 10x replica, scripts/make_scale.py):

  chooser  - whatever choose_join_strategy picks for this data
             (dim count gate, then profiled top-key share);
  aqe      - plain shuffle join, broadcast hint suppressed, AQE left
             on (Spark's own runtime answer to skew);
  salted   - the salted path forced (the chooser's skew branch).

What this proves: the chooser's pick is never slower than the
strategy a user would get by default, and the decision overhead
(dim count + optional profile job) is visible as a number instead of
an assumption. Writes one JSON artifact with per-arm medians/spreads
and the chooser's decision.

Usage: python scripts/bench_join_chooser.py [sf_dir] [out_json] [runs]
Default: /root/repo/.scale/sf1 -> JOIN_CHOOSER_BENCH_r06.json, 5.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf1"
    out_json = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "JOIN_CHOOSER_BENCH_r06.json",
        )
    )
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    from pyspark.sql import functions as F

    from hyperion_history_api_spark.api.skew_q import _notified_enrichment
    from hyperion_history_api_spark.operators.skew import salted_join
    from hyperion_history_api_spark.session import get_spark
    from hyperion_history_api_spark.sources.lake import lake_actions

    spark = get_spark("join-chooser-bench")
    spark.sparkContext.setLogLevel("ERROR")
    a = lake_actions(spark, sf_dir)

    def fact_dim():
        fact = a.select(
            "global_sequence",
            "block_num",
            F.explode("notified").alias("receiver"),
        )
        dim = fact.groupBy("receiver").agg(
            F.count("*").alias("recv_notifications"),
            F.max("block_num").alias("recv_last_block"),
        )
        return fact, dim

    # timed action is an aggregate over the joined columns (count +
    # checksum), NOT collect(): at the 10x point the full enrichment
    # is millions of rows and collect() would measure driver
    # serialization instead of the join. The checksum makes every arm
    # materialize identical join output (and proves equivalence).
    def measure(df):
        return tuple(
            df.agg(
                F.count("*"),
                F.sum(
                    F.xxhash64(
                        "global_sequence", "receiver",
                        "recv_notifications", "recv_last_block",
                    ).cast("decimal(38,0)")  # no ANSI long overflow
                ),
            ).first()
        )

    def arm_chooser():
        # the serving configuration: broadcast gate fed from the
        # catalog-stats cache (sources/stats.py), zero planner jobs
        # on the hot path. The one-time analyze job is timed below
        # as stats_analyze_sec, not hidden.
        df, strategy = _notified_enrichment(a, stats_key=sf_dir)
        return df, strategy

    def arm_default():
        fact, dim = fact_dim()
        # the join a user writes with no hints at all: Spark's own
        # static pick for a derived dim (its size estimate for the
        # agg is pessimistic, so this typically plans a sort-merge).
        return fact.join(dim, "receiver"), "spark_default"

    def arm_aqe():
        fact, dim = fact_dim()
        # plain shuffle join, broadcast suppressed (shuffle_hash
        # hint), AQE (already on in session.get_spark) free to
        # re-plan at runtime: the genuine shuffle/AQE arm even where
        # the dim would auto-broadcast at bench scale.
        return fact.hint("shuffle_hash").join(dim, "receiver"), "aqe_shuffle"

    def arm_salted():
        fact, dim = fact_dim()
        return salted_join(
            fact, dim, "receiver", salt_id_col="global_sequence", salts=8
        ), "salted"

    arms = {
        "chooser": arm_chooser,
        "default": arm_default,
        "aqe": arm_aqe,
        "salted": arm_salted,
    }
    result: dict = {"sf_dir": sf_dir, "runs": runs, "arms": {}}

    # the amortized cost the chooser's stats path pays once per
    # process (ANALYZE-equivalent), measured cold before any warm run
    # primes the cache.
    from hyperion_history_api_spark.sources.stats import (
        column_ndv,
        invalidate_stats,
    )

    invalidate_stats()
    fact0, _ = fact_dim()
    t0 = time.perf_counter()
    ndv = column_ndv(fact0, "receiver", cache_key=sf_dir)
    result["stats_analyze_sec"] = round(time.perf_counter() - t0, 4)
    result["stats_receiver_ndv"] = ndv
    checks = set()
    for name, build in arms.items():
        df, strategy = build()
        checks.add(measure(df))  # warm + result-equivalence check
        samples = []
        for _ in range(runs):
            # every sample cache-cold for every arm: the chooser
            # persists a derived dim while deciding, and Spark's
            # CacheManager would hand that cache to the NEXT sample's
            # identical plan — which would time cache reads, not the
            # query. clearCache() makes each sample the end-to-end
            # single-invocation cost the artifact claims to compare.
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            measure(build()[0])
            samples.append(time.perf_counter() - t0)
        result["arms"][name] = {
            "strategy": strategy,
            "median_sec": round(statistics.median(samples), 4),
            "spread_sec": round(max(samples) - min(samples), 4),
        }
        print(name, result["arms"][name])
    assert len(checks) == 1, f"arms disagree on (count, checksum): {checks}"
    rows, checksum = checks.pop()
    result["rows"], result["checksum"] = rows, str(checksum)
    # decision overhead on the hot path: with stats cached this is
    # the O(1) dict lookup the design claims (any Spark job here is
    # a regression).
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    _, decision = _notified_enrichment(a, stats_key=sf_dir)
    result["chooser_decision"] = decision
    result["chooser_plan_overhead_sec"] = round(time.perf_counter() - t0, 4)
    with open(out_json, "w") as f:
        json.dump(result, f, indent=1)
    print("wrote", out_json)


if __name__ == "__main__":
    main()
