"""A/B bench for the two round-7 chooser-planned serving paths
(VERDICT r6 item 3): get_account_profiles (batch get_account
composition) and hyp_key_accounts_enriched (get_key_accounts details)
at a replica scale point, each two ways:

  chooser - choose_join_strategy fed from the cached catalog stats
            (zero planner jobs on the hot path; the one-time analyze
            is timed separately, not hidden);
  shuffle - the same query shape with the broadcast suppressed
            (shuffle_hash hint), AQE free to re-plan — what a user
            gets without the chooser once the dim outgrows Spark's
            static estimate.

Asserts both arms return identical rows before timing.
Usage: python scripts/bench_chooser_paths_r07.py [sf_dir] [out] [runs]
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
            "JOIN_CHOOSER_BENCH_r07.json",
        )
    )
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    from pyspark.sql import functions as F

    from hyperion_history_api_spark.api.endpoints_ext import (
        _account_profiles,
    )
    from hyperion_history_api_spark.api.nested import _key_accounts_enriched
    from hyperion_history_api_spark.operators.latest_state import (
        latest_row_per_key,
    )
    from hyperion_history_api_spark.registry import _t
    from hyperion_history_api_spark.session import get_spark
    from hyperion_history_api_spark.sources.lake import lake_permissions
    from hyperion_history_api_spark.sources.stats import invalidate_stats

    spark = get_spark("chooser-paths-bench")
    spark.sparkContext.setLogLevel("ERROR")

    def profiles_shuffle():
        t = _t(spark, sf_dir)
        page = t["customer"].where(F.col("c_custkey").between(1, 50))
        fact = t["orders"].hint("shuffle_hash").join(
            page.select(F.col("c_custkey").alias("o_custkey")),
            "o_custkey",
            "left_semi",
        )
        rollup = fact.groupBy("o_custkey").agg(
            F.count("*").alias("total_trx"),
            F.round(F.sum("o_totalprice"), 4).alias("total_volume"),
            F.max("o_orderkey").alias("last_trx"),
        )
        return (
            page.join(rollup, page["c_custkey"] == rollup["o_custkey"], "left")
            .select(
                F.col("c_custkey").alias("account"),
                F.col("c_name").alias("account_name"),
                F.round("c_acctbal", 4).alias("balance"),
                F.coalesce("total_trx", F.lit(0)).cast("long").alias("total_trx"),
                F.round(F.coalesce("total_volume", F.lit(0.0)), 4).alias(
                    "total_volume"
                ),
                F.col("last_trx").cast("long").alias("last_trx"),
            )
            .orderBy("account")
        )

    def keyacc_shuffle():
        p = lake_permissions(spark, sf_dir)
        latest = latest_row_per_key(p, ["owner", "perm_name"], "event_id")
        key = F.expr("'PUB_K1_' || substr(md5('key7'), 1, 12)")
        owners = (
            latest.where(F.col("present") == 1)
            .where(F.exists("auth.keys", lambda k: k["key"] == key))
            .select("owner")
            .distinct()
        )
        fact = p.hint("shuffle_hash").join(owners, "owner", "left_semi")
        return (
            fact.groupBy("owner")
            .agg(
                F.count("*").cast("long").alias("versions"),
                F.count_distinct("perm_name").cast("long").alias("perms"),
                F.max("block_num").cast("long").alias("last_block"),
            )
            .orderBy("owner")
        )

    paths = {
        "account_profiles": {
            "chooser": lambda: _account_profiles(spark, sf_dir),
            "shuffle": lambda: (profiles_shuffle(), "shuffle_hash"),
        },
        "key_accounts_enriched": {
            "chooser": lambda: _key_accounts_enriched(spark, sf_dir),
            "shuffle": lambda: (keyacc_shuffle(), "shuffle_hash"),
        },
    }

    result: dict = {"sf_dir": sf_dir, "runs": runs, "paths": {}}
    # cold one-time analyze cost, reported honestly
    invalidate_stats()
    t0 = time.perf_counter()
    _account_profiles(spark, sf_dir)
    _key_accounts_enriched(spark, sf_dir)
    result["stats_analyze_sec"] = round(time.perf_counter() - t0, 4)

    for pname, arms in paths.items():
        rows = {}
        entry: dict = {}
        for aname, build in arms.items():
            df, strategy = build()
            rows[aname] = [tuple(r) for r in df.collect()]  # warm + check
            samples = []
            for _ in range(runs):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                build()[0].collect()
                samples.append(time.perf_counter() - t0)
            entry[aname] = {
                "strategy": strategy,
                "median_sec": round(statistics.median(samples), 4),
                "spread_sec": round(max(samples) - min(samples), 4),
            }
            print(pname, aname, entry[aname])
        assert rows["chooser"] == rows["shuffle"], f"{pname}: arms disagree"
        entry["rows"] = len(rows["chooser"])
        result["paths"][pname] = entry
    with open(out_json, "w") as f:
        json.dump(result, f, indent=1)
    print("wrote", out_json)


if __name__ == "__main__":
    main()
