"""Round-14 drift legs (VERDICT r13 items 1 + 3).

1. SETTLE the dedup_minhash_lsh sf3 number: r13 ended with a 25%
   protocol-identical split (builder DRIFT n=9 median 10.2 s vs judge
   quiet-host probes 12.7-13.8 s, same day). This script runs the two
   timing modes INTERLEAVED in one host window — alternating fresh-JVM
   legs of the collect-timed protocol (A) and the new engine-side
   count+checksum protocol (B), n pairs, per-sample busy-core canary —
   so host state is shared across arms and the harness-collect term
   (~60% of wall per r13 instrumentation: 2.4M-pair Python row pickle,
   which no 100 TB pipeline pays) is measured, not estimated.

2. PIN the three un-pinned scale flags with isolated fresh-JVM legs:
   - tpch_q3_shipping_priority / tpch_q5_region_volume: sf1+sf3+sf10
     legs -> isolated 10x->30x and 30x->100x exponents (expected: the
     sf3 in-bench flags were the documented ~1.3-core kernel-I/O
     systematic of that leg, isolated exponents <= ~1.0);
   - dedup_incremental: sf3+sf10 legs + result_rows at both scales ->
     is the 3.82x in-bench step output growth or plan growth?

Usage: python scripts/drift_r14.py all [pairs] [n_per_leg]
Writes DRIFT_r14.json. Protocol: fresh process/JVM per leg
(scripts/drift_r08.py), quiet host, canary logged per sample.
"""

from __future__ import annotations

import json
import math
import os
import statistics
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(REPO, ".scale", "sf1")
SF3 = os.path.join(REPO, ".scale", "sf3")
SF10 = os.path.join(REPO, ".scale", "sf10")

TPCH_FLAGS = ["tpch_q3_shipping_priority", "tpch_q5_region_volume"]


def _run_r08(args: list[str], sf_dir: str) -> dict:
    res = subprocess.run(
        [sys.executable, os.path.join(HERE, "drift_r08.py"), *args],
        capture_output=True,
        text=True,
        check=True,
        env={**os.environ, "SPARK_GRAFT_SF_DIR": sf_dir},
    )
    return json.loads(res.stdout.strip().splitlines()[-1])


def _exponent(a: float | None, b: float | None, ratio: float) -> float | None:
    if not a or not b:
        return None
    return round(math.log(b / a) / math.log(ratio), 3)


def main() -> None:
    pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    n_leg = sys.argv[3] if len(sys.argv) > 3 else "3"
    out: dict = {
        "round": 14,
        "question": "minhash sf3 collect-vs-engine split (interleaved "
        "A/B, one host window); tpch_q3/q5 + dedup_incremental "
        "scale-flag pins",
        "legs": {},
    }

    # ---- 1. interleaved A/B: collect (A) vs engine (B), fresh JVM each
    ab: dict = {"pairs": pairs, "n_per_leg": int(n_leg), "A": [], "B": []}
    for i in range(pairs):
        a = _run_r08(["isolated", "dedup_minhash_lsh", n_leg], SF3)
        print(
            f"pair {i} A(collect) median={a['median']} "
            f"canary={a['busy_cores_per_sample']}",
            file=sys.stderr,
            flush=True,
        )
        b = _run_r08(["isolated_engine", "dedup_minhash_lsh", n_leg], SF3)
        print(
            f"pair {i} B(engine)  median={b['median']} "
            f"canary={b['busy_cores_per_sample']}",
            file=sys.stderr,
            flush=True,
        )
        ab["A"].append(a)
        ab["B"].append(b)
    med_a = round(statistics.median(x["median"] for x in ab["A"]), 4)
    med_b = round(statistics.median(x["median"] for x in ab["B"]), 4)
    ab["median_collect"] = med_a
    ab["median_engine"] = med_b
    ab["harness_collect_share"] = round(1 - med_b / med_a, 3)
    ab["result_rows"] = ab["A"][0]["result_rows"]
    out["legs"]["dedup_minhash_lsh::sf3::interleaved_ab"] = ab

    # ---- 2. scale-flag pins
    for q in TPCH_FLAGS:
        for tag, sf in (("sf1", SF1), ("sf3", SF3), ("sf10", SF10)):
            if os.path.isdir(sf):
                out["legs"][f"{q}::{tag}::isolated"] = _run_r08(
                    ["isolated", q, "5"], sf
                )
                print(f"done {q} {tag}", file=sys.stderr, flush=True)
        m1 = out["legs"].get(f"{q}::sf1::isolated", {}).get("median")
        m3 = out["legs"].get(f"{q}::sf3::isolated", {}).get("median")
        m10 = out["legs"].get(f"{q}::sf10::isolated", {}).get("median")
        out["legs"][f"{q}::exponent_10x_to_30x"] = _exponent(m1, m3, 3.0)
        out["legs"][f"{q}::exponent_30x_to_100x"] = _exponent(
            m3, m10, 100 / 30
        )
    for tag, sf in (("sf3", SF3), ("sf10", SF10)):
        if os.path.isdir(sf):
            out["legs"][f"dedup_incremental::{tag}::isolated"] = _run_r08(
                ["isolated", "dedup_incremental", "5"], sf
            )
            print(f"done dedup_incremental {tag}", file=sys.stderr, flush=True)
    m3 = out["legs"].get("dedup_incremental::sf3::isolated", {}).get("median")
    m10 = out["legs"].get("dedup_incremental::sf10::isolated", {}).get(
        "median"
    )
    out["legs"]["dedup_incremental::exponent_30x_to_100x"] = _exponent(
        m3, m10, 100 / 30
    )
    r3 = out["legs"].get("dedup_incremental::sf3::isolated", {}).get(
        "result_rows"
    )
    r10 = out["legs"].get("dedup_incremental::sf10::isolated", {}).get(
        "result_rows"
    )
    if r3 and r10:
        out["legs"]["dedup_incremental::rows_ratio_30x_to_100x"] = round(
            r10 / r3, 3
        )
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
