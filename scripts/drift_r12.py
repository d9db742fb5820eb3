"""Round-12 drift recheck (VERDICT r11 item 2): pin the two NEW
SCALE_r11 tail flags with data. `dedup_exact` (0.27/0.60/1.53 s at
sf0.1/sf1/sf3, 10x->30x exponent 1.29) and
`tpch_q13_customer_distribution` (0.31/0.49/1.16 s, exponent 1.35)
flipped `tail_superlinear` this round after being clean in r10 — the
hypothesis is fixed-overhead arithmetic (the r11 constant-overhead
removal shrank the small-SF denominators), not a real growth term.

Two instruments:

1. the established DRIFT protocol (fresh process/JVM per leg, n>=9,
   isolated AND postwarm, quiet host) at `.scale/sf3` — pins the SF3
   medians outside bench-session conditions;
2. a LARGER scale point: `.scale/sf10` (a 100x replica via
   scripts/make_scale.py) — the 30x->100x exponent separates a
   constant from a growth term far better than 10x->30x can. A row
   whose 10x->30x step was really constant+linear will read a
   30x->100x exponent well under the flagged 1.3.

    python scripts/drift_r12.py all [n]     # assembles DRIFT_r12.json

Legs delegate to scripts/drift_r08.py (protocol unchanged).
"""

from __future__ import annotations

import json
import math
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
SF3 = os.path.join(REPO, ".scale", "sf3")
SF10 = os.path.join(REPO, ".scale", "sf10")

QUERIES = ["dedup_exact", "tpch_q13_customer_distribution"]


def _run_r08(args: list[str], sf_dir: str) -> dict:
    res = subprocess.run(
        [sys.executable, os.path.join(HERE, "drift_r08.py"), *args],
        capture_output=True,
        text=True,
        check=True,
        env={**os.environ, "SPARK_GRAFT_SF_DIR": sf_dir},
    )
    return json.loads(res.stdout.strip().splitlines()[-1])


def main() -> None:
    n = sys.argv[2] if len(sys.argv) > 2 else "9"
    out: dict = {
        "round": 12,
        "question": "SCALE_r11 tail flags: fixed-overhead arithmetic "
        "or real growth term?",
        "legs": {},
    }
    for q in QUERIES:
        out["legs"][f"{q}::sf3::isolated"] = _run_r08(
            ["isolated", q, n], SF3
        )
        out["legs"][f"{q}::sf3::postwarm"] = _run_r08(
            ["postwarm", q, n], SF3
        )
        print(f"done {q} sf3", file=sys.stderr, flush=True)
        if os.path.isdir(SF10):
            out["legs"][f"{q}::sf10::isolated"] = _run_r08(
                ["isolated", q, "5"], SF10
            )
            print(f"done {q} sf10", file=sys.stderr, flush=True)
    # 30x -> 100x exponent from the isolated medians
    for q in QUERIES:
        a = out["legs"].get(f"{q}::sf3::isolated", {}).get("median")
        b = out["legs"].get(f"{q}::sf10::isolated", {}).get("median")
        if a and b:
            out["legs"][f"{q}::exponent_30x_to_100x"] = round(
                math.log(b / a) / math.log(100 / 30), 3
            )
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
