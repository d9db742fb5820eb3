"""Round-13 drift legs (VERDICT r12 tasks 1-4):

1. `dedup_exact` lost its presentation-only global orderBy (the one
   measured n*log n term: DRIFT_r12 exponent 1.123 at 30x->100x) —
   done-gate: isolated 30x->100x exponent <= 1.0 with the row still
   oracle-green.
2. `dedup_minhash_lsh` sf3 — the 30x headline dominator after the r12
   curation fusion; the r11 stretch bar is median <= 10 s.
3. The two r12 driver-bench movers without a control leg
   (`embedding_cosine_topk` +57%, `doc_dsir_weight` +31%, code
   untouched in r12) — fresh-JVM sf0.1 medians either reproduce the
   move (real -> investigate) or pin it as session/host condition.

    python scripts/drift_r13.py all [n]     # assembles DRIFT_r13.json

Legs delegate to scripts/drift_r08.py (protocol unchanged: fresh
process/JVM per leg, quiet host).
"""

from __future__ import annotations

import json
import math
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
SF01 = "/root/testdata/sf0.1"
SF3 = os.path.join(REPO, ".scale", "sf3")
SF10 = os.path.join(REPO, ".scale", "sf10")

SCALE_QUERIES = ["dedup_exact", "dedup_minhash_lsh"]
MOVER_QUERIES = ["embedding_cosine_topk", "doc_dsir_weight"]


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
        "round": 13,
        "question": "dedup_exact sort-drop exponent; minhash sf3 bar; "
        "r12 uncontrolled movers (cosine_topk/dsir) condition-or-code",
        "legs": {},
    }
    for q in SCALE_QUERIES:
        out["legs"][f"{q}::sf3::isolated"] = _run_r08(
            ["isolated", q, n], SF3
        )
        print(f"done {q} sf3", file=sys.stderr, flush=True)
        if os.path.isdir(SF10):
            out["legs"][f"{q}::sf10::isolated"] = _run_r08(
                ["isolated", q, "5"], SF10
            )
            print(f"done {q} sf10", file=sys.stderr, flush=True)
    for q in MOVER_QUERIES:
        out["legs"][f"{q}::sf0.1::isolated"] = _run_r08(
            ["isolated", q, n], SF01
        )
        print(f"done {q} sf0.1", file=sys.stderr, flush=True)
    for q in SCALE_QUERIES:
        a = out["legs"].get(f"{q}::sf3::isolated", {}).get("median")
        b = out["legs"].get(f"{q}::sf10::isolated", {}).get("median")
        if a and b:
            out["legs"][f"{q}::exponent_30x_to_100x"] = round(
                math.log(b / a) / math.log(100 / 30), 3
            )
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
