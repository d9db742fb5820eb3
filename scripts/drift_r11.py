"""Round-11 drift recheck (VERDICT r10 item 4): tighten the SF3
variance read on the two rows that moved at SF3 inside wide spreads —
`doc_search_bm25` 2.67 -> 3.38 s (spread 1.20 s) and
`dedup_incremental` 4.98 -> 5.59 s (spread 0.69 s). Re-measure with
the established DRIFT protocol (fresh process/JVM per leg, n>=9,
isolated AND postwarm, quiet host) at `.scale/sf3` so the artifact
pins noise vs real; if real, the plan diff gets named in COVERAGE.

    python scripts/drift_r11.py all [n]     # assembles DRIFT_r11.json
    SPARK_GRAFT_SF_DIR=.scale/sf3 python scripts/drift_r11.py all

Legs delegate to scripts/drift_r08.py (protocol unchanged).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", ".scale/sf3")

QUERIES = ["doc_search_bm25", "dedup_incremental"]


def _run_r08(args: list[str]) -> dict:
    res = subprocess.run(
        [sys.executable, os.path.join(HERE, "drift_r08.py"), *args],
        capture_output=True,
        text=True,
        check=True,
        env={**os.environ, "SPARK_GRAFT_SF_DIR": SF_DIR},
    )
    return json.loads(res.stdout.strip().splitlines()[-1])


def main() -> None:
    n = sys.argv[2] if len(sys.argv) > 2 else "9"
    out: dict = {"round": 11, "sf_dir": SF_DIR, "legs": {}}
    for q in QUERIES:
        out["legs"][f"{q}::isolated"] = _run_r08(["isolated", q, n])
        out["legs"][f"{q}::postwarm"] = _run_r08(["postwarm", q, n])
        print(f"done {q}", file=sys.stderr, flush=True)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
