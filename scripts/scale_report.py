"""Build the scale-proof artifact (VERDICT r2 #7): per-query scaling
factors between two bench runs (default sf0.1 vs the 10x replicated
sf1 built by scripts/make_scale.py).

A query is flagged when its time grows faster than the data ratio
(superlinear) with a small constant-cost allowance; top-k / point
queries are expected to grow sublinearly thanks to partition pruning
and pushed limits.

Usage: python scripts/scale_report.py small.json big.json ratio out.json
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    small_p, big_p, ratio_s, out_p = sys.argv[1:5]
    ratio = float(ratio_s)
    small = json.load(open(small_p))
    big = json.load(open(big_p))
    qs: dict[str, dict] = {}
    flagged: list[str] = []
    for name, t_small in small["queries"].items():
        t_big = big["queries"].get(name)
        if t_big is None:
            continue
        # allow 0.3 s of fixed per-query overhead (job scheduling,
        # plan compile) before judging growth
        grow = (t_big - 0.3) / max(t_small - 0.3, 1e-3) if t_small > 0.35 else t_big / t_small
        entry = {
            "sec_small": t_small,
            "sec_big": t_big,
            "growth": round(t_big / t_small, 2),
            "adj_growth": round(grow, 2),
            "superlinear": grow > ratio * 1.2,
        }
        qs[name] = entry
        if entry["superlinear"]:
            flagged.append(name)
    out = {
        "sf_small": small.get("sf"),
        "sf_big": big.get("sf"),
        "data_ratio": ratio,
        "queries": qs,
        "superlinear": flagged,
        "ingest_events_per_sec_per_core": {
            "small": small.get("ingest_events_per_sec_per_core"),
            "big": big.get("ingest_events_per_sec_per_core"),
        },
        "stream_microbatch_sec": {
            "small": small.get("stream_microbatch_sec"),
            "big": big.get("stream_microbatch_sec"),
        },
        "headline_total_sec": {
            "small": small.get("value"),
            "big": big.get("value"),
        },
    }
    with open(out_p, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps({"superlinear": flagged, "n": len(qs)}))


if __name__ == "__main__":
    main()
