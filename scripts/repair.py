"""hyp-repair for the Spark lake — scan a block spool for holes, fill
them from a state-history endpoint, verify (src/cli/hyp-repair.ts,
repair-cli/scan.ts + repair.ts).

    python scripts/repair.py SPOOL_DIR [--host H] [--port P]
        [--start N] [--head N] [--scan-only] [--readers N]

``--scan-only`` prints the gap report without connecting anywhere
(the CLI's dry run); otherwise the holes are re-requested over the
binary SHIP envelope and the directory is re-scanned to a clean
report.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("spool_dir")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--start", type=int, default=None)
    ap.add_argument("--head", type=int, default=None)
    ap.add_argument("--readers", type=int, default=4)
    ap.add_argument("--scan-only", action="store_true")
    args = ap.parse_args()

    from hyperion_history_api_spark.session import get_spark
    from hyperion_history_api_spark.streaming.repair import (
        repair_spool,
        scan_gaps,
    )

    spark = get_spark("hyp-repair")
    spark.sparkContext.setLogLevel("ERROR")
    if args.scan_only:
        gaps = scan_gaps(
            spark.read.parquet(args.spool_dir),
            "block_num",
            expected_start=args.start,
            expected_head=args.head,
        ).collect()
        print(
            json.dumps(
                {
                    "gaps": [[r["gap_start"], r["gap_end"]] for r in gaps],
                    "missing": sum(r["missing"] for r in gaps),
                }
            )
        )
        return
    report = repair_spool(
        spark,
        args.host,
        args.port,
        args.spool_dir,
        expected_start=args.start,
        expected_head=args.head,
        max_readers=args.readers,
    )
    print(json.dumps(report))


if __name__ == "__main__":
    main()
