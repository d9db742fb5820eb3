#!/bin/bash
# Round-14 artifact regeneration — run ALONE on a quiet host (memory
# recipe). Launched EARLY in the round (the r13 discipline). Steps
# sequential; log via the caller.
set -x
cd /root/repo

echo "=== step 1: full pytest ==="
python -m pytest tests/ -q 2>&1 | tail -5

echo "=== step 2: DRIFT_r14 (interleaved minhash A/B + tpch/incremental pins) ==="
python scripts/drift_r14.py all 7 3 > DRIFT_r14.json

echo "=== step 3: bench at four scales ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python bench.py 2>/dev/null | tail -1 > BENCH_SF0.1_r14.json
SPARK_GRAFT_SF_DIR=.scale/sf1 python bench.py 2>/dev/null | tail -1 > BENCH_SF1_r14.json
SPARK_GRAFT_SF_DIR=.scale/sf3 python bench.py 2>/dev/null | tail -1 > BENCH_SF3_r14.json
SPARK_GRAFT_SF_DIR=.scale/sf10 python bench.py 2>/dev/null | tail -1 > BENCH_SF10_r14.json

echo "=== step 4: scale curve (4-point) ==="
python scripts/scale_curve.py BENCH_SF0.1_r14.json BENCH_SF1_r14.json \
    BENCH_SF3_r14.json BENCH_SF10_r14.json 10 30 100 SCALE_r14.json

echo "=== step 5: join chooser (floor recalibrated to 5M this round) ==="
python scripts/bench_chooser_paths_r08.py .scale/sf1 /tmp/chooser_sf1_r14.json 5
python scripts/bench_chooser_paths_r08.py .scale/sf3 /tmp/chooser_sf3_r14.json 5
python - <<'PYEOF'
import json
out = {
    "sf1": json.load(open("/tmp/chooser_sf1_r14.json")),
    "sf3": json.load(open("/tmp/chooser_sf3_r14.json")),
}
json.dump(out, open("JOIN_CHOOSER_BENCH_r14.json", "w"), indent=1)
PYEOF

echo "=== step 6: stream curation (kept-set must stay 563 docs) ==="
python scripts/bench_stream_curation.py /root/testdata/sf0.1 STREAM_CURATION_BENCH_r14.json

echo "=== step 7: oracle sweep sf0.01 (expect 216/216) ==="
python tests/oracle_check.py /root/testdata/sf0.01 --json=ORACLE_SELF_r14.json 2>&1 | tail -2

echo "=== step 8: oracle sweep sf0.1 (quadratic DuckDB oracles get 60s each) ==="
python tests/oracle_check.py /root/testdata/sf0.1 --json=ORACLE_SELF_SF01_r14.json --oracle-timeout=60 2>&1 | tail -3

echo "=== ALL DONE ==="
