#!/bin/bash
# Round-15 artifact regeneration — run ALONE on a quiet host (the r13/
# r14 discipline). Steps sequential; log via the caller.
set -x
cd /root/repo

echo "=== step 0: after-plans for every headline row at final HEAD ==="
python scripts/profile_r15.py --sf=/root/testdata/sf0.1 --runs=1 \
    --explain=plans/r15 --suffix=_after --executed=1 \
    --json=/tmp/prof_r15_afterplans.json 2>/dev/null | tail -3

echo "=== step 1: full pytest ==="
python -m pytest tests/ -q 2>&1 | tail -5

echo "=== step 2: DRIFT_r15 (3-arm drift A/B on the r14 flagged rows) ==="
# (skipped here if already produced this session; see /tmp/drift_r15_partial.json)
if [ ! -f DRIFT_r15.json ]; then
    python scripts/drift_r15.py 5 3 > DRIFT_r15.json
fi

echo "=== step 3: bench at four scales ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python bench.py 2>/dev/null | tail -1 > BENCH_SF0.1_r15.json
SPARK_GRAFT_SF_DIR=.scale/sf1 python bench.py 2>/dev/null | tail -1 > BENCH_SF1_r15.json
SPARK_GRAFT_SF_DIR=.scale/sf3 python bench.py 2>/dev/null | tail -1 > BENCH_SF3_r15.json
SPARK_GRAFT_SF_DIR=.scale/sf10 python bench.py 2>/dev/null | tail -1 > BENCH_SF10_r15.json

echo "=== step 3b: 8-core leg (abi fan-out scaling pin, VERDICT item 2) ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=8 python bench.py 2>/dev/null | tail -1 > BENCH_SF0.1_c8_r15.json

echo "=== step 4: scale curve (4-point) ==="
python scripts/scale_curve.py BENCH_SF0.1_r15.json BENCH_SF1_r15.json \
    BENCH_SF3_r15.json BENCH_SF10_r15.json 10 30 100 SCALE_r15.json

echo "=== step 5: join chooser (5M fact floor, r14 bracket) ==="
python scripts/bench_chooser_paths_r08.py .scale/sf1 /tmp/chooser_sf1_r15.json 5
python scripts/bench_chooser_paths_r08.py .scale/sf3 /tmp/chooser_sf3_r15.json 5
python - <<'PYEOF'
import json
out = {
    "sf1": json.load(open("/tmp/chooser_sf1_r15.json")),
    "sf3": json.load(open("/tmp/chooser_sf3_r15.json")),
}
json.dump(out, open("JOIN_CHOOSER_BENCH_r15.json", "w"), indent=1)
PYEOF

echo "=== step 6: stream curation (kept-set must stay 563 docs) ==="
python scripts/bench_stream_curation.py /root/testdata/sf0.1 STREAM_CURATION_BENCH_r15.json

echo "=== step 7: oracle sweep sf0.01 (expect 216/216) ==="
python tests/oracle_check.py /root/testdata/sf0.01 --json=ORACLE_SELF_r15.json 2>&1 | tail -2

echo "=== step 8: oracle sweep sf0.1 (quadratic DuckDB oracles get 60s each) ==="
python tests/oracle_check.py /root/testdata/sf0.1 --json=ORACLE_SELF_SF01_r15.json --oracle-timeout=60 2>&1 | tail -3

echo "=== ALL DONE ==="
