#!/bin/bash
# Round-12 artifact regeneration — run ALONE on a quiet host (the
# memory recipe): each step sequential, logs to /tmp/r12_artifacts.log
set -x
cd /root/repo

echo "=== step 1: full pytest ==="
python -m pytest tests/ -q 2>&1 | tail -5

echo "=== step 2: DRIFT_r12 (sf3 tail-flag legs + sf10 exponent) ==="
python scripts/drift_r12.py all 9 > DRIFT_r12.json

echo "=== step 3: bench at three scales ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python bench.py 2>/dev/null | tail -1 > BENCH_SF0.1_r12.json
SPARK_GRAFT_SF_DIR=.scale/sf1 python bench.py 2>/dev/null | tail -1 > BENCH_SF1_r12.json
SPARK_GRAFT_SF_DIR=.scale/sf3 python bench.py 2>/dev/null | tail -1 > BENCH_SF3_r12.json

echo "=== step 4: scale curve ==="
python scripts/scale_curve.py BENCH_SF0.1_r12.json BENCH_SF1_r12.json BENCH_SF3_r12.json 10 30 SCALE_r12.json

echo "=== step 5: join chooser ==="
python scripts/bench_chooser_paths_r08.py .scale/sf1 /tmp/chooser_sf1.json 5
python scripts/bench_chooser_paths_r08.py .scale/sf3 /tmp/chooser_sf3.json 5
python - <<'PYEOF'
import json
out = {
    "sf1": json.load(open("/tmp/chooser_sf1.json")),
    "sf3": json.load(open("/tmp/chooser_sf3.json")),
}
json.dump(out, open("JOIN_CHOOSER_BENCH_r12.json", "w"), indent=1)
PYEOF

echo "=== step 6: stream curation ==="
python scripts/bench_stream_curation.py /root/testdata/sf0.1 STREAM_CURATION_BENCH_r12.json

echo "=== step 7: oracle sweep sf0.01 ==="
python tests/oracle_check.py /root/testdata/sf0.01 --json=ORACLE_SELF_r12.json 2>&1 | tail -2

echo "=== step 8: oracle sweep sf0.1 (round-11 new; quadratic DuckDB oracles get 60s each) ==="
python tests/oracle_check.py /root/testdata/sf0.1 --json=ORACLE_SELF_SF01_r12.json --oracle-timeout=60 2>&1 | tail -3

echo "=== ALL DONE ==="
