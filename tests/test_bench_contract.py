"""Driver-contract pin for the bench CLI (round-15, r14 VERDICT item
3: the driver could not parse the r13 bench output — ``prev_bench_ok:
false`` — so round-over-round comparison silently degraded; whatever
the cause, every future HEAD must provably emit the contract).

Asserts, by actually running ``python bench.py`` once at the smallest
SF with 1 timed run:

- stdout is EXACTLY one line and that line parses as JSON;
- the required driver keys are present with the right shapes;
- every round-14 headline query name is still in ``queries`` (names
  may be ADDED, never removed or renamed — a missing name makes the
  round a regression regardless of speed).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# the r14 artifact's query set — the floor the driver diffs against
R14_QUERIES = [
    "embedding_quantized_topk",
    "doc_pack_sequences",
    "corpus_curation_full",
    "embedding_semdedup_k256",
    "doc_search_bm25_indexed",
    "dedup_incremental",
    "get_actions_by_account",
    "terms_agg_event_type",
    "date_histogram_daily",
    "get_table_state_latest",
    "abi_asof_join",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_region_volume",
    "tpch_q13_customer_distribution",
    "tpch_q18_large_volume_customer",
    "dedup_exact",
    "dedup_bloom_probe",
    "embedding_cosine_topk",
    "doc_dsir_weight",
    "dedup_minhash_lsh",
    "doc_search_tfidf",
    "doc_search_bm25",
    "hyp_actions_account_disjunction",
    "hyp_key_accounts",
    "abi_binary_decode",
    "date_histogram_cumulative",
    "user_sessions",
]


def test_bench_emits_exactly_one_parseable_json_line(tmp_path):
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = os.environ.get(
        "SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.001"
    )
    env["SPARK_GRAFT_RUNS"] = "1"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=1200,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1, f"bench stdout must be ONE line, got {len(lines)}"
    payload = json.loads(lines[0])
    assert payload["metric"] == "headline_queries_total"
    assert payload["unit"] == "sec"
    assert isinstance(payload["value"], (int, float))
    assert isinstance(payload["sf"], (int, float))
    for key in (
        "queries",
        "queries_median",
        "queries_spread",
        "ingest_events_per_sec_per_core",
        "stream_microbatch_sec",
    ):
        assert key in payload, f"missing contract key {key}"
    missing = [q for q in R14_QUERIES if q not in payload["queries"]]
    assert not missing, f"headline queries dropped from bench: {missing}"
    for name, sec in payload["queries"].items():
        assert isinstance(sec, (int, float)) and sec >= 0, (name, sec)
