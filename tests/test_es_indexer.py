"""The indexer loop end-to-end (streaming/es_indexer.py): spool files
→ foreachBatch → incremental lake refresh → ES _bulk POSTs against the
stub ES over real sockets — with injected 429s exercising the per-item
retry path, and a mid-loop crash proving the at-least-once replay
converges (doc count == lake count; state = latest per key) because
every op is _id-addressed. VERDICT r8 item 6's done-gate."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest
from pyspark.sql import functions as F

from hyperion_history_api_spark.sources import lake
from hyperion_history_api_spark.streaming.es_indexer import (
    make_es_indexer_sink,
    run_indexer,
)
from hyperion_history_api_spark.tables import load_tables
from tests.test_es_bulk import _EsStub

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def iso_lake(tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_LAKE_DIR", str(tmp_path / "lake"))
    yield tmp_path / "lake"


@pytest.fixture()
def es():
    stub = _EsStub()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_POST(self):
            n = int(self.headers["Content-Length"])
            lines = [
                ln
                for ln in self.rfile.read(n).decode().split("\n")
                if ln.strip()
            ]
            body = json.dumps(stub.handle(lines)).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", stub
    srv.shutdown()


def _spool(spark, tmp_path, n_files: int = 3, rows_per_file: int = 40):
    """Seed a spool dir with disjoint event slices (the SHIP readers'
    landing-zone shape); FAR offset keeps the isolated lake's touched
    partitions away from the base fixture's."""
    offset = 5 * lake.BLOCK_PART_SIZE * 5
    ev = (
        load_tables(spark, SF_DIR)["events"]
        .orderBy("event_id")
        .limit(n_files * rows_per_file)
        .withColumn("event_id", F.col("event_id") + F.lit(offset))
        .collect()
    )
    spool = tmp_path / "spool"
    spool.mkdir()
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    for i in range(n_files):
        chunk = ev[i * rows_per_file : (i + 1) * rows_per_file]
        stage = tmp_path / f"stage{i}"
        spark.createDataFrame(
            [
                (r["event_id"], r["ts"], r["user_id"], r["event_type"],
                 r["value"], r["props"])
                for r in chunk
            ],
            schema,
        ).coalesce(1).write.parquet(str(stage))
        # flat landing like the SHIP spool (the file stream does not
        # traverse nested dirs without recursiveFileLookup)
        part = next(stage.glob("part-*.parquet"))
        part.rename(spool / f"spool-{i:03d}.parquet")
    return str(spool), [r["event_id"] for r in ev]


def test_indexer_loop_with_retries(spark, tmp_path, iso_lake, es):
    """Happy path + injected 429s: every action doc lands exactly once
    per _id, with the per-item retry (not a whole-request replay)
    absorbing the transient failures."""
    url, stub = es
    spool, ids = _spool(spark, tmp_path)
    # two ids fail twice each before succeeding
    stub.fail_ids = {str(ids[3]): 2, str(ids[7]): 2}
    summaries = {}
    q = run_indexer(
        spark,
        SF_DIR,
        spool,
        url,
        str(tmp_path / "cp"),
        on_summary=lambda b, s: summaries.update({b: s}),
    )
    q.awaitTermination()
    action_docs = {k: v for k, v in stub.docs.items() if k[0].startswith("chain-action-")}
    assert len(action_docs) == len(ids)
    assert {int(k[1]) for k in action_docs} == set(ids)
    assert sum(s["retried"] for s in summaries.values()) >= 2
    # the lake merged the same rows (refresh path ran)
    acts = lake.lake_table(spark, SF_DIR, "actions")
    got = {
        r["global_sequence"]
        for r in acts.where(F.col("global_sequence") >= min(ids))
        .select("global_sequence")
        .collect()
    }
    assert got == set(ids)


def test_crash_replay_converges(spark, tmp_path, iso_lake, es):
    """Crash AFTER the ES writes of one batch but BEFORE its
    checkpoint commit: the restart replays that batch (at-least-once)
    and the _id-addressed ops + newer-block-wins script converge —
    doc count == spool count, state == latest per key, no dupes."""
    url, stub = es
    spool, ids = _spool(spark, tmp_path)
    boom = {"armed": True}

    def fail_once(batch_id: int) -> None:
        if boom["armed"]:
            boom["armed"] = False
            raise RuntimeError("injected crash before checkpoint commit")

    q = run_indexer(
        spark, SF_DIR, spool, url, str(tmp_path / "cp"), fail_hook=fail_once
    )
    with pytest.raises(Exception):
        q.awaitTermination()
    docs_after_crash = len(stub.docs)
    assert docs_after_crash > 0  # the POST happened, the commit did not

    # restart: the uncommitted batch replays, later batches follow
    q2 = run_indexer(spark, SF_DIR, spool, url, str(tmp_path / "cp"))
    q2.awaitTermination()
    action_docs = {
        k: v for k, v in stub.docs.items() if k[0].startswith("chain-action-")
    }
    assert {int(k[1]) for k in action_docs} == set(ids)  # converged, no dupes
    # state docs: latest (block_num, value) per key across the spool
    # the stub stores scripted updates under its default "state"
    # index (update metas carry no _index)
    state_docs = {
        k[1]: v
        for k, v in stub.docs.items()
        if not k[0].startswith("chain-action-")
    }
    ev = load_tables(spark, SF_DIR)["events"].limit(len(ids))
    from pyspark.sql import Window

    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("event_id").desc()
    )
    offset = 5 * lake.BLOCK_PART_SIZE * 5
    latest = (
        ev.orderBy("event_id")
        .withColumn("event_id", F.col("event_id") + F.lit(offset))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .collect()
    )
    for r in latest:
        key = f"{r['user_id']}-{r['event_type']}"
        assert key in state_docs, key
        assert state_docs[key]["block_num"] == r["event_id"] // 5 + 1


def test_indexer_rejects_wrong_schema_feed(spark, tmp_path, es):
    """Pointing the indexer at a raw SHIP block spool (block_num/
    payload files — no shared columns) reads as all-NULL declared
    columns; the sink must fail fast instead of null-keying the lake
    merge and the ES ops."""
    url, _ = es
    sink = make_es_indexer_sink(spark, str(tmp_path / "lake"), url)
    bad = spark.createDataFrame(
        [(None, None, None, None, None, None)],
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string",
    )
    with pytest.raises(ValueError, match="NULL event_id"):
        sink(bad, 0)
