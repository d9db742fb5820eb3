"""ES bulk connector end-to-end (sources/es_bulk.py) against a stdlib
HTTP stub implementing the ``_bulk`` endpoint's request/response shape
— the wire protocol of src/indexer/helpers/elastic-routes.ts driven
over real sockets from real executors (local mode: tasks POST to
127.0.0.1 exactly as cluster executors would POST to an ES node)."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest
from pyspark.sql import functions as F

from hyperion_history_api_spark.sources.es_bulk import (
    block_router,
    es_bulk_format,
    post_bulk,
    write_bulk_files,
)
from hyperion_history_api_spark.tables import load_tables

SF_DIR = "/root/testdata/sf0.001"


class _EsStub:
    """Minimal ES: stores docs per (index, _id); scripted updates
    apply merge semantics; injectable per-id transient failures to
    exercise the ackOrNack retry path."""

    def __init__(self):
        self.lock = threading.Lock()
        self.docs: dict[tuple[str, str], dict] = {}
        self.fail_ids: dict[str, int] = {}  # _id -> remaining 429s
        self.requests = 0

    def handle(self, lines: list[str]) -> dict:
        items, errors = [], False
        i = 0
        with self.lock:
            self.requests += 1
            while i < len(lines):
                meta = json.loads(lines[i])
                verb = next(iter(meta))
                m = meta[verb]
                _id = str(m["_id"])
                if "_index" not in m:
                    # real ES rejects any action line without _index on
                    # the global /_bulk endpoint; the stub must too, or
                    # it silently passes ops a real cluster would 400
                    items.append({verb: {"_id": _id, "status": 400}})
                    errors = True
                    i += 2 if verb in ("index", "update") else 1
                    continue
                if self.fail_ids.get(_id, 0) > 0:
                    self.fail_ids[_id] -= 1
                    items.append({verb: {"_id": _id, "status": 429}})
                    errors = True
                    i += 2 if verb in ("index", "update") else 1
                    continue
                if verb == "index":
                    body = json.loads(lines[i + 1])
                    self.docs[(m["_index"], _id)] = body
                    items.append({verb: {"_id": _id, "status": 201}})
                    i += 2
                elif verb == "update":
                    body = json.loads(lines[i + 1])
                    params = body["script"]["params"]
                    key = (m["_index"], _id)
                    cur = self.docs.get(key, {})
                    # the updateByBlock stored script: newer block wins
                    if params.get("block_num", 0) >= cur.get("block_num", -1):
                        self.docs[key] = {**cur, **params}
                    items.append({verb: {"_id": _id, "status": 200}})
                    i += 2
                elif verb == "delete":
                    self.docs.pop((m["_index"], _id), None)
                    items.append({verb: {"_id": _id, "status": 200}})
                    i += 1
                else:  # pragma: no cover
                    raise AssertionError(verb)
        return {"took": 1, "errors": errors, "items": items}


@pytest.fixture()
def es(request):
    stub = _EsStub()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_POST(self):
            assert self.path == "/_bulk"
            assert self.headers["Content-Type"] == "application/x-ndjson"
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


def test_index_ops_roundtrip_with_block_routing(spark, es):
    url, stub = es
    ev = load_tables(spark, SF_DIR)["events"].select(
        "event_id", "user_id", "event_type", "value"
    ).limit(500)
    fmt = es_bulk_format(
        ev,
        op="index",
        index_name="chain-action",
        id_col="event_id",
        router=block_router(F.col("event_id"), span=200),
    )
    # formatting is pure JVM: no python udf / mapInPandas in THIS plan
    assert "pythonUDF" not in fmt._jdf.queryExecution().executedPlan().toString()
    summary = post_bulk(fmt, url, max_ops_per_request=100).collect()
    assert sum(r["ops"] for r in summary) == 500
    assert all(r["retried"] == 0 for r in summary)
    # every doc landed under its routed partition index with its body
    want = {str(r["event_id"]): r.asDict() for r in ev.collect()}
    assert len(stub.docs) == 500
    for (idx, _id), body in stub.docs.items():
        assert idx == f"chain-action-{int(_id) // 200:06d}"
        assert body == want[_id]


def test_scripted_upsert_newer_block_wins_and_delete(spark, es):
    url, stub = es
    rows = spark.createDataFrame(
        [(1, "alice", 10, 100), (1, "alice", 25, 300), (2, "bob", 7, 50)],
        "id int, owner string, amount int, block_num int",
    )
    fmt = es_bulk_format(
        rows, op="update_script", index_name="state", id_col="id"
    )
    # the exact makeScriptedOp shape (elastic-routes.ts:23-28)
    sample = fmt.where(F.col("_id") == "2").first()["ndjson"].split("\n")
    assert json.loads(sample[0]) == {
        "update": {"_id": "2", "_index": "state", "retry_on_conflict": 3}
    }
    body = json.loads(sample[1])
    assert body["script"]["id"] == "updateByBlock"
    assert body["scripted_upsert"] is True and body["upsert"] == {}
    post_bulk(fmt.coalesce(1), url).collect()
    merged = next(v for (i, d), v in stub.docs.items() if d == "1")
    assert merged["block_num"] == 300 and merged["amount"] == 25
    dels = es_bulk_format(
        rows.where("id = 2"), op="delete", index_name="state", id_col="id"
    )
    post_bulk(dels, url).collect()
    assert not any(d == "2" for (_, d) in stub.docs)


def test_per_item_retry_after_transient_failures(spark, es):
    url, stub = es
    stub.fail_ids = {"3": 2, "7": 1}  # two ids 429 transiently
    ev = load_tables(spark, SF_DIR)["events"].select(
        "event_id", "user_id"
    ).where(F.col("event_id") <= 10)
    fmt = es_bulk_format(
        ev, op="index", index_name="retrytest", id_col="event_id"
    )
    summary = post_bulk(
        fmt.coalesce(1), url, backoff_sec=0.01
    ).collect()
    assert sum(r["retried"] for r in summary) == 3  # 2 + 1 retried sends
    # ops reports the ORIGINAL request size, not the last (retry)
    # response's item count — a partially-failed request used to
    # under-count by everything that succeeded on the first attempt
    assert sum(r["ops"] for r in summary) == ev.count()
    assert len([k for k in stub.docs if k[0] == "retrytest"]) == ev.count()
    # permanent failure -> the task raises (nackAll analog)
    stub.fail_ids = {"5": 99}
    with pytest.raises(Exception, match="failed after"):
        post_bulk(fmt.coalesce(1), url, backoff_sec=0.01, max_retries=1).collect()


def test_file_mode_lands_identical_ndjson(spark, es, tmp_path):
    url, stub = es
    ev = load_tables(spark, SF_DIR)["events"].select(
        "event_id", "event_type"
    ).where(F.col("event_id").between(1, 40))
    fmt = es_bulk_format(
        ev,
        op="index",
        index_name="filetest",
        id_col="event_id",
        router=block_router(F.col("event_id"), span=21),
    )
    write_bulk_files(fmt, str(tmp_path / "bulk"))
    # one dir per routed ES index partition, same NDJSON bytes the
    # HTTP transport sends (one protocol, two transports); each entry
    # is meta\nsource, so 40 entries land as 80 text lines
    landed = spark.read.text(str(tmp_path / "bulk"))
    assert landed.count() == 80
    import os

    parts = {
        d for d in os.listdir(tmp_path / "bulk") if d.startswith("target_index=")
    }
    assert parts == {"target_index=filetest-000000", "target_index=filetest-000001"}
    want_lines = set()
    for r in fmt.collect():
        want_lines.update(r["ndjson"].split("\n"))
    got_lines = {r["value"] for r in landed.collect()}
    assert got_lines == want_lines
