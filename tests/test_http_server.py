"""End-to-end tests of the stdlib HTTP serving layer
(api/http_server.py): real sockets, real requests via urllib, payloads
compared against the engine plans they wrap. Covers the REST envelope
(get_actions.ts:88-131), the timedQuery cache (functions.ts:946-1006),
guard-violation replies, and the SSE bounded-replay stream
(socketManager.ts replay path)."""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import pytest
from pyspark.sql import functions as F

from hyperion_history_api_spark.api.http_server import (
    HyperionAPI,
    serve_background,
)
from hyperion_history_api_spark.api.serving_cache import ResponseCache
from hyperion_history_api_spark.tables import load_tables

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def server(spark):
    api = HyperionAPI(spark, SF_DIR, cache=ResponseCache(default_ttl=60.0))
    srv, thread = serve_background(api)
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    yield base, api
    srv.shutdown()


def _get(base: str, path: str) -> dict:
    with urllib.request.urlopen(base + path, timeout=120) as r:
        return json.loads(r.read())


def test_health(server):
    base, _ = server
    body = _get(base, "/v2/health")
    assert body["health"][0]["status"] == "OK"
    lake = body["health"][1]["service_data"]
    assert lake["last_indexed_block"] > 0


def test_get_actions_envelope_matches_engine(server, spark):
    base, _ = server
    body = _get(base, "/v2/history/get_actions?account=7&limit=5")
    # envelope shape (get_actions.ts:88-131)
    assert set(body) >= {
        "query_time_ms",
        "cached",
        "total",
        "actions",
        "last_indexed_block",
    }
    assert body["total"]["relation"] == "eq"
    # payload equals the engine plan it wraps
    ev = load_tables(spark, SF_DIR)["events"]
    want = [
        r["event_id"]
        for r in ev.where(F.col("user_id") == 7)
        .orderBy(F.col("event_id").desc())
        .limit(5)
        .select("event_id")
        .collect()
    ]
    assert [a["event_id"] for a in body["actions"]] == want
    assert body["total"]["value"] == ev.where(F.col("user_id") == 7).count()


def test_response_cache_hit_and_guard_errors(server):
    base, api = server
    p = "/v2/history/get_actions?account=3&limit=3"
    first = _get(base, p)
    assert first["cached"] is False
    second = _get(base, p)
    assert second["cached"] is True  # timedQuery hit
    assert second["actions"] == first["actions"]
    assert api.cache.hits >= 1
    # limit guard → 400 with an error body (functions.ts:246-250)
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(base, "/v2/history/get_actions?account=3&limit=99999")
    assert ei.value.code == 400
    assert "limit" in json.loads(ei.value.read())["error"]
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(base, "/v2/nope")
    assert ei.value.code == 404


def test_get_transaction_and_state_routes(server, spark):
    base, _ = server
    body = _get(base, "/v2/history/get_transaction?id=7")
    assert body["executed"] is True and body["trx_id"] == 7
    ordinals = [a["l_linenumber"] for a in body["actions"]]
    assert ordinals == sorted(ordinals)  # canonical ordinal order
    missing = _get(base, "/v2/history/get_transaction?id=999999999")
    assert missing["executed"] is False

    t = load_tables(spark, SF_DIR)
    tokens = _get(base, "/v2/state/get_tokens?account=1")
    want_syms = sorted(
        r["p_brand"]
        for r in t["lineitem"]
        .join(
            t["orders"].where(F.col("o_custkey") == 1),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .join(t["part"], F.col("p_partkey") == F.col("l_partkey"))
        .select("p_brand")
        .distinct()
        .collect()
    )
    assert [tok["symbol"] for tok in tokens["tokens"]] == want_syms

    keys = _get(base, "/v2/state/get_key_accounts?public_key=Brand%2313")
    assert keys["account_names"] == sorted(set(keys["account_names"]))
    assert keys["account_names"]


def test_sse_stream_bounded_replay(server, spark):
    base, _ = server
    ev = load_tables(spark, SF_DIR)["events"]
    want = [
        r["event_id"]
        for r in ev.where(
            (F.col("user_id") == 7) & F.col("event_id").between(1, 2000)
        )
        .orderBy("event_id")
        .select("event_id")
        .collect()
    ]
    url = base + "/v2/stream?account=7&start_from=1&read_until=2000"
    got, ended = [], False
    with urllib.request.urlopen(url, timeout=120) as r:
        assert r.headers["Content-Type"] == "text/event-stream"
        event = None
        for raw in r:
            line = raw.decode().rstrip("\n")
            if line.startswith("event: "):
                event = line[7:]
            elif line.startswith("data: "):
                if event == "end":
                    ended = True
                    break
                got.append(json.loads(line[6:])["event_id"])
    assert ended
    assert got == want and want


def test_sse_live_tail_follow_mode(spark, tmp_path):
    """Replay -> live switchover on the serving surface: the SSE
    handler drains the head, then a new spool file lands in the lake
    mid-stream and its matching rows arrive over the SAME response,
    ending at read_until (socketManager.ts: history replay, then the
    relay pushes arrivals)."""
    import shutil
    import threading
    import time as _time

    # growable lake: events.parquet becomes a DIRECTORY seeded with
    # the fixture file
    lake = tmp_path / "lake"
    lake.mkdir()
    evdir = lake / "events.parquet"
    evdir.mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", evdir / "part-000.parquet")
    for t in (
        "region nation customer supplier part orders lineitem "
        "documents embeddings"
    ).split():
        shutil.copy(f"{SF_DIR}/{t}.parquet", lake / f"{t}.parquet")

    ev = load_tables(spark, str(lake))["events"]
    head = ev.agg(F.max("event_id")).first()[0]
    # the tail window: 3 future events for user 7, 1 for someone else
    future = spark.createDataFrame(
        [
            (head + 1, 7, "click", 1.5),
            (head + 2, 8, "view", 2.5),
            (head + 3, 7, "view", 3.5),
            (head + 4, 7, "click", 4.5),
        ],
        "event_id long, user_id long, event_type string, value double",
    ).withColumn("ts", F.timestamp_micros(F.lit(1_700_000_000_000_000)))

    api = HyperionAPI(spark, str(lake), cache=ResponseCache(default_ttl=0))
    srv, _ = serve_background(api)
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        def append_later():
            _time.sleep(2.0)
            future.coalesce(1).write.mode("append").parquet(str(evdir))

        threading.Thread(target=append_later, daemon=True).start()
        url = (
            base
            + f"/v2/stream?account=7&start_from={head - 5}"
            + f"&read_until={head + 4}&follow=true&poll_sec=0.2"
        )
        got, ended = [], False
        with urllib.request.urlopen(url, timeout=120) as r:
            event = None
            for raw in r:
                line = raw.decode().rstrip("\n")
                if line.startswith("event: "):
                    event = line[7:]
                elif line.startswith("data: "):
                    if event == "end":
                        ended = True
                        break
                    got.append(json.loads(line[6:]))
        assert ended
        # replay rows (user 7 in the last 5 of the head) came first,
        # then exactly the three matching future events, in order
        tail = [d["event_id"] for d in got if d["event_id"] > head]
        assert tail == [head + 1, head + 3, head + 4]
        assert all(d["user_id"] == 7 for d in got)
        ids = [d["event_id"] for d in got]
        assert ids == sorted(ids)
    finally:
        srv.shutdown()


def test_more_routes_and_post_bodies(server, spark):
    """get_deltas through the predicate compiler, created-accounts /
    creator / top-holders pages, and POSTed JSON bodies reaching the
    same handlers as GET query strings."""
    base, _ = server
    t = load_tables(spark, SF_DIR)

    deltas = _get(
        base, "/v2/history/get_deltas?code=purchase&scope=2-6&limit=50"
    )
    assert deltas["total"]["relation"] == "eq"
    assert all(
        a["event_type"] == "purchase" and 2 <= a["user_id"] <= 6
        for a in deltas["actions"]
    )
    assert deltas["actions"]

    created = _get(
        base, "/v2/history/get_created_accounts?account=CHINA&limit=10"
    )
    want = [
        r["c_custkey"]
        for r in t["customer"]
        .join(
            t["nation"].where(F.col("n_name") == "CHINA"),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .orderBy(F.col("c_custkey").desc())
        .limit(10)
        .collect()
    ]
    assert [a["account"] for a in created["accounts"]] == want

    holders = _get(base, "/v2/state/get_top_holders?limit=5")
    amounts = [h["amount"] for h in holders["holders"]]
    assert amounts == sorted(amounts, reverse=True) and len(amounts) == 5

    # POST body == GET query string (fastify shared-schema parity)
    req = urllib.request.Request(
        base + "/v2/state/get_top_holders",
        data=json.dumps({"limit": 5}).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        posted = json.loads(r.read())
    # cached:true permitted - the POST hits the GET's cache entry,
    # exactly the reference's route+params keying
    assert posted["holders"] == holders["holders"]

    creator = _get(base, "/v2/history/get_creator?account=7")
    ev = t["events"]
    first = (
        ev.where((F.col("event_type") == "signup") & (F.col("user_id") == 7))
        .orderBy("event_id")
        .first()
    )
    if first is None:
        assert creator["creator"] is None
    else:
        assert creator["creation_seq"] == first["event_id"]


def test_review_fixes_stream_400_post_bools_empty_health(server, spark, tmp_path):
    """Round-8 review regressions: bad stream params 400 BEFORE any
    SSE headers; POSTed JSON booleans behave like their query-string
    twins; an empty lake degrades /v2/health instead of crashing."""
    base, _ = server
    # 1. eager stream validation: a non-numeric start_from is a 400
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(base, "/v2/stream?start_from=abc")
    assert ei.value.code == 400
    # 2. POST {"simple": true} == GET simple=true (simple_actions key)
    req = urllib.request.Request(
        base + "/v2/history/get_actions",
        data=json.dumps({"account": 7, "limit": 3, "simple": True}).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        body = json.loads(r.read())
    assert "simple_actions" in body and "actions" not in body
    # 3. empty lake: health answers with a degraded Lake status
    import shutil
    lake = tmp_path / "empty"
    lake.mkdir()
    for t in (
        "region nation customer supplier part orders lineitem "
        "documents embeddings"
    ).split():
        shutil.copy(f"{SF_DIR}/{t}.parquet", lake / f"{t}.parquet")
    ev = load_tables(spark, SF_DIR)["events"]
    ev.limit(0).write.parquet(str(lake / "events.parquet"))
    from hyperion_history_api_spark.api.http_server import HyperionAPI as H
    api2 = H(spark, str(lake))
    health = api2.health({})
    assert health["health"][1]["status"] == "Error"


def test_get_table_rows_mongo_filters_over_post(server, spark):
    """The dynamic-table endpoint: POSTed Mongo find-grammar filters
    compile to pushed predicates; results equal the engine plan."""
    base, _ = server
    filters = {
        "o_orderstatus": {"$in": ["O", "F"]},
        "o_totalprice": {"$gt": 50000, "$lte": 200000},
    }
    req = urllib.request.Request(
        base + "/v2/state/get_table_rows",
        data=json.dumps(
            {"table": "orders", "filters": filters, "limit": 15}
        ).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        body = json.loads(r.read())
    o = load_tables(spark, SF_DIR)["orders"]
    want = [
        r["o_orderkey"]
        for r in o.where(
            F.col("o_orderstatus").isin("O", "F")
            & (F.col("o_totalprice") > 50000)
            & (F.col("o_totalprice") <= 200000)
        )
        .orderBy("o_orderkey")
        .limit(15)
        .collect()
    ]
    assert [row["o_orderkey"] for row in body["rows"]] == want and want
    # unknown table → 400
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(base, "/v2/state/get_table_rows?table=nope")
    assert ei.value.code == 400


def test_unexpected_exception_is_opaque_500(server):
    """VERDICT r9 item 8: a handler crash returns an opaque error id,
    not the exception text (which can carry paths/SQL fragments)."""
    base, api = server
    api.get_tokens = lambda params: 1 / 0  # routes is a live property
    try:
        with pytest.raises(urllib.error.HTTPError) as ei:
            _get(base, "/v2/state/get_tokens?account=1&boom=1")
        assert ei.value.code == 500
        body = json.loads(ei.value.read())
        assert body["error"] == "internal error"
        assert "ZeroDivision" not in json.dumps(body)
        assert len(body["id"]) == 12
    finally:
        del api.get_tokens


def test_negative_start_from_is_head_relative(server, spark):
    """Reference addBlockRangeOpts (functions.ts): a negative
    start_from/read_until is HEAD-relative — ``start_from: -5`` means
    "the last 5 blocks", never a full replay from block 1 (which is
    what ``event_id >= -5`` would have compiled to)."""
    _, api = server
    head = api.head_block()
    rows = list(api.stream_rows({"start_from": "-5"}))
    assert rows, "head-relative window must not be empty"
    ids = [r["event_id"] for r in rows]
    assert min(ids) >= head - 5
    assert max(ids) == head
    # both bounds resolve: -5..-2 relative = head-5..head-2 absolute
    rows2 = list(
        api.stream_rows({"start_from": "-5", "read_until": "-2"})
    )
    ids2 = [r["event_id"] for r in rows2]
    assert ids2 and min(ids2) >= head - 5 and max(ids2) == head - 2


def test_head_block_memoized_on_lake_fingerprint(
    server, spark, monkeypatch
):
    """A head_block() call on an unchanged lake is stat-only — no
    Spark scan per stream request (the relay ack path calls this for
    every subscription; at a many-file lake a per-request
    max(event_id) job is real work)."""
    import hyperion_history_api_spark.tables as T

    _, api = server
    h1 = api.head_block()

    def boom(*a, **k):  # a fingerprint hit must never reach the scan
        raise AssertionError("Spark scan on fingerprint-hit head_block")

    monkeypatch.setattr(T, "_load_one", boom)
    assert api.head_block() == h1


def test_head_block_rescans_on_lake_growth(spark, tmp_path):
    """The memo invalidates when the spool gains a file — a stale head
    would break the gap-healing math clients do with currentBlockNum."""
    import shutil

    lake = tmp_path / "lake"
    evdir = lake / "events.parquet"
    evdir.mkdir(parents=True)
    shutil.copy(f"{SF_DIR}/events.parquet", evdir / "part-000.parquet")
    api = HyperionAPI(spark, str(lake), cache=ResponseCache(default_ttl=0))
    h1 = api.head_block()
    future = spark.createDataFrame(
        [(h1 + 7, 1, "click", 1.0)],
        "event_id long, user_id long, event_type string, value double",
    ).withColumn("ts", F.timestamp_micros(F.lit(1_700_000_000_000_000)))
    future.coalesce(1).write.mode("append").parquet(str(evdir))
    assert api.head_block() == h1 + 7
