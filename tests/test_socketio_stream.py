"""Socket.IO wire compatibility (api/socketio_stream.py): a client
speaking the PUBLIC Engine.IO v4 / Socket.IO v5 packet grammar — i.e.
what a stock Hyperion stream client emits (socketManager.ts:79-230,
540-620) — connects, handshakes, subscribes with an ack callback,
acks each history batch, and receives history_end. VERDICT r9 item 5's
done-gate (the connecting-client option)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from hyperion_history_api_spark.api.http_server import HyperionAPI
from hyperion_history_api_spark.api.serving_cache import ResponseCache
from hyperion_history_api_spark.api.socketio_stream import (
    SocketIOClient,
    SocketIOStreamServer,
)
from hyperion_history_api_spark.tables import load_tables

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def sio(spark):
    api = HyperionAPI(spark, SF_DIR, cache=ResponseCache(default_ttl=0))
    srv = SocketIOStreamServer(api, ack_timeout=30.0, chain="spark")
    yield srv
    srv.close()


def test_engineio_open_connect_handshake(sio):
    """The session preamble a stock client requires: engine.io OPEN
    with sid/pingInterval, socket.io CONNECT reply, then the
    'handshake' event carrying chain metadata."""
    c = SocketIOClient("127.0.0.1", sio.port)
    assert set(c.open_info) >= {"sid", "pingInterval", "pingTimeout", "upgrades"}
    # the handshake event is the first server emit after connect
    resp = c.emit_with_ack("cancel_stream_request", {"reqUUID": "x"})
    assert resp == {"status": "OK"}
    assert any(
        e and e[0] == "handshake" and "chain" in e[1] for e in c.events
    )
    c.close()


def test_action_stream_request_replay_with_acks(sio, spark):
    """action_stream_request -> callback {status OK, reqUUID} ->
    emitWithAck'd history batches (client acks each) -> history_end;
    rows equal the oracle-checked predicate compiler's output."""
    c = SocketIOClient("127.0.0.1", sio.port)
    resp = c.emit_with_ack(
        "action_stream_request",
        {
            "account": 7,
            "start_from": 1,
            "read_until": 2000,
            "batch_size": 7,
        },
    )
    assert resp["status"] == "OK" and resp["reqUUID"]
    rows, batches = [], 0
    while True:
        m = c.next_message()
        if m.get("type") == "history_end":
            assert m["reqUUID"] == resp["reqUUID"]
            assert m["mode"] == "history"
            break
        assert m["type"] == "action_trace" and m["mode"] == "history"
        assert m["reqUUID"] == resp["reqUUID"]
        batches += 1
        rows.extend(m["messages"])
    c.close()
    ev = load_tables(spark, SF_DIR)["events"]
    want = [
        r["event_id"]
        for r in ev.where(
            (F.col("user_id") == 7) & F.col("event_id").between(1, 2000)
        )
        .orderBy("event_id")
        .collect()
    ]
    assert [d["event_id"] for d in rows] == want and want
    assert batches == -(-len(want) // 7)
    assert m["message"]["lastBlock"] == max(want)


def test_delta_stream_request_and_error_callback(sio):
    """The second subscription kind routes stream=deltas; an invalid
    request answers the callback with status ERROR (validateRequest's
    contract) instead of dropping the connection."""
    c = SocketIOClient("127.0.0.1", sio.port)
    bad = c.emit_with_ack(
        "action_stream_request", {"start_from": "notanumber"}
    )
    assert bad["status"] == "ERROR" and bad["error"]
    resp = c.emit_with_ack(
        "delta_stream_request",
        {"code": "signup", "start_from": 1, "read_until": 500,
         "batch_size": 50},
    )
    assert resp["status"] == "OK"
    rows = []
    while True:
        m = c.next_message()
        if m.get("type") == "history_end":
            break
        assert m["type"] == "delta_trace"
        rows.extend(m["messages"])
    c.close()
    assert rows and all(r["event_type"] == "signup" for r in rows)


def test_non_acking_client_forcefully_disconnected(spark):
    """A client that never acks a history batch hits the emitWithAck
    timeout and is dropped (functions.ts:292-301's forceful
    disconnection), still within the reference's contract."""
    api = HyperionAPI(spark, SF_DIR, cache=ResponseCache(default_ttl=0))
    srv = SocketIOStreamServer(api, ack_timeout=2.0)
    try:
        c = SocketIOClient("127.0.0.1", srv.port)
        resp = c.emit_with_ack(
            "action_stream_request",
            {"account": 7, "start_from": 1, "read_until": 2000,
             "batch_size": 5},
        )
        assert resp["status"] == "OK"
        c.next_message(ack=False)  # swallow one batch without acking
        with pytest.raises(ConnectionError):
            while True:
                c.next_message(ack=False)
    finally:
        srv.close()
