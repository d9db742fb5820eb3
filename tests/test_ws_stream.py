"""WebSocket stream serving with client acks (api/ws_stream.py): real
RFC-6455 sockets, the reference's Socket.IO replay contract — a
NON-acking client stalls the server at the credit window and is
forcefully disconnected after the ack timeout (functions.ts:258-305),
an acking client drains replay → live switchover exactly-once over the
same connection (socketManager.ts:540-570). VERDICT r8 item 2's
done-gate."""

from __future__ import annotations

import json
import shutil
import threading
import time as _time

import pytest
from pyspark.sql import functions as F

from hyperion_history_api_spark.api.http_server import HyperionAPI
from hyperion_history_api_spark.api.serving_cache import ResponseCache
from hyperion_history_api_spark.api.ws_stream import WsStreamServer
from hyperion_history_api_spark.sources.ship_ws import OP_TEXT, WebSocketClient
from hyperion_history_api_spark.tables import load_tables

SF_DIR = "/root/testdata/sf0.001"


def _subscribe(port: int, request: dict) -> WebSocketClient:
    ws = WebSocketClient("127.0.0.1", port)
    ws.send(json.dumps(request), OP_TEXT)
    return ws


def _frames_until_end(ws: WebSocketClient, *, ack: bool = True):
    """Drain batch frames (optionally acking each) until the end
    frame; returns (rows, n_batches)."""
    rows, batches = [], 0
    while True:
        msg = ws.recv()
        assert msg is not None, "server closed before end frame"
        frame = json.loads(msg[1])
        if frame["type"] == "end":
            return rows, batches
        assert frame["type"] == "batch"
        batches += 1
        rows.extend(frame["rows"])
        if ack:
            ws.send(json.dumps({"type": "ack", "seq": frame["seq"]}), OP_TEXT)


def test_acking_client_replays_exact_window(spark):
    api = HyperionAPI(spark, SF_DIR, cache=ResponseCache(default_ttl=0))
    srv = WsStreamServer(api, ack_timeout=30.0)
    try:
        ws = _subscribe(
            srv.port,
            {
                "account": 7,
                "start_from": 1,
                "read_until": 2000,
                "batch_size": 7,
                "window": 2,
            },
        )
        rows, batches = _frames_until_end(ws)
        ws.close()
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
    finally:
        srv.close()


def test_non_acking_client_stalls_then_forceful_disconnect(spark):
    """The ack protocol is load-bearing: with window=2 the server
    sends exactly 2 batches to a silent client, blocks (no third
    frame), and drops the connection after ack_timeout — the
    reference's 120 s forceful disconnection, shortened here."""
    api = HyperionAPI(spark, SF_DIR, cache=ResponseCache(default_ttl=0))
    srv = WsStreamServer(api, ack_timeout=2.0)
    try:
        ws = _subscribe(
            srv.port,
            {
                "account": 7,
                "start_from": 1,
                "read_until": 5000,
                "batch_size": 3,
                "window": 2,
            },
        )
        got = []
        for _ in range(2):
            frame = json.loads(ws.recv()[1])
            assert frame["type"] == "batch"
            got.append(frame["seq"])
        # stalled: nothing else arrives while we stay silent
        ws.sock.settimeout(0.8)
        with pytest.raises((TimeoutError, OSError)):
            ws.recv()
        assert max(got) == 2 and srv.sent_batches[1] == 2
        # after the ack timeout the server force-disconnects
        ws.sock.settimeout(5.0)
        with pytest.raises((ConnectionError, OSError)):
            # a close frame (None) or a reset both end the session
            if ws.recv() is None:
                raise ConnectionError("closed")
    finally:
        srv.close()


def test_replay_then_live_exactly_once_over_socket(spark, tmp_path):
    """The Socket.IO switchover on the ws surface: replay drains the
    head, new spool files land mid-stream, their matching rows arrive
    over the SAME connection under the same credit rule — every
    sequence exactly once, ascending, ending at read_until."""
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
    srv = WsStreamServer(api, ack_timeout=30.0)
    try:
        def append_later():
            _time.sleep(2.0)
            future.coalesce(1).write.mode("append").parquet(str(evdir))

        threading.Thread(target=append_later, daemon=True).start()
        ws = _subscribe(
            srv.port,
            {
                "account": 7,
                "start_from": head - 5,
                "read_until": head + 4,
                "follow": "true",
                "poll_sec": 0.2,
                "batch_size": 2,
                "window": 1,
            },
        )
        rows, _ = _frames_until_end(ws)
        ws.close()
        ids = [d["event_id"] for d in rows]
        assert ids == sorted(ids) and len(ids) == len(set(ids))
        tail = [i for i in ids if i > head]
        assert tail == [head + 1, head + 3, head + 4]
        assert all(d["user_id"] == 7 for d in rows)
    finally:
        srv.close()


def test_connection_cap_rejects_then_recovers(spark):
    """max_connections guard (VERDICT r9 item 8): a saturated server
    answers the (max+1)th subscriber with one error frame and keeps
    serving; a freed slot is reusable."""
    api = HyperionAPI(spark, SF_DIR, cache=ResponseCache(default_ttl=0))
    srv = WsStreamServer(api, ack_timeout=30.0, max_connections=1)
    try:
        # occupy the only slot: no acks, window=1 -> server blocks
        ws1 = _subscribe(
            srv.port,
            {
                "account": 7,
                "start_from": 1,
                "read_until": 2000,
                "batch_size": 5,
                "window": 1,
            },
        )
        first = json.loads(ws1.recv()[1])
        assert first["type"] == "batch"
        # second connection is told why and closed
        ws2 = _subscribe(srv.port, {"account": 7})
        frame = json.loads(ws2.recv()[1])
        assert frame == {"type": "error", "error": "too many connections"}
        ws2.close()
        # free the slot; the server notices on its next recv
        ws1.close()
        deadline = _time.time() + 20
        while True:
            ws3 = _subscribe(
                srv.port,
                {
                    "account": 7,
                    "start_from": 1,
                    "read_until": 500,
                    "batch_size": 50,
                    "window": 8,
                },
            )
            frame = json.loads(ws3.recv()[1])
            if frame["type"] != "error":
                break
            ws3.close()
            assert _time.time() < deadline, "slot never freed"
            _time.sleep(0.2)
        assert frame["type"] in ("batch", "end")
        ws3.close()
    finally:
        srv.close()


def test_raw_list_filters_accepted(spark):
    """filters sent as a real JSON array (what a structured client
    sends) must reach the compiler intact — str() on a Python list
    produces single-quoted pseudo-JSON that rejects the request."""
    api = HyperionAPI(spark, SF_DIR, cache=ResponseCache(default_ttl=0))
    srv = WsStreamServer(api, ack_timeout=30.0)
    try:
        ws = _subscribe(
            srv.port,
            {
                "account": 1,
                "start_from": 1,
                "read_until": 2000,
                "filters": [
                    {"field": "value", "operator": "gt", "value": 100}
                ],
                "batch_size": 50,
                "window": 4,
            },
        )
        rows, _ = _frames_until_end(ws)
        ws.close()
        ev = load_tables(spark, SF_DIR)["events"]
        want = [
            r["event_id"]
            for r in ev.where(
                (F.col("user_id") == 1)
                & F.col("event_id").between(1, 2000)
                & (F.col("value") > 100)
            )
            .orderBy("event_id")
            .collect()
        ]
        assert [d["event_id"] for d in rows] == want and want
    finally:
        srv.close()


def test_silent_socket_cannot_pin_a_capped_slot(spark):
    """Pre-handshake timeout (CappedWsServer): a peer that connects
    and never speaks is dropped at handshake_timeout — without it, 64
    silent TCP connects hold every slot forever and the cap becomes a
    denial of service."""
    import socket as _socket

    api = HyperionAPI(spark, SF_DIR, cache=ResponseCache(default_ttl=0))
    srv = WsStreamServer(
        api, ack_timeout=30.0, max_connections=1, handshake_timeout=0.3
    )
    try:
        mute = _socket.create_connection(("127.0.0.1", srv.port))
        _time.sleep(1.0)  # > handshake_timeout: the slot must be free
        ws = _subscribe(
            srv.port,
            {
                "account": 7,
                "start_from": 1,
                "read_until": 500,
                "batch_size": 50,
                "window": 8,
            },
        )
        rows, _ = _frames_until_end(ws)
        assert rows  # served through the single slot
        ws.close()
        mute.close()
    finally:
        srv.close()


def test_ws_forwards_control_events_out_of_band(spark, tmp_path):
    """fork_event / lib_update reach the raw-WS surface as unbatched
    typed frames, ordered ahead of any corrected rows (ws-router.ts
    io.emit forwarding), and a fork rewinds the follow cursor so the
    winning chain's row is re-delivered."""
    import os

    from hyperion_history_api_spark.streaming.control_log import (
        record_fork,
        write_lib,
    )

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
    head = int(ev.agg(F.max("event_id")).first()[0])

    api = HyperionAPI(spark, str(lake), cache=ResponseCache(default_ttl=0))
    srv = WsStreamServer(api, ack_timeout=30.0)
    try:

        def _append(seq: int, etype: str):
            before = set(os.listdir(evdir))
            spark.createDataFrame(
                [(seq, 7, etype, 9.5)],
                "event_id long, user_id long, event_type string, "
                "value double",
            ).withColumn(
                "ts", F.timestamp_micros(F.lit(1_700_000_000_000_000))
            ).coalesce(1).write.mode("append").parquet(str(evdir))
            return set(os.listdir(evdir)) - before

        def mutate():
            _time.sleep(2.0)
            write_lib(str(lake), head - 1, "libid")
            _time.sleep(1.0)
            spec = _append(head + 1, "speculative")
            _time.sleep(2.5)
            for f in spec:
                os.remove(evdir / f)
            record_fork(str(lake), head + 1, head + 1, "win-id")
            _append(head + 1, "replacement")

        threading.Thread(target=mutate, daemon=True).start()
        ws = _subscribe(
            srv.port,
            {
                "start_from": head - 2,
                "follow": "true",
                "poll_sec": 0.2,
                "idle_timeout": 20,
                "batch_size": 50,
                "window": 4,
            },
        )
        frames: list[dict] = []
        done = False
        while not done:
            msg = ws.recv()
            assert msg is not None
            frame = json.loads(msg[1])
            frames.append(frame)
            if frame.get("type") == "batch":
                ws.send(
                    json.dumps({"type": "ack", "seq": frame["seq"]}),
                    OP_TEXT,
                )
                done = any(
                    r.get("event_type") == "replacement"
                    for r in frame["rows"]
                )
            elif frame.get("type") == "end":
                done = True
        ws.close()
        kinds = [f["type"] for f in frames]
        assert "lib_update" in kinds and "fork_event" in kinds
        lib = next(f for f in frames if f["type"] == "lib_update")
        assert lib["block_num"] == head - 1
        fk_at = kinds.index("fork_event")
        fk = frames[fk_at]
        assert (fk["starting_block"], fk["ending_block"], fk["new_id"]) == (
            head + 1,
            head + 1,
            "win-id",
        )
        pre = [
            r
            for f in frames[:fk_at]
            if f["type"] == "batch"
            for r in f["rows"]
        ]
        post = [
            r
            for f in frames[fk_at + 1 :]
            if f["type"] == "batch"
            for r in f["rows"]
        ]
        assert any(r["event_type"] == "speculative" for r in pre)
        # strict wire order: the corrected row must NEVER precede the
        # fork notice in the single received-frame log
        assert not any(r["event_type"] == "replacement" for r in pre)
        assert any(
            r["event_type"] == "replacement" and r["event_id"] == head + 1
            for r in post
        )
    finally:
        srv.close()
