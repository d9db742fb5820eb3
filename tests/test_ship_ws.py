"""SHIP WebSocket reader end-to-end (sources/ship_ws.py): a real RFC
6455 conversation over real sockets against an in-process SHIP stand-in
server that pushes its ABI first, answers get_status, streams
get_blocks_result_v0 under the max_messages_in_flight credit window
(BLOCKING at zero credit, so the test proves the ack protocol is
load-bearing), interleaves pings and a fragmented message, forks the
chain mid-stream, and closes with the RFC handshake.

The server speaks BOTH envelope modes: the binary node-ABI variant
layout (sources/ship_envelope.py — the default wire form) and the JSON
debug envelope; the spool tests prove both land byte-identical
payloads."""

from __future__ import annotations

import base64
import json
import socket
import struct
import threading

import pytest

from hyperion_history_api_spark.sources.ship_envelope import (
    decode_request,
    encode_result,
)
from hyperion_history_api_spark.sources.ship_ws import (
    OP_BINARY,
    OP_CONT,
    ShipReader,
    encode_frame,
    server_handshake,
)

ABI = {"version": "eosio::abi/1.2", "structs": [{"name": "blk"}]}


def _pos(num: int, chain: str = "a") -> dict:
    """A full block_position; chain 'b' ids differ so fork tests can
    assert the winning chain's rows landed."""
    base = num if chain == "a" else num + 0x0B000000
    return {"block_num": num, "block_id": f"{base:08x}" * 8}


class _ShipServer:
    """Single-connection SHIP stand-in speaking the same framing, in
    either envelope mode. ``fork`` = (trigger, restart): instead of
    sending block ``trigger`` on chain a, restart from ``restart`` on
    chain b — the SHIP in-stream fork signal (block_num regression)."""

    def __init__(
        self,
        n_blocks: int = 40,
        envelope: str = "binary",
        fork: tuple[int, int] | None = None,
    ):
        self.n_blocks = n_blocks
        self.envelope = envelope
        self.fork = fork
        self.max_unacked_seen = 0
        self.fragmented_sent = False
        self.closed_clean = False
        self.sock = socket.create_server(("127.0.0.1", 0))
        self.port = self.sock.getsockname()[1]
        self.thread = threading.Thread(target=self._serve, daemon=True)
        self.thread.start()

    @staticmethod
    def _payload(num: int, chain: str = "a") -> bytes:
        return struct.pack("<IQ", num, num * 1000 + (1 if chain == "b" else 0))

    def _enc(self, tag: str, body: dict) -> bytes:
        if self.envelope == "binary":
            return encode_result(tag, body)
        body = dict(body)
        if isinstance(body.get("block"), bytes):
            body["block"] = base64.b64encode(body["block"]).decode()
        return json.dumps([tag, body]).encode()

    def _dec(self, blob: bytes):
        if self.envelope == "binary":
            return decode_request(blob)
        return json.loads(blob)

    def _serve(self):
        conn, _ = self.sock.accept()
        ws = server_handshake(conn)
        ws.send(json.dumps(ABI))  # ABI rides the FIRST text frame
        credit = 0
        unacked = 0
        chain = "a"
        pending: list[int] = []
        while True:
            if pending and credit > 0:
                num = pending.pop(0)
                if self.fork and chain == "a" and num == self.fork[0]:
                    # the in-stream fork: switch to chain b below the
                    # fork point, this block never sends on chain a
                    chain = "b"
                    pending = list(range(self.fork[1], self.n_blocks + 1))
                    continue
                body = {
                    "head": _pos(self.n_blocks, chain),
                    "last_irreversible": _pos(self.n_blocks, chain),
                    "this_block": _pos(num, chain),
                    "prev_block": _pos(num - 1, chain) if num > 1 else None,
                    "block": self._payload(num, chain),
                    "traces": None,
                    "deltas": None,
                }
                frame = self._enc("get_blocks_result_v0", body)
                if num == 3 and not self.fragmented_sent:
                    # exercise continuation reassembly: 3 frames
                    self.fragmented_sent = True
                    a, b, c = frame[:10], frame[10:20], frame[20:]
                    ws.sock.sendall(
                        encode_frame(OP_BINARY, a, mask=False, fin=False)
                    )
                    ws.sock.sendall(
                        encode_frame(OP_CONT, b, mask=False, fin=False)
                    )
                    ws.sock.sendall(
                        encode_frame(OP_CONT, c, mask=False, fin=True)
                    )
                elif num == 5:
                    ws.send(b"", 0x9)  # ping mid-stream (client pongs)
                    ws.send(frame, OP_BINARY)
                else:
                    ws.send(frame, OP_BINARY)
                credit -= 1
                unacked += 1
                self.max_unacked_seen = max(self.max_unacked_seen, unacked)
                continue
            # zero credit (or nothing to send): BLOCK on the client
            msg = ws.recv()
            if msg is None:
                self.closed_clean = True
                return
            tag, body = self._dec(msg[1])
            if tag == "get_status_request_v0":
                ws.send(
                    self._enc(
                        "get_status_result_v0",
                        {
                            "head": _pos(self.n_blocks),
                            "last_irreversible": _pos(self.n_blocks),
                            "trace_begin_block": 0,
                            "trace_end_block": self.n_blocks,
                            "chain_state_begin_block": 0,
                            "chain_state_end_block": self.n_blocks,
                        },
                    ),
                    OP_BINARY,
                )
            elif tag == "get_blocks_request_v0":
                credit = body["max_messages_in_flight"]
                unacked = 0
                chain = "a"
                pending = list(
                    range(
                        body["start_block_num"],
                        min(body["end_block_num"], self.n_blocks) + 1,
                    )
                )
            elif tag == "get_blocks_ack_request_v0":
                credit += body["num_messages"]
                unacked -= body["num_messages"]


def test_envelope_roundtrip_and_strictness():
    """The variant codec round-trips every session message and fails
    loudly on malformed frames (the same strict contract as the field
    codec it builds on)."""
    from hyperion_history_api_spark.functions.abi_codec import AbiDecodeError
    from hyperion_history_api_spark.sources.ship_envelope import (
        decode_result,
        encode_request,
    )

    req = {
        "start_block_num": 7,
        "end_block_num": 1 << 20,
        "max_messages_in_flight": 8,
        "have_positions": [_pos(3), _pos(4)],
        "irreversible_only": False,
        "fetch_block": True,
        "fetch_traces": True,
        "fetch_deltas": False,
    }
    blob = encode_request("get_blocks_request_v0", req)
    assert decode_request(blob) == ("get_blocks_request_v0", req)

    body = {
        "head": _pos(9),
        "last_irreversible": _pos(8),
        "this_block": _pos(9),
        "prev_block": None,
        "block": b"\x01\x02",
        "traces": None,
        "deltas": b"",
    }
    tag, back = decode_result(encode_result("get_blocks_result_v0", body))
    assert (tag, back) == ("get_blocks_result_v0", body)

    with pytest.raises(AbiDecodeError):
        decode_result(blob[:-1] + b"\xff\xff")  # trailing garbage
    with pytest.raises(AbiDecodeError):
        decode_result(b"\x63")  # variant index out of range
    with pytest.raises(AbiDecodeError):
        # corrupt tail (a varuint length with no bytes behind it)
        decode_result(
            encode_result("get_blocks_result_v0", body)[:-1] + b"\x07"
        )


@pytest.fixture(params=["binary", "json"])
def ship(request):
    srv = _ShipServer(envelope=request.param)
    yield srv
    srv.sock.close()


@pytest.fixture()
def ship_binary():
    srv = _ShipServer()
    yield srv
    srv.sock.close()


def test_handshake_abi_status_and_ordered_range(ship):
    """Both envelope modes: same session protocol, same results."""
    r = ShipReader(
        "127.0.0.1", ship.port, max_messages_in_flight=4,
        envelope=ship.envelope,
    )
    assert r.ship_abi == ABI  # first frame is the node ABI
    assert r.status["head"]["block_num"] == 40
    got = list(r.read_range(1, 20))
    assert [b["this_block"]["block_num"] for b in got] == list(range(1, 21))
    # fragmented message (block 3) reassembled; payload intact
    blk3 = got[2]
    raw = blk3["block"]
    if isinstance(raw, str):
        raw = base64.b64decode(raw)
    num, ts = struct.unpack("<IQ", raw)
    assert (num, ts) == (3, 3000)
    r.close()
    ship.thread.join(timeout=5)
    assert ship.closed_clean


def test_credit_window_is_enforced(ship_binary):
    r = ShipReader("127.0.0.1", ship_binary.port, max_messages_in_flight=3)
    assert len(list(r.read_range(1, 30))) == 30
    # the server never had more than the window unacked: the ack
    # protocol carried the stream, not server goodwill
    assert 1 <= ship_binary.max_unacked_seen <= 3
    r.close()


def test_binary_and_json_spools_are_identical(tmp_path):
    """VERDICT r8 item 4's done-gate: spool_range lands payloads
    byte-identical across the two envelope modes."""
    import pyarrow.parquet as pq

    spools = {}
    for mode in ("binary", "json"):
        srv = _ShipServer(envelope=mode)
        r = ShipReader(
            "127.0.0.1", srv.port, max_messages_in_flight=8, envelope=mode
        )
        d = str(tmp_path / mode)
        assert r.spool_range(1, 40, d, rows_per_file=16) == 40
        r.close()
        srv.sock.close()
        t = pq.read_table(d).sort_by("block_num")
        spools[mode] = list(
            zip(
                t["block_num"].to_pylist(),
                t["block_id"].to_pylist(),
                t["payload"].to_pylist(),
            )
        )
    assert spools["binary"] == spools["json"]


def test_fork_drops_stale_spool_rows(tmp_path):
    """Chain forks at 16 back to 12: the finished spool holds exactly
    one row per block 1..20, with blocks 12..20 from the WINNING
    chain (new ids + payloads), including rewrite of already-flushed
    files (rows_per_file=6 puts stale rows across file boundaries)."""
    import pyarrow.parquet as pq

    srv = _ShipServer(n_blocks=20, fork=(16, 12))
    r = ShipReader("127.0.0.1", srv.port, max_messages_in_flight=4)
    spool = str(tmp_path / "spool")
    n = r.spool_range(1, 20, spool, rows_per_file=6)
    r.close()
    srv.sock.close()
    assert n == 20
    t = pq.read_table(spool).sort_by("block_num")
    assert t["block_num"].to_pylist() == list(range(1, 21))
    by_num = dict(zip(t["block_num"].to_pylist(), t["block_id"].to_pylist()))
    for num in range(1, 12):
        assert by_num[num] == _pos(num, "a")["block_id"]
    for num in range(12, 21):
        assert by_num[num] == _pos(num, "b")["block_id"], num
    payloads = dict(zip(t["block_num"].to_pylist(), t["payload"].to_pylist()))
    assert struct.unpack("<IQ", payloads[13]) == (13, 13001)  # chain b
    assert struct.unpack("<IQ", payloads[5]) == (5, 5000)  # chain a


def test_spool_range_feeds_a_spark_file_stream(ship_binary, spark, tmp_path):
    r = ShipReader("127.0.0.1", ship_binary.port, max_messages_in_flight=8)
    spool = str(tmp_path / "spool")
    n = r.spool_range(1, 40, spool, rows_per_file=16)
    r.close()
    assert n == 40
    # the spool is a valid Structured-Streaming source: tail it with
    # availableNow and land the batch (the reader -> Spark bridge)
    out = str(tmp_path / "out")
    q = (
        spark.readStream.schema("block_num long, block_id string, payload binary")
        .parquet(spool)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    landed = spark.read.parquet(out)
    assert landed.count() == 40
    rows = {r["block_num"]: r for r in landed.collect()}
    num, ts = struct.unpack("<IQ", bytes(rows[7]["payload"]))
    assert (num, ts) == (7, 7000)


def test_parallel_backfill_ranges(spark, tmp_path):
    """The master's parallel-reader layout: three concurrent
    connections over disjoint ranges spool range-disjoint file
    prefixes into ONE flat directory; a plain (non-recursive) glob —
    batch read AND file stream — sees every range, duplicate-free."""
    from hyperion_history_api_spark.sources.ship_ws import parallel_backfill

    # one server per connection (the stand-in is single-connection);
    # real SHIP accepts many readers on one port
    servers = [_ShipServer(n_blocks=60) for _ in range(3)]
    spool = str(tmp_path / "spool")

    totals = []

    def run(srv, lo, hi):
        totals.append(
            parallel_backfill(
                "127.0.0.1", srv.port, [(lo, hi)], spool, rows_per_file=8
            )
        )

    threads = [
        threading.Thread(target=run, args=(srv, lo, hi))
        for srv, (lo, hi) in zip(servers, [(1, 20), (21, 40), (41, 60)])
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert sum(totals) == 60
    # flat layout: NO recursiveFileLookup needed (VERDICT r8 item 8)
    landed = spark.read.parquet(spool)
    nums = sorted(r["block_num"] for r in landed.select("block_num").collect())
    assert nums == list(range(1, 61))
    # the downstream tail (a file stream over the same flat dir)
    out = str(tmp_path / "out")
    q = (
        spark.readStream.schema("block_num long, block_id string, payload binary")
        .parquet(spool)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert spark.read.parquet(out).count() == 60
    for srv in servers:
        srv.sock.close()


def test_frame_read_survives_mid_frame_timeout():
    """Timeout-reentrant framing: the stream-serving heartbeat loops
    treat socket.timeout as a routine ping tick and call recv() again,
    so a timeout that lands MID-FRAME (peer's frame split across TCP
    segments) must leave the parser at the same frame boundary — a
    consuming reader would re-parse payload bytes as a fresh header
    and desync the connection permanently."""
    from hyperion_history_api_spark.sources.ship_ws import (
        OP_TEXT,
        WebSocketConnection,
        encode_frame,
    )

    a, b = socket.socketpair()
    try:
        conn = WebSocketConnection(a, is_client=False)
        a.settimeout(0.2)
        frame = encode_frame(OP_TEXT, b"hello-world", mask=True)
        b.sendall(frame[:5])  # header + part of the mask key only
        with pytest.raises(TimeoutError):
            conn.recv()
        b.sendall(frame[5:])  # the rest arrives after the timeout
        assert conn.recv() == (OP_TEXT, b"hello-world")
        # and the NEXT frame parses cleanly too (no residue)
        b.sendall(encode_frame(OP_TEXT, b"again", mask=True))
        assert conn.recv() == (OP_TEXT, b"again")
    finally:
        a.close()
        b.close()


def test_fragmented_message_survives_inter_frame_timeout():
    """Reassembly state lives on the connection: a timeout BETWEEN the
    frames of a fragmented message (heartbeat tick) must not reset the
    partial message — call-local state handed back the continuation
    tail alone, truncated and mistyped as binary."""
    from hyperion_history_api_spark.sources.ship_ws import (
        OP_CONT,
        OP_TEXT,
        WebSocketConnection,
        encode_frame,
    )

    a, b = socket.socketpair()
    try:
        conn = WebSocketConnection(a, is_client=False)
        a.settimeout(0.2)
        b.sendall(encode_frame(OP_TEXT, b"hello-", mask=True, fin=False))
        with pytest.raises(TimeoutError):
            conn.recv()  # first fragment consumed, then the gap
        b.sendall(encode_frame(OP_CONT, b"world", mask=True, fin=True))
        assert conn.recv() == (OP_TEXT, b"hello-world")
    finally:
        a.close()
        b.close()
