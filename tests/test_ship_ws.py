"""SHIP WebSocket reader end-to-end (sources/ship_ws.py): a real RFC
6455 conversation over real sockets against an in-process SHIP stand-in
server that pushes its ABI first, answers get_status, streams
get_blocks_result_v0 under the max_messages_in_flight credit window
(BLOCKING at zero credit, so the test proves the ack protocol is
load-bearing), interleaves pings and a fragmented message, and closes
with the RFC handshake."""

from __future__ import annotations

import base64
import json
import socket
import struct
import threading

import pytest

from hyperion_history_api_spark.sources.ship_ws import (
    OP_BINARY,
    OP_CONT,
    ShipReader,
    encode_frame,
    server_handshake,
)

ABI = {"version": "eosio::abi/1.2", "structs": [{"name": "blk"}]}


class _ShipServer:
    """Single-connection SHIP stand-in speaking the same framing."""

    def __init__(self, n_blocks: int = 40):
        self.n_blocks = n_blocks
        self.max_unacked_seen = 0
        self.fragmented_sent = False
        self.closed_clean = False
        self.sock = socket.create_server(("127.0.0.1", 0))
        self.port = self.sock.getsockname()[1]
        self.thread = threading.Thread(target=self._serve, daemon=True)
        self.thread.start()

    @staticmethod
    def _payload(num: int) -> str:
        return base64.b64encode(
            struct.pack("<IQ", num, num * 1000)
        ).decode()

    def _serve(self):
        conn, _ = self.sock.accept()
        ws = server_handshake(conn)
        ws.send(json.dumps(ABI))  # ABI rides the FIRST text frame
        window = 0
        credit = 0
        unacked = 0
        pending: list[int] = []
        while True:
            if pending and credit > 0:
                num = pending.pop(0)
                body = {
                    "head": {"block_num": self.n_blocks},
                    "this_block": {
                        "block_num": num,
                        "block_id": f"{num:08x}" * 8,
                    },
                    "block": self._payload(num),
                }
                frame = json.dumps(
                    ["get_blocks_result_v0", body]
                ).encode()
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
            tag, body = json.loads(msg[1])
            if tag == "get_status_request_v0":
                ws.send(
                    json.dumps(
                        [
                            "get_status_result_v0",
                            {"head": {"block_num": self.n_blocks}},
                        ]
                    ).encode(),
                    OP_BINARY,
                )
            elif tag == "get_blocks_request_v0":
                window = body["max_messages_in_flight"]
                credit = window
                unacked = 0
                pending = list(
                    range(
                        body["start_block_num"],
                        min(body["end_block_num"], self.n_blocks) + 1,
                    )
                )
            elif tag == "get_blocks_ack_request_v0":
                credit += body["num_messages"]
                unacked -= body["num_messages"]


@pytest.fixture()
def ship():
    srv = _ShipServer()
    yield srv
    srv.sock.close()


def test_handshake_abi_status_and_ordered_range(ship):
    r = ShipReader("127.0.0.1", ship.port, max_messages_in_flight=4)
    assert r.ship_abi == ABI  # first frame is the node ABI
    assert r.status["head"]["block_num"] == 40
    got = list(r.read_range(1, 20))
    assert [b["this_block"]["block_num"] for b in got] == list(range(1, 21))
    # fragmented message (block 3) reassembled; payload intact
    blk3 = got[2]
    num, ts = struct.unpack("<IQ", base64.b64decode(blk3["block"]))
    assert (num, ts) == (3, 3000)
    r.close()
    ship.thread.join(timeout=5)
    assert ship.closed_clean


def test_credit_window_is_enforced(ship):
    r = ShipReader("127.0.0.1", ship.port, max_messages_in_flight=3)
    assert len(list(r.read_range(1, 30))) == 30
    # the server never had more than the window unacked: the ack
    # protocol carried the stream, not server goodwill
    assert 1 <= ship.max_unacked_seen <= 3
    r.close()


def test_spool_range_feeds_a_spark_file_stream(ship, spark, tmp_path):
    r = ShipReader("127.0.0.1", ship.port, max_messages_in_flight=8)
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
    connections over disjoint ranges spool into one lake dir; the
    merged spool is complete, duplicate-free, and each server
    connection saw its own credit window respected."""
    from hyperion_history_api_spark.sources.ship_ws import parallel_backfill

    # one server per connection (the stand-in is single-connection);
    # real SHIP accepts many readers on one port
    servers = [_ShipServer(n_blocks=60) for _ in range(3)]
    spool = str(tmp_path / "spool")
    # route each range to its own server port via round-robin threads
    import threading

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
    landed = spark.read.option("recursiveFileLookup", "true").parquet(spool)
    nums = sorted(r["block_num"] for r in landed.select("block_num").collect())
    assert nums == list(range(1, 61))
    for srv in servers:
        srv.sock.close()
