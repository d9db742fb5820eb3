"""SHIP WebSocket reader — the indexer's state-history client
(``src/indexer/workers/state-reader.ts``) as a real network source.

Two layers, both stdlib-only (no websocket package exists in this
environment, and none is needed — RFC 6455 is ~150 lines):

1. :class:`WebSocketClient` / :class:`WebSocketConnection` — an RFC
   6455 implementation: HTTP/1.1 Upgrade handshake with the
   ``Sec-WebSocket-Key``/``-Accept`` SHA-1 proof, client-masked
   frames, text/binary/ping/pong/close opcodes, fragmented-message
   reassembly, and the close handshake. The same framing code drives
   the client AND the in-process test server
   (tests/test_ship_ws.py), so the bytes on the socket are proven
   against the spec's own mask/length edge cases (126/127 length
   forms).

2. :class:`ShipReader` — the state-reader session protocol over that
   transport (state-reader.ts):

   - on connect the server pushes its ABI as the FIRST text frame;
     the reader stores it and answers ``get_status_request_v0``
     (state-reader.ts:810-814);
   - ``get_blocks_request_v0`` carries the block window and the
     credit ``max_messages_in_flight`` (baseRequest,
     state-reader.ts:116-128);
   - the server streams ``get_blocks_result_v0`` messages; the
     reader acks every processed batch with
     ``get_blocks_ack_request_v0 {num_messages}`` to refill the
     credit window (ackBlockRange, state-reader.ts:972-974) — the
     SHIP backpressure protocol, honored bidirectionally by the test
     server (it BLOCKS with zero credit);
   - **forks**: SHIP signals a fork by streaming the NEW chain's
     blocks starting at the fork point — a ``this_block.block_num``
     at or below one already delivered. ``read_range`` detects the
     regression and invokes ``on_fork(fork_num)``; ``spool_range``
     uses it to DROP stale spool rows (buffered rows discarded,
     already-flushed files rewritten atomically without the stale
     tail) before landing the new chain, so a tail that starts after
     the spool completes sees exactly one row per block. A tail that
     already consumed stale rows relies on the downstream fork
     retraction (``streaming/state_store.py`` fork rollback) — the
     reference splits the work the same way (reader restart +
     indexer fork events).

   Envelope encoding: by default the outer request/result unions are
   the node ABI's BINARY variant layout (``ship_envelope.py`` — the
   reference deserializes with the same ABI, state-reader.ts:612-735);
   ``envelope="json"`` keeps the previous JSON envelope as a debug
   mode (human-readable frames against stand-in servers). Block
   PAYLOADS inside are binary either way and flow through the repo's
   ABI codec (``functions/abi_codec.py``) on the Spark side.

Scale shape: one reader = one connection = one block range, exactly
the reference's parallel-reader layout; a deployment runs R readers
over disjoint ranges, each spooling parquet that
``streaming/ingest.read_event_stream`` tails as a file stream — the
reader is driver-side IO by design (the reference's reader workers
are single-threaded node processes too); Spark parallelism starts at
the spool.
"""

from __future__ import annotations

import base64
import hashlib
import json
import os
import secrets
import socket
import struct
import time

_WS_GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"

OP_CONT, OP_TEXT, OP_BINARY, OP_CLOSE, OP_PING, OP_PONG = (
    0x0,
    0x1,
    0x2,
    0x8,
    0x9,
    0xA,
)


def accept_key(key: str) -> str:
    """Sec-WebSocket-Accept proof (RFC 6455 §4.2.2)."""
    return base64.b64encode(
        hashlib.sha1((key + _WS_GUID).encode()).digest()
    ).decode()


def encode_frame(
    opcode: int, payload: bytes, *, mask: bool, fin: bool = True
) -> bytes:
    """One frame (RFC 6455 §5.2): FIN|opcode, MASK|len(7/16/64-bit
    forms), optional masking key, masked payload."""
    head = bytearray([(0x80 if fin else 0) | opcode])
    n = len(payload)
    mask_bit = 0x80 if mask else 0
    if n < 126:
        head.append(mask_bit | n)
    elif n < 1 << 16:
        head.append(mask_bit | 126)
        head += struct.pack(">H", n)
    else:
        head.append(mask_bit | 127)
        head += struct.pack(">Q", n)
    if mask:
        key = secrets.token_bytes(4)
        head += key
        payload = bytes(b ^ key[i % 4] for i, b in enumerate(payload))
    return bytes(head) + payload


class WebSocketConnection:
    """Framing over an accepted socket — shared by client and server
    sides (the side only changes the masking rule: clients mask,
    servers don't, RFC 6455 §5.3)."""

    def __init__(self, sock: socket.socket, *, is_client: bool) -> None:
        self.sock = sock
        self.is_client = is_client
        self._buf = b""
        self._msg_parts: list[bytes] = []
        self._msg_op: int | None = None
        self.closed = False

    # -- send ----------------------------------------------------------
    def send(self, payload: bytes | str, opcode: int | None = None) -> None:
        if opcode is None:
            opcode = OP_TEXT if isinstance(payload, str) else OP_BINARY
        data = payload.encode() if isinstance(payload, str) else payload
        self.sock.sendall(
            encode_frame(opcode, data, mask=self.is_client)
        )

    def close(self, code: int = 1000) -> None:
        if not self.closed:
            try:
                self.send(struct.pack(">H", code), OP_CLOSE)
            except OSError:
                pass
            self.closed = True

    # -- receive -------------------------------------------------------
    def _fill(self, n: int) -> None:
        """Buffer at least ``n`` bytes WITHOUT consuming them. A
        ``socket.timeout`` mid-fill leaves ``_buf`` intact, so the
        next call resumes at the same frame boundary — load-bearing
        for the heartbeat loops (api/socketio_stream.py) that treat a
        recv timeout as a routine ping tick: a consuming reader would
        re-parse mid-frame bytes as a fresh header after a timeout
        that split a frame across TCP segments, desyncing the
        connection permanently."""
        while len(self._buf) < n:
            chunk = self.sock.recv(65536)
            if not chunk:
                raise ConnectionError("socket closed mid-frame")
            self._buf += chunk

    def _read_frame(self) -> tuple[int, bool, bytes]:
        self._fill(2)
        b0, b1 = self._buf[0], self._buf[1]
        fin, opcode = bool(b0 & 0x80), b0 & 0x0F
        masked, n = bool(b1 & 0x80), b1 & 0x7F
        hdr = 2
        if n == 126:
            self._fill(hdr + 2)
            (n,) = struct.unpack_from(">H", self._buf, hdr)
            hdr += 2
        elif n == 127:
            self._fill(hdr + 8)
            (n,) = struct.unpack_from(">Q", self._buf, hdr)
            hdr += 8
        if masked:
            self._fill(hdr + 4)
            key = self._buf[hdr : hdr + 4]
            hdr += 4
        else:
            key = None
        self._fill(hdr + n)  # only NOW is the whole frame buffered
        payload = self._buf[hdr : hdr + n]
        self._buf = self._buf[hdr + n :]
        if key:
            payload = bytes(
                b ^ key[i % 4] for i, b in enumerate(payload)
            )
        return opcode, fin, bytes(payload)

    def recv(self) -> tuple[int, bytes] | None:
        """Next complete MESSAGE (continuation frames reassembled;
        pings answered transparently). None after close.

        Reassembly state lives on the CONNECTION (not this call):
        under the heartbeat loops a ``socket.timeout`` between the
        frames of a fragmented message is a routine ping tick and the
        caller recv()s again — call-local state would reset and hand
        back the continuation tail alone, truncated and mistyped."""
        while True:
            opcode, fin, payload = self._read_frame()
            if opcode == OP_PING:
                self.send(payload, OP_PONG)
                continue
            if opcode == OP_PONG:
                continue
            if opcode == OP_CLOSE:
                self.close()  # echo the close handshake
                return None
            if opcode in (OP_TEXT, OP_BINARY):
                self._msg_op = opcode
                self._msg_parts = [payload]
            elif opcode == OP_CONT:
                self._msg_parts.append(payload)
            if fin:
                out = self._msg_op or OP_BINARY, b"".join(self._msg_parts)
                self._msg_parts, self._msg_op = [], None
                return out


class WebSocketClient(WebSocketConnection):
    """RFC 6455 client: TCP connect + Upgrade handshake, then frames."""

    def __init__(self, host: str, port: int, path: str = "/") -> None:
        sock = socket.create_connection((host, port), timeout=60)
        key = base64.b64encode(secrets.token_bytes(16)).decode()
        req = (
            f"GET {path} HTTP/1.1\r\n"
            f"Host: {host}:{port}\r\n"
            "Upgrade: websocket\r\nConnection: Upgrade\r\n"
            f"Sec-WebSocket-Key: {key}\r\n"
            "Sec-WebSocket-Version: 13\r\n\r\n"
        )
        sock.sendall(req.encode())
        resp = b""
        while b"\r\n\r\n" not in resp:
            chunk = sock.recv(4096)
            if not chunk:
                raise ConnectionError("handshake: connection closed")
            resp += chunk
        head, _, rest = resp.partition(b"\r\n\r\n")
        lines = head.decode().split("\r\n")
        if "101" not in lines[0]:
            raise ConnectionError(f"handshake rejected: {lines[0]}")
        hdrs = {
            k.strip().lower(): v.strip()
            for k, v in (ln.split(":", 1) for ln in lines[1:] if ":" in ln)
        }
        if hdrs.get("sec-websocket-accept") != accept_key(key):
            raise ConnectionError("handshake: bad Sec-WebSocket-Accept")
        super().__init__(sock, is_client=True)
        self._buf = rest  # frames may ride the handshake packet


def server_handshake(sock: socket.socket) -> WebSocketConnection:
    """Server side of the Upgrade (for the in-process test server)."""
    req = b""
    while b"\r\n\r\n" not in req:
        chunk = sock.recv(4096)
        if not chunk:
            raise ConnectionError("client vanished during handshake")
        req += chunk
    head = req.split(b"\r\n\r\n", 1)[0].decode()
    key = next(
        ln.split(":", 1)[1].strip()
        for ln in head.split("\r\n")
        if ln.lower().startswith("sec-websocket-key:")
    )
    sock.sendall(
        (
            "HTTP/1.1 101 Switching Protocols\r\n"
            "Upgrade: websocket\r\nConnection: Upgrade\r\n"
            f"Sec-WebSocket-Accept: {accept_key(key)}\r\n\r\n"
        ).encode()
    )
    return WebSocketConnection(sock, is_client=False)


# --- SHIP session ------------------------------------------------------


class ShipReader:
    """The state-reader session over a WebSocketClient.

    ``read_range(start, end)`` yields ``get_blocks_result_v0`` payload
    dicts in block order, acking every batch to refill the server's
    in-flight credit (the SHIP flow-control contract). ``spool_range``
    additionally lands the block payloads as parquet files a
    Structured-Streaming file source tails."""

    def __init__(
        self,
        host: str,
        port: int,
        *,
        max_messages_in_flight: int = 8,
        fetch_block: bool = True,
        fetch_traces: bool = True,
        fetch_deltas: bool = True,
        envelope: str = "binary",
    ) -> None:
        if envelope not in ("binary", "json"):
            raise ValueError(f"envelope must be binary|json, not {envelope!r}")
        self.envelope = envelope
        self.ws = WebSocketClient(host, port)
        self.in_flight = max_messages_in_flight
        self.base_request = {  # state-reader.ts:116-128 baseRequest
            "max_messages_in_flight": max_messages_in_flight,
            "have_positions": [],
            "irreversible_only": False,
            "fetch_block": fetch_block,
            "fetch_traces": fetch_traces,
            "fetch_deltas": fetch_deltas,
        }
        # first frame after connect is the node's ABI (onConnect →
        # init_abi, state-reader.ts:806-813) — a TEXT frame carrying
        # the JSON ABI in BOTH envelope modes (that is how the real
        # plugin ships it; everything after is binary); answer
        # get_status
        op, payload = self.ws.recv()
        assert op == OP_TEXT, "SHIP must push its ABI first"
        self.ship_abi = json.loads(payload)
        self._send(["get_status_request_v0", {}])
        tag, self.status = self._recv()
        assert tag == "get_status_result_v0"

    def _send(self, req) -> None:
        if self.envelope == "binary":
            from .ship_envelope import encode_request

            self.ws.send(encode_request(req[0], req[1]), OP_BINARY)
        else:
            self.ws.send(json.dumps(req).encode(), OP_BINARY)

    def _recv(self):
        msg = self.ws.recv()
        if msg is None:
            raise ConnectionError("SHIP closed the connection")
        if self.envelope == "binary":
            from .ship_envelope import decode_result

            return decode_result(msg[1])
        tag, body = json.loads(msg[1])
        return tag, body

    def read_range(self, start: int, end: int, *, on_fork=None):
        """Yield result payloads for [start, end] (inclusive), acking
        each message (ackBlockRange — ack batches of 1, the
        non-abi-scan path of processIncomingBlocks:384-397).

        Fork protocol: a ``this_block.block_num`` at or below the last
        delivered block means the chain forked and the server is now
        streaming the replacement chain from the fork point (SHIP
        resumes in-stream; no re-request is required). The reader
        calls ``on_fork(fork_num)`` BEFORE yielding the replacement
        block so a sink can drop rows >= fork_num, then continues the
        window from the new chain."""
        req = dict(self.base_request)
        req["start_block_num"] = start
        req["end_block_num"] = end
        self._send(["get_blocks_request_v0", req])
        expected = start
        while expected <= end:
            tag, body = self._recv()
            if tag != "get_blocks_result_v0":
                continue  # status notices interleave
            if body.get("this_block") is None:
                break  # head reached below the requested end
            num = body["this_block"]["block_num"]
            if num < expected and on_fork is not None:
                on_fork(num)
            yield body
            expected = num + 1
            self._send(
                ["get_blocks_ack_request_v0", {"num_messages": 1}]
            )

    def spool_range(
        self,
        start: int,
        end: int,
        spool_dir: str,
        *,
        rows_per_file: int = 512,
        file_prefix: str = "spool-",
        control_dir: str | None = None,
    ) -> int:
        """Drain [start, end] into parquet spool files (block_num,
        block_id, payload binary) — the bridge into
        ``streaming/ingest.read_event_stream``'s file tail. Returns
        blocks spooled (net of fork-dropped rows). Files appear
        atomically (write + rename) so a concurrent file stream never
        reads a partial file; ``file_prefix`` keeps parallel readers'
        files range-disjoint inside ONE flat directory
        (:func:`parallel_backfill`).

        Forks: on a block-number regression the stale tail is dropped
        BEFORE the replacement chain lands — buffered rows >=
        fork_num are discarded and any already-flushed file whose
        range reaches fork_num is atomically rewritten without its
        stale rows (deleted if nothing survives), so the finished
        spool holds exactly one row per block, all from the winning
        chain.

        ``control_dir`` (the serving lake root) turns on the control
        journal: every fork lands a ``fork_event`` line and every LIB
        advance a ``lib_update`` line + watermark in
        ``{control_dir}/_meta`` — exactly the two process.send events
        the reference's state-reader emits (state-reader.ts:677,
        953-958) and the ws-router broadcasts to stream clients."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        os.makedirs(spool_dir, exist_ok=True)
        rows: list[dict] = []
        n_files = 0
        # flushed file -> (path, max block_num it contains); forks are
        # near the head, so at most the last file or two rewrite
        flushed: list[tuple[str, int]] = []

        def _table(rs: list[dict]) -> "pa.Table":
            return pa.table(
                {
                    "block_num": pa.array(
                        [r["block_num"] for r in rs], pa.int64()
                    ),
                    "block_id": pa.array(
                        [r["block_id"] for r in rs], pa.string()
                    ),
                    "payload": pa.array(
                        [r["payload"] for r in rs], pa.binary()
                    ),
                }
            )

        def _atomic_write(table: "pa.Table", path: str) -> None:
            tmp = os.path.join(
                spool_dir, f".{os.path.basename(path)}.tmp"
            )
            pq.write_table(table, tmp)
            os.replace(tmp, path)

        def flush() -> None:
            nonlocal n_files
            if not rows:
                return
            path = os.path.join(
                spool_dir, f"{file_prefix}{n_files:06d}.parquet"
            )
            _atomic_write(_table(rows), path)
            flushed.append((path, max(r["block_num"] for r in rows)))
            n_files += 1
            rows.clear()

        def on_fork(fork_num: int) -> None:
            rows[:] = [r for r in rows if r["block_num"] < fork_num]
            while flushed and flushed[-1][1] >= fork_num:
                path, _ = flushed.pop()
                tbl = pq.read_table(path)
                keep = tbl.filter(
                    pa.compute.less(tbl["block_num"], fork_num)
                )
                if keep.num_rows:
                    _atomic_write(keep, path)
                    flushed.append(
                        (path, keep["block_num"].to_pylist()[-1])
                    )
                else:
                    os.remove(path)

        last_num = 0  # last block appended (fork regression detector)
        local_lib = 0
        for body in self.read_range(start, end, on_fork=on_fork):
            blk = body["this_block"]
            if control_dir is not None:
                if last_num and blk["block_num"] <= last_num:
                    # the replacement block regressed the stream: blocks
                    # [fork_num, last_num] were forked out; new_id is
                    # the winning chain's first block (logForkEvent)
                    from ..streaming.control_log import record_fork

                    record_fork(
                        control_dir,
                        starting_block=blk["block_num"],
                        ending_block=last_num,
                        new_id=blk["block_id"],
                    )
                lib = body.get("last_irreversible")
                if lib and lib.get("block_num", 0) > local_lib:
                    from ..streaming.control_log import write_lib

                    local_lib = lib["block_num"]
                    write_lib(
                        control_dir, local_lib, lib.get("block_id", "")
                    )
            last_num = blk["block_num"]
            payload = body.get("block") or b""
            if isinstance(payload, str):  # JSON envelope: base64 text
                payload = base64.b64decode(payload)
            rows.append(
                {
                    "block_num": blk["block_num"],
                    "block_id": blk["block_id"],
                    "payload": bytes(payload),
                }
            )
            if len(rows) >= rows_per_file:
                flush()
        flush()
        return sum(
            pq.read_metadata(path).num_rows for path, _ in flushed
        )

    def close(self) -> None:
        self.ws.close()
        # drain the close echo without blocking forever
        self.ws.sock.settimeout(2)
        try:
            self.ws.recv()
        except Exception:
            pass
        self.ws.sock.close()


def parallel_backfill(
    host: str,
    port: int,
    ranges: list[tuple[int, int]],
    spool_dir: str,
    *,
    max_messages_in_flight: int = 8,
    rows_per_file: int = 512,
    envelope: str = "binary",
) -> int:
    """The reference's parallel-reader backfill layout
    (state-reader.ts is spawned once per block range by the master,
    hyperion-master.ts worker map): one :class:`ShipReader`
    connection per range, all spooling into ONE flat directory under
    range-disjoint file prefixes (``range-{lo:012d}-NNNNNN.parquet``),
    so the downstream file stream globs a single growing lake with no
    recursive lookup. Returns total blocks spooled.

    Threads (not processes): each reader is IO-bound socket work —
    the GIL is released in socket recv — and the parquet spool writes
    are per-reader files, so there is no shared mutable state beyond
    the directory. Failure of any range propagates (the master
    restarts failed readers; here the caller retries the failed
    range — spool files are atomic, so a partial range re-run simply
    re-lands its files)."""
    import threading

    totals: list[int] = [0] * len(ranges)
    errors: list[BaseException | None] = [None] * len(ranges)

    def run(i: int, lo: int, hi: int) -> None:
        try:
            reader = ShipReader(
                host,
                port,
                max_messages_in_flight=max_messages_in_flight,
                envelope=envelope,
            )
            try:
                totals[i] = reader.spool_range(
                    lo,
                    hi,
                    spool_dir,
                    rows_per_file=rows_per_file,
                    file_prefix=f"range-{lo:012d}-",
                )
            finally:
                reader.close()
        except BaseException as e:  # noqa: BLE001 — surfaced below
            errors[i] = e

    threads = [
        threading.Thread(target=run, args=(i, lo, hi), daemon=True)
        for i, (lo, hi) in enumerate(ranges)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    failed = [e for e in errors if e is not None]
    if failed:
        raise RuntimeError(f"{len(failed)} range reader(s) failed") from failed[0]
    return sum(totals)
