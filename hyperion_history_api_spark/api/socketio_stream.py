"""Socket.IO wire compatibility for the stream surface — the packet
layer a STOCK Hyperion stream client speaks (``src/api/socketManager.ts``
:79-230, 540-620), implemented from the public Engine.IO v4 and
Socket.IO v5 protocol specs over this repo's own RFC-6455 server
(``sources/ship_ws.py``), stdlib-only.

Wire contract reproduced (websocket transport, ``EIO=4``):

- Engine.IO: server sends the OPEN packet ``0{"sid",...,"pingInterval",
  "pingTimeout","upgrades":[],"maxPayload"}`` after the ws upgrade,
  then heartbeats ``2`` (ping) which the client answers with ``3``
  (pong); ``4`` carries Socket.IO payloads; ``1`` closes.
- Socket.IO (default namespace): client ``40`` connects, server
  replies ``40{"sid":...}``; events are ``42<ackId?>["name",args...]``
  and acks ``43<ackId>[args...]``.
- Hyperion's session: on connect the server emits
  ``handshake {chain, chain_id}`` (socketManager.ts:119); the client
  emits ``action_stream_request`` / ``delta_stream_request`` with an
  ack callback answered ``{status:"OK", reqUUID, currentBlockNum}``
  (:162-175, 565-570); history replays as ``emitWithAck("message",
  {reqUUID, type: "<kind>_trace", mode: "history", messages: [...],
  filtered})`` — the server BLOCKS on each batch's client ack
  ``{status: true}`` with the 120 s forceful-disconnect timeout
  (helpers/functions.ts:258-305) — and finishes with
  ``message {type:"history_end", reqUUID, mode:"history",
  message:{lastBlock}}`` (:611-616); ``cancel_stream_request`` acks
  ``{status:"OK"}``.

Rows come from :meth:`..api.http_server.HyperionAPI.stream_rows` —
the SAME oracle-checked predicate compiler the SSE and plain-WS
surfaces serve, so this layer adds framing only. Scale shape matches
``ws_stream.py``: one generator per connection, one bounded batch in
memory, backpressure by blocking on the client ack.
"""

from __future__ import annotations

import json
import socket
import time
import uuid

from ..sources.ship_ws import OP_TEXT, WebSocketConnection
from .ws_stream import (
    HANDSHAKE_TIMEOUT,
    AckTimeout,
    CappedWsServer,
    normalize_params,
)

#: engine.io packet types
EIO_OPEN, EIO_CLOSE, EIO_PING, EIO_PONG, EIO_MESSAGE = "0", "1", "2", "3", "4"
#: socket.io packet types (inside an EIO_MESSAGE)
SIO_CONNECT, SIO_EVENT, SIO_ACK = "0", "2", "3"


def _parse_sio(payload: str) -> tuple[str, int | None, list]:
    """Split a Socket.IO packet body (after the leading ``4`` engine.io
    byte) into (sio_type, ack_id, json_args). Default namespace only —
    Hyperion's manager binds the root namespace."""
    sio_type, rest = payload[0], payload[1:]
    if rest.startswith("/"):  # namespace prefix "/ns," (unused here)
        _, sep, rest = rest.partition(",")
        if not sep:
            rest = ""  # namespace-only packet (e.g. "40/ns"): no body
    digits = ""
    while rest and rest[0].isdigit():
        digits += rest[0]
        rest = rest[1:]
    args = json.loads(rest) if rest else []
    return sio_type, (int(digits) if digits else None), args


class SocketIOStreamServer(CappedWsServer):
    """Accepts Socket.IO (EIO=4, websocket transport) subscribers and
    serves the reference's stream session over
    :class:`~.http_server.HyperionAPI`. Accept-loop, connection cap,
    and pre-handshake timeout come from :class:`CappedWsServer` —
    shared with the plain-WS surface so both reject and guard
    identically."""

    def __init__(
        self,
        api,
        host: str = "127.0.0.1",
        port: int = 0,
        *,
        ack_timeout: float = 120.0,
        ping_interval: float = 25.0,
        chain: str = "spark",
        max_connections: int = 64,
        handshake_timeout: float = HANDSHAKE_TIMEOUT,
    ) -> None:
        self.api = api
        self.ack_timeout = ack_timeout
        self.ping_interval = ping_interval
        self.chain = chain
        super().__init__(host, port, max_connections, handshake_timeout)

    def _reject_frame(self) -> str:
        # socket.io CONNECT_ERROR on the default namespace — what a
        # stock client surfaces as connect_error instead of an
        # unexplained transport drop
        return (
            EIO_MESSAGE + "4" + json.dumps({"message": "too many connections"})
        )

    # -- per-connection session --------------------------------------------
    def _session(self, ws: WebSocketConnection, conn_id: int) -> None:
        sid = uuid.uuid4().hex
        ws.send(
            EIO_OPEN
            + json.dumps(
                {
                    "sid": sid,
                    "upgrades": [],
                    "pingInterval": int(self.ping_interval * 1000),
                    "pingTimeout": int(self.ack_timeout * 1000),
                    "maxPayload": 1_000_000,
                }
            ),
            OP_TEXT,
        )
        next_ack = [0]  # server-side emitWithAck id counter
        last_recv = [time.monotonic()]
        last_ping = [time.monotonic()]
        # Engine.IO v4 heartbeat direction: the SERVER pings, the client
        # pongs — a stock socket.io client closes the transport if no
        # ping arrives within pingInterval+pingTimeout, so a server that
        # only ANSWERS pings loses every idle/live-tail session at
        # ~145 s. All sends stay on this session thread (ws.send is not
        # locked): recv waits are bounded at ping_interval and each
        # timeout beat sends one ping; a peer silent past
        # pingInterval+pingTimeout is dropped (engine.io's own rule).
        ws.sock.settimeout(self.ping_interval)

        def heartbeat() -> None:
            if (
                time.monotonic() - last_recv[0]
                > self.ping_interval + self.ack_timeout
            ):
                raise ConnectionError("client heartbeat lost")
            ws.send(EIO_PING, OP_TEXT)
            last_ping[0] = time.monotonic()

        def maybe_ping() -> None:
            """Keep heartbeating through BUSY stretches: a fast-acking
            client or a long Spark scan means recv never times out, so
            the timeout-path heartbeat alone starves — and a stock
            client that measures pings (not data) self-disconnects at
            pingInterval+pingTimeout mid-replay. Called from the send
            loops, which all run on this session thread."""
            if time.monotonic() - last_ping[0] >= self.ping_interval:
                heartbeat()

        def emit(event: str, data, ack_id: int | None = None) -> None:
            pkt = EIO_MESSAGE + SIO_EVENT
            if ack_id is not None:
                pkt += str(ack_id)
            ws.send(pkt + json.dumps([event, data]), OP_TEXT)

        def send_ack(ack_id: int, args: list) -> None:
            ws.send(
                EIO_MESSAGE + SIO_ACK + str(ack_id) + json.dumps(args),
                OP_TEXT,
            )

        def recv_packet() -> tuple[str, str]:
            """One engine.io packet (type, body); answers pings
            transparently (EIO4: either side may heartbeat)."""
            msg = ws.recv()
            if msg is None:
                raise ConnectionError("client closed")
            last_recv[0] = time.monotonic()
            text = msg[1].decode() if isinstance(msg[1], bytes) else msg[1]
            if not text:
                raise ValueError("empty engine.io packet")
            return text[0], text[1:]

        def await_client_ack(ack_id: int) -> dict:
            """Block (bounded) until the client's ACK for ``ack_id`` —
            the emitWithAck 120 s contract; anything else interleaving
            (pongs, cancel events) is handled in place. Recv waits stay
            at ping_interval so the server keeps heartbeating while it
            waits out a slow acker."""
            deadline = time.monotonic() + self.ack_timeout
            try:
                while True:
                    remaining = deadline - time.monotonic()
                    if remaining <= 0:
                        raise AckTimeout("client ack timeout")
                    ws.sock.settimeout(min(self.ping_interval, remaining))
                    try:
                        etype, body = recv_packet()
                    except socket.timeout:
                        if time.monotonic() >= deadline:
                            raise AckTimeout("client ack timeout") from None
                        heartbeat()
                        continue
                    if etype == EIO_PING:
                        ws.send(EIO_PONG + body, OP_TEXT)
                        continue
                    if etype != EIO_MESSAGE:
                        continue  # pongs / close echoes
                    sio_type, got_id, args = _parse_sio(body)
                    if sio_type == SIO_ACK and got_id == ack_id:
                        return args[0] if args else {}
                    # a concurrent client event mid-replay: serve the
                    # cancel contract, ignore the rest
                    if sio_type == SIO_EVENT and args:
                        if args[0] == "cancel_stream_request":
                            if got_id is not None:
                                send_ack(got_id, [{"status": "OK"}])
                            raise ConnectionError("stream cancelled")
            finally:
                ws.sock.settimeout(self.ping_interval)

        # socket.io connect on the default namespace
        while True:
            try:
                etype, body = recv_packet()
            except socket.timeout:
                heartbeat()
                continue
            if etype == EIO_PING:
                ws.send(EIO_PONG + body, OP_TEXT)
                continue
            if etype == EIO_MESSAGE and body and body[0] == SIO_CONNECT:
                break
        ws.send(EIO_MESSAGE + SIO_CONNECT + json.dumps({"sid": sid}), OP_TEXT)
        emit(
            "handshake",
            {"chain": self.chain, "chain_id": uuid.uuid4().hex},
        )

        # request loop: one stream request at a time per connection
        while True:
            try:
                etype, body = recv_packet()
            except socket.timeout:
                heartbeat()
                continue
            if etype == EIO_PING:
                ws.send(EIO_PONG + body, OP_TEXT)
                continue
            if etype == EIO_CLOSE:
                return
            if etype != EIO_MESSAGE:
                continue
            sio_type, ack_id, args = _parse_sio(body)
            if sio_type != SIO_EVENT or not args:
                continue
            event, data = args[0], (args[1] if len(args) > 1 else {})
            if event == "cancel_stream_request":
                if ack_id is not None:
                    send_ack(ack_id, [{"status": "OK"}])
                continue
            if event not in ("action_stream_request", "delta_stream_request"):
                continue
            kind = "action" if event.startswith("action") else "delta"
            req_uuid = uuid.uuid4().hex
            params = normalize_params(dict(data))
            params.pop("ignore_live", None)
            if kind == "delta":
                params["stream"] = "deltas"
            batch_size = int(params.pop("batch_size", 50))
            try:
                rows = self.api.stream_rows(params)
            except Exception as e:  # invalid request -> error callback
                if ack_id is not None:
                    send_ack(
                        ack_id, [{"status": "ERROR", "error": str(e)}]
                    )
                continue
            if ack_id is not None:  # processStreamRequest's callback
                send_ack(
                    ack_id,
                    [
                        {
                            "status": "OK",
                            "reqUUID": req_uuid,
                            "currentBlockNum": 0,
                        }
                    ],
                )
            last_block = 0
            batch: list[dict] = []

            def flush() -> None:
                nonlocal last_block
                if not batch:
                    return
                maybe_ping()
                next_ack[0] += 1
                emit(
                    "message",
                    {
                        "reqUUID": req_uuid,
                        "type": f"{kind}_trace",
                        "mode": "history",
                        "messages": batch,
                        "filtered": 0,
                    },
                    ack_id=next_ack[0],
                )
                resp = await_client_ack(next_ack[0])
                if resp.get("status") is not True:
                    raise ConnectionError("client NACKed history batch")
                last_block = max(
                    last_block,
                    max(
                        int(m.get("block_num", m.get("event_id", 0)))
                        for m in batch
                    ),
                )
                batch.clear()

            for row in rows:
                maybe_ping()  # rows may arrive slowly from a long scan
                batch.append(row)
                if len(batch) >= batch_size:
                    flush()
            flush()
            emit(
                "message",
                {
                    "type": "history_end",
                    "reqUUID": req_uuid,
                    "mode": "history",
                    "message": {"lastBlock": last_block},
                },
            )


class SocketIOClient:
    """Minimal Socket.IO (EIO=4, websocket) client — enough protocol to
    BE the stock Hyperion stream client in tests: connect + handshake,
    emitWithAck for stream requests, and the server-ack'd ``message``
    stream. Written from the same public specs as the server (and
    kept independent of it: packets are built by hand here)."""

    def __init__(self, host: str, port: int) -> None:
        from ..sources.ship_ws import WebSocketClient

        self.ws = WebSocketClient(
            host, port, path="/socket.io/?EIO=4&transport=websocket"
        )
        t, body = self._recv()
        assert t == EIO_OPEN, f"expected engine.io OPEN, got {t}"
        self.open_info = json.loads(body)
        self.ws.send(EIO_MESSAGE + SIO_CONNECT, OP_TEXT)
        self._ack_id = 0
        self.events: list[list] = []  # non-message events observed
        # socket.io connect reply
        sio, _, args = self._expect_sio()
        assert sio == SIO_CONNECT

    def _recv(self) -> tuple[str, str]:
        msg = self.ws.recv()
        if msg is None:
            raise ConnectionError("server closed")
        text = msg[1].decode() if isinstance(msg[1], bytes) else msg[1]
        return text[0], text[1:]

    def _expect_sio(self) -> tuple[str, int | None, list]:
        """Next socket.io packet, answering engine.io pings."""
        while True:
            t, body = self._recv()
            if t == EIO_PING:
                self.ws.send(EIO_PONG + body, OP_TEXT)
                continue
            if t == EIO_MESSAGE:
                return _parse_sio(body)

    def emit_with_ack(self, event: str, data) -> dict:
        self._ack_id += 1
        self.ws.send(
            EIO_MESSAGE
            + SIO_EVENT
            + str(self._ack_id)
            + json.dumps([event, data]),
            OP_TEXT,
        )
        while True:
            sio, ack_id, args = self._expect_sio()
            if sio == SIO_ACK and ack_id == self._ack_id:
                return args[0] if args else {}
            if sio == SIO_EVENT:
                self.events.append(args)

    def next_message(self, *, ack: bool = True) -> dict:
        """Next ``message`` event; acks server emitWithAck batches with
        ``{status: true}`` when ``ack`` (the stock client behavior)."""
        while True:
            sio, ack_id, args = self._expect_sio()
            if sio != SIO_EVENT:
                continue
            if args and args[0] == "message":
                if ack_id is not None and ack:
                    self.ws.send(
                        EIO_MESSAGE
                        + SIO_ACK
                        + str(ack_id)
                        + json.dumps([{"status": True}]),
                        OP_TEXT,
                    )
                return args[1]
            self.events.append(args)

    def close(self) -> None:
        try:
            self.ws.close()
        except (OSError, ConnectionError):
            pass
