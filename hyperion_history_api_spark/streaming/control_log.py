"""Indexer→serving control-event journal: ``fork_event`` /
``lib_update`` (SURVEY §2.9 T5, §2.1 S11).

Reference topology: the state-reader worker ``process.send()``s
``{event: 'lib_update'|'fork_event', data}`` to the master
(``state-reader.ts:677`` for LIB advances, ``:953-958`` logForkEvent),
the master forwards both to the ws-router worker
(``master.ts:451-505``), and the router ``io.emit()``s each event to
EVERY connected streaming client (``ws-router.ts:72-83``
appendIdAndEmit); the API-side socketManager additionally
relay-forwards both events to its own clients
(``socketManager.ts:237-239`` addRelayForwarding). A stock client uses
``fork_event`` to discard speculative rows it already rendered and
``lib_update`` to advance its irreversibility watermark.

Spark-first analog — the processes are decoupled through the lake, not
an IPC bus:

- the INGEST side appends one JSON line per event to
  ``{lake}/_meta/control.jsonl`` (single ``write()`` of a newline-
  terminated line on an O_APPEND handle: atomic for lines under
  PIPE_BUF, so concurrent range readers never interleave bytes), and
  maintains ``{lake}/_meta/lib.json`` as an atomically-replaced
  watermark file for O(1) envelope reads;
- the SERVING side tails the journal by byte offset (stat-cheap when
  idle) — the server-wide LiveRelay does it once per tick and fans the
  new events to every connection queue, exactly the ``io.emit``
  broadcast shape, with no per-connection file reads.

Event payloads mirror the reference exactly:
``fork_event``: ``{starting_block, ending_block, new_id}``
(state-reader.ts logForkEvent); ``lib_update``: ``{block_num,
block_id}`` (the SHIP envelope's ``last_irreversible`` position,
sources/ship_envelope.py get_blocks_result_v0).
"""

from __future__ import annotations

import json
import os

_META = "_meta"
_CONTROL = "control.jsonl"
_LIB = "lib.json"


def _meta_dir(lake_dir: str, create: bool = False) -> str:
    d = os.path.join(lake_dir, _META)
    if create:
        os.makedirs(d, exist_ok=True)
    return d


def append_control(lake_dir: str, event: str, data: dict) -> None:
    """Append one control event line (the process.send analog)."""
    line = json.dumps({"event": event, "data": data}, separators=(",", ":"))
    path = os.path.join(_meta_dir(lake_dir, create=True), _CONTROL)
    # one write() on an O_APPEND descriptor: atomic under PIPE_BUF, so
    # parallel range readers' fork lines never shear
    fd = os.open(path, os.O_WRONLY | os.O_CREAT | os.O_APPEND, 0o644)
    try:
        os.write(fd, (line + "\n").encode())
    finally:
        os.close(fd)


def tail_control(
    lake_dir: str, offset: int = 0
) -> tuple[list[dict], int]:
    """Events appended past byte ``offset`` plus the new offset — the
    serving side's poll. A missing journal (no ingest yet / a lake
    that never forked) is an empty tail, not an error. Stat-first: an
    unchanged journal costs one syscall, no read."""
    path = os.path.join(_meta_dir(lake_dir), _CONTROL)
    try:
        size = os.stat(path).st_size
    except FileNotFoundError:
        return [], offset
    if size <= offset:
        return [], offset
    with open(path, "rb") as f:
        f.seek(offset)
        chunk = f.read(size - offset)
    # a concurrent append can land a partial final line after our
    # stat; only consume through the last newline and leave the rest
    # for the next poll
    cut = chunk.rfind(b"\n")
    if cut < 0:
        return [], offset
    events = [
        json.loads(ln) for ln in chunk[: cut + 1].splitlines() if ln.strip()
    ]
    return events, offset + cut + 1


def write_lib(lake_dir: str, block_num: int, block_id: str = "") -> None:
    """Advance the LIB watermark: atomic-replace ``lib.json`` (the
    envelope's O(1) read) AND journal a ``lib_update`` control event
    (the broadcast the ws-router forwards, ws-router.ts:74-77)."""
    d = _meta_dir(lake_dir, create=True)
    data = {"block_num": int(block_num), "block_id": block_id}
    tmp = os.path.join(d, f".{_LIB}.tmp")
    with open(tmp, "w") as f:
        json.dump(data, f)
    os.replace(tmp, os.path.join(d, _LIB))
    append_control(lake_dir, "lib_update", data)


def read_lib(lake_dir: str) -> dict:
    """The current LIB watermark, ``{block_num: 0, block_id: ""}``
    when no ingest has recorded one — the reference's pre-connection
    default (socketManager starts currentBlockNum at 0)."""
    path = os.path.join(_meta_dir(lake_dir), _LIB)
    try:
        with open(path) as f:
            return json.load(f)
    except (FileNotFoundError, json.JSONDecodeError):
        return {"block_num": 0, "block_id": ""}


def record_fork(
    lake_dir: str, starting_block: int, ending_block: int, new_id: str
) -> None:
    """Journal a fork: blocks [starting_block, ending_block] were
    replaced by the chain whose first new block id is ``new_id`` —
    the exact logForkEvent payload (state-reader.ts:953-958)."""
    append_control(
        lake_dir,
        "fork_event",
        {
            "starting_block": int(starting_block),
            "ending_block": int(ending_block),
            "new_id": new_id,
        },
    )
