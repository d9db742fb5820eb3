"""Binary SHIP envelope — the state-history plugin's outer
request/result unions encoded per the Antelope serialization spec.

The reference serializes these with the node's own ABI
(``src/indexer/workers/state-reader.ts:612-735``: ``send_request`` /
``deserialize('result', data)``); the struct layouts below are the
public ``state_history_plugin`` ABI shipped with every Antelope node:

- a **variant** is a varuint32 alternative index followed by the
  selected struct's fields in order;
- an **optional** (``T?``) is one presence byte (0/1) followed by the
  value when present;
- an **array** (``T[]``) is a varuint32 count followed by the
  elements;
- primitives (``uint32``/``bool``/``checksum256``/``bytes``) are the
  strict little-endian forms in :mod:`..functions.abi_codec`.

Strictness matches the codec's contract: short reads, trailing bytes,
bad presence bytes, and unknown variant indexes all raise
:class:`~..functions.abi_codec.AbiDecodeError` — a version-skewed peer
fails loudly, which is what drives the reader's JSON debug mode.
"""

from __future__ import annotations

from ..functions.abi_codec import (
    AbiDecodeError,
    _decode_one,
    _encode_one,
    _Reader,
    _write_varuint32,
)

# --- the state_history_plugin ABI subset the session uses ---------------

BLOCK_POSITION = [("block_num", "uint32"), ("block_id", "checksum256")]

STRUCTS: dict[str, list[tuple[str, str]]] = {
    "block_position": BLOCK_POSITION,
    "get_status_request_v0": [],
    "get_blocks_request_v0": [
        ("start_block_num", "uint32"),
        ("end_block_num", "uint32"),
        ("max_messages_in_flight", "uint32"),
        ("have_positions", "block_position[]"),
        ("irreversible_only", "bool"),
        ("fetch_block", "bool"),
        ("fetch_traces", "bool"),
        ("fetch_deltas", "bool"),
    ],
    "get_blocks_ack_request_v0": [("num_messages", "uint32")],
    "get_status_result_v0": [
        ("head", "block_position"),
        ("last_irreversible", "block_position"),
        ("trace_begin_block", "uint32"),
        ("trace_end_block", "uint32"),
        ("chain_state_begin_block", "uint32"),
        ("chain_state_end_block", "uint32"),
    ],
    "get_blocks_result_v0": [
        ("head", "block_position"),
        ("last_irreversible", "block_position"),
        ("this_block", "block_position?"),
        ("prev_block", "block_position?"),
        ("block", "bytes?"),
        ("traces", "bytes?"),
        ("deltas", "bytes?"),
    ],
}

REQUEST_VARIANT = [
    "get_status_request_v0",
    "get_blocks_request_v0",
    "get_blocks_ack_request_v0",
]
RESULT_VARIANT = ["get_status_result_v0", "get_blocks_result_v0"]


# --- recursive value codec ----------------------------------------------


def _encode_value(ftype: str, value) -> bytes:
    if ftype.endswith("?"):
        if value is None:
            return b"\x00"
        return b"\x01" + _encode_value(ftype[:-1], value)
    if ftype.endswith("[]"):
        inner = ftype[:-2]
        return _write_varuint32(len(value)) + b"".join(
            _encode_value(inner, v) for v in value
        )
    spec = STRUCTS.get(ftype)
    if spec is not None:
        return b"".join(
            _encode_value(ft, value[fname]) for fname, ft in spec
        )
    return _encode_one(ftype, value)


def _decode_value(ftype: str, rd: _Reader):
    if ftype.endswith("?"):
        flag = rd.take(1)[0]
        if flag > 1:
            raise AbiDecodeError(f"bad optional presence byte {flag:#x}")
        return _decode_value(ftype[:-1], rd) if flag else None
    if ftype.endswith("[]"):
        inner = ftype[:-2]
        return [_decode_value(inner, rd) for _ in range(rd.varuint32())]
    spec = STRUCTS.get(ftype)
    if spec is not None:
        return {fname: _decode_value(ft, rd) for fname, ft in spec}
    return _decode_one(ftype, rd)


def encode_variant(alternatives: list[str], tag: str, body: dict) -> bytes:
    """``[tag, body]`` -> variant bytes (varuint32 index + fields)."""
    try:
        idx = alternatives.index(tag)
    except ValueError:
        raise AbiDecodeError(
            f"{tag!r} is not an alternative of {alternatives}"
        ) from None
    return _write_varuint32(idx) + _encode_value(tag, body)


def decode_variant(alternatives: list[str], blob: bytes) -> tuple[str, dict]:
    """Variant bytes -> ``(tag, body)``; trailing bytes raise."""
    rd = _Reader(bytes(blob))
    idx = rd.varuint32()
    if idx >= len(alternatives):
        raise AbiDecodeError(
            f"variant index {idx} out of range for {alternatives}"
        )
    tag = alternatives[idx]
    body = _decode_value(tag, rd)
    if not rd.done():
        raise AbiDecodeError("trailing bytes after variant body")
    return tag, body


def encode_request(tag: str, body: dict) -> bytes:
    return encode_variant(REQUEST_VARIANT, tag, body)


def decode_request(blob: bytes) -> tuple[str, dict]:
    return decode_variant(REQUEST_VARIANT, blob)


def encode_result(tag: str, body: dict) -> bytes:
    return encode_variant(RESULT_VARIANT, tag, body)


def decode_result(blob: bytes) -> tuple[str, dict]:
    return decode_variant(RESULT_VARIANT, blob)
