"""Pure-Python Antelope (EOSIO) binary codec — the subset needed for
the ABI decode UDF family (SURVEY §2.10).

The reference's one true UDF is the abieos hex->JSON decode per
(contract, type, blob) — ``src/indexer/workers/deserializer.ts:893-906``,
``src/indexer/workers/ds-pool.ts:330-341``. This module implements the
wire format for the field types that cover the promoted action shapes
(``@transfer`` etc.): ``name``, ``asset``, ``string``, ``uint64`` —
all per the public Antelope serialization spec:

- ``name``: uint64 LE; base-32 packing of chars ``.12345a-z`` — 12
  chars x 5 bits from the MSB, 13th char in the low 4 bits.
- ``asset``: int64 LE amount + ``symbol`` (1 byte precision + 7 bytes
  ASCII code, NUL-padded).
- ``string``: varuint32 length prefix + UTF-8 bytes.
- ``uint64``: LE.
- plus the primitives the SHIP outer envelope needs
  (``sources/ship_envelope.py``): ``uint32`` LE, ``bool`` (one byte,
  0/1 strict), ``checksum256`` (32 raw bytes <-> hex string),
  ``bytes`` (varuint32 length prefix + raw).

Decoding is STRICT: short reads raise, and trailing bytes after the
last field raise — so decoding a blob against the wrong ABI version
fails loudly instead of silently mis-parsing, which is what drives the
fallback chain and the auto-blacklist (base-parser.ts:158-230).
"""

from __future__ import annotations

import struct

NAME_CHARS = ".12345abcdefghijklmnopqrstuvwxyz"
_CHAR_TO_VAL = {c: i for i, c in enumerate(NAME_CHARS)}


class AbiDecodeError(ValueError):
    """Raised on any malformed/short/overlong blob."""


def name_to_u64(s: str) -> int:
    """Encode an account name (<=13 chars of ``.12345a-z``) to uint64."""
    if len(s) > 13:
        raise AbiDecodeError(f"name too long: {s!r}")
    v = 0
    for i in range(12):
        c = _CHAR_TO_VAL.get(s[i], None) if i < len(s) else 0
        if c is None:
            raise AbiDecodeError(f"invalid name char in {s!r}")
        v = (v << 5) | c
    if len(s) == 13:
        c13 = _CHAR_TO_VAL.get(s[12], None)
        if c13 is None or c13 > 15:
            raise AbiDecodeError(f"invalid 13th char in {s!r}")
        v = (v << 4) | c13
    else:
        v <<= 4
    return v


def u64_to_name(v: int) -> str:
    """Decode a uint64 to the account-name string (trailing dots
    trimmed, matching Antelope's canonical form)."""
    chars = []
    tmp = v
    c13 = tmp & 0x0F
    tmp >>= 4
    vals = []
    for _ in range(12):
        vals.append(tmp & 0x1F)
        tmp >>= 5
    for val in reversed(vals):
        chars.append(NAME_CHARS[val])
    if c13:
        chars.append(NAME_CHARS[c13])
    return "".join(chars).rstrip(".")


def _write_varuint32(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        out.append(b | (0x80 if n else 0))
        if not n:
            return bytes(out)


class _Reader:
    def __init__(self, blob: bytes) -> None:
        self.blob = blob
        self.pos = 0

    def take(self, n: int) -> bytes:
        if self.pos + n > len(self.blob):
            raise AbiDecodeError("short read")
        out = self.blob[self.pos : self.pos + n]
        self.pos += n
        return out

    def varuint32(self) -> int:
        shift, result = 0, 0
        while True:
            if shift > 35:
                raise AbiDecodeError("varuint32 overflow")
            b = self.take(1)[0]
            result |= (b & 0x7F) << shift
            if not (b & 0x80):
                return result
            shift += 7

    def done(self) -> bool:
        return self.pos == len(self.blob)


def _encode_one(ftype: str, value) -> bytes:
    if ftype == "name":
        return struct.pack("<Q", name_to_u64(value))
    if ftype == "uint64":
        return struct.pack("<Q", int(value))
    if ftype == "uint32":
        return struct.pack("<I", int(value))
    if ftype == "bool":
        return b"\x01" if value else b"\x00"
    if ftype == "checksum256":
        raw = bytes.fromhex(value) if isinstance(value, str) else bytes(value)
        if len(raw) != 32:
            raise AbiDecodeError(f"checksum256 needs 32 bytes, got {len(raw)}")
        return raw
    if ftype == "bytes":
        raw = bytes(value)
        return _write_varuint32(len(raw)) + raw
    if ftype == "asset":
        amount_units, precision, code = value  # (int, int, str)
        sym = bytes([precision]) + code.encode("ascii").ljust(7, b"\x00")
        return struct.pack("<q", amount_units) + sym
    if ftype == "string":
        raw = value.encode("utf-8")
        return _write_varuint32(len(raw)) + raw
    raise AbiDecodeError(f"unknown field type {ftype!r}")


def _decode_one(ftype: str, rd: _Reader):
    if ftype == "name":
        return u64_to_name(struct.unpack("<Q", rd.take(8))[0])
    if ftype == "uint64":
        return struct.unpack("<Q", rd.take(8))[0]
    if ftype == "uint32":
        return struct.unpack("<I", rd.take(4))[0]
    if ftype == "bool":
        b = rd.take(1)[0]
        if b > 1:
            raise AbiDecodeError(f"bad bool byte {b:#x}")
        return bool(b)
    if ftype == "checksum256":
        return rd.take(32).hex()
    if ftype == "bytes":
        return rd.take(rd.varuint32())
    if ftype == "asset":
        amount_units = struct.unpack("<q", rd.take(8))[0]
        sym = rd.take(8)
        precision = sym[0]
        code = sym[1:].rstrip(b"\x00").decode("ascii")
        if not code.isalpha() or not code.isupper():
            raise AbiDecodeError(f"bad symbol code {code!r}")
        return (amount_units, precision, code)
    if ftype == "string":
        n = rd.varuint32()
        try:
            return rd.take(n).decode("utf-8")
        except UnicodeDecodeError as e:
            raise AbiDecodeError("bad utf8") from e
    raise AbiDecodeError(f"unknown field type {ftype!r}")


def encode_fields(spec: list[tuple[str, str]], values: dict) -> bytes:
    """Serialize ``values`` per the ABI type ``spec``
    ([(field, type), ...] in order)."""
    return b"".join(_encode_one(ftype, values[fname]) for fname, ftype in spec)


def decode_fields(spec: list[tuple[str, str]], blob: bytes) -> dict:
    """Strictly deserialize ``blob`` per ``spec``; raises
    :class:`AbiDecodeError` on short reads OR trailing bytes."""
    rd = _Reader(blob)
    out = {fname: _decode_one(ftype, rd) for fname, ftype in spec}
    if not rd.done():
        raise AbiDecodeError("trailing bytes")
    return out


from ..udf_compat import pickle_by_value as _pbv  # noqa: E402

_pbv(__name__)
