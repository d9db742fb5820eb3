"""Property-based round-trip of the binary SHIP envelope
(sources/ship_envelope.py): hypothesis generates arbitrary session
messages — every encode→decode must be identity, and every strict
truncation must raise, for ALL inputs, not just the handshake shapes
the socket tests happen to exercise."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hyperion_history_api_spark.functions.abi_codec import AbiDecodeError
from hyperion_history_api_spark.sources.ship_envelope import (
    decode_request,
    decode_result,
    encode_request,
    encode_result,
)

u32 = st.integers(min_value=0, max_value=(1 << 32) - 1)
checksum = st.binary(min_size=32, max_size=32).map(lambda b: b.hex())
position = st.fixed_dictionaries({"block_num": u32, "block_id": checksum})
opt_bytes = st.one_of(st.none(), st.binary(max_size=64))

blocks_request = st.fixed_dictionaries(
    {
        "start_block_num": u32,
        "end_block_num": u32,
        "max_messages_in_flight": u32,
        "have_positions": st.lists(position, max_size=5),
        "irreversible_only": st.booleans(),
        "fetch_block": st.booleans(),
        "fetch_traces": st.booleans(),
        "fetch_deltas": st.booleans(),
    }
)

blocks_result = st.fixed_dictionaries(
    {
        "head": position,
        "last_irreversible": position,
        "this_block": st.one_of(st.none(), position),
        "prev_block": st.one_of(st.none(), position),
        "block": opt_bytes,
        "traces": opt_bytes,
        "deltas": opt_bytes,
    }
)

status_result = st.fixed_dictionaries(
    {
        "head": position,
        "last_irreversible": position,
        "trace_begin_block": u32,
        "trace_end_block": u32,
        "chain_state_begin_block": u32,
        "chain_state_end_block": u32,
    }
)


@settings(max_examples=200, deadline=None)
@given(blocks_request)
def test_request_roundtrip(body):
    blob = encode_request("get_blocks_request_v0", body)
    assert decode_request(blob) == ("get_blocks_request_v0", body)


@settings(max_examples=200, deadline=None)
@given(st.one_of(blocks_result.map(lambda b: ("get_blocks_result_v0", b)),
                 status_result.map(lambda b: ("get_status_result_v0", b))))
def test_result_roundtrip(msg):
    tag, body = msg
    assert decode_result(encode_result(tag, body)) == (tag, body)


@settings(max_examples=150, deadline=None)
@given(blocks_result, st.data())
def test_truncation_always_raises(body, data):
    """Strictness: EVERY proper prefix of a valid frame is rejected —
    a short read can never silently decode (the contract that makes
    version skew fail loudly)."""
    blob = encode_result("get_blocks_result_v0", body)
    cut = data.draw(st.integers(min_value=0, max_value=len(blob) - 1))
    with pytest.raises(AbiDecodeError):
        decode_result(blob[:cut])


@settings(max_examples=150, deadline=None)
@given(blocks_request, st.binary(min_size=1, max_size=8))
def test_trailing_bytes_always_raise(body, tail):
    blob = encode_request("get_blocks_request_v0", body) + tail
    with pytest.raises(AbiDecodeError):
        decode_request(blob)
