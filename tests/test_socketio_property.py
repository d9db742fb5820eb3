"""Property tests for the Socket.IO packet grammar
(api/socketio_stream._parse_sio): round-trip against independently
built packets, and totality — arbitrary junk either parses or raises
ValueError (the session loop's clean-disconnect class), never an
unhandled exception type that would kill the session thread with a
traceback."""

from __future__ import annotations

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from hyperion_history_api_spark.api.socketio_stream import (
    SIO_ACK,
    SIO_EVENT,
    _parse_sio,
)

json_scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**31), max_value=2**31),
    st.floats(allow_nan=False, allow_infinity=False),
    st.text(max_size=40),
)
json_values = st.recursive(
    json_scalars,
    lambda children: st.one_of(
        st.lists(children, max_size=4),
        st.dictionaries(st.text(max_size=10), children, max_size=4),
    ),
    max_leaves=10,
)


@settings(max_examples=200, deadline=None)
@given(
    sio_type=st.sampled_from([SIO_EVENT, SIO_ACK]),
    ack_id=st.one_of(st.none(), st.integers(min_value=0, max_value=10**9)),
    args=st.lists(json_values, min_size=0, max_size=4),
)
def test_parse_roundtrips_built_packets(sio_type, ack_id, args):
    pkt = sio_type + ("" if ack_id is None else str(ack_id)) + json.dumps(args)
    got_type, got_id, got_args = _parse_sio(pkt)
    assert got_type == sio_type
    assert got_id == ack_id
    assert got_args == json.loads(json.dumps(args))


@settings(max_examples=200, deadline=None)
@given(
    ns=st.text(
        alphabet=st.characters(blacklist_characters=",", max_codepoint=0x7F),
        max_size=8,
    ),
    ack_id=st.one_of(st.none(), st.integers(min_value=0, max_value=10**6)),
    args=st.lists(json_scalars, max_size=3),
    with_comma=st.booleans(),
)
def test_namespace_prefix_never_desyncs(ns, ack_id, args, with_comma):
    """Namespaced packets ('2/ns,<id>[...]') parse like root packets;
    a comma-less namespace ('40/ns') is a body-less packet, not an
    IndexError (the bug class the review found)."""
    body = ("" if ack_id is None else str(ack_id)) + json.dumps(args)
    pkt = SIO_EVENT + "/" + ns + ("," + body if with_comma else "")
    got_type, got_id, got_args = _parse_sio(pkt)
    assert got_type == SIO_EVENT
    if with_comma:
        assert got_id == ack_id and got_args == json.loads(json.dumps(args))
    else:
        assert got_id is None and got_args == []


@settings(max_examples=300, deadline=None)
@given(junk=st.text(min_size=1, max_size=60))
def test_junk_is_total_or_valueerror(junk):
    try:
        sio_type, ack_id, args = _parse_sio(junk)
    except ValueError:
        return  # json.JSONDecodeError included — the handled class
    assert isinstance(sio_type, str)
    assert ack_id is None or isinstance(ack_id, int)
