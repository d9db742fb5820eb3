"""ABI codec + decode-pipeline tests (SURVEY §2.10, P16).

The codec is pinned against PUBLIC Antelope test vectors (name
encoding values published in the EOSIO/Antelope docs and widely used
in client libraries), so the encode and decode halves cannot share a
compensating bug.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from hyperion_history_api_spark.functions.abi_codec import (
    AbiDecodeError,
    decode_fields,
    encode_fields,
    name_to_u64,
    u64_to_name,
)
from hyperion_history_api_spark.operators.abi_pipeline import (
    abi_version_table,
    apply_blacklist,
    auto_blacklist_windows,
    build_binary_actions,
    decode_actions,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.001")


# ------------------------------------------------------------------ codec

# public vectors: (name, uint64 value)
KNOWN_NAMES = [
    ("eosio", 6138663577826885632),
    ("eosio.token", 6138663591592764928),
    ("a", 3458764513820540928),
]


@pytest.mark.parametrize("name,val", KNOWN_NAMES)
def test_name_known_vectors(name, val):
    assert name_to_u64(name) == val
    assert u64_to_name(val) == name


def test_name_roundtrip_edge_cases():
    for n in ["", "a.b.c", "zzzzzzzzzzzz", "zzzzzzzzzzzzj", "user1", "x.1"]:
        assert u64_to_name(name_to_u64(n)) == n.rstrip(".")
    with pytest.raises(AbiDecodeError):
        name_to_u64("User")  # uppercase invalid
    with pytest.raises(AbiDecodeError):
        name_to_u64("zzzzzzzzzzzzz")  # 13th char must be <= 'j' (4 bits)


def test_transfer_blob_roundtrip_and_strictness():
    spec = [
        ("from", "name"),
        ("to", "name"),
        ("quantity", "asset"),
        ("memo", "string"),
    ]
    vals = {
        "from": "alice",
        "to": "bob",
        "quantity": (10000, 4, "EOS"),
        "memo": "m" * 300,  # 2-byte varuint length
    }
    blob = encode_fields(spec, vals)
    # known name prefixes: alice = 0x3445...; LE bytes of the uint64
    assert blob[:8] == name_to_u64("alice").to_bytes(8, "little")
    out = decode_fields(spec, blob)
    assert out == vals
    with pytest.raises(AbiDecodeError):
        decode_fields(spec, blob[:-1])  # short
    with pytest.raises(AbiDecodeError):
        decode_fields(spec, blob + b"\x00")  # trailing bytes


# --------------------------------------------------------------- pipeline


def test_decode_pipeline_fallback_and_errors(spark):
    d = decode_actions(build_binary_actions(spark, SF_DIR)).cache()
    # transfers decode clean with correct values
    t = d.where(F.col("action_name") == "transfer")
    assert t.where(F.col("decoded.ds_error")).count() == 0
    # from_account comes from real binary decode; compare vs scalar rule
    src = build_binary_actions(spark, SF_DIR).select("global_sequence", "abi_from")
    joined = t.select("global_sequence", "decoded.from_account").join(
        src, "global_sequence"
    )
    assert joined.where(F.col("from_account") != F.col("abi_from")).count() == 0
    # doit rows: error iff corrupted window
    errs = d.where(F.col("action_name") == "doit").select(
        "block_num", "decoded.ds_error"
    )
    assert errs.where(
        (F.col("block_num") >= 101)
        & (F.col("block_num") < 1001)
        & ~F.col("ds_error")
    ).count() == 0
    assert errs.where(
        ((F.col("block_num") < 101) | (F.col("block_num") >= 1001))
        & F.col("ds_error")
    ).count() == 0
    d.unpersist()


def test_auto_blacklist_windows_and_apply(spark):
    d = decode_actions(build_binary_actions(spark, SF_DIR))
    abis = abi_version_table(spark)
    windows = auto_blacklist_windows(d, abis)
    rows = {(r.contract, r.valid_from, r.valid_until) for r in windows.collect()}
    assert rows == {("mycontract", 1, 1001)}
    decodable = d.where(F.col("abi_blob").isNotNull())
    kept = apply_blacklist(decodable, windows)
    # the WHOLE v1 window is skipped, incl. intact blocks [1,101)
    assert kept.where(
        (F.col("contract") == "mycontract") & (F.col("block_num") < 1001)
    ).count() == 0
    # non-blacklisted rows untouched
    assert (
        kept.where(F.col("contract") == "eosio.token").count()
        == decodable.where(F.col("contract") == "eosio.token").count()
    )


def test_run_decode_ingest_end_to_end(spark, tmp_path):
    """Full streaming flow: binary feed -> decode -> auto-blacklist
    window store -> anti-join -> decoded log."""
    from pyspark.sql import functions as F2

    from hyperion_history_api_spark.streaming.decode_ingest import run_decode_ingest

    paths = run_decode_ingest(spark, SF_DIR, str(tmp_path))
    bl = spark.read.parquet(paths["blacklist"])
    assert {(r.contract, r.valid_from, r.valid_until) for r in bl.collect()} == {
        ("mycontract", 1, 1001)
    }
    log = spark.read.parquet(paths["decoded_log"])
    # whole blacklisted window absent
    assert log.where(
        (F2.col("contract") == "mycontract") & (F2.col("block_num") < 1001)
    ).count() == 0
    # transfers survived, decoded clean with real values
    t = log.where(F2.col("action_name") == "transfer")
    assert t.count() > 0
    assert t.where(F2.col("decoded.ds_error")).count() == 0
    assert t.where(F2.col("decoded.from_account") != F2.col("abi_from")).count() == 0
