"""Repair loop end-to-end (streaming/repair.py): seed a spool with
holes (interior gap + missing tail), scan → fill from the in-process
SHIP server over the binary envelope → re-scan clean — the reference's
hyp-repair scan/fill/verify cycle (src/cli/repair-cli) with the window
scan replacing the driver-side binary search."""

from __future__ import annotations

import pytest

from hyperion_history_api_spark.sources.ship_ws import ShipReader
from hyperion_history_api_spark.streaming.repair import (
    coalesce_ranges,
    repair_spool,
    scan_gaps,
)
from tests.test_ship_ws import _ShipServer


def test_coalesce_ranges_unit():
    assert coalesce_ranges([(5, 9), (1, 3), (10, 12), (20, 25), (24, 30)]) == [
        (1, 3),
        (5, 12),
        (20, 30),
    ]
    assert coalesce_ranges([]) == []


def test_scan_gaps_edges(spark):
    df = spark.createDataFrame(
        [(5,), (6,), (9,), (10,)], "block_num long"
    )
    got = [
        (r["gap_start"], r["gap_end"], r["missing"])
        for r in scan_gaps(
            df, "block_num", expected_start=1, expected_head=12
        ).collect()
    ]
    assert got == [(1, 4, 4), (7, 8, 2), (11, 12, 2)]


def test_repair_spool_fills_holes_from_ship(spark, tmp_path):
    spool = str(tmp_path / "spool")
    # seed: blocks 1-12 and 25-40 of a 60-block chain (one connection,
    # two windows — the server resets pending per request)
    seed_srv = _ShipServer(n_blocks=60)
    r = ShipReader("127.0.0.1", seed_srv.port)
    assert r.spool_range(1, 12, spool, rows_per_file=8) == 12
    assert r.spool_range(25, 40, spool, rows_per_file=8, file_prefix="b-") == 16
    r.close()
    seed_srv.sock.close()

    # holes: 13-24 interior, 41-60 tail-edge vs the expected head
    fill_srv = _ShipServer(n_blocks=60)
    report = repair_spool(
        spark,
        "127.0.0.1",
        fill_srv.port,
        spool,
        expected_start=1,
        expected_head=60,
        max_readers=1,  # the stand-in server is single-connection
    )
    fill_srv.sock.close()
    assert report["gaps_before"] == 2
    assert report["missing_before"] == 12 + 20
    assert report["blocks_fetched"] == 32
    assert report["repaired"] is True and report["gaps_after"] == 0
    nums = sorted(
        x["block_num"]
        for x in spark.read.parquet(spool).select("block_num").collect()
    )
    assert nums == list(range(1, 61))  # complete AND duplicate-free


def test_repair_refuses_majority_hole(spark, tmp_path, monkeypatch):
    from hyperion_history_api_spark.streaming import repair as rep

    monkeypatch.setattr(rep, "MAX_GAPS", 1)
    spool = str(tmp_path / "spool")
    seed_srv = _ShipServer(n_blocks=60)
    r = ShipReader("127.0.0.1", seed_srv.port)
    r.spool_range(1, 4, spool, rows_per_file=8)
    r.spool_range(10, 12, spool, rows_per_file=8, file_prefix="b-")
    r.close()
    seed_srv.sock.close()
    with pytest.raises(RuntimeError, match="gaps"):
        rep.repair_spool(
            spark, "127.0.0.1", 1, spool, expected_start=1, expected_head=60
        )
