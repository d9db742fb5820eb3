"""Fork/LIB awareness on the serving surface (SURVEY §2.9 T5, §2.1
S11): the indexer→serving control journal (streaming/control_log.py),
the SHIP reader's fork_event/lib_update emission
(state-reader.ts:677,953-958), the envelope's real ``lib``
(get_actions.ts:71-80, v1 get_actions.ts:301), and the broadcast to
live stream clients (ws-router.ts:72-83, socketManager.ts:237-239)."""

from __future__ import annotations

import json
import urllib.request

import pytest
from pyspark.sql import functions as F

from hyperion_history_api_spark.streaming.control_log import (
    append_control,
    read_lib,
    record_fork,
    tail_control,
    write_lib,
)

SF_DIR = "/root/testdata/sf0.001"


# -- journal primitives ----------------------------------------------------


def test_tail_control_roundtrip_and_offsets(tmp_path):
    lake = str(tmp_path)
    events, off = tail_control(lake, 0)
    assert events == [] and off == 0  # missing journal = empty tail
    append_control(lake, "lib_update", {"block_num": 5, "block_id": "x"})
    record_fork(lake, 10, 12, "newid")
    events, off = tail_control(lake, 0)
    assert [e["event"] for e in events] == ["lib_update", "fork_event"]
    assert events[1]["data"] == {
        "starting_block": 10,
        "ending_block": 12,
        "new_id": "newid",
    }
    # tail from the new offset: nothing until another append
    again, off2 = tail_control(lake, off)
    assert again == [] and off2 == off
    append_control(lake, "lib_update", {"block_num": 9, "block_id": "y"})
    more, off3 = tail_control(lake, off)
    assert len(more) == 1 and off3 > off


def test_tail_control_ignores_partial_trailing_line(tmp_path):
    import os

    lake = str(tmp_path)
    append_control(lake, "lib_update", {"block_num": 1, "block_id": ""})
    path = os.path.join(lake, "_meta", "control.jsonl")
    with open(path, "ab") as f:  # a torn concurrent append
        f.write(b'{"event":"fork_ev')
    events, off = tail_control(lake, 0)
    assert len(events) == 1  # the torn line is left for the next poll
    with open(path, "ab") as f:
        f.write(b'ent","data":{"starting_block":3}}\n')
    events2, _ = tail_control(lake, off)
    assert events2 == [
        {"event": "fork_event", "data": {"starting_block": 3}}
    ]


def test_lib_watermark_roundtrip(tmp_path):
    lake = str(tmp_path)
    assert read_lib(lake) == {"block_num": 0, "block_id": ""}
    write_lib(lake, 42, "abc")
    assert read_lib(lake) == {"block_num": 42, "block_id": "abc"}
    # write_lib also journals the broadcast line
    events, _ = tail_control(lake, 0)
    assert events == [
        {"event": "lib_update", "data": {"block_num": 42, "block_id": "abc"}}
    ]


# -- SHIP reader emission ----------------------------------------------------


def test_spool_range_journals_fork_and_lib(tmp_path):
    """The ingest side emits exactly the reference's two control
    events: a LIB advance per get_status envelope improvement
    (state-reader.ts:674-680) and a fork with [starting, ending] +
    the winning chain's first block id (logForkEvent :953-958)."""
    from tests.test_ship_ws import _ShipServer, _pos
    from hyperion_history_api_spark.sources.ship_ws import ShipReader

    srv = _ShipServer(n_blocks=20, fork=(16, 12))
    r = ShipReader("127.0.0.1", srv.port, max_messages_in_flight=4)
    lake = str(tmp_path / "lake")
    spool = str(tmp_path / "spool")
    n = r.spool_range(1, 20, spool, rows_per_file=6, control_dir=lake)
    r.close()
    srv.sock.close()
    assert n == 20
    events, _ = tail_control(lake, 0)
    forks = [e for e in events if e["event"] == "fork_event"]
    libs = [e for e in events if e["event"] == "lib_update"]
    assert forks == [
        {
            "event": "fork_event",
            "data": {
                "starting_block": 12,
                "ending_block": 15,
                "new_id": _pos(12, "b")["block_id"],
            },
        }
    ]
    # the fake server reports last_irreversible = n_blocks throughout:
    # one advance (0 -> 20), journaled once, watermark readable
    assert libs and libs[0]["data"]["block_num"] == 20
    assert read_lib(lake)["block_num"] == 20


# -- envelope contract -------------------------------------------------------


@pytest.fixture(scope="module")
def lib_server(spark, tmp_path_factory):
    """An API over a lake copy whose _meta carries a LIB watermark —
    the envelope contract: lib == the ingested watermark, not 0."""
    import shutil

    from hyperion_history_api_spark.api.http_server import (
        HyperionAPI,
        serve_background,
    )
    from hyperion_history_api_spark.api.serving_cache import ResponseCache

    lake = tmp_path_factory.mktemp("liblake")
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        shutil.copy(f"{SF_DIR}/{t}.parquet", lake / f"{t}.parquet")
    write_lib(str(lake), 57, "libid57")
    api = HyperionAPI(
        spark, str(lake), cache=ResponseCache(default_ttl=0)
    )
    srv, _ = serve_background(api)
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    yield base, api
    srv.shutdown()


def _get(base: str, path: str) -> dict:
    with urllib.request.urlopen(base + path, timeout=120) as r:
        return json.loads(r.read())


def test_envelope_lib_matches_ingested_watermark(lib_server):
    base, api = lib_server
    assert api.lib_block() == 57
    # default: lib stays 0 (the reference only resolves it on opt-in)
    body = _get(base, "/v2/history/get_actions?account=7&limit=3")
    assert body["lib"] == 0
    body = _get(
        base, "/v2/history/get_actions?account=7&limit=3&checkLib=true"
    )
    assert body["lib"] == 57
    # simple rows carry the irreversibility flag (get_actions.ts:118)
    body = _get(
        base,
        "/v2/history/get_actions?account=7&limit=3&simple=true"
        "&checkLib=true&sort=asc&after=1",
    )
    for a in body["simple_actions"]:
        assert a["irreversible"] == (a["event_id"] < 57)


def test_v1_get_actions_stamps_lib_unconditionally(lib_server):
    base, _ = lib_server
    body = _get(
        base,
        "/v1/history/get_actions?account_name=5&pos=-1&offset=-5",
    )
    assert body["last_irreversible_block"] == 57


def test_simple_actions_irreversible_absent_at_lib_zero(
    spark, tmp_path
):
    """checkLib with a zero watermark emits NO ``irreversible`` key:
    get_actions.ts:118 is ``response.lib !== 0 ? block_num < lib :
    undefined`` and JSON.stringify drops undefined-valued keys — so at
    lib==0 the key is absent, not false (r13 ADVICE high)."""
    import shutil

    from hyperion_history_api_spark.api.http_server import (
        HyperionAPI,
        serve_background,
    )
    from hyperion_history_api_spark.api.serving_cache import ResponseCache

    lake = tmp_path / "lake0"
    lake.mkdir()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        shutil.copy(f"{SF_DIR}/{t}.parquet", lake / f"{t}.parquet")
    api = HyperionAPI(spark, str(lake), cache=ResponseCache(default_ttl=0))
    srv, _ = serve_background(api)
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        assert api.lib_block() == 0  # no _meta/lib.json in this lake
        body = _get(
            base,
            "/v2/history/get_actions?account=7&limit=3&simple=true"
            "&checkLib=true",
        )
        assert body["lib"] == 0
        assert body["simple_actions"]
        for a in body["simple_actions"]:
            assert "irreversible" not in a
    finally:
        srv.shutdown()


def test_get_transaction_stamps_real_lib(lib_server):
    """get_transaction resolves the REAL watermark on every path
    (get_transaction.ts:67,102) — found and missing alike — while
    get_blocks/get_block keep the reference's hardcoded lib: 0
    (get_blocks.ts:155, get_block.ts:32)."""
    base, _ = lib_server
    body = _get(base, "/v2/history/get_transaction?id=7")
    assert body["executed"] is True
    assert body["lib"] == 57
    missing = _get(base, "/v2/history/get_transaction?id=999999999")
    assert missing["executed"] is False
    assert missing["lib"] == 57
    hyp = _get(base, "/v2/history/get_transaction?model=hyperion&id=7")
    assert hyp["lib"] == 57
    blocks = _get(base, "/v2/history/get_blocks?after=100&before=400")
    assert blocks["lib"] == 0 and blocks["cached"] is False
    one = _get(base, "/v2/history/get_block?block_num=3")
    assert one["lib"] == 0


# -- SSE follow-mode broadcast -----------------------------------------------


def test_sse_follow_forwards_control_events_and_redelivers(
    spark, tmp_path
):
    """A follow-mode SSE subscriber sees lib_update and fork_event as
    NAMED SSE events, and after a fork the stream rewinds: corrected
    rows at already-served sequence numbers are re-delivered AFTER
    the fork notice (the client discards its speculative rows on
    fork_event, exactly the reference flow)."""
    import shutil
    import threading
    import time as _time

    from hyperion_history_api_spark.api.http_server import (
        HyperionAPI,
        serve_background,
    )
    from hyperion_history_api_spark.api.serving_cache import ResponseCache
    from hyperion_history_api_spark.tables import load_tables

    lake = tmp_path / "lake"
    lake.mkdir()
    evdir = lake / "events.parquet"
    evdir.mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", evdir / "part-000.parquet")
    for t in (
        "region nation customer supplier part orders lineitem "
        "documents embeddings"
    ).split():
        shutil.copy(f"{SF_DIR}/{t}.parquet", lake / f"{t}.parquet")
    ev = load_tables(spark, str(lake))["events"]
    head = int(ev.agg(F.max("event_id")).first()[0])

    api = HyperionAPI(spark, str(lake), cache=ResponseCache(default_ttl=0))
    srv, _ = serve_background(api)
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:

        def _append(seq: int, etype: str):
            import os

            before = set(os.listdir(evdir))
            spark.createDataFrame(
                [(seq, 7, etype, 9.5)],
                "event_id long, user_id long, event_type string, "
                "value double",
            ).withColumn(
                "ts", F.timestamp_micros(F.lit(1_700_000_000_000_000))
            ).coalesce(1).write.mode("append").parquet(str(evdir))
            return set(os.listdir(evdir)) - before

        def mutate_later():
            import os

            _time.sleep(2.0)
            # LIB advance broadcast
            write_lib(str(lake), head - 1, "libid")
            _time.sleep(1.0)
            # a speculative block arrives...
            spec_files = _append(head + 1, "speculative")
            _time.sleep(2.5)  # let the poll serve it (cold-session jobs)
            # ...then the chain forks it away: retraction trims the
            # stale spool FIRST (spool_range's on_fork order), THEN
            # the fork is journaled, then the winning block lands —
            # so a scan between journal and landing finds nothing and
            # the cursor stays below the fork point
            for f in spec_files:
                os.remove(evdir / f)
            record_fork(str(lake), head + 1, head + 1, "winning-id")
            _append(head + 1, "forked_replacement")

        threading.Thread(target=mutate_later, daemon=True).start()
        url = (
            base
            + f"/v2/stream?start_from={head - 3}"
            + "&follow=true&poll_sec=0.2&idle_timeout=15"
        )
        frames: list[tuple[str, dict]] = []
        with urllib.request.urlopen(url, timeout=120) as r:
            event = "row"
            for raw in r:
                line = raw.decode().rstrip("\n")
                if line.startswith("event: "):
                    event = line[7:]
                elif line.startswith("data: "):
                    frames.append((event, json.loads(line[6:])))
                    if event == "end" or (
                        event == "row"
                        and frames[-1][1].get("event_type")
                        == "forked_replacement"
                    ):
                        break
                    event = "row"
        kinds = [k for k, _ in frames]
        assert "lib_update" in kinds
        assert "fork_event" in kinds
        fork_at = kinds.index("fork_event")
        lib_frame = dict(frames)[("lib_update")]
        assert lib_frame["block_num"] == head - 1
        fork_frame = frames[fork_at][1]
        assert fork_frame == {
            "starting_block": head + 1,
            "ending_block": head + 1,
            "new_id": "winning-id",
        }
        # the speculative row streamed BEFORE the fork notice, and the
        # corrected row (same sequence number) arrives AFTER it
        served_pre = [
            (d.get("event_id"), d.get("event_type"))
            for k, d in frames[:fork_at]
            if k == "row"
        ]
        assert (head + 1, "speculative") in served_pre
        # strict wire order: the corrected row must NEVER precede the
        # fork notice in the single received-frame log
        assert not any(
            t == "forked_replacement" for _, t in served_pre
        )
        post = [d for k, d in frames[fork_at + 1 :] if k == "row"]
        assert any(
            d.get("event_type") == "forked_replacement"
            and d["event_id"] == head + 1
            for d in post
        )
    finally:
        srv.shutdown()
