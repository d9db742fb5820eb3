"""Direct unit coverage of the SHARED commit protocol
(hyperion_history_api_spark/commitlog.py) — the single audit surface
the three stores (ParquetStateStore, DedupIndexStore, lake refresh)
now delegate to. Store-level behavior (bucketed CoW, delta+compact,
crash-safety through Spark writes) stays pinned in the store suites;
this file pins the protocol invariants themselves."""

from __future__ import annotations

import json
import os

import pytest

from hyperion_history_api_spark.commitlog import (
    CommitLog,
    link_files,
    link_tree,
    replace_dir,
    snap_version,
)


def _mk_snap(log: CommitLog, payload: str) -> str:
    snap, snap_dir = log.new_snapshot()
    os.makedirs(snap_dir)
    with open(os.path.join(snap_dir, "data.txt"), "w") as f:
        f.write(payload)
    return snap


def test_versions_monotonic_and_pointer_atomicity(tmp_path):
    log = CommitLog(str(tmp_path / "s"), keep_versions=2)
    assert log.read_manifest() is None
    assert log.versions() == []
    for i in range(3):
        log.publish(_mk_snap(log, f"v{i+1}"))
    m = log.read_manifest()
    assert m["version"] == 3
    assert snap_version(m["snapshot"]) == 3
    assert log.versions() == [2, 3]  # keep_versions=2 window
    # no stray manifest temp files survive a publish
    assert not [
        e for e in os.listdir(log.path) if e.startswith("MANIFEST.json.tmp")
    ]


def test_retention_gc_removes_only_out_of_window_snaps(tmp_path):
    log = CommitLog(str(tmp_path / "s"), keep_versions=2)
    snaps = []
    for i in range(4):
        s = _mk_snap(log, f"v{i+1}")
        snaps.append(s)
        log.publish(s)
    # window = current + 1 retained: v3, v4 on disk; v1, v2 GC'd
    alive = {e for e in os.listdir(log.path) if e.startswith("v")}
    assert alive == set(snaps[2:])


def test_retain_extra_postpones_gc_one_publish(tmp_path):
    log = CommitLog(str(tmp_path / "s"), keep_versions=2)
    s1, s2 = _mk_snap(log, "a"), None
    log.publish(s1)
    s2 = _mk_snap(log, "b")
    log.publish(s2)
    s3 = _mk_snap(log, "c")
    log.publish(s3, retain_extra=1)  # the delta+compact pairing
    alive = {e for e in os.listdir(log.path) if e.startswith("v")}
    assert s1 in alive  # would have been GC'd without retain_extra
    s4 = _mk_snap(log, "d")
    log.publish(s4)  # normal window resumes: both old ones go
    alive = {e for e in os.listdir(log.path) if e.startswith("v")}
    assert alive == {s3, s4}


def test_extra_manifest_fields_round_trip(tmp_path):
    log = CommitLog(str(tmp_path / "s"))
    log.publish(_mk_snap(log, "x"), extra={"num_buckets": 7, "k": "v"})
    m = log.read_manifest()
    assert m["num_buckets"] == 7 and m["k"] == "v"


def test_version_snapshot_dir_time_travel_and_collected_raises(tmp_path):
    log = CommitLog(str(tmp_path / "s"), keep_versions=2)
    for i in range(3):
        log.publish(_mk_snap(log, f"v{i+1}"))
    d2 = log.version_snapshot_dir(2)
    assert open(os.path.join(d2, "data.txt")).read() == "v2"
    with pytest.raises(ValueError, match="retained window"):
        log.version_snapshot_dir(1)  # collected


def test_corrupt_manifest_reads_as_none(tmp_path):
    log = CommitLog(str(tmp_path / "s"))
    os.makedirs(log.path)
    with open(log.manifest_file(), "w") as f:
        f.write("{not json")
    assert log.read_manifest() is None


def test_link_files_shares_inodes_and_skips_bookkeeping(tmp_path):
    src, dst = tmp_path / "src", tmp_path / "dst"
    os.makedirs(src)
    (src / "part-0.parquet").write_text("data")
    (src / "_SUCCESS").write_text("")
    (src / ".hidden").write_text("")
    link_files(str(src), str(dst))
    assert sorted(os.listdir(dst)) == ["part-0.parquet"]
    assert (
        os.stat(src / "part-0.parquet").st_ino
        == os.stat(dst / "part-0.parquet").st_ino
    )


def test_link_tree_recurses_partition_dirs(tmp_path):
    src, dst = tmp_path / "src", tmp_path / "dst"
    os.makedirs(src / "b=1")
    (src / "b=1" / "f.parquet").write_text("x")
    link_tree(src, dst)
    assert (
        os.stat(src / "b=1" / "f.parquet").st_ino
        == os.stat(dst / "b=1" / "f.parquet").st_ino
    )


def test_replace_dir_swaps_and_cleans(tmp_path):
    dest, tmp = tmp_path / "t", tmp_path / ".t.tmp"
    os.makedirs(dest)
    (dest / "old.txt").write_text("old")
    os.makedirs(tmp)
    (tmp / "new.txt").write_text("new")
    replace_dir(tmp, dest)
    assert os.listdir(dest) == ["new.txt"]
    assert not tmp.exists()
    assert not [e for e in os.listdir(tmp_path) if ".old." in e]


def test_stores_share_the_protocol(tmp_path, spark):
    """The unification claim itself: both versioned stores run on the
    same CommitLog class and produce interoperable manifests."""
    from hyperion_history_api_spark.streaming.dedup_ingest import (
        DedupIndexStore,
    )
    from hyperion_history_api_spark.streaming.state_store import (
        ParquetStateStore,
    )

    st = ParquetStateStore(spark, str(tmp_path / "st"), keys=["k"])
    ix = DedupIndexStore(spark, str(tmp_path / "ix"))
    assert type(st.log) is CommitLog and type(ix.log) is CommitLog
    df = spark.createDataFrame([(1, 10)], "k int, block_num int")
    st.apply_batch(df)
    m = st.read_manifest()
    assert {"version", "snapshot", "history"} <= set(m)
    assert json.load(open(st.log.manifest_file())) == m
