"""Manifest-pointer commit protocol of ParquetStateStore (round-2
verdict item 5): a reader concurrent with a merge/retract observes
either the old snapshot or the new one, never a mix; crashes before
the pointer move are invisible."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from hyperion_history_api_spark.streaming.state_store import ParquetStateStore


def _store(spark, tmp_path, **kw) -> ParquetStateStore:
    return ParquetStateStore(
        spark, str(tmp_path / "st"), keys=["key"], block_col="block_num", **kw
    )


def _upd(spark, rows):
    return spark.createDataFrame(rows, "key long, block_num long, val string")


def test_reader_concurrent_with_merge_sees_one_snapshot(spark, tmp_path):
    """The lagging-reader race the directory swap lost: resolve the
    current snapshot, let a merge commit UNDER the reader, then read —
    the retained-version window keeps the old files, so the reader gets
    exactly the old snapshot's rows."""
    st = _store(spark, tmp_path)
    st.apply_batch(_upd(spark, [(1, 10, "a"), (2, 10, "b")]))
    reader_df = st.current()  # lazy plan pinned to snapshot v1's files
    st.apply_batch(_upd(spark, [(1, 20, "a2"), (3, 20, "c")]))  # commit v2
    old = {(r.key, r.val) for r in reader_df.collect()}  # reads v1 files
    assert old == {(1, "a"), (2, "b")}  # complete old snapshot, no mix
    new = {(r.key, r.val) for r in st.current().collect()}
    assert new == {(1, "a2"), (2, "b"), (3, "c")}


def test_reader_concurrent_with_retract_sees_one_snapshot(spark, tmp_path):
    st = ParquetStateStore(
        spark, str(tmp_path / "st"), keys=["key"], block_col="block_num"
    )
    rows = [(i, 10 + i, f"b{(10 + i) // 5}") for i in range(10)]
    st.apply_batch(
        spark.createDataFrame(rows, "key long, block_num long, block_id string")
    )
    reader_df = st.current()
    forked = spark.createDataFrame([("b3",)], "block_id string")
    st.retract_forked(forked)  # commits v2 through the same protocol
    assert reader_df.count() == 10  # pre-fork snapshot intact
    kept = st.current()
    assert kept.where(F.col("block_id") == "b3").count() == 0
    assert kept.count() < 10


def test_gc_respects_retained_window(spark, tmp_path):
    st = _store(spark, tmp_path, keep_versions=2)
    for i in range(4):
        st.apply_batch(_upd(spark, [(1, i, f"v{i}")]))
    m = st.read_manifest()
    assert m["version"] == 4
    dirs = {d for d in os.listdir(st.path) if d.startswith("v")}
    # current + one retained predecessor; older snapshots GC'd
    assert dirs == {m["snapshot"], *m["history"]}
    assert len(dirs) == 2


def test_crash_before_pointer_move_is_invisible(spark, tmp_path):
    """A writer dying after writing its snapshot dir but before the
    os.replace leaves the old manifest intact — readers are unaffected
    and the orphan is just unreferenced files."""
    st = _store(spark, tmp_path)
    st.apply_batch(_upd(spark, [(1, 10, "a")]))
    m1 = st.read_manifest()
    # simulate the crash: snapshot written, pointer NOT moved
    orphan = os.path.join(st.path, "v99999999-deadbeef")
    _upd(spark, [(1, 99, "ghost")]).write.parquet(orphan)
    assert st.read_manifest() == m1
    assert {r.val for r in st.current().collect()} == {"a"}


def test_no_partial_manifest_left_behind(spark, tmp_path):
    st = _store(spark, tmp_path)
    st.apply_batch(_upd(spark, [(1, 10, "a")]))
    st.apply_batch(_upd(spark, [(1, 20, "b")]))
    stray = [f for f in os.listdir(st.path) if ".tmp-" in f]
    assert stray == []


def test_manifest_versions_monotonic(spark, tmp_path):
    st = _store(spark, tmp_path)
    versions = []
    for i in range(3):
        st.apply_batch(_upd(spark, [(1, i, f"v{i}")]))
        versions.append(st.read_manifest()["version"])
    assert versions == [1, 2, 3]


def test_time_travel_within_retained_window(spark, tmp_path):
    """read_version resolves any retained commit (Delta-style
    VERSION AS OF bounded by the retention window); GC'd versions
    raise instead of silently serving the wrong snapshot."""
    import pytest

    st = _store(spark, tmp_path, keep_versions=3)
    st.apply_batch(_upd(spark, [(1, 10, "a")]))
    st.apply_batch(_upd(spark, [(2, 20, "b")]))
    st.apply_batch(_upd(spark, [(1, 30, "a3")]))
    assert st.versions() == [1, 2, 3]
    v1 = {(r.key, r.val) for r in st.read_version(1).collect()}
    v2 = {(r.key, r.val) for r in st.read_version(2).collect()}
    v3 = {(r.key, r.val) for r in st.read_version(3).collect()}
    assert v1 == {(1, "a")}
    assert v2 == {(1, "a"), (2, "b")}
    assert v3 == {(1, "a3"), (2, "b")}
    st.apply_batch(_upd(spark, [(3, 40, "c")]))  # v4 => v1 GC'd
    assert st.versions() == [2, 3, 4]
    with pytest.raises(ValueError, match="not in retained window"):
        st.read_version(1)


def test_incremental_commit_links_untouched_buckets(spark, tmp_path):
    """Bucket-level copy-on-write: a batch touching one key rewrites
    only that key's bucket; every other bucket's data files in the new
    snapshot are the SAME INODES as the previous snapshot's (hard
    links), and the merged state equals the naive full merge."""
    import os

    from pyspark.sql import functions as F

    st = ParquetStateStore(
        spark, str(tmp_path / "st"), ["k"], block_col="b", num_buckets=8,
        keep_versions=4,
    )
    base = spark.createDataFrame(
        [(i, 1, f"x{i}") for i in range(64)], "k int, b int, v string"
    )
    st.apply_batch(base)
    snap1 = st.read_manifest()["snapshot"]
    st.apply_batch(
        spark.createDataFrame([(7, 2, "updated")], "k int, b int, v string")
    )
    m = st.read_manifest()
    snap2 = m["snapshot"]

    def inodes(snap, bucket):
        d = os.path.join(st.path, snap, f"__b={bucket}")
        if not os.path.isdir(d):
            return None
        return sorted(
            os.stat(os.path.join(d, f)).st_ino
            for f in os.listdir(d)
            if not f.startswith(("_", "."))
        )

    touched = st._bucket(
        spark.createDataFrame([(7,)], "k int")
    ).collect()[0]["__b"]
    linked = rewritten = 0
    for k in range(8):
        a, b = inodes(snap1, k), inodes(snap2, k)
        if k == touched:
            assert a != b  # rewritten bucket: new files
            rewritten += 1
        elif a is not None:
            assert a == b  # untouched bucket: same inodes
            linked += 1
    assert rewritten == 1 and linked >= 5
    # merged state == naive full merge
    rows = {(r["k"], r["b"], r["v"]) for r in st.current().collect()}
    want = {(i, 1, f"x{i}") for i in range(64) if i != 7} | {(7, 2, "updated")}
    assert rows == want


def test_incremental_commit_prunes_snapshot_scan(spark, tmp_path):
    """The touched-bucket read is a real partition-pruned scan:
    PartitionFilters on __b, not a full-snapshot filter."""
    from pyspark.sql import functions as F

    st = ParquetStateStore(
        spark, str(tmp_path / "st"), ["k"], block_col="b", num_buckets=8,
    )
    st.apply_batch(
        spark.createDataFrame(
            [(i, 1, i * 1.0) for i in range(40)], "k int, b int, v double"
        )
    )
    snap = st.read_manifest()["snapshot"]
    pruned = st._read_snapshot(snap).where(F.col("__b").isin([3]))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "__b" in plan


def test_incremental_deletes_and_retraction_still_correct(spark, tmp_path):
    """present=0 deletes and fork retraction through the bucket-
    incremental path produce the same state as the semantics demand."""
    st = ParquetStateStore(
        spark,
        str(tmp_path / "st"),
        ["k"],
        block_col="b",
        present_col="p",
        num_buckets=4,
        keep_versions=4,
    )
    st.apply_batch(
        spark.createDataFrame(
            [(i, 1, 1, f"blk{i % 3}") for i in range(12)],
            "k int, b int, p int, block_id string",
        )
    )
    # delete k=5 via present=0; stale replay for k=6 is dropped
    st.apply_batch(
        spark.createDataFrame(
            [(5, 2, 0, "blk9"), (6, 0, 1, "blk9")],
            "k int, b int, p int, block_id string",
        )
    )
    ks = {r["k"] for r in st.current().collect()}
    assert 5 not in ks and 6 in ks and len(ks) == 11
    # retract everything written by blk1
    st.retract_forked(
        spark.createDataFrame([("blk1",)], "block_id string")
    )
    left = {r["k"] for r in st.current().collect()}
    assert left == {k for k in range(12) if k % 3 != 1 and k != 5}


def test_reopen_with_different_num_buckets_stays_correct(spark, tmp_path):
    """The modulus is part of the snapshot layout: reopening with a
    different num_buckets must NOT take the bucket-pruned incremental
    path (stale __b values would make the merge miss existing rows and
    drop buckets >= the new modulus). The manifest records the modulus
    and a mismatch falls back to the full-rewrite merge."""
    st8 = ParquetStateStore(
        spark, str(tmp_path / "st"), ["k"], block_col="b", num_buckets=8,
    )
    st8.apply_batch(
        spark.createDataFrame(
            [(i, 1, f"x{i}") for i in range(32)], "k int, b int, v string"
        )
    )
    assert st8.read_manifest()["num_buckets"] == 8
    # reopen the same path under a 3-bucket modulus and update one key
    st3 = ParquetStateStore(
        spark, str(tmp_path / "st"), ["k"], block_col="b", num_buckets=3,
    )
    st3.apply_batch(
        spark.createDataFrame([(7, 2, "updated")], "k int, b int, v string")
    )
    rows = {(r["k"], r["v"]) for r in st3.current().collect()}
    want = {(i, f"x{i}") for i in range(32) if i != 7} | {(7, "updated")}
    assert rows == want  # no stale duplicate for k=7, no dropped buckets
    assert st3.read_manifest()["num_buckets"] == 3
    # and the NEXT commit under the new modulus takes the pruned path
    st3.apply_batch(
        spark.createDataFrame([(9, 2, "u9")], "k int, b int, v string")
    )
    rows2 = {(r["k"], r["v"]) for r in st3.current().collect()}
    assert (9, "u9") in rows2 and len(rows2) == 32


def test_all_deleted_incremental_commit_stays_readable(spark, tmp_path):
    """A tombstone batch deleting the last remaining rows produces an
    empty merge with every bucket touched: the commit must still land
    a readable snapshot (schema-preserving empty write), not an empty
    directory that breaks schema inference."""
    st = ParquetStateStore(
        spark, str(tmp_path / "st"), ["k"], block_col="b",
        present_col="p", num_buckets=4,
    )
    st.apply_batch(
        spark.createDataFrame(
            [(1, 1, 1, "a"), (2, 1, 1, "b")], "k int, b int, p int, v string"
        )
    )
    st.apply_batch(
        spark.createDataFrame(
            [(1, 2, 0, "x"), (2, 2, 0, "x")], "k int, b int, p int, v string"
        )
    )
    cur = st.current()  # must not raise schema-inference errors
    assert cur.count() == 0
    assert set(cur.columns) >= {"k", "b", "p", "v"}
    # the store remains usable after the wipe
    st.apply_batch(
        spark.createDataFrame([(3, 3, 1, "c")], "k int, b int, p int, v string")
    )
    assert {r["k"] for r in st.current().collect()} == {3}
