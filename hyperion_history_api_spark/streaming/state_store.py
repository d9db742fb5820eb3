"""Mergeable current-state tables (SURVEY §2.1 S6-S8, S11-S12).

Hyperion maintains mutable state (accounts/voters/proposals/permissions/
dynamic contract tables) via Elasticsearch scripted upserts and Mongo
bulkWrite:

- ``updateByBlock`` guard: an incoming doc is applied only if its
  ``block_num`` >= the stored one (stale replays are dropped) —
  reference ``src/indexer/definitions/updateByBlock.painless.ts:3-30``,
  wired at ``src/indexer/helpers/elastic-routes.ts:23-28``.
- ``present == 0`` deletes the row (table-row removal) —
  ``elastic-routes.ts:30-34,118-126``.
- Fork rollback deletes everything from forked block ids —
  ``src/indexer/workers/state-reader.ts:469-599,863-890`` (S11).
- Retention pruning drops partitions older than ``max_retained_blocks``
  — ``src/indexer/modules/lifecycleManager.ts`` (S12).

Spark-first re-expression: state = ``merge`` of (current snapshot ∪
update batch) reduced to the max-block row per natural key — a
shuffle-on-key window dedup, the exact logical plan a Delta ``MERGE
WHEN MATCHED AND s.block_num >= t.block_num`` compiles to. On a real
lake this writes Delta; here the ``ParquetStateStore`` snapshots to
parquet per micro-batch (atomic swap via write-then-rename), which is
the same plan shape at any scale: the merge shuffles only on the
natural key, AQE handles skewed keys, and the snapshot stays
partitioned by key hash.

Divergence note: the painless script merges field-by-field and removes
null fields; we replace the whole row (columnar world — partial-doc
updates don't exist in a fixed-schema lake). Reference rows are always
full docs in practice (mongo-routes.ts builds complete documents), so
results match.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..commitlog import CommitLog, link_files
from ..commitlog import snap_version as _snap_version


def merge_update_by_block(
    current: DataFrame | None,
    updates: DataFrame,
    keys: Sequence[str],
    *,
    block_col: str = "block_num",
    present_col: str | None = None,
    order_col: str | None = None,
) -> DataFrame:
    """Apply one update batch to the current state snapshot.

    Winner per key = highest ``block_col``; on a tie the update wins
    (the painless guard is ``>=``, updateByBlock.painless.ts:5-9).
    Rows whose winning version has ``present_col == 0`` are deleted
    (elastic-routes.ts:30-34).

    Two same-key same-block updates within one batch resolve in batch
    order — the reference applies updates in queue order (deterministic
    last-write-wins). ``order_col`` names the monotonic within-batch
    sequence; when absent we synthesize one from the updates frame's
    row order (stable for a deterministic source, e.g. a file read),
    so the tiebreak chain ``(block desc, is_update desc, seq desc)``
    is total.

    Scale: one hash shuffle on ``keys``; map-side the window is a
    partial top-1, so this is the minimal plan for keyed last-writer-
    wins. Updates within a batch also dedup here (the reference relies
    on queue ordering instead).
    """
    seq = F.col(order_col) if order_col else F.monotonically_increasing_id()
    tagged = updates.withColumn("__is_update", F.lit(1)).withColumn("__seq", seq)
    if current is not None:
        cur = (
            current.withColumn("__is_update", F.lit(0))
            .withColumn("__seq", F.lit(-1).cast("long"))
        )
        tagged = cur.unionByName(tagged, allowMissingColumns=False)
    w = (
        Window.partitionBy(*[F.col(k) for k in keys])
        .orderBy(
            F.col(block_col).desc(),
            F.col("__is_update").desc(),
            F.col("__seq").desc(),
        )
    )
    out = (
        tagged.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn", "__is_update", "__seq")
    )
    if present_col is not None:
        out = out.where(F.col(present_col) != 0)
    return out


def fork_retract(
    df: DataFrame, forked: DataFrame, on: str = "block_id"
) -> DataFrame:
    """Remove all rows written by forked blocks (S11).

    ``state-reader.ts:863-890`` issues a deleteByQuery per forked
    block id across action/delta/block indices; the Spark form is a
    broadcast anti-join (the fork set is tiny — a few blocks around the
    fork point), so no shuffle of the big side.
    """
    return df.join(F.broadcast(forked.select(on).distinct()), on=on, how="left_anti")


def prune_retention(
    df: DataFrame,
    head_block: int,
    max_retained_blocks: int,
    *,
    block_col: str = "block_num",
) -> DataFrame:
    """Keep only blocks newer than head - max_retained_blocks (S12,
    lifecycleManager.ts). On a partitioned lake this predicate prunes
    whole partitions (block_part = floor(block/P))."""
    return df.where(F.col(block_col) > F.lit(head_block - max_retained_blocks))


class ParquetStateStore:
    """A MERGE-maintained state table with a manifest-pointer commit.

    The ``foreachBatch`` target for streaming ingest (SURVEY §3.2 step
    4): each micro-batch merges via :func:`merge_update_by_block` and
    commits the result through the same protocol Iceberg/Delta use at
    heart — **immutable snapshot directories + one atomically-replaced
    pointer file**:

    1. the merged state is written to a fresh ``v<NNNNNNNN>-<uuid>/``
       directory (never modified after publication);
    2. ``MANIFEST.json`` (the pointer) is rewritten via write-temp +
       ``os.replace`` — atomic on POSIX, so a reader resolving the
       manifest sees either the old version or the new one, **never a
       mix of files from both** (the round-2 verdict's crash-consistency
       gap: the old directory-swap had a window with no live snapshot,
       and deleted files a lagging reader had listed);
    3. superseded snapshots are retained for ``keep_versions`` commits
       before GC, so in-flight readers of recent versions keep their
       files (the Delta ``VACUUM`` retention idea). A reader must be
       faster than ``keep_versions`` consecutive commits — configurable.

    Crash-consistency: a writer dying before step 2 leaves an orphan
    directory (GC'd later) and an intact old manifest; dying after step
    2 is a completed commit. There is no partial state a reader can
    observe. Single-writer (one streaming query) is assumed, as with
    the reference's per-table indexer worker; concurrent ``os.replace``
    would be last-writer-wins.

    Fork retraction (:meth:`retract_forked`) shares the same commit
    path, so S11 rollback racing concurrent readers is covered by the
    identical snapshot-isolation argument. On a production lake this
    class is replaced by Delta/Iceberg ``MERGE`` — the protocol here is
    their parquet-only equivalent, isolated behind one class.
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        keys: Sequence[str],
        *,
        block_col: str = "block_num",
        present_col: str | None = None,
        num_buckets: int = 8,
        keep_versions: int = 2,
    ) -> None:
        self.spark = spark
        self.path = path
        self.keys = list(keys)
        self.block_col = block_col
        self.present_col = present_col
        self.num_buckets = num_buckets
        # commit protocol (versioning, pointer swap, retention GC) is
        # the shared CommitLog; this class keeps only merge POLICY
        # (bucketed copy-on-write, updateByBlock semantics)
        self.log = CommitLog(path, keep_versions=keep_versions)

    # -- manifest -----------------------------------------------------

    def read_manifest(self) -> dict | None:
        return self.log.read_manifest()

    def _read_snapshot(self, snap: str) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.path, snap))

    def current(self) -> DataFrame | None:
        m = self.read_manifest()
        if m is None:
            return None
        df = self._read_snapshot(m["snapshot"])
        return df.drop("__b") if "__b" in df.columns else df

    def versions(self) -> list[int]:
        """Committed versions still resolvable (retained window, oldest
        first, current last)."""
        return self.log.versions()

    def read_version(self, version: int) -> DataFrame:
        """Time travel within the retained window: read the snapshot a
        past commit published. Versioned snapshots are exactly what the
        manifest GC keeps for in-flight readers, so any version in
        ``versions()`` resolves; older ones were collected and raise.
        (Same contract as Delta/Iceberg ``VERSION AS OF`` bounded by
        the retention window.)"""
        m = self.read_manifest()
        if m is not None and version == m["version"]:
            return self.current()
        df = self.spark.read.parquet(
            self.log.version_snapshot_dir(version)
        )
        return df.drop("__b") if "__b" in df.columns else df

    # -- commit protocol ----------------------------------------------

    def _bucket(self, df: DataFrame) -> DataFrame:
        """Attach the deterministic hash-bucket column: a pure function
        of the natural key, so a row lives in the same ``__b=K/``
        partition directory in every snapshot."""
        return df.withColumn(
            "__b",
            F.pmod(
                F.xxhash64(*[F.col(k) for k in self.keys]),
                F.lit(self.num_buckets),
            ).cast("int"),
        )

    def _commit(
        self,
        df: DataFrame,
        *,
        link_from: str | None = None,
        touched: list[int] | None = None,
    ) -> None:
        """Publish ``df`` (rows of the touched buckets, or everything
        when ``link_from`` is None) as the next snapshot.

        Copy-on-write at bucket granularity — the Delta/Iceberg
        incremental-commit idea on plain parquet: the write lands only
        the REWRITTEN ``__b=K/`` partition directories; every untouched
        bucket's data files are **hard-linked** from the previous
        snapshot (inode sharing, same trick as ``sources/lake_refresh``),
        so per-commit IO is O(touched buckets), not O(state). GC of a
        superseded snapshot unlinks its names; shared inodes survive in
        the newer snapshots that link them. The manifest ``os.replace``
        remains the single atomic commit point."""
        snap, snap_dir = self.log.new_snapshot()
        if link_from is None and df.isEmpty():
            # empty initial state: plain write preserves the schema
            # (a partitioned write of zero rows emits no footer at all)
            df.write.mode("overwrite").parquet(snap_dir)
        else:
            # repartition on the BUCKET id so each task holds whole
            # buckets and every __b=K/ dir gets ~1 file (repartitioning
            # on the raw keys would spray each bucket across all tasks
            # -> num_buckets^2 small files per snapshot)
            self._bucket(df).repartition(
                self.num_buckets, F.col("__b")
            ).write.mode("overwrite").partitionBy("__b").parquet(snap_dir)
            if link_from is not None:
                for k in range(self.num_buckets):
                    if touched is not None and k in touched:
                        continue
                    src = os.path.join(self.path, link_from, f"__b={k}")
                    if not os.path.isdir(src):
                        continue
                    link_files(src, os.path.join(snap_dir, f"__b={k}"))
            # An all-deleted commit (empty merge, every bucket touched)
            # emits no parquet footers and links nothing — the snapshot
            # dir would be unreadable. Fall back to the schema-preserving
            # plain empty write so the next current()/read_version works.
            if not any(
                e.startswith("__b=") for e in os.listdir(snap_dir)
            ):
                df.write.mode("overwrite").parquet(snap_dir)
        # bucketing modulus is part of the snapshot layout: a reopen
        # with a different num_buckets must NOT take the bucket-pruned
        # incremental path (rows would be merged under the wrong
        # modulus / dropped)
        self.log.publish(snap, extra={"num_buckets": self.num_buckets})

    # -- operations ---------------------------------------------------

    def apply_batch(self, updates: DataFrame) -> None:
        """Merge one update batch and commit ONLY its touched buckets.

        The update batch names the buckets it can change (``__b`` is a
        pure key hash), so the current-state read is pruned to those
        partition directories (a real PartitionFilter on the snapshot
        scan), the merge shuffles only touched-bucket rows, and the
        commit links the rest forward — per-batch cost scales with the
        batch's key spread, not the accumulated state. This is the
        piece that makes a MERGE-maintained 100 TB state table
        affordable per micro-batch."""
        m = self.read_manifest()
        cur_raw = self._read_snapshot(m["snapshot"]) if m else None
        if (
            cur_raw is None
            or "__b" not in cur_raw.columns
            or (m is not None and m.get("num_buckets") != self.num_buckets)
        ):
            # first commit, a legacy/empty unpartitioned snapshot, or a
            # reopen under a DIFFERENT bucketing modulus (the stored
            # __b values are stale — bucket-pruned reads would miss
            # existing rows and drop high-index buckets):
            # full merge + full partitioned write under the new modulus
            merged = merge_update_by_block(
                self.current(),
                updates,
                self.keys,
                block_col=self.block_col,
                present_col=self.present_col,
            )
            self._commit(merged)
            return
        # touched-bucket discovery is one tiny distinct over the
        # (typically already-persisted) batch — no checkpoint: an
        # eager materialization job here costs more than recomputing
        # the one-column bucket projection twice
        touched = sorted(
            r["__b"]
            for r in self._bucket(updates).select("__b").distinct().collect()
        )
        cur_touched = cur_raw.where(F.col("__b").isin(touched)).drop("__b")
        merged = merge_update_by_block(
            cur_touched,
            updates,
            self.keys,
            block_col=self.block_col,
            present_col=self.present_col,
        )
        self._commit(merged, link_from=m["snapshot"], touched=touched)

    def retract_forked(self, forked: DataFrame, *, on: str = "block_id") -> None:
        """S11 fork rollback through the same commit protocol: readers
        see the pre-fork or post-fork snapshot, never a mix. Buckets
        holding no forked rows are linked forward unchanged (the fork
        set is tiny, so most buckets are untouched)."""
        m = self.read_manifest()
        if m is None:
            return
        cur_raw = self._read_snapshot(m["snapshot"])
        if (
            "__b" not in cur_raw.columns
            or m.get("num_buckets") != self.num_buckets
        ):
            self._commit(fork_retract(self.current(), forked, on=on))
            return
        fk = F.broadcast(forked.select(on).distinct())
        touched = sorted(
            r["__b"]
            for r in cur_raw.join(fk, on=on)
            .select("__b")
            .distinct()
            .collect()
        )
        cur_touched = cur_raw.where(F.col("__b").isin(touched)).drop("__b")
        self._commit(
            fork_retract(cur_touched, forked, on=on),
            link_from=m["snapshot"],
            touched=touched,
        )
