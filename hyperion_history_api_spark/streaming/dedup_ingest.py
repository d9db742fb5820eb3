"""Streaming near-duplicate detection AT INGEST: the per-batch
incremental MinHash dedup (operators/dedup.incremental_pairs /
extend_dedup_index) wired into a Structured Streaming foreachBatch
sink, with the four ``DedupIndex`` frames persisted behind ONE
manifest pointer so probe and extend always see a consistent index
version.

This is the composition a 100-TB training-data pipeline actually
runs: documents arrive as micro-batches; each batch

1. probes the STORED index (history never re-signed — registered
   texts skip the shingle/sign passes entirely),
2. appends its near-dup pairs to a per-batch output directory
   (replay-idempotent, same ``ingest_batch=<id>`` overwrite
   discipline as streaming/ingest.make_ingest_sink),
3. extends the index (append-only union of the four frames) and
   commits the new version through an atomic manifest ``os.replace``
   (the streaming/state_store protocol — a crash between pairs-write
   and index-commit replays the batch against the OLD index and
   overwrites its own pairs dir, so the published (pairs, index)
   pair is always consistent).

The union of per-batch pair outputs over any ingest order equals the
one-shot full-corpus ``minhash_lsh_pairs`` (replay-order
independence, proven end-to-end through real streaming by
tests/test_streaming_dedup.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..commitlog import CommitLog, link_files
from ..operators.dedup import (
    DedupIndex,
    build_dedup_index,
    incremental_pairs_and_delta,
    minhash_lsh_pairs,
)

_FRAMES = ("bands", "hashes", "members", "registry")

# Compaction clustering key per frame: the column the hot probe path
# equi-joins / looks up on, so a compacted frame is range-clustered
# (footer min/max prunes) AND lands in few large files.
_CLUSTER_KEY = {
    "bands": "band_val",   # probe joins on (band_id, band_val)
    "hashes": None,        # fetched by id; id_col name is caller-owned
    "members": "__rep",    # expansion legs join on the group rep
    "registry": "__fp",    # fingerprint lookup of arriving docs
}


class DedupIndexStore:
    """Manifest-pointer persistence for a :class:`DedupIndex`: each
    commit writes into a fresh ``v<NNNNNNNN>-<uuid>/`` directory and
    atomically swaps ONE pointer file, so readers and the next batch's
    extend see all four frames from the same version — never bands of
    one version against a registry of another. Superseded versions are
    retained for ``keep_versions`` commits (in-flight reader
    protection), then GC'd.

    Two commit granularities (the Delta-lake append/OPTIMIZE split):

    - :meth:`commit_delta` persists only the batch's ADDITIONS —
      previous data files are hard-linked forward (inode sharing, the
      state_store trick) and the delta lands as a few new files.
      Per-commit IO is O(batch), which is what makes a streaming index
      affordable; the cost is fragmentation — after N commits each
      frame is ~N-way split and every probe opens every file.
    - :meth:`compact` is the ``OPTIMIZE``: rewrite each frame
      range-clustered by its probe key (bands by ``band_val``, members
      by rep, registry by fp) into few large files, published through
      the SAME atomic manifest swap — readers of the pre-compaction
      version keep their (linked) files, and rows are bit-identical
      (pinned by tests/test_streaming_dedup.py).

    Reference anchor: the ES segment-merge / index-lifecycle behavior
    this mirrors (src/indexer/modules/lifecycleManager.ts:18-60 —
    Hyperion actively merges segments and rolls indices rather than
    letting write-granularity segments accumulate).
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        *,
        keep_versions: int = 2,
        compact_every: int | None = None,
        compact_target_files: int = 4,
        delta_write_partitions: int = 2,
        cache_frames: bool = False,
    ) -> None:
        self.spark = spark
        self.path = path
        # version-checked read-through cache: the probe DAG references
        # the stored frames ~8 times per micro-batch, and without a
        # persist each reference is a separate parquet scan (listing +
        # decode of a directory whose file count grows every delta
        # commit). A long-lived ingest sink turns this on; one-shot
        # readers keep the default (no executor-memory footprint).
        # Correctness is by construction: the cache key is the
        # manifest version, so a cached frame is always the published
        # snapshot, never a speculative one.
        self.cache_frames = cache_frames
        self._frame_cache: tuple[int, DedupIndex] | None = None
        # the PERSISTED parquet-read frames underlying the cache —
        # kept separately because commit_delta advances _frame_cache
        # to (version+1, cached ∪ delta) unions, and teardown must
        # unpersist the base frames those unions are built over
        self._cache_base: DedupIndex | None = None
        # commit protocol (versioning, pointer swap, retention GC) is
        # the shared CommitLog; this class keeps only index POLICY
        # (which frames, delta layout, compaction clustering)
        self.log = CommitLog(path, keep_versions=keep_versions)
        # auto-compact after every K delta commits (None = manual only)
        self.compact_every = compact_every
        self.compact_target_files = max(1, compact_target_files)
        # a micro-batch delta is O(batch) rows — landing it at shuffle
        # parallelism would add ~shuffle_partitions tiny files per
        # frame per commit; coalescing to a couple of files per frame
        # cuts the fragmentation RATE ~16x before compaction even runs
        self.delta_write_partitions = max(1, delta_write_partitions)

    def read_manifest(self) -> dict | None:
        return self.log.read_manifest()

    def read(self) -> DedupIndex | None:
        m = self.read_manifest()
        if m is None:
            return None
        version = int(m["version"])
        if self._frame_cache is not None:
            cached_v, cached = self._frame_cache
            if cached_v == version:
                return cached
            self._drop_cache()
        base = os.path.join(self.path, m["snapshot"])
        idx = DedupIndex(
            **{
                f: self.spark.read.parquet(os.path.join(base, f))
                for f in _FRAMES
            }
        )
        if self.cache_frames:
            idx = DedupIndex(
                **{f: getattr(idx, f).persist() for f in _FRAMES}
            )
            self._frame_cache = (version, idx)
            self._cache_base = idx
        return idx

    def _drop_cache(self) -> None:
        """Unpersist the cached frames (superseded version /
        compaction reset) — nothing computes through them once the
        next read comes from parquet."""
        if self._cache_base is not None:
            for f in _FRAMES:
                getattr(self._cache_base, f).unpersist()
        self._cache_base = None
        self._frame_cache = None

    # -- commit protocol ----------------------------------------------

    @staticmethod
    def _canon(df: DataFrame) -> DataFrame:
        """Canonical column order for every written file: files of one
        frame directory must agree (linked v1 files + appended delta
        files are read as one parquet dataset)."""
        return df.select(*sorted(df.columns))

    def last_ingest_batch(self) -> int | None:
        """The foreachBatch ``batch_id`` of the last APPLIED index
        commit, or None if the store is unseeded / was committed
        outside a streaming sink."""
        m = self.read_manifest()
        return None if m is None or "last_ingest_batch" not in m else int(
            m["last_ingest_batch"]
        )

    def commit(self, index: DedupIndex, *, batch_id: int | None = None) -> None:
        """Full-index commit (seed / rebuild): writes all four frames.
        ``batch_id`` (when committing from a streaming sink) is
        recorded in the manifest so a replayed micro-batch can be
        recognized and skipped — see :meth:`commit_delta`."""
        snap, snap_dir = self.log.new_snapshot()
        for f in _FRAMES:
            self._canon(getattr(index, f)).write.mode("overwrite").parquet(
                os.path.join(snap_dir, f)
            )
        extra = {} if batch_id is None else {"last_ingest_batch": int(batch_id)}
        self.log.publish(snap, extra=extra)

    def commit_delta(
        self,
        delta: DedupIndex,
        *,
        batch_id: int | None = None,
        also: tuple = (),
    ) -> None:
        """Append-only commit: hard-link every data file of the
        current snapshot forward, then land only the delta rows as new
        files. IO is O(batch); the manifest swap stays the single
        atomic commit point (a crash mid-write leaves an orphan dir
        and an intact pointer).

        foreachBatch is at-least-once: a sink retried for batch N
        re-runs against the index that ALREADY contains N's rows, and
        blindly re-appending would bloat the index with duplicate
        signature/registry rows forever (the pair/keeper OUTPUT stays
        correct — partition overwrite + id_a<id_b — but the index does
        not). ``batch_id <= last_ingest_batch`` therefore short-circuits
        to a no-op: the pairs dir was already overwritten idempotently
        by the caller, and the index already holds this batch. A crash
        BETWEEN pairs-write and index-commit replays with
        ``batch_id > last_ingest_batch`` and commits normally.

        ``also``: extra write callables (the sink's own per-batch
        parquet outputs — pairs, clean rows) executed CONCURRENTLY
        with the four frame writes, all gated behind the single
        manifest swap. Spark job submission is thread-safe and every
        leg here is a small independent write job whose wall-clock is
        dominated by fixed scheduling cost, so running the ~6 legs on
        threads collapses the sink's serial-job ladder into roughly
        one job's latency (round-6 verdict item 6: the per-wave
        constant, not the data volume, capped streaming throughput).
        Crash semantics are unchanged — the manifest ``os.replace``
        after ALL legs finish remains the only commit point, and the
        replay guard skips the ``also`` legs together with the frames
        (an applied batch's outputs are already durable)."""
        m = self.read_manifest()
        if m is None:
            raise ValueError("commit_delta requires a seeded index store")
        if (
            batch_id is not None
            and "last_ingest_batch" in m
            and int(batch_id) <= int(m["last_ingest_batch"])
        ):
            return  # at-least-once replay of an applied batch
        snap, snap_dir = self.log.new_snapshot()
        prev = os.path.join(self.path, m["snapshot"])
        delta_commits = int(m.get("delta_commits", 0)) + 1
        extra = {"delta_commits": delta_commits}
        if batch_id is not None:
            extra["last_ingest_batch"] = int(batch_id)
        elif "last_ingest_batch" in m:
            extra["last_ingest_batch"] = int(m["last_ingest_batch"])
        from concurrent.futures import ThreadPoolExecutor

        advancing = (
            self.cache_frames
            and self._frame_cache is not None
            and self._frame_cache[0] == int(m["version"])
        )
        if advancing:
            # the cache will advance to (cached ∪ delta) after the
            # publish; checkpoint each delta frame LAZILY so its own
            # write leg below (its only in-commit action) materializes
            # O(batch) blocks — next wave's probe then reads flat
            # block-backed unions instead of re-expanding the delta's
            # lineage (delta.members anti-joins the CURRENT cache, so
            # an un-truncated chain would nest one full index plan
            # per wave)
            delta = DedupIndex(
                **{
                    f: getattr(delta, f).localCheckpoint(eager=False)
                    for f in _FRAMES
                }
            )

        def _write_frame(f: str) -> None:
            dst = os.path.join(snap_dir, f)
            link_files(os.path.join(prev, f), dst)
            self._canon(getattr(delta, f)).coalesce(
                self.delta_write_partitions
            ).write.mode("append").parquet(dst)

        legs = [lambda f=f: _write_frame(f) for f in _FRAMES] + list(also)
        with ThreadPoolExecutor(max_workers=len(legs)) as pool:
            futures = [pool.submit(leg) for leg in legs]
            for fut in futures:
                fut.result()  # first failure propagates; no publish
        self.log.publish(snap, extra=extra)
        if advancing:
            # advance the cache IN PLACE instead of invalidating: the
            # published snapshot is by construction (linked history) ∪
            # (delta rows), and both sides already live in this
            # session — the base frames persisted, the delta frames
            # checkpoint-backed by the write legs above. Re-listing +
            # re-decoding the whole index from parquet every wave was
            # the steady-state read cost (round-8); the union chain
            # stays O(waves-since-compaction) flat block-backed legs
            # because compaction resets to a fresh parquet read.
            # unionByName matches columns by name, so the written
            # _canon order is irrelevant here.
            cached = self._frame_cache[1]
            self._frame_cache = (
                int(m["version"]) + 1,
                DedupIndex(
                    **{
                        f: getattr(cached, f).unionByName(
                            getattr(delta, f)
                        )
                        for f in _FRAMES
                    }
                ),
            )
        if self.compact_every and delta_commits >= self.compact_every:
            # the paired compaction must not burn a retention slot of
            # its own (two publishes in one sink invocation would halve
            # the documented in-flight reader window)
            self.compact(retain_extra=1)

    def compact(self, *, retain_extra: int = 0) -> None:
        """The OPTIMIZE pass: rewrite each frame range-clustered by
        its probe key into ``compact_target_files`` files and publish
        as a fresh version (``delta_commits`` resets). Equality is
        structural — same rows, new physical layout."""
        index = self.read()
        if index is None:
            return
        m = self.read_manifest()
        snap, snap_dir = self.log.new_snapshot()

        def _rewrite(f: str) -> None:
            df = getattr(index, f)
            key = _CLUSTER_KEY[f]
            if key is None or key not in df.columns:
                # hashes: cluster on the caller-named id column (the
                # only non-__h column of the frame)
                key = next(c for c in df.columns if c != "__h")
            (
                self._canon(df)
                .repartitionByRange(self.compact_target_files, F.col(key))
                .sortWithinPartitions(key)
                .write.mode("overwrite")
                .parquet(os.path.join(snap_dir, f))
            )

        # the four rewrites are independent write jobs gated behind
        # the one publish — run them on threads like commit_delta's
        # legs (the serial ladder made the auto-compaction wave the
        # slowest wave of the steady window, round-8)
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=len(_FRAMES)) as pool:
            for fut in [pool.submit(_rewrite, f) for f in _FRAMES]:
                fut.result()  # first failure propagates; no publish
        extra = {"delta_commits": 0, "compacted": True}
        if m is not None and "last_ingest_batch" in m:
            # the replay guard must survive an OPTIMIZE rewrite —
            # compaction changes layout, not applied-batch history
            extra["last_ingest_batch"] = int(m["last_ingest_batch"])
        self.log.publish(snap, extra=extra, retain_extra=retain_extra)

    def frame_file_counts(self) -> dict[str, int]:
        """Data files per frame of the current snapshot (the
        fragmentation observable the compaction bench tracks)."""
        m = self.read_manifest()
        if m is None:
            return {}
        base = os.path.join(self.path, m["snapshot"])
        return {
            f: sum(
                1
                for e in os.listdir(os.path.join(base, f))
                if e.endswith(".parquet")
            )
            for f in _FRAMES
        }


def make_dedup_sink(
    spark: SparkSession,
    out_dir: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    compact_every: int | None = 8,
    assume_small_batch: bool = True,
):
    """foreachBatch sink: probe -> append pairs -> delta-commit the
    index additions (O(batch) IO, history hard-linked forward), with
    an automatic compaction every ``compact_every`` delta commits so
    probe cost stays flat over a long ingest run.
    Returns ``(sink, paths)`` like ``make_ingest_sink``.

    ``assume_small_batch`` (default True) asserts every micro-batch
    fits the probe's 64 MB broadcast gate, skipping the per-wave gate
    count (worth ~17% of steady wave latency,
    STREAM_CURATION_BENCH_r08). Pass False for feeds that may replay
    BULK-sized spool files (maxFilesPerTrigger caps files, not rows)
    — those batches then pay the counted gate and fall back to a
    shuffle join instead of a giant broadcast."""
    store = DedupIndexStore(
        spark,
        os.path.join(out_dir, "dedup_index"),
        compact_every=compact_every,
        cache_frames=True,
    )
    pairs_path = os.path.join(out_dir, "dup_pairs")

    def sink(batch: DataFrame, batch_id: int) -> None:
        batch = batch.select(id_col, text_col).persist()
        try:
            index = store.read()
            if index is None:
                # seed: the first batch pairs against itself and
                # becomes the initial index
                pairs = minhash_lsh_pairs(
                    batch, text_col, id_col, threshold=threshold
                )
                pairs.write.mode("overwrite").parquet(
                    os.path.join(pairs_path, f"ingest_batch={batch_id}")
                )
                store.commit(
                    build_dedup_index(batch, text_col, id_col),
                    batch_id=batch_id,
                )
            else:
                pairs, delta = incremental_pairs_and_delta(
                    index,
                    batch,
                    text_col,
                    id_col,
                    threshold=threshold,
                    # foreachBatch micro-batches: skip the probe-side
                    # count gate, fold the split materialization into
                    # the shingle checkpoint job (round-8)
                    assume_small_batch=assume_small_batch,
                )
                store.commit_delta(
                    delta,
                    batch_id=batch_id,
                    # the pairs write rides the commit's thread pool,
                    # gated behind the same manifest swap
                    also=(
                        lambda: pairs.write.mode("overwrite").parquet(
                            os.path.join(
                                pairs_path, f"ingest_batch={batch_id}"
                            )
                        ),
                    ),
                )
        finally:
            batch.unpersist()

    return sink, {"pairs": pairs_path, "index": store.path}


def read_pairs(spark: SparkSession, pairs_path: str) -> DataFrame:
    """All pairs emitted so far (the per-batch union)."""
    return spark.read.parquet(pairs_path).drop("ingest_batch")
