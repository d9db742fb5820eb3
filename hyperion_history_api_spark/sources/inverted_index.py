"""Stored inverted index with incremental maintenance — the engine's
form of the reference's core storage primitive.

Hyperion's entire query layer sits on Elasticsearch, which IS an
inverted index: every memo/``match`` search the reference serves
(functions.ts:154-169) reads term postings that the INDEXER maintained
at ingest time; queries never re-tokenize the corpus. The engine's
``doc_search_bm25`` computes the same scores from scratch per query —
correct, but a full-corpus tokenize per search is the wrong serving
story at 100 TB. This module stores the index and maintains it
incrementally, exactly like the dedup/ANN artifact stores:

Frames (parquet, one directory per frame, CommitLog-versioned):

- ``postings``: (word, doc_id, tf, dl) — the classic postings list,
  with the document length denormalized onto each posting so scoring
  needs NO join back to a doc table. Append-only across commits (the
  corpus contract is Hyperion's: documents are immutable and new
  commits carry NEW doc_ids — the append-only history model).
  Full builds cluster by word, so a query's terms prune to a few
  files via parquet min/max footer stats.
- ``df``: (word, df) — document frequencies. Rewritten on every
  commit (it is an aggregate), but it is vocabulary-sized: tiny
  relative to postings at any scale that matters.
- ``stats``: one row (n, sumdl) — INTEGER sums, not the average, so
  increments merge with exact arithmetic (avgdl = sumdl/n at read
  time; no float-accumulation drift across commit orders).

Delta commit cost is O(batch tokens) + O(vocabulary): postings files
of the previous snapshot hard-link forward, only the batch's postings
land as new files; df/stats rewrite from (previous || batch) — no
history re-tokenization ever. The manifest swap is the single atomic
commit point (shared CommitLog, commitlog.py).

BM25 serving reads ONLY the query terms' postings (pushed word
filter), broadcasts the filtered df and the 1-row stats, and top-ks
with TakeOrdered — per-query cost proportional to the matched
postings, not the corpus. Score formula and constants are identical
to doc_search_bm25 (Lucene k1=1.2, b=0.75), and the registry row
builds the store in two increments, so its oracle hash proves
incremental maintenance == from-scratch SQL scoring.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..commitlog import CommitLog, link_files

_BM25_K1 = 1.2
_BM25_B = 0.75

POSTINGS_FRAME = "postings"
DF_FRAME = "df"
STATS_FRAME = "stats"
_FRAMES = (POSTINGS_FRAME, DF_FRAME, STATS_FRAME)
# Optional 4th frame: (doc_id) rows of RETRACTED documents. The
# append-only corpus contract holds for `documents`, but the moment
# the index serves forkable data (the actions-lake memo field), a fork
# rollback must remove the tip's postings — ES does this with
# deleteByQuery during fork handling (state-reader.ts:469-599), Lucene
# with per-segment tombstone bitmaps cleaned at merge. Same design
# here: retraction appends tombstone ids (O(retracted) IO, postings
# never rewritten), serving anti-joins them out, compaction physically
# drops them. UNLIKE Lucene (which leaves docFreq stale until merge),
# df/stats are adjusted EXACTLY at retraction commit time, so stored
# scores equal from-scratch scores on the retracted corpus — the
# property the oracle row pins.
TOMB_FRAME = "tombstones"


def _tokenize(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(word, doc_id, tf, dl, positions) rows — the same
    ``split(text, ' ')`` token contract as doc_search_bm25/
    doc_search_tfidf, so stored scores are comparable with the
    from-scratch path bit-for-bit. ``positions`` is the sorted
    in-document token-offset list (the Lucene positional-postings
    trade-off: ~token-count list entries instead of ~distinct-term
    rows, bought back by phrase/proximity queries needing no corpus
    access). ``sort_array`` over ``collect_list`` makes the array
    canonical regardless of partitioning, so incremental and full
    builds stay row-identical."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.col(text_col), " ").alias("ws"),
    )
    return (
        toks.select(
            "doc_id",
            F.size("ws").alias("dl"),
            F.posexplode("ws").alias("pos", "word"),
        )
        .groupBy("word", "doc_id", "dl")
        .agg(
            F.count(F.lit(1)).alias("tf"),
            F.sort_array(F.collect_list("pos")).alias("positions"),
        )
    )


class InvertedIndexStore:
    """Versioned inverted-index store (postings/df/stats frames on
    the shared CommitLog protocol — same crash-safety contract as
    ParquetStateStore and DedupIndexStore)."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        *,
        keep_versions: int = 2,
        cluster_files: int = 8,
        delta_write_partitions: int = 2,
        compact_every: int | None = None,
    ) -> None:
        self.spark = spark
        self.path = path
        self.log = CommitLog(path, keep_versions=keep_versions)
        self.cluster_files = max(1, cluster_files)
        self.delta_write_partitions = max(1, delta_write_partitions)
        # auto-OPTIMIZE after every K delta commits (None = manual) —
        # same fragmentation policy as DedupIndexStore: a long ingest
        # run otherwise splits each frame ~K-ways and every query
        # opens every file
        self.compact_every = compact_every

    # -- read -----------------------------------------------------------

    def read(self) -> dict[str, DataFrame] | None:
        m = self.log.read_manifest()
        if m is None:
            return None
        base = self.log.snapshot_dir(m["snapshot"])
        return {
            f: self.spark.read.parquet(os.path.join(base, f))
            for f in _FRAMES
        }

    def tombstones(self) -> DataFrame | None:
        """(doc_id) frame of retracted documents in the current
        snapshot, or None when nothing was ever retracted (the common
        case — serving pays zero extra work then)."""
        m = self.log.read_manifest()
        if m is None:
            return None
        t = os.path.join(self.log.snapshot_dir(m["snapshot"]), TOMB_FRAME)
        return self.spark.read.parquet(t) if os.path.isdir(t) else None

    def live_postings(self, idx: dict[str, DataFrame] | None = None) -> DataFrame:
        """Postings minus tombstoned docs — what every serving path
        scores over. Tombstones are fork-tip-sized (retraction is the
        exceptional path), so the anti-join broadcasts them; with no
        tombstones this IS the raw postings frame (no join in the
        plan)."""
        idx = idx if idx is not None else self.read()
        if idx is None:
            raise ValueError("live_postings requires a seeded index store")
        p = idx[POSTINGS_FRAME]
        tomb = self.tombstones()
        if tomb is not None:
            # left_anti moves the join key first; restore the frame's
            # column order so callers see one schema either way
            p = p.join(F.broadcast(tomb), "doc_id", "left_anti").select(
                *idx[POSTINGS_FRAME].columns
            )
        return p

    # -- commit ----------------------------------------------------------

    @staticmethod
    def _canon(df: DataFrame) -> DataFrame:
        # one column order for every file of a frame: linked v1 files
        # and appended delta files are read as one parquet dataset
        return df.select(*sorted(df.columns))

    def _aggregates(
        self, postings: DataFrame
    ) -> tuple[DataFrame, DataFrame]:
        df_t = postings.groupBy("word").agg(
            F.count(F.lit(1)).alias("df")
        )  # one posting row per (word, doc): count == distinct docs
        stats = postings.select("doc_id", "dl").distinct().agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("dl").cast("long").alias("sumdl"),
        )
        return df_t, stats

    def last_ingest_batch(self) -> int | None:
        """foreachBatch ``batch_id`` of the last APPLIED commit (None
        when unseeded / committed outside a streaming sink) — the
        at-least-once replay guard, same contract as
        streaming/dedup_ingest.DedupIndexStore."""
        m = self.log.read_manifest()
        return None if m is None or "last_ingest_batch" not in m else int(
            m["last_ingest_batch"]
        )

    def commit(
        self,
        docs: DataFrame,
        *,
        text_col: str = "text",
        id_col: str = "doc_id",
        batch_id: int | None = None,
    ) -> None:
        """Full build: postings range-clustered by word (query terms
        prune to few files via footer stats), aggregates derived.
        ``batch_id`` (when committing from a streaming sink) lands in
        the manifest so a replayed micro-batch is recognized."""
        postings = _tokenize(docs, text_col, id_col)
        df_t, stats = self._aggregates(postings)
        snap, snap_dir = self.log.new_snapshot()
        (
            self._canon(postings)
            .repartitionByRange(self.cluster_files, "word")
            .sortWithinPartitions("word", "doc_id")
            .write.mode("overwrite")
            .parquet(os.path.join(snap_dir, POSTINGS_FRAME))
        )
        self._canon(df_t).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(snap_dir, DF_FRAME)
        )
        self._canon(stats).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(snap_dir, STATS_FRAME)
        )
        extra = {} if batch_id is None else {"last_ingest_batch": int(batch_id)}
        self.log.publish(snap, extra=extra)

    def commit_delta(
        self,
        docs: DataFrame,
        *,
        text_col: str = "text",
        id_col: str = "doc_id",
        batch_id: int | None = None,
        also: tuple = (),
    ) -> None:
        """Incremental commit of NEW documents (disjoint doc_ids — the
        append-only corpus contract): postings hard-link forward +
        O(batch) new files; df/stats rewritten from (previous ||
        batch) without touching postings history.

        ``batch_id <= last_ingest_batch`` short-circuits to a no-op:
        foreachBatch is at-least-once, and blindly re-appending a
        replayed batch would double its postings AND double-count its
        df/n/sumdl contributions forever (worse than the dedup store's
        bloat — scores would silently drift). Same guard as
        streaming/dedup_ingest.DedupIndexStore.commit_delta."""
        cur = self.read()
        if cur is None:
            raise ValueError("commit_delta requires a seeded index store")
        _m0 = self.log.read_manifest()
        if (
            batch_id is not None
            and "last_ingest_batch" in _m0
            and int(batch_id) <= int(_m0["last_ingest_batch"])
        ):
            return  # at-least-once replay of an applied batch
        batch = _tokenize(docs, text_col, id_col)
        bdf, bstats = self._aggregates(batch)
        merged_df = (
            cur[DF_FRAME]
            .unionByName(bdf)
            .groupBy("word")
            .agg(F.sum("df").cast("long").alias("df"))
        )
        merged_stats = (
            cur[STATS_FRAME]
            .unionByName(bstats)
            .agg(
                F.sum("n").cast("long").alias("n"),
                F.sum("sumdl").cast("long").alias("sumdl"),
            )
        )
        m = self.log.read_manifest()
        snap, snap_dir = self.log.new_snapshot()
        prev = self.log.snapshot_dir(m["snapshot"])

        # the three frame writes plus any caller legs (``also`` — a
        # streaming sink's own per-batch outputs) run concurrently on
        # one thread pool, all gated behind the single manifest swap
        # (the streaming/dedup_ingest.commit_delta pattern: each leg
        # is a small independent job dominated by fixed scheduling
        # cost, and the replay guard above skips the ``also`` legs
        # together with the frames)
        def _postings_leg() -> None:
            dst = os.path.join(snap_dir, POSTINGS_FRAME)
            link_files(os.path.join(prev, POSTINGS_FRAME), dst)
            self._canon(batch).coalesce(
                self.delta_write_partitions
            ).write.mode("append").parquet(dst)

        def _df_leg() -> None:
            self._canon(merged_df).coalesce(1).write.mode(
                "overwrite"
            ).parquet(os.path.join(snap_dir, DF_FRAME))

        def _stats_leg() -> None:
            self._canon(merged_stats).coalesce(1).write.mode(
                "overwrite"
            ).parquet(os.path.join(snap_dir, STATS_FRAME))

        from concurrent.futures import ThreadPoolExecutor

        legs = [_postings_leg, _df_leg, _stats_leg] + list(also)
        with ThreadPoolExecutor(max_workers=len(legs)) as pool:
            for fut in [pool.submit(leg) for leg in legs]:
                fut.result()  # first failure propagates; no publish
        tprev = os.path.join(prev, TOMB_FRAME)
        if os.path.isdir(tprev):  # carry retractions forward
            link_files(tprev, os.path.join(snap_dir, TOMB_FRAME))
        delta_commits = int(m.get("delta_commits", 0)) + 1
        extra = {"delta_commits": delta_commits}
        if batch_id is not None:
            extra["last_ingest_batch"] = int(batch_id)
        elif "last_ingest_batch" in m:
            extra["last_ingest_batch"] = int(m["last_ingest_batch"])
        self.log.publish(snap, extra=extra)
        if self.compact_every and delta_commits >= self.compact_every:
            # paired compaction must not burn a retention slot of its
            # own (same rationale as DedupIndexStore.commit_delta)
            self.compact(retain_extra=1)

    def retract_ids(
        self, ids: DataFrame, *, id_col: str = "doc_id"
    ) -> None:
        """Retract documents from the index — the fork-rollback path
        (S11; ES deleteByQuery during fork handling,
        state-reader.ts:469-599). O(retracted) commit IO:

        - postings hard-link forward UNCHANGED; the retracted ids land
          as new tombstone rows (serving anti-joins them, compaction
          physically drops them);
        - df/stats are adjusted EXACTLY by subtracting the retracted
          docs' own postings contributions — one postings read filtered
          to the retracted ids. A fork retracts the chain TIP, whose
          postings live in the newest delta files, and doc_id footer
          min/max on older files prunes them from this scan (doc ids
          are monotone with commit order under the append contract).
          Integer df/(n, sumdl) arithmetic keeps the adjustment drift-
          free, so post-retraction stored scores equal from-scratch
          scores on the retracted corpus (the oracle-pinned property;
          Lucene by contrast serves stale docFreq until segment merge).

        Ids never indexed are tolerated (they subtract nothing); ids
        already tombstoned are skipped so a replayed retraction cannot
        double-subtract.
        """
        cur = self.read()
        if cur is None:
            raise ValueError("retract_ids requires a seeded index store")
        new_ids = ids.select(
            F.col(id_col).cast("long").alias("doc_id")
        ).distinct()
        tomb_prev = self.tombstones()
        if tomb_prev is not None:
            new_ids = new_ids.join(tomb_prev, "doc_id", "left_anti")
        retr = cur[POSTINGS_FRAME].join(F.broadcast(new_ids), "doc_id")
        df_sub = retr.groupBy("word").agg(
            F.count(F.lit(1)).alias("df_sub")
        )
        stats_sub = retr.select("doc_id", "dl").distinct().agg(
            F.count(F.lit(1)).alias("n_sub"),
            F.coalesce(F.sum("dl"), F.lit(0)).cast("long").alias("sumdl_sub"),
        )
        merged_df = (
            cur[DF_FRAME]
            .join(df_sub, "word", "left")
            .select(
                "word",
                (
                    F.col("df") - F.coalesce(F.col("df_sub"), F.lit(0))
                ).cast("long").alias("df"),
            )
            .where(F.col("df") > 0)
        )
        merged_stats = cur[STATS_FRAME].crossJoin(stats_sub).select(
            (F.col("n") - F.col("n_sub")).cast("long").alias("n"),
            (F.col("sumdl") - F.col("sumdl_sub")).cast("long").alias("sumdl"),
        )
        m = self.log.read_manifest()
        snap, snap_dir = self.log.new_snapshot()
        prev = self.log.snapshot_dir(m["snapshot"])
        dst = os.path.join(snap_dir, POSTINGS_FRAME)
        link_files(os.path.join(prev, POSTINGS_FRAME), dst)
        self._canon(merged_df).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(snap_dir, DF_FRAME)
        )
        self._canon(merged_stats).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(snap_dir, STATS_FRAME))
        tdst = os.path.join(snap_dir, TOMB_FRAME)
        tprev = os.path.join(prev, TOMB_FRAME)
        if os.path.isdir(tprev):
            link_files(tprev, tdst)
        new_ids.coalesce(1).write.mode("append").parquet(tdst)
        extra = {"delta_commits": int(m.get("delta_commits", 0))}
        if "last_ingest_batch" in m:
            # the replay guard must survive a retraction commit
            extra["last_ingest_batch"] = int(m["last_ingest_batch"])
        self.log.publish(snap, extra=extra)

    def compact(self, *, retain_extra: int = 0) -> None:
        """OPTIMIZE: physically drop tombstoned postings and rewrite
        word-clustered into few files (the Lucene segment merge that
        actually reclaims deletes). df/stats are already exact — they
        rewrite as-is; the tombstones frame is NOT carried into the
        new snapshot. Published through the same atomic manifest swap;
        rows of the live view are identical before and after."""
        cur = self.read()
        if cur is None:
            return
        live = self.live_postings(cur)
        m = self.log.read_manifest()
        snap, snap_dir = self.log.new_snapshot()
        (
            self._canon(live)
            .repartitionByRange(self.cluster_files, "word")
            .sortWithinPartitions("word", "doc_id")
            .write.mode("overwrite")
            .parquet(os.path.join(snap_dir, POSTINGS_FRAME))
        )
        for f in (DF_FRAME, STATS_FRAME):
            self._canon(cur[f]).coalesce(1).write.mode(
                "overwrite"
            ).parquet(os.path.join(snap_dir, f))
        extra = {"delta_commits": 0, "compacted": True}
        if m is not None and "last_ingest_batch" in m:
            # the replay guard must survive an OPTIMIZE rewrite —
            # compaction changes layout, not applied-batch history
            # (without this, a micro-batch replayed right after an
            # auto-compaction would re-commit and double-count)
            extra["last_ingest_batch"] = int(m["last_ingest_batch"])
        self.log.publish(snap, extra=extra, retain_extra=retain_extra)

    # -- serve -----------------------------------------------------------

    def scalar_aggregates_local(
        self, terms: list[str] | None = None
    ) -> tuple[dict[str, int], int, int]:
        """Driver-side read of the two SCALAR aggregate frames —
        ``(df_map, n, sumdl)``. Every commit path maintains df as one
        row per word and stats as one row, both coalesce(1) (tiny),
        so a pyarrow read of the snapshot files is value-identical to
        the Spark scan — but costs zero Spark jobs, removing the two
        broadcast-build job rounds every indexed-search query paid
        (round-15; guide §1.2 "remove passes", §5 driver work is fine
        for metadata-sized data). ``terms`` prunes the df map."""
        import pyarrow.parquet as pq

        m = self.log.read_manifest()
        if m is None:
            raise ValueError("scalar_aggregates_local requires a seeded store")
        base = self.log.snapshot_dir(m["snapshot"])

        def _tab(frame: str):
            import glob

            parts = sorted(
                glob.glob(os.path.join(base, frame, "*.parquet"))
            )
            import pyarrow as pa

            return pa.concat_tables([pq.read_table(p) for p in parts])

        dft = _tab(DF_FRAME)
        words = dft.column("word").to_pylist()
        dfs = dft.column("df").to_pylist()
        df_map = {
            w: int(d)
            for w, d in zip(words, dfs)
            if terms is None or w in terms
        }
        st = _tab(STATS_FRAME)
        return df_map, int(st.column("n")[0].as_py()), int(
            st.column("sumdl")[0].as_py()
        )

    @staticmethod
    def _per_word_df(terms: list[str], df_map: dict[str, int]):
        """CASE word WHEN t THEN df(t) ... over the pruned postings —
        terms absent from the index have no postings rows, so their
        placeholder value is never evaluated."""
        col = F.when(
            F.col("word") == terms[0], F.lit(df_map.get(terms[0], 1))
        )
        for t in terms[1:]:
            col = col.when(F.col("word") == t, F.lit(df_map.get(t, 1)))
        return col

    def bm25_scored(self, terms: list[str]) -> DataFrame:
        """Unlimited (doc_id, score) frame from the STORED index:
        postings pruned to the query terms (pushed filter +
        word-clustered files); df and the 1-row stats are read DRIVER-
        side (round-15 — they are metadata-sized scalar frames, see
        ``scalar_aggregates_local``) and enter the plan as exact
        integer literals, so the plan is scan -> project -> one hash
        agg -> caller's top-k: no broadcast builds, no joins —
        per-query cost follows matched postings, never the corpus.
        Formula and constants identical to doc_search_bm25. Callers
        compose their own gate/top-k (bm25() below, AND-match in
        api/dedup_sim.py)."""
        idx = self.read()
        if idx is None:
            raise ValueError("bm25 requires a seeded index store")
        p = self.live_postings(idx).where(F.col("word").isin(terms))
        df_map, n, sumdl = self.scalar_aggregates_local(terms)
        df_col = self._per_word_df(terms, df_map)
        idf = F.log(
            F.lit(1.0)
            + (F.lit(n) - df_col + F.lit(0.5)) / (df_col + F.lit(0.5))
        )
        avgdl = F.lit(sumdl / n)  # exact long/long -> same IEEE double
        norm = F.col("tf") * F.lit(_BM25_K1 + 1) / (
            F.col("tf")
            + F.lit(_BM25_K1)
            * (F.lit(1.0 - _BM25_B) + F.lit(_BM25_B) * F.col("dl") / avgdl)
        )
        return (
            p.groupBy("doc_id")
            .agg(F.round(F.sum(idf * norm), 4).alias("score"))
        )

    def bm25(self, terms: list[str], k: int = 20) -> DataFrame:
        """BM25 top-k: :meth:`bm25_scored` + TakeOrdered."""
        return (
            self.bm25_scored(terms)
            .orderBy(F.col("score").desc(), F.col("doc_id").asc())
            .limit(k)
        )

    def phrase_match(self, words: list[str]) -> DataFrame:
        """Exact-phrase match from positional postings (ES
        ``match_phrase``): per matched doc, the count of phrase
        occurrences. The position chain folds left JVM-side — the
        candidate positions of the length-``i`` prefix are
        ``array_intersect(transform(prefix, p -> p+1),
        positions(word_i))`` — so an n-word phrase is n-1 broadcast-
        or shuffle-equi-joins over ALREADY word-pruned postings plus
        array kernels inside codegen; the corpus is never touched and
        nothing explodes to one-row-per-position."""
        if len(words) < 2:
            raise ValueError("phrase_match needs at least two words")
        idx = self.read()
        if idx is None:
            raise ValueError("phrase_match requires a seeded index store")
        p = self.live_postings(idx)

        def positions_of(w: str, alias: str) -> DataFrame:
            return p.where(F.col("word") == w).select(
                "doc_id", F.col("positions").alias(alias)
            )

        cur = positions_of(words[0], "chain")
        for i, w in enumerate(words[1:]):
            nxt = positions_of(w, f"p{i}")
            cur = (
                cur.join(nxt, "doc_id")
                .withColumn(
                    "chain",
                    F.array_intersect(
                        F.transform("chain", lambda x: x + 1),
                        F.col(f"p{i}"),
                    ),
                )
                .where(F.size("chain") > 0)
                .select("doc_id", "chain")
            )
        return cur.select(
            "doc_id", F.size("chain").alias("n_occurrences")
        ).orderBy("doc_id")
