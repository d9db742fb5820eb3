"""The repair loop end-to-end — the reference's ``hyp-repair`` CLI
(``src/cli/repair-cli``): ``scan`` finds the holes in a supposedly
contiguous block/sequence range (scan.ts:298-333, driver-side binary
search there; one ``lag()`` window pass here), ``fill`` re-requests
exactly those ranges from the state-history endpoint and lands them
(repair.ts:628+ ``fillMissingBlocksFromFile`` instructs the indexer's
readers over WS; here the readers ARE the repo's
:func:`..sources.ship_ws.parallel_backfill`).

Spark-first split:

- **scan** is set-based: the gap finder is ONE window pass over the
  sequence column (`find_missing_ranges`), extended with the edge
  gaps (missing head/tail vs the expected bounds) the reference's
  scan also reports. At 100 TB the scan is a column projection + one
  sort-within-key window — no driver-side binary search ever touches
  the data.
- **fill** is driver-side IO by design, like the readers themselves:
  the gap list is bounded by DAMAGE (not history — a healthy lake
  yields zero rows), so collecting it mirrors the reference writing
  the ranges file; adjacent ranges are coalesced and grouped into at
  most ``max_readers`` connections, then spooled with range-disjoint
  file prefixes into the SAME flat directory the ingest tail globs.
- **verify** re-runs the scan after the fill — the reference's
  repair → re-scan discipline; the report carries both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .missed_blocks import find_missing_ranges

#: refuse to drive a fill from a scan larger than this — damage lists
#: are small by contract; a bigger one means the lake is majority-hole
#: and a plain backfill of the whole range is the right tool
MAX_GAPS = 100_000


def scan_gaps(
    df: DataFrame,
    seq_col: str,
    *,
    expected_start: int | None = None,
    expected_head: int | None = None,
) -> DataFrame:
    """All (gap_start, gap_end, missing) holes in ``df[seq_col]``,
    including the edge gaps against the expected bounds (scan.ts
    checks lib-to-head coverage the same way). One window pass; the
    edge checks are two scalar aggregates over the same scan."""
    interior = find_missing_ranges(df, seq_col)
    edges = []
    if expected_start is not None or expected_head is not None:
        bounds = df.agg(
            F.min(seq_col).alias("lo"), F.max(seq_col).alias("hi")
        ).first()
        spark = df.sparkSession
        if (
            expected_start is not None
            and bounds["lo"] is not None
            and bounds["lo"] > expected_start
        ):
            edges.append((expected_start, bounds["lo"] - 1))
        if (
            expected_head is not None
            and bounds["hi"] is not None
            and bounds["hi"] < expected_head
        ):
            edges.append((bounds["hi"] + 1, expected_head))
        if bounds["lo"] is None:  # empty lake: one gap, the whole range
            lo = expected_start if expected_start is not None else 1
            hi = expected_head if expected_head is not None else lo - 1
            edges = [(lo, hi)] if hi >= lo else []
        if edges:
            edge_df = spark.createDataFrame(
                [(lo, hi, hi - lo + 1) for lo, hi in edges],
                "gap_start long, gap_end long, missing long",
            )
            interior = interior.unionByName(edge_df)
    return interior.orderBy("gap_start")


def coalesce_ranges(
    ranges: list[tuple[int, int]], *, join_within: int = 1
) -> list[tuple[int, int]]:
    """Merge adjacent/overlapping ranges (gap lists from partitioned
    scans can abut) so each reader requests one contiguous window."""
    out: list[tuple[int, int]] = []
    for lo, hi in sorted(ranges):
        if out and lo <= out[-1][1] + join_within:
            out[-1] = (out[-1][0], max(out[-1][1], hi))
        else:
            out.append((lo, hi))
    return out


def fill_gaps(
    host: str,
    port: int,
    gaps: list[tuple[int, int]],
    spool_dir: str,
    *,
    max_readers: int = 4,
    rows_per_file: int = 512,
    envelope: str = "binary",
) -> int:
    """Re-request the gap ranges from the SHIP endpoint and spool them
    into ``spool_dir`` (flat, range-prefixed — the ingest tail's own
    layout). Ranges are grouped into at most ``max_readers``
    connections, each reading ITS ranges serially — the reference
    caps concurrent repair readers the same way. Returns blocks
    spooled."""
    from ..sources.ship_ws import ShipReader

    ranges = coalesce_ranges(gaps)
    if not ranges:
        return 0
    groups: list[list[tuple[int, int]]] = [
        ranges[i::max_readers] for i in range(min(max_readers, len(ranges)))
    ]
    import threading

    totals = [0] * len(groups)
    errors: list[BaseException | None] = [None] * len(groups)

    def run(i: int, mine: list[tuple[int, int]]) -> None:
        try:
            reader = ShipReader(host, port, envelope=envelope)
            try:
                for lo, hi in mine:
                    totals[i] += reader.spool_range(
                        lo,
                        hi,
                        spool_dir,
                        rows_per_file=rows_per_file,
                        file_prefix=f"repair-{lo:012d}-",
                    )
            finally:
                reader.close()
        except BaseException as e:  # noqa: BLE001 — surfaced below
            errors[i] = e

    threads = [
        threading.Thread(target=run, args=(i, g), daemon=True)
        for i, g in enumerate(groups)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    failed = [e for e in errors if e is not None]
    if failed:
        raise RuntimeError(
            f"{len(failed)} repair reader(s) failed"
        ) from failed[0]
    return sum(totals)


def repair_spool(
    spark: SparkSession,
    host: str,
    port: int,
    spool_dir: str,
    *,
    seq_col: str = "block_num",
    expected_start: int | None = None,
    expected_head: int | None = None,
    max_readers: int = 4,
    envelope: str = "binary",
) -> dict:
    """scan → fill → re-scan over a block spool directory; returns the
    repair report (the CLI's summary). The re-scan reads the SAME
    directory the fill landed in, so a clean report means the tail's
    next poll serves a hole-free range."""

    def _scan() -> list[tuple[int, int]]:
        df = spark.read.parquet(spool_dir)
        rows = (
            scan_gaps(
                df,
                seq_col,
                expected_start=expected_start,
                expected_head=expected_head,
            )
            .limit(MAX_GAPS + 1)
            .collect()
        )
        if len(rows) > MAX_GAPS:
            raise RuntimeError(
                f"more than {MAX_GAPS} gaps — use a plain backfill"
            )
        return [(r["gap_start"], r["gap_end"]) for r in rows]

    before = _scan()
    fetched = (
        fill_gaps(
            host,
            port,
            before,
            spool_dir,
            max_readers=max_readers,
            envelope=envelope,
        )
        if before
        else 0
    )
    after = _scan()
    return {
        "gaps_before": len(before),
        "missing_before": sum(hi - lo + 1 for lo, hi in before),
        "blocks_fetched": fetched,
        "gaps_after": len(after),
        "repaired": not after,
    }
