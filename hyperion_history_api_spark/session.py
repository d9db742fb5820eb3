"""SparkSession factory tuned for this engine.

Local testing runs on ``local[N]``; the config block is written for a
real multi-executor cluster (AQE, shuffle sizing, Arrow). At 100 TB the
same settings hold — only ``shuffle.partitions`` scales with cluster
cores (AQE coalesces down at runtime, so a high static value is safe).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "hyperion-spark", master: str | None = None) -> SparkSession:
    """Build (or reuse) the tuned session.

    Settings rationale (scale-first):
    - AQE on: runtime shuffle-partition coalescing, skew-join splitting
      (replaces the reference's contract-heatmap rebalancing,
      master.ts:1088-1189).
    - ``shuffle.partitions``: sized for the local harness; on a cluster
      set ~2-3x total cores — AQE coalesces small post-shuffle stages.
    - Arrow on: any Pandas-UDF fallback path moves data in columnar
      batches, not pickled rows.
    - Session timezone UTC: block times are UTC; keeps parity with the
      DuckDB oracle (naive timestamps).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # Fail fast on a typo'd codec env (r14 ADVICE low): unvalidated, a
    # bad value only surfaces at the first parquet WRITE as a deep
    # Spark error far from the env var that caused it.
    codec = os.environ.get("SPARK_GRAFT_PARQUET_CODEC", "zstd").lower()
    _PARQUET_CODECS = {
        "none", "uncompressed", "snappy", "gzip", "lzo",
        "brotli", "lz4", "lz4_raw", "zstd",
    }
    if codec not in _PARQUET_CODECS:
        raise ValueError(
            f"SPARK_GRAFT_PARQUET_CODEC={codec!r} is not a parquet codec "
            f"Spark supports; use one of {sorted(_PARQUET_CODECS)}"
        )
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus) if cpus.isdigit() else 32, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # driver testdata ships TIMESTAMP(NANOS) parquet, which Spark has
        # no native type for; read as long and convert in tables.load_tables
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # Engine-written parquet (ingest log, state snapshots, stored
        # indexes, compaction) defaults to zstd: measured r14 at the
        # bench protocol (5 interleaved fresh-JVM A/B rounds, 2M-row
        # backfill_write), wall is codec-neutral within host noise
        # (medians 2.09 s zstd vs 2.43 s snappy) while the output is
        # -35% bytes (26.1 vs 40.4 MB). Output bytes cross the
        # NIC/storage once and every downstream scan rereads them, so
        # at 100 TB the byte win dominates; override per-deployment via
        # SPARK_GRAFT_PARQUET_CODEC (e.g. snappy for CPU-starved,
        # disk-rich local targets).
        .config("spark.sql.parquet.compression.codec", codec)
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
