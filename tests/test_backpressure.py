"""Backpressure monitor (S13/T4, round-2 verdict item 8): lag metric
from the file-source commit log, bounded batch sizes under a burst,
hysteresis pause/resume."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from hyperion_history_api_spark.streaming.backpressure import (
    BackpressureConfig,
    QueueMonitor,
    pending_files,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.001")


def test_pause_resume_hysteresis():
    mon = QueueMonitor(BackpressureConfig(queue_limit=100, resume_ratio=0.5))
    assert mon.observe(50).paused is False
    assert mon.observe(120).paused is True  # crossed the limit
    assert mon.observe(80).paused is True  # above resume floor: stay paused
    assert mon.observe(49).paused is False  # drained below limit/2: resume
    assert mon.observe(60).paused is False  # hysteresis: no flap


def test_aimd_throttle_bounds():
    cfg = BackpressureConfig(
        queue_limit=10**9, min_files_per_trigger=1, max_files_per_trigger=16
    )
    mon = QueueMonitor(cfg)
    mon.observe(100)
    for lag in (200, 400, 800, 1600, 3200, 6400):  # sustained growth
        d = mon.observe(lag)
    assert d.files_per_trigger == 1  # halved down to the floor
    for lag in range(6300, 6300 - 40 * 100, -100):  # draining
        d = mon.observe(lag)
    assert d.files_per_trigger == 16  # additive recovery, capped
    assert all(
        1 <= h.files_per_trigger <= 16 for h in mon.history
    )


def test_lag_metric_and_bounded_batches_under_burst(spark, tmp_path):
    """A burst of 8 feed files with maxFilesPerTrigger=2: every
    micro-batch is bounded, and the pending-files lag metric (computed
    from Spark's own source commit log) decreases monotonically to 0."""
    from hyperion_history_api_spark.tables import (
        EVENTS_SCHEMA_RAW,
        normalize_events,
    )

    feed = str(tmp_path / "feed")
    raw = spark.read.schema(EVENTS_SCHEMA_RAW).parquet(
        os.path.join(SF_DIR, "events.parquet")
    )
    raw.repartitionByRange(8, "event_id").write.parquet(feed)

    cp = str(tmp_path / "cp")
    out = str(tmp_path / "out")
    lags: list[int] = []
    batch_rows: list[int] = []

    def sink(batch, batch_id):
        batch_rows.append(batch.count())
        batch.write.mode("overwrite").parquet(
            os.path.join(out, f"b={batch_id}")
        )
        lags.append(pending_files(feed, cp))

    stream = normalize_events(
        spark.readStream.schema(EVENTS_SCHEMA_RAW)
        .format("parquet")
        .option("maxFilesPerTrigger", 2)
        .load(feed)
    )
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", cp)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    n_total = raw.count()
    assert sum(batch_rows) == n_total
    # bounded batches: 8 files / 2 per trigger => 4 batches, each ~1/4
    assert len(batch_rows) == 4
    assert max(batch_rows) <= n_total / 2  # no batch swallowed the burst
    # lag decreases monotonically to zero as the burst drains
    assert lags == sorted(lags, reverse=True)
    assert lags[-1] == 0
    # the monitor consuming this series never pauses below its limit
    mon = QueueMonitor(BackpressureConfig(queue_limit=100))
    for lag in lags:
        mon.observe(lag)
    assert not any(h.paused for h in mon.history)
