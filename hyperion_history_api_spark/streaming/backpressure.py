"""Backpressure beyond trigger options (SURVEY §2.1 S13, §2.9 T4).

The reference's queue monitor polls RabbitMQ queue depths and pauses /
resumes the state readers around a configured limit, with an autoscale
trigger (``master.ts`` via ``queueMonitor.ts``; config
``hyperionConfig.ts:26-42`` — ``queue_limit``, ``auto_scale_trigger``).
Round 2 only exposed the trigger-side knobs (``maxFilesPerTrigger``);
this module adds the monitor half:

- **Lag metric**: for a file-backed stream, pending work = files
  present in the feed dir minus files recorded in Spark's file-source
  commit log (``<checkpoint>/sources/0/<batch>`` JSON manifests — the
  engine's own record of what each batch consumed). This is the
  offset-lag analogue of the reference's queue depth; a Kafka source
  swaps in consumer-lag from query progress.
- **Pause/resume policy**: hysteresis around ``queue_limit`` — pause
  intake when lag >= limit, resume when it drains below
  ``resume_ratio * limit`` (the reference resumes below half its
  limit). While paused the source takes NOTHING (the reference
  suspends the reader socket); an AIMD throttle additionally halves
  ``files_per_trigger`` on growth and recovers additively on drain, so
  a burst degrades intake smoothly instead of oscillating.

At cluster scale the same policy object drives
``maxOffsetsPerTrigger`` / dynamic allocation; the decision logic is
source-agnostic and unit-tested on synthetic lag series.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field


@dataclass(frozen=True)
class BackpressureConfig:
    """Mirrors the reference's scaling config block
    (hyperionConfig.ts:26-42)."""

    queue_limit: int = 10_000  # pause intake at this lag
    resume_ratio: float = 0.5  # resume below limit * ratio
    min_files_per_trigger: int = 1
    max_files_per_trigger: int = 50  # max_messages_in_flight analogue


@dataclass(frozen=True)
class ThrottleDecision:
    paused: bool
    files_per_trigger: int
    lag: int


@dataclass
class QueueMonitor:
    """Stateful pause/resume + AIMD throttle over an observed lag
    series. One ``observe(lag)`` call per micro-batch (or per poll
    interval while paused)."""

    cfg: BackpressureConfig = field(default_factory=BackpressureConfig)
    paused: bool = False
    files_per_trigger: int = 0  # 0 => start at max
    history: list[ThrottleDecision] = field(default_factory=list)

    def observe(self, lag: int) -> ThrottleDecision:
        c = self.cfg
        if self.files_per_trigger <= 0:
            self.files_per_trigger = c.max_files_per_trigger
        if not self.paused and lag >= c.queue_limit:
            self.paused = True
        elif self.paused and lag <= c.queue_limit * c.resume_ratio:
            self.paused = False
        prev = self.history[-1].lag if self.history else None
        if prev is not None and lag > prev:
            # multiplicative decrease while the backlog grows
            self.files_per_trigger = max(
                c.min_files_per_trigger, self.files_per_trigger // 2
            )
        elif prev is not None and lag < prev:
            # additive recovery while draining
            self.files_per_trigger = min(
                c.max_files_per_trigger, self.files_per_trigger + 1
            )
        d = ThrottleDecision(self.paused, self.files_per_trigger, lag)
        self.history.append(d)
        return d


def committed_files(checkpoint_dir: str) -> set[str]:
    """Files the file-source has committed, from Spark's own source log
    (``<checkpoint>/sources/0/<batchId>`` — one JSON entry per file)."""
    src = os.path.join(checkpoint_dir, "sources", "0")
    seen: set[str] = set()
    if not os.path.isdir(src):
        return seen
    for name in os.listdir(src):
        if not name.split(".")[0].isdigit():
            continue
        try:
            with open(os.path.join(src, name)) as f:
                for line in f:
                    line = line.strip()
                    if not line.startswith("{"):
                        continue  # version header ("v1")
                    entry = json.loads(line)
                    if "path" in entry:
                        seen.add(entry["path"].replace("file://", ""))
        except (OSError, ValueError):
            continue
    return seen


def pending_files(feed_dir: str, checkpoint_dir: str) -> int:
    """The lag metric: data files present but not yet committed by the
    source — the queue-depth analogue for a file-backed feed."""
    present = {
        os.path.join(feed_dir, f)
        for f in os.listdir(feed_dir)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    }
    return len(present - committed_files(checkpoint_dir))
