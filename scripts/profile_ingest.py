"""One-off profiler for the backfill_write ingest path (VERDICT r2 #2).

Runs ONE variant per process (fresh JVM) so heap/codec settings apply
cleanly; prints a JSON line with the measured events/s/core.

Usage: python scripts/profile_ingest.py <variant>
Variants: base, mem, lz4, zstd, nodict, nosort, mem_nodict, mem_lz4
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANT = sys.argv[1] if len(sys.argv) > 1 else "base"

if VARIANT.startswith("m16"):
    os.environ["SPARK_DRIVER_MEMORY"] = "16g"
elif VARIANT.startswith("mem"):
    os.environ["SPARK_DRIVER_MEMORY"] = "32g"

from pyspark.sql import functions as F  # noqa: E402

from hyperion_history_api_spark.session import get_spark  # noqa: E402
from hyperion_history_api_spark.streaming.ingest import (  # noqa: E402
    decode_and_enrich,
)
from hyperion_history_api_spark.tables import load_tables  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(f"ingest-prof-{VARIANT}")
    spark.sparkContext.setLogLevel("ERROR")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    if "lz4" in VARIANT:
        spark.conf.set("spark.sql.parquet.compression.codec", "lz4")
    if "zstd" in VARIANT:
        spark.conf.set("spark.sql.parquet.compression.codec", "zstd")

    base = load_tables(spark, sf_dir)["events"]
    base_n = base.count()
    copies = max(1, 2_000_000 // max(base_n, 1))
    span = base.agg(F.max("event_id")).first()[0] + 1
    feed = (
        base.repartition(cpus)
        .withColumn("__rep", F.explode(F.array(*[F.lit(i) for i in range(copies)])))
        .withColumn("event_id", F.col("event_id") + F.col("__rep") * F.lit(span))
        .drop("__rep")
    )
    decoded = decode_and_enrich(feed)
    rows = base_n * copies
    npart = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))

    def write(path: str) -> None:
        df = decoded.repartition(npart, "block_part")
        if "nosort" not in VARIANT:
            df = df.sortWithinPartitions("block_part", "event_id")
        w = df.write.mode("overwrite")
        if "nodict" in VARIANT:
            w = w.option("parquet.enable.dictionary", "false")
        w.partitionBy("block_part").parquet(path)

    tmp = tempfile.mkdtemp(prefix=f"ingest_prof_{VARIANT}_")
    try:
        write(os.path.join(tmp, "warm"))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            write(os.path.join(tmp, "timed"))
            best = min(best, time.perf_counter() - t0)
        sz = sum(
            os.path.getsize(os.path.join(dp, f))
            for dp, _, fs in os.walk(os.path.join(tmp, "timed"))
            for f in fs
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    print(
        json.dumps(
            {
                "variant": VARIANT,
                "sec": round(best, 3),
                "events_per_sec_per_core": round(rows / best / cpus),
                "bytes": sz,
            }
        )
    )


if __name__ == "__main__":
    main()
