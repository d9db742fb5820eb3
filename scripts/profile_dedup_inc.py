"""Profile dedup_incremental: postwarm medians + members-scan count.

Usage: python scripts/profile_dedup_inc.py [sf_dir] [n_runs] [--explain]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
n = int(sys.argv[2]) if len(sys.argv) > 2 else 5
explain = "--explain" in sys.argv

from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "16g")
    .config("spark.sql.adaptive.enabled", "true")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from hyperion_history_api_spark.registry import queries

q = queries()["dedup_incremental"]

times = []
for i in range(n):
    t0 = time.monotonic()
    df = q(spark, sf_dir)
    cnt = df.count()
    times.append(time.monotonic() - t0)
    print(f"run {i}: {times[-1]:.3f} s rows={cnt}", flush=True)
if explain:
    df = q(spark, sf_dir)
    print(df._jdf.queryExecution().executedPlan().toString()[:12000])
times.sort()
print(f"median={times[len(times) // 2]:.3f} warm_min={times[0]:.3f}")
