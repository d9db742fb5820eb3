"""The external driver's consumption contract, exercised the way the
driver actually does it: import ``__spark_entry__.py`` BY FILE PATH
from a foreign cwd, build a VANILLA SparkSession (none of
``session.get_spark``'s configs), and run queries.

This is the only place the two contract-specific failure classes
show up:

- executor-side ModuleNotFoundError for Python-UDF closures pickled
  by reference (the repo dir is on the driver's sys.path only —
  ``udf_compat.pickle_by_value`` makes closures self-contained);
- TIMESTAMP(NANOS) parquet reads that only work through
  ``tables.load_tables``'s runtime conf.

Runs as a subprocess so the in-repo test session (repo on sys.path,
tuned confs) can't mask either.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_PROBE = """
import importlib.util
spec = importlib.util.spec_from_file_location(
    "__spark_entry__", {entry!r})
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)
from pyspark.sql import SparkSession
spark = (
    SparkSession.builder.master("local[4]")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
assert len(mod.entry(spark).collect()) >= 0
qs, osql = mod.queries(), mod.oracle_sql()
assert set(osql) <= set(qs), "oracle_sql keys must be registered queries"
sf = "/root/testdata/sf0.001"
# doc_bpe_token_stats: mapInPandas closure calling module helpers —
# the query that failed worker-side before pickle-by-value.
assert qs["doc_bpe_token_stats"](spark, sf).count() > 0
# timestamp-typed scan through the contract path
assert qs["date_histogram_daily"](spark, sf).count() > 0
print("DRIVER_CONTRACT_OK")
"""


def test_entry_from_foreign_cwd_vanilla_session(tmp_path):
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    proc = subprocess.run(
        [sys.executable, "-c", _PROBE.format(entry=os.path.join(REPO, "__spark_entry__.py"))],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "DRIVER_CONTRACT_OK" in proc.stdout
