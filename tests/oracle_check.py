"""Local replica of the driver's correctness gate: run each registered
Spark query and its DuckDB oracle on the same parquet tables, compare
row count + schema-insensitive sorted values (order-insensitive hash).

Used by tests/test_oracle_parity.py and runnable standalone:

    python tests/oracle_check.py [sf_dir]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hyperion_history_api_spark.tables import TABLE_NAMES  # noqa: E402


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)

    def cell(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "<null>"
        if isinstance(v, float):
            if v == int(v) and abs(v) < 1e15:
                return str(int(v))
            return f"{v:.6g}"
        if isinstance(v, pd.Timestamp):
            return v.isoformat()
        return str(v)

    out = df.map(cell)
    return out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)


def _kind(col: pd.Series) -> str:
    """Canonical type tag for a result column, matching how the
    driver's typed hasher distinguishes values: integer-kind and
    float-kind stringify differently there ("42" vs "42.0"), so an
    int/float disagreement between Spark and the oracle is a real
    hash-gate failure even when every value is numerically equal.
    Object columns are classified by their first non-null value so a
    DuckDB HUGEINT (int128 -> Python int in an object column) is
    still caught against a Spark float, and vice versa."""
    k = col.dtype.kind
    if k in "iu":
        return "int"
    if k == "f":
        # all-null float columns carry no type signal (both engines
        # widen fully-null ints to float) — treat as wildcard
        return "any" if col.isna().all() else "float"
    if k == "b":
        return "bool"
    if k == "M":
        return "ts"
    if k == "O":
        for v in col:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                continue
            if isinstance(v, bool):
                return "bool"
            if isinstance(v, int):
                return "int"
            if isinstance(v, float):
                return "float"
            if isinstance(v, pd.Timestamp):
                return "ts"
            return "obj"
        return "any"
    return "obj"


def compare(spark_df, oracle_df: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty = pass)."""
    errs: list[str] = []
    sp = spark_df.toPandas()
    if len(sp) != len(oracle_df):
        errs.append(f"row count: spark={len(sp)} oracle={len(oracle_df)}")
    if sorted(map(str.lower, sp.columns)) != sorted(map(str.lower, oracle_df.columns)):
        errs.append(f"columns: spark={sorted(sp.columns)} oracle={sorted(oracle_df.columns)}")
        return errs
    # dtype gate: the driver hashes typed values, so "42" (int) vs
    # "42.0" (float) fails there even though str()-canonicalized
    # cells below would agree. Compare column kinds before values.
    sp_kinds = {c.lower(): _kind(sp[c]) for c in sp.columns}
    or_kinds = {c.lower(): _kind(oracle_df[c]) for c in oracle_df.columns}
    for c in sorted(sp_kinds):
        a, b = sp_kinds[c], or_kinds[c]
        if a != b and "any" not in (a, b):
            errs.append(f"dtype kind for '{c}': spark={a} oracle={b}")
    a, b = _canon(sp), _canon(oracle_df.rename(columns=dict(zip(oracle_df.columns, oracle_df.columns))))
    b.columns = a.columns  # align case
    if len(a) == len(b):
        neq = (a != b).any(axis=1)
        if neq.any():
            i = int(neq.idxmax())
            errs.append(
                f"values differ at canonical row {i}:\n  spark : {a.iloc[i].to_dict()}\n  oracle: {b.iloc[i].to_dict()}"
            )
    return errs


#: results marker for an oracle that exceeded --oracle-timeout: the
#: SPARK side is fine; the DuckDB brute-force twin (quadratic pair
#: joins, recursive CTEs) is infeasible at this scale factor. Counted
#: separately from pass/fail — the row stays hash-gated at sf0.01.
ORACLE_TIMEOUT = "ORACLE_TIMEOUT"


def _execute_oracle(
    con: duckdb.DuckDBPyConnection, sql: str, timeout: float | None
) -> pd.DataFrame:
    if not timeout:
        return con.execute(sql).df()
    import threading

    timer = threading.Timer(timeout, con.interrupt)
    timer.start()
    try:
        return con.execute(sql).df()
    finally:
        timer.cancel()


def run_all(
    sf_dir: str,
    only: list[str] | None = None,
    oracle_timeout: float | None = None,
) -> dict[str, list[str]]:
    from hyperion_history_api_spark import registry
    from hyperion_history_api_spark.session import get_spark

    spark = get_spark("oracle-check")
    con = duck_connection(sf_dir)
    results: dict[str, list[str]] = {}
    for name, spec in registry.all_specs().items():
        if only and name not in only:
            continue
        try:
            sdf = spec.spark_fn(spark, sf_dir)
            if spec.oracle is None:
                n = sdf.count()
                results[name] = [] if n >= 0 else ["negative count?"]
                continue
            odf = _execute_oracle(con, spec.oracle, oracle_timeout)
            results[name] = compare(sdf, odf)
        except duckdb.InterruptException:
            # the Spark side still has to be runnable and non-empty-
            # schema'd; only the oracle twin is infeasible here
            results[name] = [
                f"{ORACLE_TIMEOUT}: DuckDB oracle exceeded "
                f"{oracle_timeout}s at {sf_dir} (spark rows={sdf.count()})"
            ]
        except Exception as e:  # noqa: BLE001
            results[name] = [f"EXCEPTION: {type(e).__name__}: {e}"]
    return results


if __name__ == "__main__":
    import json
    import os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    json_out = next(
        (a.split("=", 1)[1] for a in sys.argv[1:] if a.startswith("--json=")), None
    )
    otimeout = next(
        (
            float(a.split("=", 1)[1])
            for a in sys.argv[1:]
            if a.startswith("--oracle-timeout=")
        ),
        None,
    )
    sf = argv[0] if argv else "/root/testdata/sf0.01"
    only = argv[1].split(",") if len(argv) > 1 else None
    res = run_all(sf, only, oracle_timeout=otimeout)

    def _is_timeout(v: list[str]) -> bool:
        return bool(v) and v[0].startswith(ORACLE_TIMEOUT)

    failed = {k: v for k, v in res.items() if v and not _is_timeout(v)}
    skipped = {k for k, v in res.items() if _is_timeout(v)}
    for k in sorted(res):
        status = (
            "SKIP" if k in skipped else "FAIL" if res[k] else "ok"
        )
        print(f"{status:4} {k}")
        for e in res[k]:
            print(f"      {e}")
    passed = len(res) - len(failed) - len(skipped)
    tail = f" ({len(skipped)} oracle-timeout)" if skipped else ""
    print(f"\n{passed}/{len(res) - len(skipped)} passed{tail}")
    if json_out:
        from hyperion_history_api_spark import registry

        specs = registry.all_specs()
        with open(json_out, "w") as f:
            json.dump(
                {
                    k: {
                        "pass": None if k in skipped else not res[k],
                        "check": "oracle_timeout_at_this_sf"
                        if k in skipped
                        else "hash"
                        if specs[k].oracle
                        else "rows_only",
                        "errors": res[k],
                    }
                    for k in sorted(res)
                },
                f,
                indent=1,
            )
    sys.exit(1 if failed else 0)
