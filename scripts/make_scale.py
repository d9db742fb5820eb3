"""Build a replicated scale-up of a testdata dir (VERDICT r2 #7).

/root/testdata tops out at sf0.1; the scale-proof bench point needs a
~10x feed. This replicates every fact table K times with coherent key
offsets (foreign keys shift with their parents, so joins produce K
copies of each original match) and leaves the dimension tables
(region/nation) fixed. Original rows are preserved at offset 0, so
every literal predicate in the bench queries still selects data.

Usage: python scripts/make_scale.py [src_dir] [out_dir] [k]
Default: /root/testdata/sf0.1 -> /root/repo/.scale/sf1, k=10.
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scale/sf1"
K = int(sys.argv[3]) if len(sys.argv) > 3 else 10

# key column -> span source table (span = max(key)+1 from SRC)
KEYS = {
    "c_custkey": "customer",
    "o_orderkey": "orders",
    "p_partkey": "part",
    "s_suppkey": "supplier",
    "event_id": "events",
    "doc_id": "documents",
    "vec_id": "embeddings",
}
FK = {  # foreign key -> parent key (shares the parent's span)
    "o_custkey": "c_custkey",
    "l_orderkey": "o_orderkey",
    "l_partkey": "p_partkey",
    "l_suppkey": "s_suppkey",
}
COPY_TABLES = [
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]
DIM_TABLES = ["region", "nation"]


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    spans: dict[str, int] = {}
    for key, tbl in KEYS.items():
        spans[key] = (
            con.sql(f"select max({key})+1 from '{SRC}/{tbl}.parquet'").fetchone()[0]
        )
    for fk, pk in FK.items():
        spans[fk] = spans[pk]

    for tbl in DIM_TABLES:
        con.sql(
            f"copy (select * from '{SRC}/{tbl}.parquet') to '{OUT}/{tbl}.parquet' (format parquet)"
        )

    for tbl in COPY_TABLES:
        cols = [
            c[0]
            for c in con.sql(f"describe select * from '{SRC}/{tbl}.parquet'").fetchall()
        ]
        sel = ", ".join(
            f"{c} + __i * {spans[c]} as {c}" if c in spans else c for c in cols
        )
        con.sql(
            f"copy (select {sel} from '{SRC}/{tbl}.parquet', range({K}) t(__i)) "
            f"to '{OUT}/{tbl}.parquet' (format parquet)"
        )
        n = con.sql(f"select count(*) from '{OUT}/{tbl}.parquet'").fetchone()[0]
        print(tbl, n)


if __name__ == "__main__":
    main()
