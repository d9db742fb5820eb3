"""Z-order (Morton) clustering for multi-dimension file/row-group
skipping — the lake-layout technique for queries that filter on TWO
independent columns (the reference's hot path: account AND block
range, get_actions/functions.ts).

A single sort key prunes one dimension: the lake's ``actions`` table
sorted by ``global_sequence`` skips files for block-range predicates
but reads EVERYTHING for an account predicate (every file's account
min/max spans the whole domain). Interleaving the bits of both
columns into one Morton key and range-partitioning + sorting by it
makes every written file a small rectangle in (a, b) space, so
parquet min/max statistics prune BOTH predicates to ~sqrt(files)
instead of one to 1 and the other to all — the public Delta
OPTIMIZE ZORDER / Iceberg sort-order technique, expressed as plain
DataFrame ops.

Determinism contract: the key is integer arithmetic only
(``(x div 2^i) % 2`` terms — no hash, no engine-private mix), so the
same expression is generated for the DuckDB oracle and the
``zorder_key_check`` row hash-matches bit-for-bit.

Scale: the key is a narrow per-row projection; clustering is one
range exchange (sampled bounds) + in-partition sort — exactly the
shuffle a single-dim sorted write already pays, so Z-ordering at
100 TB costs nothing extra over sorting and buys the second
dimension's pruning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_terms(col_a: str, col_b: str, bits: int = 16) -> list[str]:
    """The interleave as SQL term strings — shared verbatim by the
    Spark expression and the generated oracle SQL, which is what
    makes the key engine-portable: ``(x div 2^i) % 2`` is exact
    integer arithmetic everywhere (DuckDB spells div ``//``)."""
    terms: list[str] = []
    for i in range(bits):
        terms.append(f"((({col_a} div {1 << i}) % 2) * {1 << (2 * i)})")
        terms.append(f"((({col_b} div {1 << i}) % 2) * {1 << (2 * i + 1)})")
    return terms


def zorder_key(col_a: str, col_b: str, bits: int = 16) -> Column:
    """Morton key of two non-negative integer columns: bit i of
    ``col_a`` lands at position 2i, of ``col_b`` at 2i+1. Columns
    wider than ``bits`` bits should be right-shifted by the caller
    (dropping LOW bits keeps range locality; hashing would destroy
    it)."""
    return F.expr(" + ".join(zorder_terms(col_a, col_b, bits))).cast("long")


def cluster_by_zorder(
    df: DataFrame,
    col_a: str,
    col_b: str,
    *,
    bits: int = 16,
    num_files: int = 16,
    key_col: str = "__z",
) -> DataFrame:
    """Cluster rows for writing: range-partition on the Morton key
    (sampled bounds — balanced output files regardless of data
    distribution) and sort within each partition, so every output
    file covers a compact Z-curve interval = a small rectangle in
    (a, b) space. Write the result with plain ``.parquet()``; the
    min/max stats do the rest at read time."""
    keyed = df.withColumn(key_col, zorder_key(col_a, col_b, bits))
    return keyed.repartitionByRange(num_files, key_col).sortWithinPartitions(
        key_col
    )


def file_prune_fraction(path: str, column: str, lo, hi) -> float:
    """Fraction of a parquet directory's row groups a reader can SKIP
    for ``column BETWEEN lo AND hi``, judged from footer min/max
    statistics only — the same decision Spark's parquet filter
    pushdown makes. Test/diagnostic helper (driver-side, reads
    footers not data)."""
    import glob as _glob
    import os as _os

    import pyarrow.parquet as _pq

    total = skipped = 0
    for f in _glob.glob(_os.path.join(path, "**", "*.parquet"), recursive=True):
        md = _pq.ParquetFile(f).metadata
        idx = md.schema.to_arrow_schema().get_field_index(column)
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            total += 1
            if st is not None and (st.max < lo or st.min > hi):
                skipped += 1
    return skipped / total if total else 0.0
