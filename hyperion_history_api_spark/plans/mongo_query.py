"""Mongo-style find-filter compiler for the dynamic contract-table
endpoints (the MongoDB half of the reference's serving layer).

``get_table_rows`` accepts a ``filters`` URL param holding a Mongo
query document — ``{"field": {"$gt": x, "$lte": y}, "f2": v,
"f3": {"$in": [...]}}`` — with ISO-date strings inside comparison
operators coerced to dates (get_table_rows.ts:76-129); the same
document grammar drives get_top_holders' extended filters. This module
compiles that document into ONE Spark ``Column`` predicate, so the
Mongo find semantics run as Catalyst filters: pushed to the parquet
scan for plain comparisons, codegen'd for the rest. No query-side
loops, no UDFs.

Grammar (the subset the reference actually uses):
- ``{field: scalar}``        -> equality
- ``{field: {$eq/$ne/$gt/$gte/$lt/$lte: v}}`` -> comparison
- ``{field: {$in/$nin: [...]}}``              -> membership
- ``{field: {$exists: true/false}}``          -> null check
- several fields AND together; operators within one field AND together
- ISO-8601 strings (``YYYY-MM-DD[THH:MM[:SS]]``) inside comparison
  operators are coerced with ``to_timestamp`` exactly when the target
  column is a date/timestamp (the reference's new Date() probe).

Type mismatches (e.g. ``{"status": {"$gt": 10}}`` against a string
column) compile to a never-match clause instead of letting Spark's
ANSI cast throw mid-query — BSON compares are typed the same way
(a numeric never equals a string), and a 400-able user filter must
not become a runtime task failure.

Unknown operators raise ``ValueError`` (the reference 400s on filter
processing errors).
"""

from __future__ import annotations

import re
from typing import Any, Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DATE_RE = re.compile(r"^\d{4}-\d{2}-\d{2}([T ]\d{2}:\d{2}(:\d{2})?)?(Z|[+-]\d{2}:?\d{2})?$")

_COMPARISONS = {
    "$eq": lambda c, v: c == v,
    "$ne": lambda c, v: c != v,
    "$gt": lambda c, v: c > v,
    "$gte": lambda c, v: c >= v,
    "$lt": lambda c, v: c < v,
    "$lte": lambda c, v: c <= v,
}


_NUMERIC_PREFIXES = (
    "tinyint", "smallint", "int", "bigint", "float", "double", "decimal"
)


def _lit_compatible(dtype: str, value: Any) -> bool:
    """BSON-style typed compare: a literal only matches a column of its
    own type family. Incompatible pairs compile to never-match rather
    than an ANSI cast error."""
    import datetime

    if isinstance(value, bool):
        return dtype == "boolean"
    if isinstance(value, (int, float)):
        return dtype.startswith(_NUMERIC_PREFIXES)
    if isinstance(value, str):
        return dtype == "string" or dtype.startswith(("timestamp", "date"))
    if isinstance(value, (datetime.datetime, datetime.date)):
        return dtype.startswith(("timestamp", "date"))
    return True


def _coerce(df: DataFrame, field: str, value: Any) -> Any:
    """ISO-date strings compare against date/timestamp columns as
    timestamps (the reference's date-operator probe); everything else
    passes through untouched."""
    if isinstance(value, str) and _DATE_RE.match(value):
        dtype = dict(df.dtypes).get(field, "")
        if dtype.startswith(("timestamp", "date")):
            return F.to_timestamp(F.lit(value.replace("Z", "").replace("T", " ")))
    return value


def compile_mongo_query(df: DataFrame, query: Mapping[str, Any]) -> Column:
    """Compile a Mongo find document into one Column predicate (all
    top-level fields ANDed, Mongo's implicit-AND semantics)."""
    dtypes = dict(df.dtypes)
    pred: Column | None = None
    for field, cond in query.items():
        if field.startswith("$"):
            raise ValueError(f"unsupported top-level operator: {field}")
        col = F.col(field)
        dtype = dtypes.get(field, "")
        if isinstance(cond, Mapping):
            for op, raw in cond.items():
                if op in _COMPARISONS:
                    if not _lit_compatible(dtype, raw):
                        clause = F.lit(False)
                    else:
                        clause = _COMPARISONS[op](col, _coerce(df, field, raw))
                elif op == "$in":
                    vals = [v for v in raw if _lit_compatible(dtype, v)]
                    clause = col.isin(vals) if vals else F.lit(False)
                elif op == "$nin":
                    vals = [v for v in raw if _lit_compatible(dtype, v)]
                    # incompatible values can never equal the column;
                    # SQL NOT IN semantics drop nulls either way
                    clause = ~col.isin(vals) if vals else col.isNotNull()
                elif op == "$exists":
                    clause = col.isNotNull() if raw else col.isNull()
                else:
                    raise ValueError(f"unsupported operator: {op}")
                pred = clause if pred is None else pred & clause
        else:
            if not _lit_compatible(dtype, cond):
                clause = F.lit(False)
            else:
                clause = col == _coerce(df, field, cond)
            pred = clause if pred is None else pred & clause
    return pred if pred is not None else F.lit(True)
