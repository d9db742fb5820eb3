"""Plugin handler registry (SURVEY §2.10 'plugin handlers').

The reference exposes three per-event hook points loaded from operator
plugins: ``processActionData`` (ds-pool.ts:183-185),
``processDeltaData`` (deserializer.ts:1349) and ``processStreamEvent``
(ws-router.ts:98) — each keyed by contract (actions/deltas) and called
inline in the pipeline.

Spark-first: a plugin is a ``DataFrame -> DataFrame`` transform
registered for a (kind, contract) key; :func:`apply_plugins` chains
every registered transform whose key matches into the enrichment
plan. Plugins are plan transforms, not per-row callbacks — they
compose into the same Catalyst plan (codegen, pushdown) instead of
breaking the pipeline into Python row hops, which is what makes the
hook usable at 100 TB. A plugin that must gate on its contract does so
with a Column predicate (``when(col(contract) == key, ...)``), same as
the table handlers.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PluginFn = Callable[[DataFrame], DataFrame]

_PLUGINS: dict[tuple[str, str], list[PluginFn]] = {}

KINDS = ("action", "delta", "stream")


def register_plugin(kind: str, contract: str, fn: PluginFn) -> PluginFn:
    """Register a plugin transform for (kind, contract); ``*`` matches
    every contract. Returns ``fn`` so it can be used as a decorator."""
    if kind not in KINDS:
        raise ValueError(f"unknown plugin kind {kind!r}")
    _PLUGINS.setdefault((kind, contract), []).append(fn)
    return fn


def clear_plugins() -> None:
    _PLUGINS.clear()


def apply_plugins(
    df: DataFrame, kind: str, *, contract_col: str = "contract"
) -> DataFrame:
    """Chain every matching plugin into the plan. Exact-contract
    plugins are responsible for gating their own effect on
    ``contract_col`` (helper: :func:`gated`)."""
    out = df
    for (k, _contract), fns in _PLUGINS.items():
        if k != kind:
            continue
        for fn in fns:
            out = fn(out)
    return out


def gated(contract: str, column: str, make_expr, *, contract_col: str = "contract") -> PluginFn:
    """Convenience: a plugin that adds ``column`` = ``make_expr(df)``
    only on rows of ``contract`` (NULL elsewhere) — the common
    processActionData shape."""

    def fn(df: DataFrame) -> DataFrame:
        expr = make_expr(df)
        if contract != "*":
            expr = F.when(F.col(contract_col) == contract, expr)
        return df.withColumn(column, expr)

    return fn
