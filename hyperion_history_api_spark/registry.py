"""The correctness matrix: every implemented operator/query from
SURVEY.md §2, defined ONCE with (a) its Spark plan and (b) the
equivalent DuckDB oracle SQL. ``__spark_entry__.py`` re-exports this.

Table mapping (driver testdata -> Hyperion data model, SURVEY §1.1):
- ``events``      = the append-only action log (`{chain}-action-*`):
                    event_id ~ global_sequence, ts ~ @timestamp,
                    user_id ~ account, event_type ~ act.name,
                    value ~ usage metric, props ~ act.data (JSON blob)
- ``orders`` / ``lineitem`` = transaction -> trace hierarchy
- ``customer`` / ``supplier`` = mutable account state tables
- ``documents`` / ``embeddings`` = training-data corpus
  (beyond-reference dedup / similarity / text-analysis operators)

Determinism rules (driver hash-compare):
- every LIMIT query has a TOTAL order (unique tiebreaker column);
- every float aggregate is rounded to a fixed scale in BOTH engines;
- aliases match exactly between Spark plan and oracle SQL.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from .tables import load_tables


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None => non-SQL-expressible, rows-only check
    survey_ref: str  # SURVEY §2 row(s) this covers
    headline: bool = False  # included in bench.py


_REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str, oracle: str | None, survey_ref: str, headline: bool = False
) -> Callable[[Callable[[SparkSession, str], DataFrame]], Callable]:
    def deco(fn: Callable[[SparkSession, str], DataFrame]) -> Callable:
        _REGISTRY[name] = QuerySpec(name, fn, oracle, survey_ref, headline)
        return fn

    return deco


def all_specs() -> dict[str, QuerySpec]:
    return dict(_REGISTRY)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {n: s.spark_fn for n, s in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {n: s.oracle for n, s in _REGISTRY.items() if s.oracle is not None}


def _t(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return load_tables(spark, sf_dir)


# --- queries are defined in the api modules; importing them populates
# the registry ---
from .api import history as _history  # noqa: E402,F401
from .api import stats as _stats  # noqa: E402,F401
from .api import state as _state  # noqa: E402,F401
from .api import tpch as _tpch  # noqa: E402,F401
from .api import textops as _textops  # noqa: E402,F401
from .api import dedup_sim as _dedup_sim  # noqa: E402,F401
from .api import multimodal_q as _multimodal_q  # noqa: E402,F401
from .api import streamq as _streamq  # noqa: E402,F401
from .api import endpoints_ext as _endpoints_ext  # noqa: E402,F401
from .api import nested as _nested  # noqa: E402,F401
from .api import abi_q as _abi_q  # noqa: E402,F401
from .api import envelope as _envelope  # noqa: E402,F401
from .api import table_handlers_q as _table_handlers_q  # noqa: E402,F401
from .api import misc_endpoints as _misc_endpoints  # noqa: E402,F401
from .api import curation as _curation  # noqa: E402,F401
from .api import pipeline_aggs as _pipeline_aggs  # noqa: E402,F401
from .api import skew_q as _skew_q  # noqa: E402,F401
