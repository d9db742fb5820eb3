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


# Hoisted to the FRONT of the queries()/oracle_sql() iteration order.
# The driver's per-round correctness artifact snapshots a fixed-size
# prefix of the registry (50 rows in rounds 1-6), so without rotation
# it would re-measure the same round-1 queries forever; keeping the
# newest-round rows here makes the driver's own artifact exercise the
# latest work (round-6 verdict item 8). Completeness is unaffected —
# the full registry is swept every round by tests/oracle_check.py
# (ORACLE_SELF_r*.json) and pytest parametrizes over all specs.
_SHOWCASE: list[str] = [
    # round 7: stored-index serving on the actions lake + fork
    # retraction with exact df/stats adjustment; measured k256 recall
    "hyp_memo_search_bm25_indexed",
    "hyp_memo_bm25_post_retraction",
    "embedding_ivf_k256_recall",
    "get_account_profiles",
    "hyp_key_accounts_enriched",
    "multimodal_decode_jpeg",
    "embedding_semdedup_k256",
    "stream_index_bm25",
    "hyp_memo_phrase_indexed",
    # round 6: stored inverted index, curation stream, corpus-mix caps
    "doc_search_bm25_indexed",
    "doc_search_phrase_indexed",
    "doc_search_match_and_indexed",
    "stream_curation_rollup",
    "doc_source_quota",
    "doc_source_token_budget",
    "fork_retraction",
    "dedup_incremental",
    "dedup_minhash_lsh",
]


def _ordered() -> dict[str, QuerySpec]:
    front = {n: _REGISTRY[n] for n in _SHOWCASE if n in _REGISTRY}
    return front | {n: s for n, s in _REGISTRY.items() if n not in front}


def all_specs() -> dict[str, QuerySpec]:
    return _ordered()


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {n: s.spark_fn for n, s in _ordered().items()}


def oracle_sql() -> dict[str, str]:
    return {n: s.oracle for n, s in _ordered().items() if s.oracle is not None}


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
