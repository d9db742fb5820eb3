"""History-query endpoints (SURVEY §2.11 v2-history family) expressed
over the ``events`` log table.

Each query is the Spark-first re-expression of one get_actions /
get_deltas-shaped request: predicate compiler (§2.2) -> orderBy/limit
(§2.6) -> projection (§2.2 P13/P14). Catalyst turns these into
parquet scans with PushedFilters + TakeOrderedAndProject — the same
physical shape ES gives Hyperion (sorted index + from/size).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.predicates import QueryParams, apply_query
from ..registry import register, _t

_EVENT_NUMERIC = frozenset({"event_id", "user_id", "value"})


def _events_query(spark: SparkSession, sf_dir: str, params: QueryParams) -> DataFrame:
    ev = _t(spark, sf_dir)["events"]
    return apply_query(
        ev,
        params,
        default_sort_field="event_id",
        tiebreaker="event_id",
        numeric_fields=_EVENT_NUMERIC,
        seq_field="event_id",
    )


@register(
    "get_actions_by_account",
    """
    SELECT event_id, ts, user_id, event_type, value
    FROM events WHERE user_id = 7
    ORDER BY event_id DESC LIMIT 100
    """,
    "P1+O1+O3 (get_actions account term, functions.ts:183-184)",
    headline=True,
)
def get_actions_by_account(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 term equality + default desc sort + limit."""
    out = _events_query(
        spark, sf_dir, QueryParams(terms={"user_id": "7"}, limit=100)
    )
    return out.select("event_id", "ts", "user_id", "event_type", "value")


@register(
    "get_actions_multi_or",
    """
    SELECT event_id, user_id, event_type
    FROM events WHERE event_type IN ('click', 'view')
    ORDER BY event_id DESC LIMIT 200
    """,
    "P3 multi-value OR (functions.ts:149-150)",
)
def get_actions_multi_or(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = _events_query(
        spark, sf_dir, QueryParams(terms={"event_type": "click,view"}, limit=200)
    )
    return out.select("event_id", "user_id", "event_type")


@register(
    "get_actions_negated",
    """
    SELECT event_id, user_id, event_type
    FROM events WHERE event_type <> 'click' AND user_id = 3
    ORDER BY event_id DESC LIMIT 100
    """,
    "P2 negated term (functions.ts:179-181)",
)
def get_actions_negated(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = _events_query(
        spark,
        sf_dir,
        QueryParams(terms={"event_type": "!click", "user_id": "3"}, limit=100),
    )
    return out.select("event_id", "user_id", "event_type")


@register(
    "get_actions_range",
    """
    SELECT event_id, user_id, value
    FROM events WHERE value >= 50 AND value <= 60
    ORDER BY event_id DESC LIMIT 500
    """,
    "P5 range a-b (functions.ts:61-69)",
)
def get_actions_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = _events_query(spark, sf_dir, QueryParams(terms={"value": "50-60"}, limit=500))
    return out.select("event_id", "user_id", "value")


@register(
    "get_actions_time_window",
    """
    SELECT event_id, ts, event_type
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-03 00:00:00'
      AND ts <= TIMESTAMP '2024-01-05 00:00:00'
      AND event_type = 'purchase'
    ORDER BY event_id DESC LIMIT 1000
    """,
    "P6 before/after ISO time filter (functions.ts:71-131)",
)
def get_actions_time_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = _events_query(
        spark,
        sf_dir,
        QueryParams(
            terms={"event_type": "purchase"},
            after="2024-01-03 00:00:00",
            before="2024-01-05 00:00:00",
            limit=1000,
        ),
    )
    return out.select("event_id", "ts", "event_type")


@register(
    "get_actions_seq_bounds",
    """
    SELECT event_id, user_id FROM events
    WHERE event_id >= 100 AND event_id <= 400
    ORDER BY event_id ASC LIMIT 1000
    """,
    "P6 numeric before/after on sequence (functions.ts:109-131)",
)
def get_actions_seq_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = _events_query(
        spark, sf_dir, QueryParams(after="100", before="400", sort="asc", limit=1000)
    )
    return out.select("event_id", "user_id")


@register(
    "get_actions_paged",
    """
    SELECT event_id, user_id, event_type FROM events
    ORDER BY event_id DESC LIMIT 50 OFFSET 100
    """,
    "O3 skip/limit pagination (functions.ts:239-267)",
)
def get_actions_paged(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = _events_query(spark, sf_dir, QueryParams(skip=100, limit=50))
    return out.select("event_id", "user_id", "event_type")


@register(
    "get_actions_sorted_by",
    """
    SELECT event_id, user_id, value FROM events
    WHERE event_type = 'purchase'
    ORDER BY value DESC, event_id ASC LIMIT 100
    """,
    "O1 custom sortedBy=field:dir (get_actions/functions.ts:3-14)",
)
def get_actions_sorted_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = _events_query(
        spark,
        sf_dir,
        QueryParams(terms={"event_type": "purchase"}, sorted_by="value:desc", limit=100),
    )
    return out.select("event_id", "user_id", "value")


@register(
    "get_actions_simple_projection",
    """
    SELECT event_id AS global_sequence, ts AS "timestamp",
           event_type AS action,
           CASE WHEN length(props) > 24
                THEN substr(props, 1, 16) || '...'
                ELSE props END AS data
    FROM events WHERE user_id = 11
    ORDER BY event_id DESC LIMIT 100
    """,
    "P13/P14 simple projection + noBinary truncation (get_actions.ts:104-131)",
)
def get_actions_simple_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`simple` response format: rename/derive columns; `noBinary`
    truncates long payload strings to a prefix + '...'."""
    out = _events_query(spark, sf_dir, QueryParams(terms={"user_id": "11"}, limit=100))
    return out.select(
        F.col("event_id").alias("global_sequence"),
        F.col("ts").alias("timestamp"),
        F.col("event_type").alias("action"),
        F.when(
            F.length("props") > 24, F.concat(F.substring("props", 1, 16), F.lit("..."))
        )
        .otherwise(F.col("props"))
        .alias("data"),
    )


@register(
    "get_actions_wildcard",
    """
    SELECT doc_id, source FROM documents
    WHERE text LIKE '%window%' AND lang = 'en'
    ORDER BY doc_id ASC LIMIT 1000
    """,
    "P10 wildcard contains (get_voter_scopes.ts:12-24)",
)
def get_actions_wildcard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir)["documents"]
    return (
        docs.where(F.col("text").contains("window") & (F.col("lang") == "en"))
        .orderBy(F.col("doc_id").asc())
        .limit(1000)
        .select("doc_id", "source")
    )


def _get_transaction_shape(spark: SparkSession, sf_dir: str, **chooser_kwargs):
    """Core of ``get_transaction_shape``, chooser-planned from catalog
    facts (round-7 verdict item 8). The dim is a KEY-equality lookup
    on o_orderkey, so ``dim_rows = 1`` is foldable from the predicate
    plus key uniqueness — no analyze job at all. The fact term is NOT
    rows(lineitem): the key equality propagates through the equi-join
    onto the fact scan (constraint inference pushes l_orderkey = 7
    into parquet), so the exchange a shuffle join pays is one key's
    traces — rows(lineitem)/ndv(l_orderkey) — which sits far below
    the broadcast-payoff floor, and the chooser correctly refuses the
    broadcast build for a point lookup (measured winner at sf3,
    JOIN_CHOOSER_BENCH_r08). Returns ``(df, strategy)``."""
    from ..operators.skew import choose_join_strategy
    from ..sources.stats import column_ndv, table_rows

    t = _t(spark, sf_dir)
    o = t["orders"].where(F.col("o_orderkey") == 7).select(
        F.col("o_orderkey").alias("l_orderkey")
    )
    chooser_kwargs.setdefault("dim_rows", 1)
    if "fact_rows" not in chooser_kwargs:
        li_rows = table_rows(t["lineitem"], cache_key=f"{sf_dir}#lineitem")
        lk_ndv = column_ndv(
            t["lineitem"], "l_orderkey", cache_key=f"{sf_dir}#lineitem"
        )
        chooser_kwargs["fact_rows"] = max(1, li_rows // max(lk_ndv, 1))
    fact, strategy = choose_join_strategy(
        t["lineitem"],
        o,
        "l_orderkey",
        salt_id_col="l_orderkey",
        how="left_semi",
        **chooser_kwargs,
    )
    out = fact.orderBy("l_linenumber").select(
        F.col("l_orderkey").alias("o_orderkey"),
        "l_linenumber",
        "l_partkey",
        "l_quantity",
        "l_extendedprice",
    )
    return out, strategy


@register(
    "get_transaction_shape",
    """
    SELECT o_orderkey, l_linenumber, l_partkey, l_quantity, l_extendedprice
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderkey = 7
    ORDER BY l_linenumber
    """,
    "get_transaction term lookup + trace expansion (get_transaction.ts:6-137)",
)
def get_transaction_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point lookup of one transaction and its traces — the lineitem
    side prunes on the join key pushed through the (stats-planned)
    broadcast semi-join."""
    return _get_transaction_shape(spark, sf_dir)[0]
