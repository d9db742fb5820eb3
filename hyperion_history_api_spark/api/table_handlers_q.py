"""Oracle-backed queries for the table-handler dictionary (SURVEY
§2.10 'table handlers'; deserializer.ts:1855-2012) — round-1 missing
item #4.

Fixture: a deltas-with-raw-JSON stream derived from ``events`` — the
``data`` column is a JSON string BUILT from deterministic scalar
derivations, and the handlers must parse + promote it back; the DuckDB
oracle states the expected promoted fields directly from the same
scalar derivations, so any parsing/promotion bug (field drop, float
parse, balance split, wildcard/exact precedence) hash-mismatches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.table_handlers import apply_table_handlers
from ..registry import register

# shared scalar derivations (valid in Spark SQL AND DuckDB — the oracle
# uses them directly; the Spark fixture wraps them in JSON text)
_CODE = (
    "CASE event_type WHEN 'purchase' THEN 'eosio.token' "
    "WHEN 'click' THEN 'customtoken' ELSE 'eosio' END"
)
_TABLE = (
    "CASE event_type WHEN 'purchase' THEN 'accounts' "
    "WHEN 'click' THEN 'accounts' WHEN 'view' THEN 'voters' "
    "WHEN 'signup' THEN 'userres' ELSE 'global' END"
)
_SYM = "CASE WHEN user_id % 2 = 0 THEN 'EOS' ELSE 'SYS' END"
_AMT = "round(value, 2)"
_NET = "round(value, 2)"
# 4-decimal scale: value/2 has at most 3 decimal digits, so no
# half-way rounding boundary exists (Spark rounds the decimal string,
# DuckDB the binary double — they disagree exactly on .xx5 halves)
_CPU = "round(value / 2, 4)"
_LVW = "round(value * 1000, 4)"
_STAKED = "round(value * 2, 4)"
_PROXY = "CASE WHEN user_id % 10 = 0 THEN 'bigproxy' ELSE '' END"
_IS_PROXY = "user_id % 20 = 0"
_RAM = "user_id * 1000 + 5"
_OWNER = "'user' || CAST(user_id AS STRING)"
_PRODS_EMPTY = "user_id % 3 = 0"


def build_raw_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta rows with the RAW JSON ``data`` payload each handler must
    promote — the columnar stand-in for the decoded contract row the
    deserializer hands to tableHandlers."""
    from ..tables import load_tables

    ev = load_tables(spark, sf_dir)["events"]
    return ev.selectExpr(
        "event_id AS global_sequence",
        f"{_CODE} AS code",
        f"{_TABLE} AS table_name",
        f"{_OWNER} AS scope",
        # one JSON shape per table family
        f"""CASE {_TABLE}
            WHEN 'accounts' THEN
              '{{"balance": "' || CAST({_AMT} AS STRING) || ' ' || {_SYM} || '"}}'
            WHEN 'voters' THEN
              '{{"owner": "' || {_OWNER} || '", "is_proxy": ' ||
              CAST({_IS_PROXY} AS STRING) ||
              ', "proxy": "' || {_PROXY} || '", "producers": ' ||
              CASE WHEN {_PRODS_EMPTY} THEN '[]'
                   ELSE '["prod' || CAST(user_id % 21 AS STRING) ||
                        '","prod' || CAST((user_id + 3) % 21 AS STRING) || '"]'
              END ||
              ', "last_vote_weight": "' || CAST({_LVW} AS STRING) ||
              '", "proxied_vote_weight": "0", "staked": "' ||
              CAST({_STAKED} AS STRING) || '"}}'
            WHEN 'userres' THEN
              '{{"owner": "' || {_OWNER} || '", "net_weight": "' ||
              CAST({_NET} AS STRING) || ' SYS", "cpu_weight": "' ||
              CAST({_CPU} AS STRING) || ' SYS", "ram_bytes": ' ||
              CAST({_RAM} AS STRING) || '}}'
            ELSE '{{"k": ' || CAST(user_id AS STRING) || '}}'
            END AS data""",
    )


@register(
    "table_handler_accounts_wildcard",
    f"""
    SELECT event_id AS global_sequence, {_CODE} AS code,
           {_AMT} AS amount, {_SYM} AS symbol
    FROM events
    WHERE event_type IN ('purchase', 'click')
    ORDER BY global_sequence LIMIT 500
    """,
    "§2.10 wildcard *:accounts handler: balance split on ANY token "
    "contract (deserializer.ts:1979-2011)",
)
def table_handler_accounts_wildcard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two different codes flow through the one wildcard handler —
    proving key lookup is by table with code wildcard."""
    d = apply_table_handlers(build_raw_deltas(spark, sf_dir))
    return (
        d.where(F.col("table_name") == "accounts")
        .select(
            "global_sequence",
            "code",
            F.col("at_accounts.amount").alias("amount"),
            F.col("at_accounts.symbol").alias("symbol"),
        )
        .orderBy("global_sequence")
        .limit(500)
    )


@register(
    "table_handler_voters",
    f"""
    SELECT event_id AS global_sequence,
           {_IS_PROXY} AS is_proxy,
           CASE WHEN user_id % 10 = 0 THEN 'bigproxy' END AS proxy,
           CASE WHEN {_PRODS_EMPTY} THEN NULL ELSE 2 END AS n_producers,
           {_LVW} AS last_vote_weight,
           {_STAKED} AS staked
    FROM events
    WHERE event_type = 'view'
    ORDER BY global_sequence LIMIT 500
    """,
    "§2.10 eosio:voters handler: float promotion, empty-proxy and "
    "empty-producers drop (deserializer.ts:1859-1881)",
)
def table_handler_voters(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = apply_table_handlers(build_raw_deltas(spark, sf_dir))
    return (
        d.where(F.col("table_name") == "voters")
        .select(
            "global_sequence",
            F.col("at_voters.is_proxy").alias("is_proxy"),
            F.col("at_voters.proxy").alias("proxy"),
            F.size("at_voters.producers").cast("int").alias("n_producers"),
            F.col("at_voters.last_vote_weight").alias("last_vote_weight"),
            F.col("at_voters.staked").alias("staked"),
        )
        .orderBy("global_sequence")
        .limit(500)
    )


@register(
    "table_handler_userres",
    f"""
    SELECT event_id AS global_sequence,
           {_OWNER} AS owner,
           {_NET} AS net_weight, {_CPU} AS cpu_weight,
           round({_NET} + {_CPU}, 4) AS total_weight,
           CAST({_RAM} AS BIGINT) AS ram_bytes
    FROM events
    WHERE event_type = 'signup'
    ORDER BY global_sequence LIMIT 500
    """,
    "§2.10 eosio:userres handler: asset-string weights -> floats + "
    "toFixed(4) total (deserializer.ts:1901-1916)",
)
def table_handler_userres(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = apply_table_handlers(build_raw_deltas(spark, sf_dir))
    return (
        d.where(F.col("table_name") == "userres")
        .select(
            "global_sequence",
            F.col("at_userres.owner").alias("owner"),
            F.col("at_userres.net_weight").alias("net_weight"),
            F.col("at_userres.cpu_weight").alias("cpu_weight"),
            F.col("at_userres.total_weight").alias("total_weight"),
            F.col("at_userres.ram_bytes").alias("ram_bytes"),
        )
        .orderBy("global_sequence")
        .limit(500)
    )


@register(
    "table_handler_global_passthrough",
    f"""
    SELECT event_id AS global_sequence,
           '{{"k": ' || CAST(user_id AS STRING) || '}}' AS raw_json
    FROM events
    WHERE event_type NOT IN ('purchase', 'click', 'view', 'signup')
    ORDER BY global_sequence LIMIT 500
    """,
    "§2.10 eosio:global handler: whole-object passthrough "
    "(deserializer.ts:1883-1886)",
)
def table_handler_global_passthrough(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = apply_table_handlers(build_raw_deltas(spark, sf_dir))
    return (
        d.where(F.col("table_name") == "global")
        .select(
            "global_sequence",
            F.col("at_global.raw_json").alias("raw_json"),
        )
        .orderBy("global_sequence")
        .limit(500)
    )
