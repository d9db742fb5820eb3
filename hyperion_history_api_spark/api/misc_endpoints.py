"""v2 misc endpoints — get_filters + explorer_metadata (SURVEY §2.11
'v2' row; closes the round-1 checklist gap).

Both are config-reflection endpoints in the reference:

- ``get_filters`` parses the operator's ingest whitelist/blacklist
  strings ``chain::contract::action`` into structured rows
  (``src/api/routes/v2/get_filters/get_filters.ts`` filterToObj);
- ``explorer_metadata`` returns provider/chain config
  (``src/api/routes/v2/explorer_metadata/explorer_metadata.ts``).

Spark-first: the filter parse is the same split logic the ingest-side
P15 filters compile from, expressed as Column ops over a config-backed
DataFrame, so the oracle hash-checks the parse. Metadata is a one-row
constant frame."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import _t, register

# fixture operator config (hyperionConfig.ts:201-210 shape): the chain
# prefix gates which entries apply, '*' wildcards pass through
FILTER_CONFIG: dict[str, list[str]] = {
    "action_blacklist": [
        "mainnet::spammer::*",
        "mainnet::eosio.token::noisyact",
        "testnet::other::thing",
    ],
    "action_whitelist": ["mainnet::gooddapp::play", "mainnet::gooddapp::move"],
    "delta_blacklist": ["mainnet::spammer::junktable"],
}
CHAIN = "mainnet"

EXPLORER_METADATA = {
    "provider": "hyperion-spark",
    "provider_url": "https://example.invalid",
    "chain_name": CHAIN,
    "chain_id": "0" * 64,
    "custom_core_token": "",
    "oracle_price_histogram": False,
}


def get_filters_df(spark: SparkSession) -> DataFrame:
    """filterToObj as a DataFrame transform: keep entries for this
    chain, split ``chain::contract::action``, tag list + kind."""
    rows = [
        (kind, entry)
        for kind, entries in FILTER_CONFIG.items()
        for entry in entries
    ]
    raw = spark.createDataFrame(rows, "kind string, entry string")
    parts = F.split("entry", "::")
    return (
        raw.where(parts.getItem(0) == CHAIN)
        .select(
            "kind",
            parts.getItem(1).alias("contract"),
            parts.getItem(2).alias("action_or_table"),
        )
    )


@register(
    "get_filters",
    """
    SELECT kind, string_split(entry, '::')[2] AS contract,
           string_split(entry, '::')[3] AS action_or_table
    FROM (VALUES
        ('action_blacklist', 'mainnet::spammer::*'),
        ('action_blacklist', 'mainnet::eosio.token::noisyact'),
        ('action_blacklist', 'testnet::other::thing'),
        ('action_whitelist', 'mainnet::gooddapp::play'),
        ('action_whitelist', 'mainnet::gooddapp::move'),
        ('delta_blacklist', 'mainnet::spammer::junktable')
    ) AS t(kind, entry)
    WHERE string_split(entry, '::')[1] = 'mainnet'
    ORDER BY kind, contract, action_or_table
    """,
    "v2 get_filters: chain-gated filter-string parse "
    "(get_filters.ts filterToObj)",
)
def get_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    return get_filters_df(spark).orderBy("kind", "contract", "action_or_table")


@register(
    "explorer_metadata",
    """
    SELECT 'hyperion-spark' AS provider, 'mainnet' AS chain_name,
           repeat('0', 64) AS chain_id, false AS oracle_price_histogram
    """,
    "v2 explorer_metadata: config reflection (explorer_metadata.ts)",
)
def explorer_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = EXPLORER_METADATA
    return spark.createDataFrame(
        [(m["provider"], m["chain_name"], m["chain_id"], m["oracle_price_histogram"])],
        "provider string, chain_name string, chain_id string, "
        "oracle_price_histogram boolean",
    )


@register(
    "es_bulk_index_ops",
    """
    SELECT 'chain-action-' || lpad(CAST(CAST(floor(event_id / 500000) AS BIGINT) AS VARCHAR), 6, '0')
             AS target_index,
           CAST(event_id AS VARCHAR) AS _id,
           '{"index":{"_id":"' || CAST(event_id AS VARCHAR)
             || '","_index":"chain-action-'
             || lpad(CAST(CAST(floor(event_id / 500000) AS BIGINT) AS VARCHAR), 6, '0')
             || '"}}' || chr(10)
             || '{"event_id":' || event_id
             || ',"user_id":' || user_id
             || ',"event_type":"' || event_type || '"}'
             AS ndjson
    FROM events WHERE user_id = 7
    ORDER BY _id LIMIT 200
    """,
    "ES bulk-index op formatting: exact _bulk NDJSON pairs with "
    "block-range index routing (elastic-routes.ts:58-79,63-65), "
    "built entirely from JVM expressions (sources/es_bulk.py)",
)
def es_bulk_index_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The connector's FORMAT stage as an oracle row: the op-metadata
    + source NDJSON pair per document, byte-compared against a DuckDB
    string-construction twin (to_json emits compact JSON in struct
    field order, which the twin replicates). The transport stage
    (post_bulk: POST, per-item ack/nack, retry) is socket-tested in
    tests/test_es_bulk.py against a stub _bulk endpoint."""
    from ..sources.es_bulk import block_router, es_bulk_format

    ev = (
        _t(spark, sf_dir)["events"]
        .where(F.col("user_id") == 7)
        .select("event_id", "user_id", "event_type")
    )
    return (
        es_bulk_format(
            ev,
            op="index",
            index_name="chain-action",
            id_col="event_id",
            router=block_router(F.col("event_id"), span=500_000),
        )
        .orderBy("_id")
        .limit(200)
    )


@register(
    "es_bulk_upsert_ops",
    """
    WITH latest AS (
        SELECT user_id, event_type, event_id, value,
               row_number() OVER (PARTITION BY user_id, event_type
                                  ORDER BY event_id DESC) AS rn
        FROM events
    )
    SELECT 'chain-state' AS target_index,
           CAST(user_id AS VARCHAR) || '-' || event_type AS _id,
           '{"update":{"_id":"' || CAST(user_id AS VARCHAR) || '-'
             || event_type
             || '","_index":"chain-state","retry_on_conflict":3}}' || chr(10)
             || '{"script":{"id":"updateByBlock","params":{"block_num":'
             || CAST(CAST(floor(event_id / 5) AS BIGINT) + 1 AS VARCHAR)
             || ',"user_id":' || user_id
             || ',"event_type":"' || event_type
             || '","value_units":' || CAST(floor(value * 100) AS BIGINT)
             || '}},"scripted_upsert":true,"upsert":{}}'
             AS ndjson
    FROM latest WHERE rn = 1
    ORDER BY _id LIMIT 200
    """,
    "ES scripted-upsert op formatting: exact updateByBlock NDJSON "
    "pairs per state key (makeScriptedOp, elastic-routes.ts:23-28; "
    "S6), JVM-codegen like the index-op twin — the format stage of "
    "the streaming indexer loop (streaming/es_indexer.py)",
)
def es_bulk_upsert_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The indexer loop's STATE write as an oracle row: one
    ``updateByBlock`` scripted upsert per (scope, pk) carrying the
    key's latest block + integer value units (the asset-units
    convention keeps the JSON byte-exact across engines; floor is
    IEEE-identical both sides where round modes differ). The
    transport + crash/replay convergence is socket-tested in
    tests/test_es_indexer.py."""
    from pyspark.sql import Window
    from ..sources.es_bulk import es_bulk_format as _fmt

    ev = _t(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("event_id").desc()
    )
    latest = (
        ev.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(
            F.concat_ws("-", "user_id", "event_type").alias("_state_id"),
            (F.floor(F.col("event_id") / 5) + 1)
            .cast("long")
            .alias("block_num"),
            "user_id",
            "event_type",
            F.floor(F.col("value") * 100).cast("long").alias("value_units"),
        )
    )
    return (
        _fmt(
            latest,
            op="update_script",
            index_name="chain-state",
            id_col="_state_id",
            source_cols=["block_num", "user_id", "event_type", "value_units"],
        )
        .orderBy("_id")
        .limit(200)
    )
