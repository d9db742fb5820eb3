"""Per-table struct promotion — the reference's table-handler
dictionary (SURVEY §2.10; ``deserializer.ts:1855-2012
populateTableHandlers``).

Hyperion promotes the raw decoded ``data`` of hot system tables into
typed ``@table`` objects: ``eosio:voters``, ``eosio:global``,
``eosio:producers``, ``eosio:userres``, ``eosio:delband``,
``eosio.msig:approvals`` and the WILDCARD ``*:accounts`` (any token
contract's balance row). Handlers are keyed ``code:table``; lookup
tries the exact key first, then ``*:table``.

Spark-first: each handler is a Column transform (``from_json`` with
the handler's schema + field-level promotion), and
:func:`apply_table_handlers` applies the whole dictionary in ONE
narrow projection — a CASE per target struct column gated on the
(code, table) key, so every handler rides the same
whole-stage-codegen pass over the delta stream; no UDFs, no shuffle.
Promoted columns are named ``at_<table>`` (columnar stand-in for the
reference's ``@table`` keys). The reference deletes promoted keys
from ``data`` and omits empty fields (e.g. ``proxy === ""``); in a
fixed-schema lake the struct keeps the field as NULL — documented
divergence, same information.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_VOTERS_SCHEMA = T.StructType(
    [
        T.StructField("is_proxy", T.BooleanType()),
        T.StructField("proxy", T.StringType()),
        T.StructField("producers", T.ArrayType(T.StringType())),
        T.StructField("last_vote_weight", T.StringType()),
        T.StructField("proxied_vote_weight", T.StringType()),
        T.StructField("staked", T.StringType()),
    ]
)


def _voters(data: Column) -> Column:
    """deserializer.ts:1859-1881: floats parsed from chain strings,
    empty proxy dropped (NULL), empty producers dropped (NULL)."""
    d = F.from_json(data, _VOTERS_SCHEMA)
    return F.struct(
        d["is_proxy"].alias("is_proxy"),
        F.when(d["proxy"] != "", d["proxy"]).alias("proxy"),
        F.when(F.size(d["producers"]) > 0, d["producers"]).alias("producers"),
        d["last_vote_weight"].cast("double").alias("last_vote_weight"),
        d["proxied_vote_weight"].cast("double").alias("proxied_vote_weight"),
        d["staked"].cast("double").alias("staked"),
    )


def _global(data: Column) -> Column:
    """deserializer.ts:1883-1886: @global = the whole data object."""
    return F.struct(data.alias("raw_json"))


_PRODUCERS_SCHEMA = T.StructType(
    [
        T.StructField("total_votes", T.StringType()),
        T.StructField("is_active", T.BooleanType()),
        T.StructField("unpaid_blocks", T.LongType()),
    ]
)


def _producers(data: Column) -> Column:
    d = F.from_json(data, _PRODUCERS_SCHEMA)
    return F.struct(
        d["total_votes"].cast("double").alias("total_votes"),
        d["is_active"].alias("is_active"),
        d["unpaid_blocks"].alias("unpaid_blocks"),
    )


_RES_SCHEMA = T.StructType(
    [
        T.StructField("owner", T.StringType()),
        T.StructField("from", T.StringType()),
        T.StructField("to", T.StringType()),
        T.StructField("net_weight", T.StringType()),
        T.StructField("cpu_weight", T.StringType()),
        T.StructField("ram_bytes", T.LongType()),
    ]
)


def _weights(d: Column) -> tuple[Column, Column, Column]:
    net = F.split(d["net_weight"], " ").getItem(0).cast("double")
    cpu = F.split(d["cpu_weight"], " ").getItem(0).cast("double")
    # reference: parseFloat((net + cpu).toFixed(4))
    return net, cpu, F.round(net + cpu, 4)


def _userres(data: Column) -> Column:
    d = F.from_json(data, _RES_SCHEMA)
    net, cpu, total = _weights(d)
    return F.struct(
        d["owner"].alias("owner"),
        net.alias("net_weight"),
        cpu.alias("cpu_weight"),
        total.alias("total_weight"),
        d["ram_bytes"].alias("ram_bytes"),
    )


def _delband(data: Column) -> Column:
    d = F.from_json(data, _RES_SCHEMA)
    net, cpu, total = _weights(d)
    return F.struct(
        d["from"].alias("from_account"),
        d["to"].alias("to_account"),
        net.alias("net_weight"),
        cpu.alias("cpu_weight"),
        total.alias("total_weight"),
    )


_ACCOUNTS_SCHEMA = T.StructType([T.StructField("balance", T.StringType())])


def _accounts(data: Column) -> Column:
    """The WILDCARD handler (*:accounts, deserializer.ts:1979-2011):
    any contract's balance row splits '<amount> <SYM>'."""
    d = F.from_json(data, _ACCOUNTS_SCHEMA)
    parts = F.split(d["balance"], " ")
    return F.struct(
        parts.getItem(0).cast("double").alias("amount"),
        parts.getItem(1).alias("symbol"),
    )


# key -> (target column, transform). Exact keys first, then wildcards —
# mirroring populateTableHandlers' dictionary.
TABLE_HANDLERS: dict[str, tuple[str, Callable[[Column], Column]]] = {
    "eosio:voters": ("at_voters", _voters),
    "eosio:global": ("at_global", _global),
    "eosio:producers": ("at_producers", _producers),
    "eosio:userres": ("at_userres", _userres),
    "eosio:delband": ("at_delband", _delband),
    "*:accounts": ("at_accounts", _accounts),
}


def handler_keys_for(code: str, table: str) -> list[str]:
    """Lookup order: exact ``code:table``, then ``*:table``."""
    out = []
    if f"{code}:{table}" in TABLE_HANDLERS:
        out.append(f"{code}:{table}")
    if f"*:{table}" in TABLE_HANDLERS:
        out.append(f"*:{table}")
    return out


def apply_table_handlers(
    df: DataFrame,
    *,
    code_col: str = "code",
    table_col: str = "table_name",
    data_col: str = "data",
) -> DataFrame:
    """Apply the whole handler dictionary in one projection: each
    target struct column is non-null exactly where its key matches
    (wildcard keys match any code). Narrow, codegen'd, no shuffle."""
    out = df
    for key, (target, fn) in TABLE_HANDLERS.items():
        code, _, table = key.partition(":")
        match = F.col(table_col) == table
        if code != "*":
            match = match & (F.col(code_col) == code)
        else:
            # exact keys shadow the wildcard for their code
            exact_codes = [
                k.split(":", 1)[0]
                for k in TABLE_HANDLERS
                if k.endswith(f":{table}") and not k.startswith("*")
            ]
            if exact_codes:
                match = match & ~F.col(code_col).isin(exact_codes)
        out = out.withColumn(
            target, F.when(match, fn(F.col(data_col)))
        )
    return out
