"""The REAL Hyperion row shapes, materialized (SURVEY §1.1-§1.2,
FIXTURES.md §1-§2).

Round-1 verdict: every operator was proven on flat proxy columns while
the reference's core row is an action with nested ``receipts[]``
(each with ``auth_sequence[]``), ``act.authorization[]``,
``notified[]`` and promoted ``@transfer`` structs —
``src/indexer/definitions/index-templates.ts:52-178``. This module
materializes those shapes as a deterministic enrichment of the
driver's ``events`` parquet, so the get_actions/P7/P4/J3 family can be
proven on the actual nested schema with a DuckDB oracle.

Design for oracle parity: every SCALAR derivation is one SQL snippet
(in ``_SCALARS``) that parses identically in Spark SQL and DuckDB;
only the array/struct wrapping differs per dialect (Spark
``named_struct``/``array`` vs DuckDB ``{..}``/``[..]``), and both
wrappers are generated from the same Python builders so the two
engines construct bit-identical nested tables. The Spark side is a
pure narrow projection (no UDF, no shuffle, whole-stage codegen) —
at 100 TB this enrichment is the map stage of ingest, and the nested
table is what lands in the lake partitioned by block range.

Nested-shape cardinalities (mirroring the e2e LoadGenerator's
notification coverage, tests/e2e/lib/load-generator.ts:44-49):
- receipts: 1-3 per action (contract self-receipt + up to two
  notified counterparties, keyed on event_id mod 2 / mod 5);
- act.authorization: 1-2 actors (second actor every third action);
- notified: exactly the receipt receivers (ES keeps them in sync,
  ds-pool.ts:556-569);
- @transfer: non-null iff act.name = 'transfer', with memos drawn
  from a fixed phrase list (fuzzy-match coverage) plus one >256-char
  variant (noBinary truncation coverage).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Layer 1: scalar derivations — ONE snippet per column, valid in BOTH
# Spark SQL and DuckDB (shared subset: ||, CAST AS STRING, CASE, md5,
# floor, round, repeat, %).
# ---------------------------------------------------------------------------

_SCALARS: list[tuple[str, str]] = [
    ("global_sequence", "event_id"),
    ("block_num", "CAST(floor(event_id / 5) AS BIGINT) + 1"),
    (
        "block_id",
        "substr(md5('blk' || CAST(CAST(floor(event_id / 5) AS BIGINT) + 1 "
        "AS STRING)), 1, 16)",
    ),
    (
        "trx_id",
        "substr(md5('trx' || CAST(CAST(floor(event_id / 3) AS BIGINT) "
        "AS STRING)), 1, 16)",
    ),
    (
        "producer",
        "'prod' || CAST((CAST(floor(event_id / 5) AS BIGINT) + 1) % 21 AS STRING)",
    ),
    (
        "act_account",
        "CASE event_type WHEN 'purchase' THEN 'eosio.token' "
        "WHEN 'error' THEN 'mycontract' ELSE 'eosio' END",
    ),
    (
        "act_name",
        "CASE event_type WHEN 'purchase' THEN 'transfer' "
        "WHEN 'signup' THEN 'newaccount' WHEN 'view' THEN 'voteproducer' "
        "WHEN 'click' THEN 'delegatebw' ELSE 'doit' END",
    ),
    ("actor", "'user' || CAST(user_id AS STRING)"),
    ("actor2", "'user' || CAST((user_id + 7) % 150 AS STRING)"),
    ("cp", "'user' || CAST((user_id + 1) % 150 AS STRING)"),
    ("third", "'user' || CAST((user_id + 13) % 150 AS STRING)"),
    # action trees of depth <=2: ordinal 1 is the root (creator 0),
    # ordinals 2-4 are children of the root (action-dedup.ts semantics)
    ("action_ordinal", "event_id % 4 + 1"),
    ("creator_action_ordinal", "CASE WHEN event_id % 4 = 0 THEN 0 ELSE 1 END"),
    # digest: equal for the notification pair within a trx (same digest
    # slot), distinct for inline actions (action-dedup.ts:44-57) — a trx
    # spans 3 consecutive event_ids, so the %2 slot yields real pairs
    (
        "act_digest",
        "substr(md5('act' || CAST(CAST(floor(event_id / 3) AS BIGINT) "
        "AS STRING) || ':' || CAST(event_id % 2 AS STRING)), 1, 16)",
    ),
    # usage billed only on the first action of a trx (base-parser.ts:72-92)
    (
        "cpu_usage_us",
        "CASE WHEN event_id % 3 = 0 THEN CAST(round(value * 10, 0) AS BIGINT) "
        "ELSE 0 END",
    ),
    (
        "net_usage_words",
        "CASE WHEN event_id % 3 = 0 THEN CAST(round(value, 0) AS BIGINT) "
        "ELSE 0 END",
    ),
    ("amount", "round(value, 4)"),
    ("symbol", "CASE WHEN event_id % 2 = 0 THEN 'EOS' ELSE 'SYS' END"),
    # public keys for the @newaccount auth objects: same PUB_K1 key-group
    # scheme as the permissions table, keyed by the CREATED account
    (
        "na_key_active",
        "'PUB_K1_' || substr(md5('key' || CAST(((user_id + 1) % 150) % 40 "
        "AS STRING)), 1, 12)",
    ),
    (
        "na_key_owner",
        "'PUB_K1_' || substr(md5('key' || CAST(((user_id + 1) % 150 + 1) % 40 "
        "AS STRING)), 1, 12)",
    ),
    (
        "memo",
        "CASE user_id % 5 WHEN 0 THEN 'payment for model run' "
        "WHEN 1 THEN 'refund for order' "
        "WHEN 2 THEN 'tip for madel service' "
        "WHEN 3 THEN 'monthly subscription fee ' || repeat('x', 280) "
        "ELSE 'gift transfer memo' END",
    ),
]

_SCALAR_SQL = ", ".join(f"{expr} AS {name}" for name, expr in _SCALARS)

# ---------------------------------------------------------------------------
# Layer 2: nested wrapping — per-dialect builders over the layer-1 names.
# ---------------------------------------------------------------------------


def _receipt(dialect: str, recv: str, idx: int) -> str:
    gs = f"global_sequence * 8 + {idx}"
    rs = f"CAST(floor(global_sequence / 7) AS BIGINT) + {idx}"
    if dialect == "spark":
        return (
            f"named_struct('receiver', {recv}, 'global_sequence', {gs}, "
            f"'recv_sequence', {rs}, 'auth_sequence', "
            f"array(named_struct('account', actor, 'sequence', global_sequence)))"
        )
    return (
        f"{{'receiver': {recv}, 'global_sequence': {gs}, "
        f"'recv_sequence': {rs}, 'auth_sequence': "
        f"[{{'account': actor, 'sequence': global_sequence}}]}}"
    )


def _branch4(arr3: str, arr2a: str, arr2b: str, arr1: str) -> str:
    """receipts/notified cardinality: mod 10 -> 3 elems; mod 2 -> 2;
    mod 5 -> 2 (other pair); else 1."""
    return (
        f"CASE WHEN global_sequence % 10 = 0 THEN {arr3} "
        f"WHEN global_sequence % 2 = 0 THEN {arr2a} "
        f"WHEN global_sequence % 5 = 0 THEN {arr2b} "
        f"ELSE {arr1} END"
    )


def _receipts_expr(dialect: str) -> str:
    r0 = _receipt(dialect, "act_account", 0)
    r1 = _receipt(dialect, "cp", 1)
    r2 = _receipt(dialect, "third", 2)
    if dialect == "spark":
        return _branch4(
            f"array({r0}, {r1}, {r2})",
            f"array({r0}, {r1})",
            f"array({r0}, {r2})",
            f"array({r0})",
        )
    return _branch4(
        f"[{r0}, {r1}, {r2}]", f"[{r0}, {r1}]", f"[{r0}, {r2}]", f"[{r0}]"
    )


def _notified_expr(dialect: str) -> str:
    if dialect == "spark":
        return _branch4(
            "array(act_account, cp, third)",
            "array(act_account, cp)",
            "array(act_account, third)",
            "array(act_account)",
        )
    return _branch4(
        "[act_account, cp, third]",
        "[act_account, cp]",
        "[act_account, third]",
        "[act_account]",
    )


def _auth_expr(dialect: str) -> str:
    if dialect == "spark":
        a1 = "named_struct('actor', actor, 'permission', 'active')"
        a2 = "named_struct('actor', actor2, 'permission', 'owner')"
        return (
            f"CASE WHEN global_sequence % 3 = 0 THEN array({a1}, {a2}) "
            f"ELSE array({a1}) END"
        )
    a1 = "{'actor': actor, 'permission': 'active'}"
    a2 = "{'actor': actor2, 'permission': 'owner'}"
    return (
        f"CASE WHEN global_sequence % 3 = 0 THEN [{a1}, {a2}] ELSE [{a1}] END"
    )


def _act_expr(dialect: str) -> str:
    auth = _auth_expr(dialect)
    if dialect == "spark":
        return (
            f"named_struct('account', act_account, 'name', act_name, "
            f"'authorization', {auth}, 'data', props)"
        )
    return (
        f"{{'account': act_account, 'name': act_name, "
        f"'authorization': {auth}, 'data': props}}"
    )


def _transfer_expr(dialect: str) -> str:
    if dialect == "spark":
        st = (
            "named_struct('from_account', actor, 'to_account', cp, "
            "'amount', amount, 'symbol', symbol, 'memo', memo)"
        )
    else:
        st = (
            "{'from_account': actor, 'to_account': cp, "
            "'amount': amount, 'symbol': symbol, 'memo': memo}"
        )
    return f"CASE WHEN act_name = 'transfer' THEN {st} ELSE NULL END"


def _newaccount_expr(dialect: str) -> str:
    """The @newaccount promoted struct (index-templates.ts:99-105):
    ``newact`` plus the ``active``/``owner`` auth objects whose nested
    ``keys[].key`` terms back the get_key_accounts action-search
    fallback (get_key_accounts.ts:140-143). @updateauth.auth has the
    identical object shape."""

    def auth(key: str) -> str:
        if dialect == "spark":
            return (
                f"named_struct('threshold', 1, 'keys', "
                f"array(named_struct('key', {key}, 'weight', 1)))"
            )
        return f"{{'threshold': 1, 'keys': [{{'key': {key}, 'weight': 1}}]}}"

    if dialect == "spark":
        st = (
            f"named_struct('newact', cp, 'active', {auth('na_key_active')}, "
            f"'owner', {auth('na_key_owner')})"
        )
    else:
        st = (
            f"{{'newact': cp, 'active': {auth('na_key_active')}, "
            f"'owner': {auth('na_key_owner')}}}"
        )
    return f"CASE WHEN act_name = 'newaccount' THEN {st} ELSE NULL END"


_NESTED_COLS = [
    ("act", _act_expr),
    ("receipts", _receipts_expr),
    ("notified", _notified_expr),
    ("transfer", _transfer_expr),
    ("newaccount", _newaccount_expr),
]


def build_actions(
    spark: SparkSession, sf_dir: str, events: DataFrame | None = None
) -> DataFrame:
    """The nested ``actions`` table (index-templates.ts:52-178 shape).

    Narrow two-stage projection over the events parquet: scalars, then
    nested wrapping — no UDF, no shuffle; Catalyst collapses both into
    one whole-stage-codegen map over the scan.

    ``events`` overrides the source frame (same schema as
    ``load_tables(...)["events"]``) — the incremental lake refresh
    enriches only the newly-ingested slice through this hook.
    """
    from ..tables import load_tables

    ev = events if events is not None else load_tables(spark, sf_dir)["events"]
    scalars = ev.selectExpr("ts", "user_id", "event_type", "value", "props",
                            *[f"{expr} AS {name}" for name, expr in _SCALARS])
    nested = scalars.selectExpr(
        "*", *[f"{fn('spark')} AS {name}" for name, fn in _NESTED_COLS]
    )
    return nested


# The DuckDB twin: a WITH-prefix reproducing the same nested table from
# the registered ``events`` view. Append query SQL after this prefix.
ACTIONS_CTE = (
    "WITH _hyp_scalars AS (SELECT ts, user_id, event_type, value, props, "
    f"{_SCALAR_SQL} FROM events), "
    "actions AS (SELECT *, "
    + ", ".join(f"{fn('duckdb')} AS {name}" for name, fn in _NESTED_COLS)
    + " FROM _hyp_scalars)"
)


# ---------------------------------------------------------------------------
# deltas: contract table-row versions with promoted @accounts/@voters
# structs (index-templates.ts:193-259; FIXTURES.md §2)
# ---------------------------------------------------------------------------

_DELTA_SCALARS: list[tuple[str, str]] = [
    ("block_num", "CAST(floor(event_id / 5) AS BIGINT) + 1"),
    (
        "block_id",
        "substr(md5('blk' || CAST(CAST(floor(event_id / 5) AS BIGINT) + 1 "
        "AS STRING)), 1, 16)",
    ),
    (
        "code",
        "CASE event_type WHEN 'purchase' THEN 'eosio.token' "
        "WHEN 'click' THEN 'eosio.token' ELSE 'eosio' END",
    ),
    (
        "table_name",
        "CASE event_type WHEN 'purchase' THEN 'accounts' "
        "WHEN 'click' THEN 'accounts' WHEN 'view' THEN 'voters' "
        "WHEN 'signup' THEN 'voters' ELSE 'global' END",
    ),
    ("scope", "'user' || CAST(user_id AS STRING)"),
    ("payer", "'user' || CAST(user_id AS STRING)"),
    ("primary_key", "CAST(user_id % 50 AS STRING)"),
    ("present", "CASE WHEN event_id % 37 = 0 THEN 0 ELSE 1 END"),
    ("amount", "round(value, 4)"),
    ("symbol", "CASE WHEN user_id % 2 = 0 THEN 'EOS' ELSE 'SYS' END"),
    ("is_proxy", "user_id % 10 = 0"),
    ("last_vote_weight", "round(value * 1000, 4)"),
    ("staked", "round(value * 2, 4)"),
    ("prod_a", "'prod' || CAST(user_id % 21 AS STRING)"),
    ("prod_b", "'prod' || CAST((user_id + 3) % 21 AS STRING)"),
    ("prod_c", "'prod' || CAST((user_id + 9) % 21 AS STRING)"),
]

_DELTA_SCALAR_SQL = ", ".join(f"{expr} AS {name}" for name, expr in _DELTA_SCALARS)


def _accounts_struct(dialect: str) -> str:
    st = (
        "named_struct('amount', amount, 'symbol', symbol)"
        if dialect == "spark"
        else "{'amount': amount, 'symbol': symbol}"
    )
    return f"CASE WHEN table_name = 'accounts' THEN {st} ELSE NULL END"


def _voters_struct(dialect: str) -> str:
    prods = (
        "CASE WHEN user_id % 2 = 0 THEN array(prod_a, prod_b, prod_c) "
        "ELSE array(prod_a, prod_b) END"
        if dialect == "spark"
        else "CASE WHEN user_id % 2 = 0 THEN [prod_a, prod_b, prod_c] "
        "ELSE [prod_a, prod_b] END"
    )
    if dialect == "spark":
        st = (
            f"named_struct('is_proxy', is_proxy, 'producers', {prods}, "
            f"'last_vote_weight', last_vote_weight, 'staked', staked)"
        )
    else:
        st = (
            f"{{'is_proxy': is_proxy, 'producers': {prods}, "
            f"'last_vote_weight': last_vote_weight, 'staked': staked}}"
        )
    return f"CASE WHEN table_name = 'voters' THEN {st} ELSE NULL END"


_DELTA_NESTED = [("accounts_data", _accounts_struct), ("voters_data", _voters_struct)]


def build_deltas(
    spark: SparkSession, sf_dir: str, events: DataFrame | None = None
) -> DataFrame:
    """The nested ``deltas`` table (index-templates.ts:193-259 shape):
    several versions per (code, table, scope, primary_key) across
    blocks, ~3% deletions (present=0), per-table promoted structs.

    ``events`` overrides the source frame (see :func:`build_actions`)."""
    from ..tables import load_tables

    ev = events if events is not None else load_tables(spark, sf_dir)["events"]
    scalars = ev.selectExpr(
        "ts", "event_id", "user_id", "value",
        *[f"{expr} AS {name}" for name, expr in _DELTA_SCALARS],
    )
    return scalars.selectExpr(
        "*", *[f"{fn('spark')} AS {name}" for name, fn in _DELTA_NESTED]
    )


DELTAS_CTE = (
    "WITH _hyp_dscalars AS (SELECT ts, event_id, user_id, value, "
    f"{_DELTA_SCALAR_SQL} FROM events), "
    "deltas AS (SELECT *, "
    + ", ".join(f"{fn('duckdb')} AS {name}" for name, fn in _DELTA_NESTED)
    + " FROM _hyp_dscalars)"
)


# ---------------------------------------------------------------------------
# permissions + links: upsert-maintained account-permission state
# (index-templates.ts:277-307; FIXTURES.md §5). Public keys are REUSED
# across accounts (user_id % 40 key groups) so get_key_accounts has
# real multi-account hits; ~2.5% tombstones.
# ---------------------------------------------------------------------------

_PERM_SCALARS: list[tuple[str, str]] = [
    ("block_num", "CAST(floor(event_id / 5) AS BIGINT) + 1"),
    ("owner", "'user' || CAST(user_id AS STRING)"),
    (
        "perm_name",
        "CASE event_id % 3 WHEN 0 THEN 'owner' WHEN 1 THEN 'active' "
        "ELSE 'custom' END",
    ),
    (
        "parent",
        "CASE event_id % 3 WHEN 0 THEN '' WHEN 1 THEN 'owner' "
        "ELSE 'active' END",
    ),
    ("present", "CASE WHEN event_id % 41 = 0 THEN 0 ELSE 1 END"),
    (
        "key1",
        "'PUB_K1_' || substr(md5('key' || CAST(user_id % 40 AS STRING)), 1, 12)",
    ),
    (
        "key2",
        "'PUB_K1_' || substr(md5('key' || CAST((user_id + 1) % 40 AS STRING)), "
        "1, 12)",
    ),
    ("threshold", "1 + event_id % 2"),
]

_PERM_SCALAR_SQL = ", ".join(f"{expr} AS {name}" for name, expr in _PERM_SCALARS)


def _perm_auth_expr(dialect: str) -> str:
    if dialect == "spark":
        k1 = "named_struct('key', key1, 'weight', 1)"
        k2 = "named_struct('key', key2, 'weight', 1)"
        keys = (
            f"CASE WHEN event_id % 4 = 0 THEN array({k1}, {k2}) "
            f"ELSE array({k1}) END"
        )
        return f"named_struct('threshold', threshold, 'keys', {keys})"
    k1 = "{'key': key1, 'weight': 1}"
    k2 = "{'key': key2, 'weight': 1}"
    keys = f"CASE WHEN event_id % 4 = 0 THEN [{k1}, {k2}] ELSE [{k1}] END"
    return f"{{'threshold': threshold, 'keys': {keys}}}"


def build_permissions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``permissions`` table (index-templates.ts:277-293 shape):
    versioned permission objects with nested ``auth.keys[]``."""
    from ..tables import load_tables

    ev = load_tables(spark, sf_dir)["events"]
    scalars = ev.selectExpr(
        "ts", "event_id", "user_id",
        *[f"{expr} AS {name}" for name, expr in _PERM_SCALARS],
    )
    return scalars.selectExpr("*", f"{_perm_auth_expr('spark')} AS auth")


PERMS_CTE = (
    "WITH _hyp_pscalars AS (SELECT ts, event_id, user_id, "
    f"{_PERM_SCALAR_SQL} FROM events), "
    "permissions AS (SELECT *, "
    + _perm_auth_expr("duckdb")
    + " AS auth FROM _hyp_pscalars)"
)


_LINK_SCALARS: list[tuple[str, str]] = [
    ("block_num", "CAST(floor(event_id / 5) AS BIGINT) + 1"),
    ("account", "'user' || CAST(user_id AS STRING)"),
    (
        "code",
        "CASE event_id % 4 WHEN 0 THEN 'eosio.token' WHEN 1 THEN 'eosio' "
        "WHEN 2 THEN 'eosio.msig' ELSE 'mycontract' END",
    ),
    (
        "action",
        "CASE event_id % 5 WHEN 0 THEN 'transfer' WHEN 1 THEN 'voteproducer' "
        "WHEN 2 THEN 'propose' WHEN 3 THEN 'doit' ELSE 'approve' END",
    ),
    (
        "permission",
        "CASE event_id % 3 WHEN 0 THEN 'claim' WHEN 1 THEN 'ops' "
        "ELSE 'active' END",
    ),
    ("present", "CASE WHEN event_id % 29 = 0 THEN 0 ELSE 1 END"),
]

_LINK_SCALAR_SQL = ", ".join(f"{expr} AS {name}" for name, expr in _LINK_SCALARS)


def build_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``links`` permission-link table (index-templates.ts:295-307
    shape): versioned (account, code, action) -> permission rows with
    tombstones."""
    from ..tables import load_tables

    ev = load_tables(spark, sf_dir)["events"]
    return ev.selectExpr(
        "ts", "event_id", "user_id",
        *[f"{expr} AS {name}" for name, expr in _LINK_SCALARS],
    )


LINKS_CTE = (
    "WITH links AS (SELECT ts, event_id, user_id, "
    f"{_LINK_SCALAR_SQL} FROM events)"
)


# ---------------------------------------------------------------------------
# proposals: msig proposal state with nested approval arrays
# (index-templates.ts:476-526 table-proposals; FIXTURES.md §6)
# ---------------------------------------------------------------------------

_PROP_SCALARS: list[tuple[str, str]] = [
    ("block_num", "CAST(floor(event_id / 5) AS BIGINT) + 1"),
    ("proposer", "'user' || CAST(user_id % 30 AS STRING)"),
    ("proposal_name", "'prop' || CAST(event_id % 400 AS STRING)"),
    ("executed", "event_id % 11 = 0"),
    ("expiration", "ts + INTERVAL 3 DAY"),
    ("appr_a", "'user' || CAST(user_id AS STRING)"),
    ("appr_b", "'user' || CAST((user_id + 5) % 150 AS STRING)"),
    ("appr_c", "'user' || CAST((user_id + 11) % 150 AS STRING)"),
]

_PROP_SCALAR_SQL = ", ".join(f"{expr} AS {name}" for name, expr in _PROP_SCALARS)


def _approval(dialect: str, actor: str) -> str:
    if dialect == "spark":
        return f"named_struct('actor', {actor}, 'permission', 'active', 'time', ts)"
    return f"{{'actor': {actor}, 'permission': 'active', 'time': ts}}"


def _requested_expr(dialect: str) -> str:
    a = _approval(dialect, "appr_a")
    b = _approval(dialect, "appr_b")
    c = _approval(dialect, "appr_c")
    arr3 = f"array({a}, {b}, {c})" if dialect == "spark" else f"[{a}, {b}, {c}]"
    arr2 = f"array({a}, {b})" if dialect == "spark" else f"[{a}, {b}]"
    return f"CASE WHEN event_id % 2 = 0 THEN {arr3} ELSE {arr2} END"


def _provided_expr(dialect: str) -> str:
    a = _approval(dialect, "appr_a")
    b = _approval(dialect, "appr_b")
    arr1 = f"array({a})" if dialect == "spark" else f"[{a}]"
    arr2 = f"array({a}, {b})" if dialect == "spark" else f"[{a}, {b}]"
    empty = "array()" if dialect == "spark" else "[]"
    return (
        f"CASE WHEN event_id % 3 = 0 THEN {arr2} "
        f"WHEN event_id % 3 = 1 THEN {arr1} ELSE {empty} END"
    )


_PROP_NESTED = [
    ("requested_approvals", _requested_expr),
    ("provided_approvals", _provided_expr),
]


def build_proposals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The msig ``proposals`` state table (FIXTURES.md §6): several
    versions per (proposer, proposal_name) across blocks, nested
    requested/provided approval arrays, executed flag, expiration."""
    from ..tables import load_tables

    ev = load_tables(spark, sf_dir)["events"]
    scalars = ev.selectExpr(
        "ts", "event_id", "user_id",
        *[f"{expr} AS {name}" for name, expr in _PROP_SCALARS],
    )
    return scalars.selectExpr(
        "*", *[f"{fn('spark')} AS {name}" for name, fn in _PROP_NESTED]
    )


PROPOSALS_CTE = (
    "WITH _hyp_prscalars AS (SELECT ts, event_id, user_id, "
    f"{_PROP_SCALAR_SQL} FROM events), "
    "proposals AS (SELECT *, "
    + ", ".join(f"{fn('duckdb')} AS {name}" for name, fn in _PROP_NESTED)
    + " FROM _hyp_prscalars)"
)


# ---------------------------------------------------------------------------
# schedule: producer-schedule versions with nested producers[]
# (index-templates.ts:354-372; FIXTURES.md §8)
# ---------------------------------------------------------------------------

_SCHED_VERSION = "CAST(floor(event_id / 500) AS BIGINT)"
_SCHED_NAME = f"'prod' || CAST(({_SCHED_VERSION} + i) % 21 AS STRING)"
_SCHED_KEY = (
    "'PUB_K1_' || substr(md5('sched' || CAST(" + _SCHED_VERSION
    + " AS STRING) || ':' || " + _SCHED_NAME + "), 1, 12)"
)


def _producers_expr(dialect: str) -> str:
    if dialect == "spark":
        return (
            f"transform(sequence(0, 20), i -> named_struct("
            f"'name', {_SCHED_NAME}, 'key', {_SCHED_KEY}))"
        )
    return (
        f"list_transform(range(0, 21), i -> "
        f"{{'name': {_SCHED_NAME}, 'key': {_SCHED_KEY}}})"
    )


def build_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Producer-schedule versions: one row per 500-event boundary,
    21-producer nested array whose per-version keys rotate (as-of
    lookup coverage: the same producer has different keys across
    versions)."""
    from ..tables import load_tables

    ev = load_tables(spark, sf_dir)["events"]
    return (
        ev.where(F.expr("event_id % 500 = 0"))
        .selectExpr(
            "ts",
            f"{_SCHED_VERSION} AS version",
            "CAST(floor(event_id / 5) AS BIGINT) + 1 AS block_num",
            f"{_producers_expr('spark')} AS producers",
        )
    )


SCHEDULE_CTE = (
    "WITH schedule AS (SELECT ts, "
    f"{_SCHED_VERSION} AS version, "
    "CAST(floor(event_id / 5) AS BIGINT) + 1 AS block_num, "
    f"{_producers_expr('duckdb')} AS producers "
    "FROM events WHERE event_id % 500 = 0)"
)
