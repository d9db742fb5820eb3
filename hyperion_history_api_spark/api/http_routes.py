"""The remaining REST routes — the reference autoloads every route
directory (``src/api/routes.ts:18-25``); this module completes the
serving surface begun in :mod:`.http_server` with the v2-history tail,
the v2-state family, the v2-stats family, the v2 misc pair, and the v1
compatibility shims (``src/api/routes/v1-history``, ``v1-trace``).

Every handler is the same THIN-translation discipline as
http_server.py: query-string/JSON params → the oracle-checked plan
family the registry serves (parameterized through the SAME private
cores — ``_get_key_accounts``, ``_v1_trace_get_block``, the predicate
compiler, ``latest_row_per_key`` — so the HTTP plan can never drift
from the hash-gated one), plus the reference's response body shapes.
Handler defaults equal the registry rows' constants, which is what
``tests/test_http_server.py`` asserts per family (envelope parity).

Scale shape: unchanged from the registry rows — point/page lookups are
pushed-down scans + TakeOrderedAndProject; dimension joins run through
the stats-planned chooser; every ``.collect()`` is behind a clamped
``limit`` (MAX_LIMIT) or a bounded group-by (per-day buckets,
25-producer rollups).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.latest_state import latest_row_per_key
from ..plans.predicates import QueryParams, apply_query, compile_predicate
from ..registry import _t


def _rows(df: DataFrame, limit: int | None = None) -> list[dict]:
    """Collect a bounded frame to JSON-safe dicts (timestamps → str)."""
    if limit is not None:
        df = df.limit(limit)
    return [
        {
            k: (str(v) if hasattr(v, "isoformat") else v)
            for k, v in r.asDict(recursive=True).items()
        }
        for r in df.collect()
    ]


# --- v2-history tail -----------------------------------------------------


def get_blocks(api, params: dict) -> dict:
    """routes/v2-history/get_blocks (get_blocks.ts:6-161): block-range
    headers with per-block rollups — the ``get_blocks_range`` plan
    parameterized by the [after, before] sequence window.
    ``model=hyperion`` serves the nested lake rollups."""
    if params.get("model") == "hyperion":
        return hyp_get_blocks(api, params)
    from .http_server import _limit

    after = int(params.get("after", 100))
    before = int(params.get("before", 699))
    ev = _t(api.spark, api.sf_dir)["events"]
    pred = compile_predicate(
        ev,
        QueryParams(after=str(after), before=str(before)),
        seq_field="event_id",
    )
    df = (
        ev.where(pred)
        .groupBy((F.col("event_id") / 100).cast("long").alias("block_num"))
        .agg(
            F.count("*").alias("trx_count"),
            F.round(F.sum("value"), 4).alias("cpu_usage"),
            F.max("event_id").alias("last_seq"),
        )
        .orderBy(F.col("block_num").desc())
    )
    # get_blocks.ts:153-158 response shape: the reference itself
    # hardcodes lib: 0 here (only get_transaction resolves the real
    # watermark) — mirror that, not lib_block()
    return {"cached": False, "lib": 0, "blocks": _rows(df, _limit(params))}


def get_block(api, params: dict) -> dict:
    """routes/v2-history/get_block: ONE block's header rollup plus its
    transactions — the single-block specialization of get_blocks (the
    block_num = event_id // 100 mapping the registry uses), both scans
    pruned to the block's 100-sequence slice. ``model=hyperion``
    serves the nested lake header."""
    if params.get("model") == "hyperion":
        return hyp_get_block_route(api, params)
    num = int(params.get("block_num", 3))
    lo, hi = num * 100, num * 100 + 99
    ev = _t(api.spark, api.sf_dir)["events"].where(
        F.col("event_id").between(lo, hi)
    )
    head = ev.agg(
        F.count("*").alias("trx_count"),
        F.round(F.sum("value"), 4).alias("cpu_usage"),
        F.max("event_id").alias("last_seq"),
    ).first()
    if head["last_seq"] is None:
        return {"block_num": num, "transactions": [], "trx_count": 0}
    trx = ev.orderBy("event_id").select(
        "event_id", "user_id", "event_type", "ts"
    )
    return {
        "block_num": num,
        "lib": 0,  # get_block.ts:32 hardcodes lib: 0
        "trx_count": head["trx_count"],
        "cpu_usage": head["cpu_usage"],
        "last_seq": head["last_seq"],
        "transactions": _rows(trx, 1000),
    }


def get_abi_snapshot(api, params: dict) -> dict:
    """routes/v2-history/get_abi_snapshot: the contract's latest ABI
    version at or below ``block`` — a top-1 as-of lookup (the
    ``abi_asof_join``/``top1_lookup`` family): pushed-down equality +
    sequence bound, TakeOrderedAndProject(1)."""
    account = int(params["contract"])
    block = int(params.get("block", 1 << 62))
    ev = _t(api.spark, api.sf_dir)["events"]
    row = (
        ev.where(
            (F.col("event_type") == "signup")
            & (F.col("user_id") == account)
            & (F.col("event_id") <= block)
        )
        .orderBy(F.col("event_id").desc())
        .limit(1)
        .select("event_id", "ts")
        .first()
    )
    if row is None:
        return {"contract": account, "present": False}
    return {
        "contract": account,
        "present": True,
        "version_seq": row["event_id"],
        "valid_from": str(row["ts"]),
    }


def get_schedule(api, params: dict) -> dict:
    """routes/v2-history/get_schedule (get_schedule.ts:9-59): latest
    producer-schedule version as-of a sequence — the
    ``get_schedule_asof`` plan parameterized by ``before``."""
    before = params.get("before", "600")
    ev = _t(api.spark, api.sf_dir)["events"]
    df = apply_query(
        ev,
        QueryParams(terms={"event_type": "signup"}, before=str(before), limit=1),
        default_sort_field="event_id",
        seq_field="event_id",
    ).select(
        F.col("event_id").alias("version_seq"),
        F.col("user_id").alias("producer_slot"),
        F.col("ts").alias("active_since"),
    )
    rows = _rows(df)
    return {"schedule": rows[0] if rows else None}


def get_table_state(api, params: dict) -> dict:
    """routes/v2-history/get_table_state (get_table_state.ts:22-78):
    latest row per (scope, primary_key) as-of ``block``, paged by the
    composite ``after_key`` cursor — ``get_table_state_latest`` +
    ``keyset_pagination`` in one parameterized plan. One shuffle on
    the state key; the as-of bound is pushed to the scan.
    ``model=hyperion`` serves the nested deltas-lake state."""
    if params.get("model") == "hyperion":
        return hyp_get_table_state(api, params)
    from .http_server import _limit

    block = int(params.get("block", 800))
    after_key = params.get("after_key", "")
    limit = _limit(params, default=100)
    ev = _t(api.spark, api.sf_dir)["events"]
    latest = latest_row_per_key(
        ev,
        ["user_id", "event_type"],
        "event_id",
        as_of=F.col("event_id") <= block,
    )
    key = F.concat_ws("-", F.col("user_id"), F.col("event_type"))
    page = latest.withColumn("_key", key)
    if after_key:
        page = page.where(F.col("_key") > after_key)
    page = (
        page.orderBy(F.col("_key").asc())
        .limit(limit)
        .select(
            "user_id",
            "event_type",
            "event_id",
            F.round("value", 4).alias("value"),
            "_key",
        )
    )
    rows = _rows(page)
    next_key = rows[-1]["_key"] if rows and len(rows) == limit else None
    for r in rows:
        del r["_key"]
    return {"block": block, "rows": rows, "next_key": next_key}


def check_transaction(api, params: dict) -> dict:
    """routes/v2-history/check_transaction (check_transaction.ts:4-27):
    existence probe — key lookup + trace count, predicate pushed into
    both scans (the registered ``check_transaction`` plan)."""
    trx = int(params.get("id", 42))
    t = _t(api.spark, api.sf_dir)
    o = t["orders"].where(F.col("o_orderkey") == trx)
    li = t["lineitem"].where(F.col("l_orderkey") == trx)
    row = (
        o.join(li, F.col("l_orderkey") == F.col("o_orderkey"), "left")
        .groupBy("o_orderkey", "o_orderstatus", "o_totalprice")
        .agg(F.count("l_orderkey").alias("action_count"))
        .first()
    )
    if row is None:
        return {"id": trx, "known": False}
    return {
        "id": trx,
        "known": True,
        "status": row["o_orderstatus"],
        "action_count": row["action_count"],
        "total": round(row["o_totalprice"], 4),
    }


def hyp_get_actions(api, params: dict) -> dict:
    """``model=hyperion`` on routes/v2-history/get_actions: serve the
    REAL nested action documents from the partitioned lake — the
    document shape the reference returns (index-templates.ts:52-178),
    not the flat testdata mapping. Predicates are the registry's own:
    account => the triple involvement disjunction over
    notified/receipts.receiver/act.authorization.actor
    (hyp_actions_account_disjunction); ``filter=code:action`` =>
    the OR-of-conjunctions compiler; after/before => block bounds that
    PRUNE LAKE PARTITIONS (prune_block_range — the block_hint
    single-index routing, get_transaction.ts:73-79)."""
    from ..plans.predicates import compile_code_action_filter
    from ..sources.lake import lake_actions, prune_block_range
    from .http_server import _limit

    a = lake_actions(api.spark, api.sf_dir)
    if "after" in params or "before" in params:
        a = prune_block_range(
            a,
            lo=int(params["after"]) if "after" in params else None,
            hi=int(params["before"]) if "before" in params else None,
        )
    pred = F.lit(True)
    if "account" in params:
        acct = params["account"]
        pred = pred & (
            F.array_contains("notified", acct)
            | F.exists("receipts", lambda r: r["receiver"] == acct)
            | F.exists("act.authorization", lambda x: x["actor"] == acct)
        )
    if "filter" in params:
        pred = pred & compile_code_action_filter(
            F.col("act.account"), F.col("act.name"), params["filter"]
        )
    matched = a.where(pred)
    limit = _limit(params)
    skip = int(params.get("skip", 0))
    order = (
        F.col("global_sequence").asc()
        if params.get("sort") == "asc"
        else F.col("global_sequence").desc()
    )
    page = matched.orderBy(order)
    if skip:
        page = page.offset(skip)
    page = page.limit(limit).select(
        "global_sequence",
        "block_num",
        "trx_id",
        "act",
        "notified",
        F.col("ts").cast("string").alias("timestamp"),
    )
    actions = [r.asDict(recursive=True) for r in page.collect()]
    return {
        "actions": actions,
        "total": {"value": matched.count(), "relation": "eq"},
        "model": "hyperion",
    }


def hyp_get_transaction(api, params: dict) -> dict:
    """``model=hyperion`` on get_transaction: the trx's actions in
    canonical ordinal order from the nested lake, key-pruned by
    trx_id (+ optional block_num_hint partition routing — the
    reference's single-index hint, get_transaction.ts:73-79)."""
    from ..sources.lake import lake_actions, prune_block_range

    trx_id = params["id"]
    a = lake_actions(api.spark, api.sf_dir)
    if "block_hint" in params:
        hint = int(params["block_hint"])
        a = prune_block_range(a, lo=hint, hi=hint)
    rows = (
        a.where(F.col("trx_id") == trx_id)
        .orderBy("action_ordinal", "global_sequence")
        .select(
            "global_sequence",
            "action_ordinal",
            "creator_action_ordinal",
            "block_num",
            "act",
            F.size("receipts").cast("long").alias("n_receipts"),
        )
        .limit(1000)
        .collect()
    )
    lib = api.lib_block()  # real lib on get_transaction (ts:67,102)
    if not rows:
        return {"executed": False, "trx_id": trx_id, "lib": lib, "actions": []}
    return {
        "executed": True,
        "trx_id": trx_id,
        "lib": lib,
        "block_num": rows[0]["block_num"],
        "actions": [r.asDict(recursive=True) for r in rows],
    }


def hyp_get_deltas(api, params: dict) -> dict:
    """``model=hyperion`` on get_deltas: the nested delta documents
    from the lake (promoted @accounts struct), newest first — the
    shared :func:`..api.nested.deltas_page` core the hash-gated
    ``hyp_get_deltas_page`` row runs; route defaults are the row's
    constants."""
    from .http_server import _limit
    from .nested import deltas_page

    df = deltas_page(
        api.spark,
        api.sf_dir,
        code=params.get("code", "eosio.token"),
        table=params.get("table", "accounts"),
        scope=params.get("scope"),
        payer=params.get("payer"),
        block_hi=int(params["before"]) if "before" in params else 180,
        limit=_limit(params, default=100),
    )
    return {"deltas": _rows(df), "model": "hyperion"}


def hyp_get_blocks(api, params: dict) -> dict:
    """``model=hyperion`` on get_blocks: per-block header rollups from
    the nested actions lake over [after, before] — the shared
    :func:`..api.nested.blocks_range_rollup` core of the hash-gated
    ``hyp_get_blocks_range`` row (its constants are the defaults)."""
    from .http_server import _limit
    from .nested import blocks_range_rollup

    lo = int(params.get("after", 40))
    hi = int(params.get("before", 60))
    df = blocks_range_rollup(api.spark, api.sf_dir, lo, hi).orderBy(
        F.col("block_num").desc()
    )
    return {
        "cached": False,
        "lib": 0,  # get_blocks.ts:155 hardcodes lib: 0
        "blocks": _rows(df, _limit(params)),
        "model": "hyperion",
    }


def hyp_get_block_route(api, params: dict) -> dict:
    """``model=hyperion`` on get_block: one block's nested header
    rollup — the hash-gated ``hyp_get_block`` row parameterized by
    block_num (same :func:`..api.nested.blocks_range_rollup` core)."""
    from .nested import blocks_range_rollup

    num = int(params.get("block_num", 42))
    rows = _rows(
        blocks_range_rollup(api.spark, api.sf_dir, num, num).withColumn(
            "prev_id",
            F.expr(
                "substr(md5('blk' || CAST(block_num - 1 AS STRING)), 1, 16)"
            ),
        )
    )
    if not rows:
        return {"block_num": num, "present": False, "model": "hyperion"}
    return rows[0] | {"present": True, "model": "hyperion"}


def hyp_get_table_state(api, params: dict) -> dict:
    """``model=hyperion`` on get_table_state: latest present row per
    (scope, primary_key) as-of ``block`` on the nested deltas lake —
    the shared :func:`..api.nested.table_state_asof` core of the
    hash-gated ``hyp_table_state_latest`` row, plus the route's
    keyset ``after_key`` page cursor (O8)."""
    from .http_server import _limit
    from .nested import table_state_asof

    block = int(params.get("block", 1500))
    limit = _limit(params, default=100)
    latest = table_state_asof(
        api.spark,
        api.sf_dir,
        params.get("code", "eosio.token"),
        params.get("table", "accounts"),
        block,
    )
    page = latest.withColumn(
        "_key", F.concat_ws("-", F.col("scope"), F.col("primary_key"))
    )
    if params.get("after_key"):
        page = page.where(F.col("_key") > params["after_key"])
    rows = _rows(page.orderBy(F.col("_key").asc()).limit(limit))
    next_key = rows[-1]["_key"] if rows and len(rows) == limit else None
    for r in rows:
        del r["_key"]
    return {
        "block": block,
        "rows": rows,
        "next_key": next_key,
        "model": "hyperion",
    }


def hyp_get_created_accounts(api, params: dict) -> dict:
    """``model=hyperion`` on get_created_accounts: the creator's
    newaccount actions from the nested lake (promoted @newaccount
    struct) — the shared :func:`..api.nested.created_accounts` core of
    the hash-gated ``hyp_created_accounts`` row."""
    from .http_server import _limit
    from .nested import created_accounts

    creator = params.get("account", "user8")
    df = created_accounts(
        api.spark, api.sf_dir, creator, limit=_limit(params, default=100)
    )
    return {"accounts": _rows(df), "model": "hyperion"}


def hyp_get_creator(api, params: dict) -> dict:
    """``model=hyperion`` on get_creator: top-1 newaccount lookup by
    created account on the nested lake — the shared
    :func:`..api.nested.creator_of` core of the hash-gated
    ``hyp_get_creator`` row."""
    from .nested import creator_of

    account = params.get("account", "user5")
    rows = _rows(creator_of(api.spark, api.sf_dir, account))
    if not rows:
        return {"account": account, "creator": None, "model": "hyperion"}
    return rows[0] | {"model": "hyperion"}


# --- v2-state remainder ---------------------------------------------------


def get_account(api, params: dict) -> dict:
    """routes/v2-state/get_account (get_account.ts:38-108): the FULL
    composition the reference assembles from parallel subqueries —
    account row + activity rollup (one key-pruned plan, the registered
    ``get_account`` shape) plus the account's recent actions, held
    tokens (the chooser-planned ``get_tokens`` core) and permission
    links. Every leg is key-pruned to the one account; the reference
    fires them as Promise.all and so does a Spark scheduler under
    concurrent jobs — here they run serially per request, each a
    sub-100ms point plan."""
    account = int(params.get("account", 7))
    t = _t(api.spark, api.sf_dir)
    c = t["customer"].where(F.col("c_custkey") == account)
    o = t["orders"].where(F.col("o_custkey") == account)
    row = (
        c.join(o, F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("c_custkey", "c_name", "c_acctbal")
        .agg(
            F.count("o_orderkey").alias("total_trx"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 4).alias(
                "total_volume"
            ),
            F.max("o_orderkey").alias("last_trx"),
        )
        .first()
    )
    if row is None:
        return {"account": account, "known": False}
    # the three side legs of the reference composition
    from .endpoints_ext import _get_tokens

    tokens_df, _ = _get_tokens(api.spark, api.sf_dir, account=account)
    actions = (
        _t(api.spark, api.sf_dir)["events"]
        .where(F.col("user_id") == account)
        .orderBy(F.col("event_id").desc())
        .limit(10)
        .select("event_id", "event_type", "ts", "value")
    )
    links = (
        _t(api.spark, api.sf_dir)["events"]
        .where(F.col("user_id") == account)
        .groupBy(F.col("event_type").alias("action"))
        .agg(F.min("event_id").alias("linked_at"))
        .orderBy("action")
    )
    return {
        "account": account,
        "known": True,
        "account_name": row["c_name"],
        "balance": round(row["c_acctbal"], 4),
        "total_trx": row["total_trx"],
        "total_volume": row["total_volume"],
        "last_trx": row["last_trx"],
        "tokens": _rows(tokens_df, 100),
        "actions": _rows(actions),
        "links": _rows(links, 100),
    }


def get_links(api, params: dict) -> dict:
    """routes/v2-state/get_links (get_links.ts:5-64): permission links
    per account — compiler-built account filter + bounded groupBy
    (the registered ``get_links`` plan parameterized)."""
    account = params.get("account", "1-5")
    ev = _t(api.spark, api.sf_dir)["events"]
    pred = compile_predicate(
        ev,
        QueryParams(terms={"user_id": str(account)}),
        numeric_fields=frozenset({"user_id"}),
    )
    df = (
        ev.where(pred)
        .groupBy(
            F.col("user_id").alias("account"),
            F.col("event_type").alias("action"),
        )
        .agg(F.min("event_id").alias("linked_at"))
        .orderBy("account", "action")
    )
    return {"links": _rows(df, 1000)}


def get_proposals(api, params: dict) -> dict:
    """routes/v2-state/get_proposals (get_proposals.ts:4-96): pending
    msig proposals, newest first with a unique tiebreaker (the
    registered ``get_proposals`` plan parameterized)."""
    from .http_server import _limit

    status = params.get("status", "P")
    o = _t(api.spark, api.sf_dir)["orders"]
    df = apply_query(
        o,
        QueryParams(
            terms={"o_orderstatus": status},
            sorted_by="o_orderdate:desc",
            limit=_limit(params, default=40),
        ),
        default_sort_field="o_orderdate",
        tiebreaker="o_orderkey",
    ).select(
        F.col("o_orderkey").alias("proposal_id"),
        F.col("o_custkey").alias("proposer"),
        F.col("o_orderdate").alias("proposed_at"),
        F.round("o_totalprice", 4).alias("stake"),
    )
    return {"proposals": _rows(df)}


def get_voters(api, params: dict) -> dict:
    """routes/v2-state/get_voters (get_voters.ts:6-74): weight-ranked
    voter page + the exact total (the registered ``get_voters`` +
    ``get_voter_count`` pair, sharing one predicate)."""
    from .http_server import _limit

    segment = params.get("producer", "BUILDING")
    cust = _t(api.spark, api.sf_dir)["customer"]
    qp = QueryParams(
        terms={"c_mktsegment": segment, "c_acctbal": "0.01-9999999"},
        sorted_by="c_acctbal:desc",
        limit=_limit(params, default=50),
    )
    page = apply_query(
        cust,
        qp,
        default_sort_field="c_acctbal",
        tiebreaker="c_custkey",
        numeric_fields=frozenset({"c_acctbal"}),
    ).select(
        F.col("c_custkey").alias("voter"),
        F.round("c_acctbal", 4).alias("weight"),
    )
    total = cust.where(
        (F.col("c_mktsegment") == segment) & (F.col("c_acctbal") > 0)
    ).count()
    return {"voter_count": total, "voters": _rows(page)}


def get_voter_scopes(api, params: dict) -> dict:
    """routes/v2-state/get_voter_scopes: the distinct (account, scope)
    pairs behind a type set — the registered ``distinct_scopes``
    set-dedup parameterized by the scope list."""
    types = params.get("scopes", "signup,error").split(",")
    ev = _t(api.spark, api.sf_dir)["events"]
    df = (
        ev.where(F.col("event_type").isin(types))
        .select(
            F.col("user_id").alias("account"),
            F.col("event_type").alias("scope"),
        )
        .distinct()
        .orderBy("account", "scope")
    )
    return {"scopes": _rows(df, 1000)}


# --- v2-stats --------------------------------------------------------------


def get_action_usage(api, params: dict) -> dict:
    """routes/v2-stats/get_action_usage (get_action_usage.ts:4-21):
    action count + unique actors inside [start, end] — the
    ``delta_seq_diff`` conditional-aggregate shape (two top-1 lookups
    folded into ONE scan) plus the window's distinct actors."""
    start = params.get("start", "2024-01-02 00:00:00")
    end = params.get("end", "2024-01-05 00:00:00")
    ev = _t(api.spark, api.sf_dir)["events"]
    start_ts = F.lit(start).cast("timestamp")
    end_ts = F.lit(end).cast("timestamp")
    row = ev.agg(
        (
            F.max(F.when(F.col("ts") <= end_ts, F.col("event_id")))
            - F.max(F.when(F.col("ts") <= start_ts, F.col("event_id")))
        ).alias("action_count"),
        F.count_distinct(
            F.when(
                (F.col("ts") > start_ts) & (F.col("ts") <= end_ts),
                F.col("user_id"),
            )
        ).alias("unique_actors"),
    ).first()
    return {
        "from": start,
        "to": end,
        "action_count": row["action_count"],
        "unique_actors": row["unique_actors"],
    }


def get_api_usage(api, params: dict) -> dict:
    """routes/v2-stats/get_api_usage: the serving layer's OWN usage
    counters (the reference aggregates per-route hit counts from its
    rate-limiter store) — real per-route request totals plus the
    timedQuery cache's hit/miss split. Driver-side state, no Spark
    job: usage accounting must not cost a query."""
    with api._usage_lock:
        per_route = dict(sorted(api.usage.items()))
    return {
        "total_requests": sum(per_route.values()),
        "by_route": per_route,
        "cache": {"hits": api.cache.hits, "misses": api.cache.misses},
    }


def get_missed_blocks(api, params: dict) -> dict:
    """routes/v2-stats/get_missed_blocks (get_missed_blocks.ts:41-53):
    per-producer missed rollup (the registered
    ``missed_blocks_rollup`` plan, optional producer filter)."""
    ev = _t(api.spark, api.sf_dir)["events"].where(
        F.col("event_type") == "error"
    )
    if "producer" in params:
        ev = ev.where(F.col("user_id") == int(params["producer"]))
    df = (
        ev.groupBy(F.col("user_id").alias("producer"))
        .agg(
            F.sum(F.floor("value").cast("long")).alias("total_size"),
            F.count("*").alias("occurrences"),
        )
        .orderBy("producer")
    )
    return {"stats": _rows(df, 1000)}


def get_resource_usage(api, params: dict) -> dict:
    """routes/v2-stats/get_resource_usage: usage-metric stats for one
    action — the ``extended_stats_value``/``usage_sum_min_max``
    aggregate family parameterized by the action term, one pushed-down
    scan."""
    action = params.get("action", "purchase")
    ev = _t(api.spark, api.sf_dir)["events"].where(
        F.col("event_type") == action
    )
    row = ev.agg(
        F.count("*").alias("n"),
        F.round(F.sum("value"), 4).alias("total"),
        F.round(F.min("value"), 4).alias("min"),
        F.round(F.max("value"), 4).alias("max"),
        F.round(F.avg("value"), 4).alias("avg"),
        F.round(F.stddev_pop("value"), 4).alias("std_dev"),
    ).first()
    return {"action": action, **row.asDict()}


def get_trx_count(api, params: dict) -> dict:
    """routes/v2-stats/get_trx_count (get_trx_count.ts:176-225): exact
    transaction count; ``validate_actions=true`` adds the
    blocks-vs-actions reconciliation verdict (the registered
    ``trx_count_reconcile`` join, reduced to its consistency bit)."""
    t = _t(api.spark, api.sf_dir)
    out = {"trx_count": t["orders"].count()}
    if params.get("validate_actions") == "true":
        orders, li = t["orders"], t["lineitem"]
        block_side = orders.groupBy(
            F.date_trunc("day", "o_orderdate").alias("d")
        ).agg(F.count("*").alias("orders_cnt"))
        action_side = (
            li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
            .groupBy(F.date_trunc("day", "o_orderdate").alias("d"))
            .agg(F.count_distinct("l_orderkey").alias("lineitem_orders"))
        )
        bad = (
            block_side.alias("b")
            .join(action_side.alias("a"), F.col("b.d") == F.col("a.d"), "left")
            .where(
                F.col("b.orders_cnt")
                != F.coalesce(F.col("a.lineitem_orders"), F.lit(0))
            )
            .count()
        )
        out["consistent"] = bad == 0
        out["inconsistent_buckets"] = bad
    return out


# --- v2 misc ---------------------------------------------------------------


def get_filters(api, params: dict) -> dict:
    """routes/v2/get_filters: the operator's parsed ingest filter
    config (get_filters.ts filterToObj — the registered
    ``get_filters`` transform)."""
    from .misc_endpoints import get_filters_df

    df = get_filters_df(api.spark).orderBy(
        "kind", "contract", "action_or_table"
    )
    return {"filters": _rows(df)}


def explorer_metadata(api, params: dict) -> dict:
    """routes/v2/explorer_metadata: provider/chain config reflection
    (explorer_metadata.ts) — a constant, no Spark job."""
    from .misc_endpoints import EXPLORER_METADATA

    return dict(EXPLORER_METADATA)


# --- v1 compatibility shims -------------------------------------------------


def v1_get_actions(api, params: dict) -> dict:
    """routes/v1-history/get_actions: the pos/offset grammar
    (get_actions.ts:357-359 — negative pos anchors at the END of the
    account's history; the page returns ascending with
    ``account_action_seq`` numbering). Same negative-slice semantics
    as the registered ``v1_pos_offset_tail``; the running sequence is
    the ``account_action_seq`` window over the page only (bounded)."""
    account = int(params.get("account_name", 5))
    pos = int(params.get("pos", -1))
    offset = int(params.get("offset", -20))
    ev = _t(api.spark, api.sf_dir)["events"].where(
        F.col("user_id") == account
    )
    n = abs(offset) or 1
    if pos < 0:
        # tail slice: last |offset| actions, served ascending
        page = (
            ev.orderBy(F.col("event_id").desc())
            .limit(min(n, 1000))
            .orderBy(F.col("event_id").asc())
        )
        total = ev.count()
        base = total - min(n, total)
    else:
        page = (
            ev.orderBy(F.col("event_id").asc())
            .offset(pos)
            .limit(min(n, 1000))
        )
        base = pos
    rows = _rows(
        page.select("event_id", "user_id", "event_type", "ts")
    )
    actions = [
        {
            "global_action_seq": r["event_id"],
            "account_action_seq": base + i,
            "block_time": r["ts"],
            "action_trace": {
                "act": {"name": r["event_type"], "account": r["user_id"]}
            },
        }
        for i, r in enumerate(rows)
    ]
    # v1 stamps the real LIB unconditionally (get_actions.ts:301 takes
    # it from get_info() on every request) — the ingest watermark is
    # the engine's chain-info analog
    return {
        "actions": actions,
        "last_irreversible_block": api.lib_block(),
    }


def v1_get_transaction(api, params: dict) -> dict:
    """routes/v1-history/get_transaction: the v1 body shape over the
    same point-lookup plan as v2 get_transaction (canonical ordinal
    trace order — the bug-#148 regroup discipline)."""
    trx = int(params["id"])
    t = _t(api.spark, api.sf_dir)
    head = (
        t["orders"]
        .where(F.col("o_orderkey") == trx)
        .select("o_orderkey", "o_orderstatus", "o_orderdate")
        .first()
    )
    if head is None:
        return {"id": trx, "trx": None, "traces": []}
    traces = (
        t["lineitem"]
        .where(F.col("l_orderkey") == trx)
        .orderBy("l_linenumber")
        .select("l_linenumber", "l_partkey", "l_quantity", "l_extendedprice")
    )
    return {
        "id": trx,
        "trx": {"receipt": {"status": head["o_orderstatus"]}},
        "block_time": str(head["o_orderdate"]),
        "traces": _rows(traces, 1000),
    }


def v1_get_key_accounts(api, params: dict) -> dict:
    """routes/v1-history/get_key_accounts: v1 body shape over the same
    chooser-planned core as the v2 route."""
    from .endpoints_ext import _get_key_accounts

    df, _ = _get_key_accounts(
        api.spark, api.sf_dir, key=params.get("public_key", "Brand#13")
    )
    return {"account_names": [r["account"] for r in df.collect()]}


def v1_get_controlled_accounts(api, params: dict) -> dict:
    """routes/v1-history/get_controlled_accounts
    (get_controlled_accounts.ts:4-64): accounts controlled by one
    controller — the registered ``get_controlled_accounts`` set-dedup
    parameterized by the controlling account."""
    controlling = int(params.get("controlling_account", 7))
    sup = _t(api.spark, api.sf_dir)["supplier"]
    df = (
        sup.where(F.col("s_nationkey") == controlling)
        .select(F.col("s_suppkey").alias("controlled"))
        .distinct()
        .orderBy("controlled")
    )
    return {"controlled_accounts": [r["controlled"] for r in df.collect()]}


def v1_trace_get_block(api, params: dict) -> dict:
    """routes/v1-trace/get_block (get_block.ts:30-90): nested block
    reconstruction — header joined to traces re-nested in canonical
    ordinal order, through the SAME stats-planned core as the
    registered ``v1_trace_get_block`` (``_v1_trace_get_block``)."""
    from .endpoints_ext import _v1_trace_get_block as core

    lo = int(params.get("after", 1))
    hi = int(params.get("before", 160))
    df, _ = core(api.spark, api.sf_dir, lo=lo, hi=hi)
    return {"transactions": _rows(df, 1000)}


#: route path -> handler(api, params). Merged into HyperionAPI.routes.
EXTRA_ROUTES = {
    "/v2/history/get_blocks": get_blocks,
    "/v2/history/get_block": get_block,
    "/v2/history/get_abi_snapshot": get_abi_snapshot,
    "/v2/history/get_schedule": get_schedule,
    "/v2/history/get_table_state": get_table_state,
    "/v2/history/check_transaction": check_transaction,
    "/v2/state/get_account": get_account,
    "/v2/state/get_links": get_links,
    "/v2/state/get_proposals": get_proposals,
    "/v2/state/get_voters": get_voters,
    "/v2/state/get_voter_scopes": get_voter_scopes,
    "/v2/stats/get_action_usage": get_action_usage,
    "/v2/stats/get_api_usage": get_api_usage,
    "/v2/stats/get_missed_blocks": get_missed_blocks,
    "/v2/stats/get_resource_usage": get_resource_usage,
    "/v2/stats/get_trx_count": get_trx_count,
    "/v2/get_filters": get_filters,
    "/v2/explorer_metadata": explorer_metadata,
    "/v1/history/get_actions": v1_get_actions,
    "/v1/history/get_transaction": v1_get_transaction,
    "/v1/history/get_key_accounts": v1_get_key_accounts,
    "/v1/history/get_controlled_accounts": v1_get_controlled_accounts,
    "/v1/trace_api/get_block": v1_trace_get_block,
}
