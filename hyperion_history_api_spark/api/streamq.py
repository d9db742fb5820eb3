"""Oracle-backed queries for the streaming / sink / repair operator
families (SURVEY §2.9 T1-T3, §2.1 S6-S8+S11, §2.2 P4/P7/P9, §2.6 O4,
§5 repair scans).

Each entry exercises one operator through the registry's
DuckDB-hash-match gate. The streaming operators themselves live in
``..streaming``; these queries run their batch-equivalent plans (a
Structured Streaming query and its batch twin share the same Catalyst
plan, so the oracle checks the semantics that the stream executes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register, _t
from ..streaming.filters import RequestFilter, StreamRequest, compile_request
from ..streaming.missed_blocks import find_missing_ranges
from ..streaming.state_store import fork_retract, merge_update_by_block


@register(
    "stream_filter_and",
    """
    SELECT event_id, user_id, value
    FROM events
    WHERE event_type = 'purchase' AND value > 100
      AND CAST(json_extract_string(props, '$.k') AS DOUBLE) >= 50
    ORDER BY event_id LIMIT 1000
    """,
    "T1 stream filters, filter_op=and (streamFunctions.ts:58-73; "
    "checkMetaFilter common_functions.ts:301-331)",
)
def stream_filter_and(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subscription: contract routing key + two field filters ANDed;
    the ``k`` field resolves through the JSON payload fallback."""
    ev = _t(spark, sf_dir)["events"]
    req = StreamRequest(
        contract="purchase",
        filters=(
            RequestFilter("value", 100, "gt"),
            RequestFilter("k", 50, "gte"),
        ),
    )
    return (
        ev.where(compile_request(ev, req))
        .select("event_id", "user_id", "value")
        .orderBy("event_id")
        .limit(1000)
    )


@register(
    "stream_filter_or",
    """
    SELECT event_id, event_type, value
    FROM events
    WHERE CAST(user_id AS VARCHAR) = '3'
      AND (event_type LIKE 'err%' OR value > 195)
    ORDER BY event_id LIMIT 1000
    """,
    "T1 stream filters, filter_op=or (streamFunctions.ts:66-70)",
)
def stream_filter_or(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Notified-account routing + OR'd filters (starts_with | gt)."""
    ev = _t(spark, sf_dir)["events"]
    req = StreamRequest(
        account="3",
        filter_op="or",
        filters=(
            RequestFilter("event_type", "err", "starts_with"),
            RequestFilter("value", 195, "gt"),
        ),
    )
    return (
        ev.where(compile_request(ev, req))
        .select("event_id", "event_type", "value")
        .orderBy("event_id")
        .limit(1000)
    )


@register(
    "stream_filter_asset",
    """
    SELECT event_id, value
    FROM (
        SELECT event_id, value,
               CASE WHEN event_id % 2 = 0 THEN 'EOS' ELSE 'SYS' END AS sym
        FROM events
    )
    WHERE sym = 'EOS' AND round(value, 2) >= 150
    ORDER BY event_id LIMIT 1000
    """,
    "T1 asset-aware filter compare (common_functions.ts:294-299)",
)
def stream_filter_asset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unit-aware compare on an ``"<amount> <symbol>"`` string: only
    rows whose symbol matches the filter's ``asset`` are compared
    numerically; other symbols never match."""
    ev = _t(spark, sf_dir)["events"]
    assetized = ev.withColumn(
        "quantity",
        F.concat(
            F.round("value", 2).cast("string"),
            F.lit(" "),
            F.when(F.col("event_id") % 2 == 0, "EOS").otherwise("SYS"),
        ),
    )
    flt = RequestFilter("quantity", 150, "gte", asset="EOS")
    req = StreamRequest(filters=(flt,))
    return (
        assetized.where(compile_request(assetized, req))
        .select("event_id", "value")
        .orderBy("event_id")
        .limit(1000)
    )


@register(
    "stream_filter_asset_mismatch",
    """
    SELECT event_id, value
    FROM (
        SELECT event_id, value,
               CASE WHEN event_id % 2 = 0 THEN 'EOS' ELSE 'SYS' END AS sym,
               CAST(round(value, 2) AS VARCHAR) || ' ' ||
               CASE WHEN event_id % 2 = 0 THEN 'EOS' ELSE 'SYS' END AS raw
        FROM events
    )
    WHERE CASE WHEN sym = 'EOS'
               THEN contains(
                   CASE WHEN round(value, 2) = floor(round(value, 2))
                        THEN CAST(CAST(round(value, 2) AS BIGINT) AS VARCHAR)
                        ELSE CAST(CAST(round(value, 2) AS DOUBLE) AS VARCHAR)
                   END, '5')
               ELSE contains(raw, '5') END
    ORDER BY event_id LIMIT 1000
    """,
    "T1 asset filter on a MISMATCHED symbol runs against the raw "
    "string, not NULL (common_functions.ts:294-299 coerces only on "
    "symbol match; r12 ADVICE)",
)
def stream_filter_asset_mismatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``contains '5'`` under ``asset=EOS``: EOS rows compare against
    the parsed amount's rendering, SYS rows against the RAW
    ``"<amount> SYS"`` string — the reference only rewrites
    fieldValue=parseFloat(amount) when the split symbol equals
    filter.asset; otherwise the operator sees the string unchanged."""
    ev = _t(spark, sf_dir)["events"]
    assetized = ev.withColumn(
        "quantity",
        F.concat(
            F.round("value", 2).cast("string"),
            F.lit(" "),
            F.when(F.col("event_id") % 2 == 0, "EOS").otherwise("SYS"),
        ),
    )
    flt = RequestFilter("quantity", "5", "contains", asset="EOS")
    req = StreamRequest(filters=(flt,))
    return (
        assetized.where(compile_request(assetized, req))
        .select("event_id", "value")
        .orderBy("event_id")
        .limit(1000)
    )


def _assetized_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events + a synthetic ``"<amount> <symbol>"`` quantity column
    (EOS on even ids, SYS on odd) — the shared fixture for the asset
    filter-semantics rows."""
    ev = _t(spark, sf_dir)["events"]
    return ev.withColumn(
        "quantity",
        F.concat(
            F.round("value", 2).cast("string"),
            F.lit(" "),
            F.when(F.col("event_id") % 2 == 0, "EOS").otherwise("SYS"),
        ),
    )


@register(
    "stream_filter_asset_js_render",
    """
    SELECT event_id, value
    FROM (
        SELECT event_id, value, round(value, 2) AS amt,
               CASE WHEN event_id % 2 = 0 THEN 'EOS' ELSE 'SYS' END AS sym,
               CAST(round(value, 2) AS VARCHAR) || ' ' ||
               CASE WHEN event_id % 2 = 0 THEN 'EOS' ELSE 'SYS' END AS raw
        FROM events
    )
    WHERE CASE WHEN sym = 'EOS'
               THEN contains(
                   CASE WHEN amt = floor(amt)
                        THEN CAST(CAST(amt AS BIGINT) AS VARCHAR)
                        ELSE CAST(CAST(amt AS DOUBLE) AS VARCHAR) END,
                   '.')
               ELSE contains(raw, '.') END
    ORDER BY event_id LIMIT 2000
    """,
    "T1 asset string-op renders the parsed amount like JS "
    "Number#toString: integral doubles print with no '.0', so "
    "contains('.') misses them (common_functions.ts:296-297 parseFloat"
    " + :319-321 string ops; r13 ADVICE)",
)
def stream_filter_asset_js_render(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """``contains "."`` under ``asset=EOS``: a matched integral amount
    (parseFloat('150.0000') -> 150) renders as ``"150"`` — no decimal
    point, no match — while the raw ``"150.0 SYS"`` mismatch string
    keeps its point and matches. Hash-gates the JS-number-rendering
    branch of the asset compiler (streaming/filters.py)."""
    assetized = _assetized_events(spark, sf_dir)
    flt = RequestFilter("quantity", ".", "contains", asset="EOS")
    req = StreamRequest(filters=(flt,))
    return (
        assetized.where(compile_request(assetized, req))
        .select("event_id", "value")
        .orderBy("event_id")
        .limit(2000)
    )


@register(
    "stream_filter_asset_lex_relational",
    """
    SELECT event_id, value
    FROM (
        SELECT event_id, value, round(value, 2) AS amt,
               CASE WHEN event_id % 2 = 0 THEN 'EOS' ELSE 'SYS' END AS sym,
               CAST(round(value, 2) AS VARCHAR) || ' ' ||
               CASE WHEN event_id % 2 = 0 THEN 'EOS' ELSE 'SYS' END AS raw
        FROM events
    )
    WHERE CASE WHEN sym = 'EOS'
               THEN amt >= 20.0
               ELSE raw >= '20' END
    ORDER BY event_id LIMIT 2000
    """,
    "T1 asset relational with a STRING filter value: matched amounts "
    "coerce the value to number (JS number>=string), MISMATCHED raw "
    "strings compare lexicographically (JS string>=string; "
    "common_functions.ts:305-316; r13 ADVICE)",
)
def stream_filter_asset_lex_relational(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """``gte "20"`` (string value) under ``asset=EOS``: EOS amounts
    compare numerically against 20; SYS raw strings compare
    LEXICOGRAPHICALLY against ``"20"`` — ``"6.55 SYS" >= "20"`` is
    true ('6' > '2'), ``"12.31 SYS"`` is false — exactly JS's
    string-vs-string relational. Hash-gates the value-type split in
    the asset compiler's relational branch."""
    assetized = _assetized_events(spark, sf_dir)
    flt = RequestFilter("quantity", "20", "gte", asset="EOS")
    req = StreamRequest(filters=(flt,))
    return (
        assetized.where(compile_request(assetized, req))
        .select("event_id", "value")
        .orderBy("event_id")
        .limit(2000)
    )


@register(
    "v1_pos_offset_tail",
    """
    SELECT event_id, user_id, event_type
    FROM (
        SELECT event_id, user_id, event_type FROM events
        WHERE user_id = 5 ORDER BY event_id DESC LIMIT 20
    ) ORDER BY event_id ASC
    """,
    "O4 v1 pos/offset semantics: pos=-1, offset=-20 = last 20 asc "
    "(v1-history/get_actions.ts:179-196,306-321)",
)
def v1_pos_offset_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """v1 get_actions tail slice: negative pos anchors at the end of
    the account's history; the page is returned in ascending order."""
    ev = _t(spark, sf_dir)["events"]
    tail = (
        ev.where(F.col("user_id") == 5)
        .select("event_id", "user_id", "event_type")
        .orderBy(F.col("event_id").desc())
        .limit(20)
    )
    return tail.orderBy(F.col("event_id").asc())


@register(
    "repair_missing_ranges",
    """
    SELECT gap_start, gap_end, missing
    FROM (
        SELECT prev + 1 AS gap_start, event_id - 1 AS gap_end,
               event_id - prev - 1 AS missing
        FROM (
            SELECT event_id, lag(event_id) OVER (ORDER BY event_id) AS prev
            FROM events WHERE event_type = 'purchase'
        ) WHERE prev IS NOT NULL AND event_id > prev + 1
    ) ORDER BY gap_start LIMIT 1000
    """,
    "repair CLI missing-range scan (repair-cli/scan.ts:298-333) as one "
    "lag() window pass",
)
def repair_missing_ranges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every gap in the purchase-event id sequence in one set-based
    pass — replaces the reference's driver-side binary search."""
    ev = _t(spark, sf_dir)["events"].where(F.col("event_type") == "purchase")
    return (
        find_missing_ranges(ev, "event_id")
        .orderBy("gap_start")
        .limit(1000)
    )


@register(
    "repair_missing_actions",
    """
    WITH per_block AS (
        SELECT CAST(floor(event_id / 5) AS BIGINT) + 1 AS block_num,
               count(DISTINCT CAST(floor(event_id / 3) AS BIGINT))
                   AS expected_trx,
               count(DISTINCT CASE WHEN event_id % 97 <> 0
                     THEN CAST(floor(event_id / 3) AS BIGINT) END)
                   AS indexed_trx
        FROM events GROUP BY 1
    ), mismatch AS (
        SELECT block_num, expected_trx - indexed_trx AS missing
        FROM per_block WHERE expected_trx > indexed_trx
    ), islands AS (
        SELECT block_num, missing,
               block_num - row_number() OVER (ORDER BY block_num) AS grp
        FROM mismatch
    )
    SELECT min(block_num) AS range_start, max(block_num) AS range_end,
           count(*) AS blocks,
           CAST(sum(missing) AS BIGINT) AS missing_actions
    FROM islands GROUP BY grp ORDER BY range_start
    """,
    "repair CLI missing-action scan: get_trx_count?validate_actions=true "
    "driven binary search (repair-cli/scan.ts:576-642) as one set-based "
    "pass over expected-vs-indexed trx counts",
)
def repair_missing_actions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference narrows missing-action ranges by binary-searching
    ``get_trx_count?validate_actions=true`` over block ranges (N API
    round-trips, each a pair of ES counts). Set-based equivalent: ONE
    aggregation computing expected and indexed distinct-trx counts per
    block (simulating a lost ingest slice as event_id % 97 = 0), then a
    gaps-and-islands merge of the mismatching blocks into contiguous
    repair ranges — the same {start, end, missing_actions} rows the CLI
    prints, in two shuffles total regardless of range width.

    Scale: the heavy aggregation is per-block (high cardinality, even
    keys); the island rank over the mismatch set uses the DISTRIBUTED
    prefix sum (operators/packing.py running_total, weight 1 —
    rank(block_num) == row_number in block order because block_num is
    distinct after the groupBy), so there is no single-partition
    window anywhere: a mass-damage repair (reindex-scale mismatch
    sets) stays parallel instead of funnelling through one task.
    Round-11: this removed the repo's last global-ordering window.
    """
    ev = _t(spark, sf_dir)["events"]
    trx = F.floor(F.col("event_id") / 3).cast("long")
    per_block = (
        ev.select(
            (F.floor(F.col("event_id") / 5).cast("long") + 1).alias("block_num"),
            trx.alias("trx"),
            (F.col("event_id") % 97 != 0).alias("kept"),
        )
        .groupBy("block_num")
        .agg(
            F.countDistinct("trx").alias("expected_trx"),
            F.countDistinct(F.when(F.col("kept"), F.col("trx"))).alias(
                "indexed_trx"
            ),
        )
        .where(F.col("expected_trx") > F.col("indexed_trx"))
        .select(
            "block_num",
            (F.col("expected_trx") - F.col("indexed_trx")).alias("missing"),
        )
    )
    from ..operators.packing import running_total

    ranked = running_total(per_block, "block_num", F.lit(1))
    return (
        ranked.withColumn("grp", F.col("block_num") - F.col("_cum"))
        .groupBy("grp")
        .agg(
            F.min("block_num").alias("range_start"),
            F.max("block_num").alias("range_end"),
            F.count(F.lit(1)).alias("blocks"),
            F.sum("missing").alias("missing_actions"),
        )
        .select("range_start", "range_end", "blocks", "missing_actions")
        .orderBy("range_start")
    )


@register(
    "state_merge_tombstones",
    """
    SELECT user_id, last_event_id, last_type, last_value
    FROM (
        SELECT user_id, event_id AS last_event_id, event_type AS last_type,
               round(value, 4) AS last_value,
               row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC)
                   AS rn
        FROM events
    ) WHERE rn = 1 AND last_type <> 'error'
    ORDER BY user_id
    """,
    "S6+S7 updateByBlock MERGE with present=0 delete "
    "(updateByBlock.painless.ts:3-30; elastic-routes.ts:30-34)",
)
def state_merge_tombstones(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-history merge into current state: winner per user = highest
    event_id; users whose winning row is a tombstone (event_type =
    'error' => present=0) are deleted from the state table."""
    ev = _t(spark, sf_dir)["events"]
    updates = ev.select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.col("event_type").alias("last_type"),
        F.round("value", 4).alias("last_value"),
        F.when(F.col("event_type") == "error", 0).otherwise(1).alias("present"),
    )
    state = merge_update_by_block(
        None, updates, ["user_id"], block_col="last_event_id", present_col="present"
    )
    return state.drop("present").orderBy("user_id")


@register(
    "fork_retraction",
    """
    SELECT event_type, count(*) AS n, round(sum(value), 4) AS total
    FROM events
    WHERE event_id // 100 NOT IN (5, 17, 23)
    GROUP BY event_type ORDER BY event_type
    """,
    "S11 fork rollback: deleteByQuery(block_id) -> broadcast anti-join "
    "(state-reader.ts:863-890)",
)
def fork_retraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retract three forked blocks (block = event_id div 100) from the
    log, then aggregate the surviving rows."""
    ev = _t(spark, sf_dir)["events"].withColumn(
        "block_num", (F.col("event_id") / 100).cast("long")
    )
    forked = spark.createDataFrame([(5,), (17,), (23,)], "block_num: long")
    kept = fork_retract(ev, forked, on="block_num")
    return (
        kept.groupBy("event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total"))
        .orderBy("event_type")
    )


@register(
    "account_disjunction",
    """
    SELECT event_id, user_id
    FROM events
    WHERE user_id = 7 OR CAST(json_extract_string(props, '$.k') AS BIGINT) = 7
    ORDER BY event_id LIMIT 1000
    """,
    "P7 account involvement disjunction over multiple fields "
    "(functions.ts:195-203, definitions.ts:1-5)",
)
def account_disjunction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``account=x`` matches any involvement column: direct actor OR
    referenced in the payload — the OR-of-fields shape of the
    reference's [notified, receipts.receiver, authorization.actor]."""
    ev = _t(spark, sf_dir)["events"]
    involved = (F.col("user_id") == 7) | (
        F.get_json_object("props", "$.k").cast("long") == 7
    )
    return ev.where(involved).select("event_id", "user_id").orderBy("event_id").limit(1000)


@register(
    "array_and_membership",
    """
    SELECT l_orderkey, count(DISTINCT l_suppkey) AS n_suppliers
    FROM lineitem
    GROUP BY l_orderkey
    HAVING bool_or(l_suppkey = 1) AND bool_or(l_suppkey = 2)
    ORDER BY l_orderkey
    """,
    "P4 space-AND array membership (functions.ts:171-177)",
)
def array_and_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders whose supplier set contains BOTH suppliers 1 and 2 — the
    ``f=v1 v2`` grammar over an array column, built here by grouping
    the trace-level table to its transaction grain."""
    li = _t(spark, sf_dir)["lineitem"]
    grouped = li.groupBy("l_orderkey").agg(
        F.collect_set("l_suppkey").alias("suppliers")
    )
    return (
        grouped.where(
            F.array_contains("suppliers", 1) & F.array_contains("suppliers", 2)
        )
        .select(
            "l_orderkey", F.size("suppliers").cast("long").alias("n_suppliers")
        )
        .orderBy("l_orderkey")
    )


@register(
    "fuzzy_memo_match",
    """
    SELECT lang, count(*) AS n_match
    FROM documents
    WHERE len(list_filter(string_split(lower(text), ' '),
                          w -> levenshtein(w, 'model') <= 1)) > 0
    GROUP BY lang ORDER BY lang
    """,
    "P9 fuzzy match on memo text (functions.ts:154-169) — edit-distance "
    "token match; exact ES fuzziness semantics documented as divergent",
)
def fuzzy_memo_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-level fuzzy match: any whitespace token within edit
    distance 1 of the query term. ES ``match``+fuzziness applies
    per-analyzed-token AUTO distance; we pin distance<=1 in both
    engines so the oracle is exact."""
    docs = _t(spark, sf_dir)["documents"]
    has_match = F.exists(
        F.split(F.lower("text"), " "),
        lambda w: F.levenshtein(w, F.lit("model")) <= 1,
    )
    return (
        docs.where(has_match)
        .groupBy("lang")
        .agg(F.count("*").alias("n_match"))
        .orderBy("lang")
    )


@register(
    "stream_replay_page",
    """
    SELECT event_id, user_id, event_type
    FROM events
    WHERE event_id >= (SELECT max(event_id) - 1000 FROM events)
    ORDER BY event_id ASC LIMIT 500
    """,
    "T2+T3 history replay first scroll page with relative start_from "
    "(socketManager.ts:547-640; functions.ts:725-777)",
)
def stream_replay_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First keyset page of a ``start_from: -1000`` replay: resolve the
    relative offset against head, then ascending scroll of 500."""
    ev = _t(spark, sf_dir)["events"]
    head = ev.agg(F.max("event_id")).first()[0]
    start = int(head) - 1000
    return (
        ev.where(F.col("event_id") >= start)
        .select("event_id", "user_id", "event_type")
        .orderBy(F.col("event_id").asc())
        .limit(500)
    )


@register(
    "stream_window_rollup",
    """
    SELECT date_trunc('minute', ts) AS win_start, event_type,
           count(*) AS n, round(sum(value), 4) AS total
    FROM events
    GROUP BY 1, 2
    ORDER BY win_start, event_type LIMIT 2000
    """,
    "T7 tumbling-window rollup (batch twin of the streaming windowed "
    "agg): 1-minute event-time windows per type; the stream form runs "
    "the same plan under a watermark (block_rollups pattern, "
    "ingest.py:120)",
)
def stream_window_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time windows via the streaming ``window()``
    operator (not date_trunc), so the oracle checks the exact
    bucketing Structured Streaming applies; in a stream this agg is
    watermark-bounded state, partial-aggregated map-side before the
    one shuffle on (window, type)."""
    ev = _t(spark, sf_dir)["events"]
    return (
        ev.groupBy(F.window("ts", "1 minute").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("total"),
        )
        .select(
            F.col("win.start").alias("win_start"), "event_type", "n", "total"
        )
        .orderBy("win_start", "event_type")
        .limit(2000)
    )


def _socketio_session(spark: SparkSession, sf_dir: str):
    """Run one filtered action subscription over the REAL Socket.IO
    wire (server + spec-level client in-process, ephemeral port) and
    return (messages, batch_frames, request_ack). Registry rows built
    on this hash-gate the full stack a stock client exercises —
    Engine.IO framing, the ack'd emitWithAck batch flow, filtered
    counts, history_end — not just the row plan underneath
    (socketManager.ts:540-620; functions.ts:226-317)."""
    from .http_server import HyperionAPI
    from .serving_cache import ResponseCache
    from .socketio_stream import SocketIOClient, SocketIOStreamServer

    api = HyperionAPI(spark, sf_dir, cache=ResponseCache(default_ttl=0))
    srv = SocketIOStreamServer(api, ack_timeout=60.0)
    try:
        c = SocketIOClient("127.0.0.1", srv.port)
        ack = c.emit_with_ack(
            "action_stream_request",
            {
                "account": 1,
                "start_from": 1,
                "read_until": 2000,
                "filters": [
                    {"field": "value", "operator": "gt", "value": 100}
                ],
                "batch_size": 100,
                # bounded-history row: skip the live attach so the
                # registry run doesn't spin relay polls while draining
                "ignore_live": True,
            },
        )
        if ack.get("status") != "OK":  # pragma: no cover - surfaced
            raise RuntimeError(f"subscription rejected: {ack}")
        frames, rows = [], []
        while True:
            m = c.next_message()
            if m.get("type") == "history_end":
                frames.append(m)
                break
            frames.append(m)
            rows.extend(m["messages"])
        c.close()
        return rows, frames, ack
    finally:
        srv.close()


@register(
    "socketio_replay_rows",
    """
    SELECT event_id, user_id, event_type, round(value, 4) AS value
    FROM events
    WHERE user_id = 1 AND event_id BETWEEN 1 AND 2000 AND value > 100
    ORDER BY event_id
    """,
    "serving: the Socket.IO stream surface END TO END — rows received "
    "by a spec-level client over the real wire (Engine.IO framing, "
    "ack'd emitWithAck batches) equal the predicate compiler's output",
)
def socketio_replay_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The received replay itself: every row that crossed the wire,
    in order — a framing bug (dropped batch, double-send on a
    re-ack, row lost to the filtered counter) flips the hash."""
    rows, _frames, _ack = _socketio_session(spark, sf_dir)
    return spark.createDataFrame(
        [
            (
                int(d["event_id"]),
                int(d["user_id"]),
                str(d["event_type"]),
                round(float(d["value"]), 4),
            )
            for d in rows
        ],
        "event_id long, user_id long, event_type string, value double",
    ).orderBy("event_id")


@register(
    "socketio_replay_summary",
    """
    SELECT CAST((SELECT max(event_id) FROM events) AS BIGINT)
               AS current_block_num,
           CAST(ceil((count(*) FILTER (WHERE value > 100)) / 100.0)
               AS BIGINT) AS n_batches,
           CAST(count(*) FILTER (WHERE value > 100) AS BIGINT) AS n_rows,
           CAST(count(*) FILTER (WHERE NOT value > 100) AS BIGINT)
               AS total_filtered,
           CAST(max(event_id) AS BIGINT) AS last_block
    FROM events
    WHERE user_id = 1 AND event_id BETWEEN 1 AND 2000
    """,
    "serving: Socket.IO session bookkeeping over the real wire — the "
    "ack's REAL currentBlockNum (head), batch count under the ack "
    "window, per-batch filtered totals (rows the primary query "
    "matched but field filters dropped), and history_end's lastBlock "
    "advancing over filtered rows (socketManager.ts:565-570; "
    "functions.ts:226-317)",
)
def socketio_replay_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row of wire-protocol bookkeeping: a placeholder ack field,
    a lost batch, a filtered row silently hidden, or a lastBlock that
    ignores filtered rows each flips the hash."""
    _rows, frames, ack = _socketio_session(spark, sf_dir)
    batches = [f for f in frames if f.get("type") != "history_end"]
    end = frames[-1]
    return spark.createDataFrame(
        [
            (
                int(ack["currentBlockNum"]),
                len(batches),
                sum(len(f["messages"]) for f in batches),
                sum(int(f["filtered"]) for f in batches),
                int(end["message"]["lastBlock"]),
            )
        ],
        "current_block_num long, n_batches long, n_rows long, "
        "total_filtered long, last_block long",
    )


@register(
    "socketio_replay_deltas",
    """
    SELECT event_id, user_id, event_type,
           CAST(json_extract(props, '$.k') AS BIGINT) AS payer
    FROM events
    WHERE event_type = 'signup' AND event_id BETWEEN 1 AND 2000
    ORDER BY event_id
    """,
    "serving: the DELTA subscription kind over the real Socket.IO "
    "wire — code routing + the payer column promoted from the JSON "
    "payload (StreamDeltasRequest, stream-requests.ts:25-49), "
    "delta_trace framing end to end",
)
def socketio_replay_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The second subscription kind through the full wire stack: a
    wrong delta column mapping (payer not promoted, code routed to
    the wrong column) or delta framing bug flips the hash."""
    from .http_server import HyperionAPI
    from .serving_cache import ResponseCache
    from .socketio_stream import SocketIOClient, SocketIOStreamServer

    api = HyperionAPI(spark, sf_dir, cache=ResponseCache(default_ttl=0))
    srv = SocketIOStreamServer(api, ack_timeout=60.0)
    try:
        c = SocketIOClient("127.0.0.1", srv.port)
        ack = c.emit_with_ack(
            "delta_stream_request",
            {
                "code": "signup",
                "start_from": 1,
                "read_until": 2000,
                "batch_size": 200,
                "ignore_live": True,
            },
        )
        if ack.get("status") != "OK":  # pragma: no cover - surfaced
            raise RuntimeError(f"subscription rejected: {ack}")
        rows = []
        while True:
            m = c.next_message()
            if m.get("type") == "history_end":
                break
            if m.get("type") != "delta_trace":  # live interleavings
                continue
            rows.extend(m["messages"])
        c.close()
    finally:
        srv.close()
    return spark.createDataFrame(
        [
            (
                int(d["event_id"]),
                int(d["user_id"]),
                str(d["event_type"]),
                None if d.get("payer") is None else int(d["payer"]),
            )
            for d in rows
        ],
        "event_id long, user_id long, event_type string, payer long",
    ).orderBy("event_id")
