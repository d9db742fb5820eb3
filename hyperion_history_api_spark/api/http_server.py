"""In-process HTTP serving layer — the fastify REST surface
(``src/api/routes.ts:18-25``, handlers under ``src/api/routes/``) and
the Socket.IO relay's bounded-replay path
(``src/api/socketManager.ts:409-495``) served over stdlib
``http.server``, with Server-Sent Events standing in for the
Socket.IO frames (no websocket library exists in this environment;
SSE is the same one-directional push shape the relay uses for
replays).

This closes the "HTTP serving layer" gap the engine previously scoped
out: every handler here is a THIN translation layer — query-string →
:class:`~..plans.predicates.QueryParams` / stream-request structs →
the SAME oracle-checked DataFrame plans the registry serves — plus
the reference's own response conventions:

- envelope metadata (``query_time_ms``, ``cached``, exact ``total``,
  ``last_indexed_block``) via :mod:`.envelope`
  (get_actions.ts:88-131);
- the ``timedQuery`` response cache with per-route TTLs via
  :mod:`.serving_cache` (functions.ts:946-1006);
- 400 replies with an ``error`` body for guard violations, exactly
  where the reference's schema validation / ``ServerError`` path
  rejects (functions.ts:246-250 skip/limit guards).

Scale shape: the server holds ONE SparkSession; each request submits
the same pushed-down point/page plans the registry exposes (parquet
scan + TakeOrderedAndProject), so a serving fleet scales by adding
stateless HTTP replicas over a shared long-lived session pool —
the reference's api-node/pm2 layout (SURVEY §3.1) with Spark in place
of Elasticsearch.

Stand-in schema mapping (same as the registered queries'): ``events``
is the action log (``user_id`` = account, ``event_type`` = contract,
``event_id`` = global_sequence), ``orders``/``lineitem`` the
transaction/trace pair, ``part`` the token registry.
"""

from __future__ import annotations

import json
import logging
import threading
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qsl, urlsplit

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..plans.predicates import QueryGuardError, QueryParams
from ..registry import _t
from ..streaming.filters import StreamRequest, StreamSchema, compile_request
from .envelope import get_actions_with_envelope
from .serving_cache import DEFAULT_TTLS, ResponseCache, timed_query

_EVENT_NUMERIC = frozenset({"event_id", "user_id", "value"})

#: hard cap on any route's collected page — the reference's fastify
#: schema rejects limit > 1000 (functions.ts skip/limit guards); a
#: route that let a raw ``limit`` reach ``.limit().collect()`` would
#: serialize an entire table onto the serving driver.
MAX_LIMIT = 1000


def _limit(params: dict, default: int = 100) -> int:
    n = int(params.get("limit", default))
    if n < 0:
        raise ValueError(f"limit must be >= 0, got {n}")
    return min(n, MAX_LIMIT)


def _qp(params: dict, terms: dict[str, str] | None = None) -> QueryParams:
    """Query-string dict → QueryParams (the fastify schema's shared
    history params, functions.ts:183-250: account/after/before/sort/
    skip/limit plus free ``field=value`` terms). ``terms`` lets a
    route pre-map its own field names (get_deltas) while sharing the
    paging/window parsing — one place to add a future guard."""
    if terms is None:
        terms = {}
        if "account" in params:
            terms["user_id"] = params["account"]
        if "filter" in params:  # contract[:action] filter → event_type
            terms["event_type"] = params["filter"].split(":", 1)[0]
        for k, v in params.items():
            if k.startswith("term."):  # explicit field term passthrough
                terms[k[5:]] = v
    return QueryParams(
        terms=terms,
        after=params.get("after"),
        before=params.get("before"),
        sort=params.get("sort", "desc"),
        skip=int(params.get("skip", 0)),
        limit=int(params.get("limit", 100)),
    )


class HyperionAPI:
    """Route handlers over one shared SparkSession + lake dir."""

    def __init__(
        self,
        spark: SparkSession,
        sf_dir: str,
        *,
        cache: ResponseCache | None = None,
    ) -> None:
        self.spark = spark
        self.sf_dir = sf_dir
        self.cache = cache if cache is not None else ResponseCache(
            ttls=dict(DEFAULT_TTLS)
        )
        # per-route request totals served by /v2/stats/get_api_usage
        # (the reference aggregates the same counters from its
        # rate-limiter store)
        self.usage: dict[str, int] = {}
        self._usage_lock = threading.Lock()
        # head_block() memo: (events-lake fingerprint -> head). A hit
        # is stat-only — no Spark job per stream request/relay ack
        self._head_cache: tuple | None = None

    def count_request(self, route: str) -> None:
        with self._usage_lock:
            self.usage[route] = self.usage.get(route, 0) + 1

    # -- v2 (routes/v2/health) -----------------------------------------
    def health(self, params: dict) -> dict:
        ev = _t(self.spark, self.sf_dir)["events"]
        head = (
            ev.orderBy(F.col("event_id").desc())
            .limit(1)
            .select("event_id", "ts")
            .first()
        )
        # an EMPTY lake is a degraded-but-alive service, not a crash:
        # a load-balancer probe must get a response precisely when the
        # service is newly up (health.ts reports per-service status
        # the same way)
        lake = (
            {
                "service": "Lake",
                "status": "OK",
                "service_data": {
                    "last_indexed_block": head["event_id"],
                    "last_indexed_block_time": str(head["ts"]),
                },
            }
            if head is not None
            else {"service": "Lake", "status": "Error", "service_data": {}}
        )
        return {
            "version": "spark",
            "health": [
                {"service": "SparkSession", "status": "OK"},
                lake,
            ],
        }

    # -- v2-history ------------------------------------------------------
    def get_actions(self, params: dict) -> dict:
        """routes/v2-history/get_actions (get_actions.ts:88-131).
        ``model=hyperion`` serves the nested lake documents instead of
        the flat testdata mapping (http_routes.hyp_get_actions)."""
        if params.get("model") == "hyperion":
            from .http_routes import hyp_get_actions

            return hyp_get_actions(self, params)
        qp = _qp(params)
        ev = _t(self.spark, self.sf_dir)["events"]
        return get_actions_with_envelope(
            self.spark,
            ev,
            qp,
            seq_field="event_id",
            simple=params.get("simple") == "true",
            # reference: lib stays 0 unless the request opts in
            # (query.checkLib -> get_info().last_irreversible_block_num,
            # get_actions.ts:71-80); our chain-info analog is the
            # ingest-maintained watermark
            lib=self.lib_block()
            if str(params.get("checkLib", "")).lower() in ("true", "1")
            else None,
            default_sort_field="event_id",
            tiebreaker="event_id",
            numeric_fields=_EVENT_NUMERIC,
        )

    def get_transaction(self, params: dict) -> dict:
        """routes/v2-history/get_transaction: point lookup of one trx
        + its traces in canonical ordinal order (the bug-#148 regroup
        discipline). The key predicate reaches both scans via
        constraint propagation — same plan family as the registered
        ``get_transaction_shape``. ``model=hyperion`` serves the
        nested lake documents with block_hint partition routing."""
        if params.get("model") == "hyperion":
            from .http_routes import hyp_get_transaction

            return hyp_get_transaction(self, params)
        trx = int(params["id"])
        t = _t(self.spark, self.sf_dir)
        o = t["orders"].where(F.col("o_orderkey") == trx)
        head = o.select("o_orderkey", "o_orderstatus", "o_orderdate").first()
        # the reference resolves the REAL lib for get_transaction on
        # both its cache and ES paths (get_transaction.ts:67,102) —
        # unlike get_blocks/get_block, which hardcode lib: 0
        lib = self.lib_block()
        if head is None:
            return {
                "executed": False,
                "trx_id": trx,
                "lib": lib,
                "actions": [],
            }
        traces = (
            t["lineitem"]
            .where(F.col("l_orderkey") == trx)
            .orderBy("l_linenumber")
            .select("l_linenumber", "l_partkey", "l_quantity", "l_extendedprice")
        )
        return {
            "executed": True,
            "trx_id": trx,
            "lib": lib,
            "status": head["o_orderstatus"],
            "block_time": str(head["o_orderdate"]),
            "actions": [r.asDict() for r in traces.collect()],
        }

    def get_deltas(self, params: dict) -> dict:
        """routes/v2-history/get_deltas: (code,table) → event_type,
        scope → account range, payer → promoted props.k — the same
        predicate-compiler path as the registered
        ``get_deltas_by_scope``. ``model=hyperion`` serves the nested
        lake documents (http_routes.hyp_get_deltas)."""
        if params.get("model") == "hyperion":
            from .http_routes import hyp_get_deltas

            return hyp_get_deltas(self, params)
        ev = _t(self.spark, self.sf_dir)["events"].withColumn(
            "payer", F.get_json_object("props", "$.k").cast("long")
        )
        terms: dict[str, str] = {}
        if "code" in params or "table" in params:
            terms["event_type"] = params.get("table", params.get("code"))
        if "scope" in params:
            terms["user_id"] = params["scope"]
        if "payer" in params:
            terms["payer"] = params["payer"]
        qp = _qp(params, terms=terms)
        return get_actions_with_envelope(
            self.spark,
            ev,
            qp,
            seq_field="event_id",
            default_sort_field="event_id",
            tiebreaker="event_id",
            numeric_fields=frozenset({"event_id", "user_id", "payer"}),
        )

    def get_created_accounts(self, params: dict) -> dict:
        """routes/v2-history/get_created_accounts: creator → created
        accounts (nation = creator dimension, 25-row broadcast).
        ``model=hyperion`` serves the nested newaccount documents."""
        if params.get("model") == "hyperion":
            from .http_routes import hyp_get_created_accounts

            return hyp_get_created_accounts(self, params)
        t = _t(self.spark, self.sf_dir)
        creator = F.broadcast(
            t["nation"].where(F.col("n_name") == params["account"])
        )
        rows = (
            t["customer"]
            .join(creator, F.col("c_nationkey") == F.col("n_nationkey"))
            .orderBy(F.col("c_custkey").desc())
            .limit(_limit(params))
            .select(
                F.col("c_custkey").alias("account"),
                F.col("c_name").alias("account_name"),
            )
            .collect()
        )
        return {"accounts": [r.asDict() for r in rows]}

    def get_creator(self, params: dict) -> dict:
        """routes/v2-history/get_creator: the account's first signup
        event is its creation record (newaccount semantics).
        ``model=hyperion`` serves the nested newaccount top-1."""
        if params.get("model") == "hyperion":
            from .http_routes import hyp_get_creator

            return hyp_get_creator(self, params)
        account = int(params["account"])
        ev = _t(self.spark, self.sf_dir)["events"]
        row = (
            ev.where(
                (F.col("event_type") == "signup")
                & (F.col("user_id") == account)
            )
            .orderBy("event_id")
            .limit(1)
            .first()
        )
        if row is None:
            return {"account": account, "creator": None}
        return {
            "account": account,
            "creation_seq": row["event_id"],
            "timestamp": str(row["ts"]),
        }

    # -- v2-state ----------------------------------------------------------
    def get_top_holders(self, params: dict) -> dict:
        """routes/v2-state/get_top_holders: balance-ranked page."""
        cust = _t(self.spark, self.sf_dir)["customer"]
        rows = (
            cust.orderBy(F.col("c_acctbal").desc(), F.col("c_custkey").asc())
            .limit(_limit(params, default=20))
            .select(
                F.col("c_custkey").alias("account"),
                F.round("c_acctbal", 4).alias("amount"),
            )
            .collect()
        )
        return {"holders": [r.asDict() for r in rows]}

    def get_tokens(self, params: dict) -> dict:
        """routes/v2-state/get_tokens (get_tokens.ts:63-72): account →
        held symbols — the SAME stats-planned chooser core the
        registered ``get_tokens`` serves (endpoints_ext._get_tokens),
        parameterized by account, so the HTTP plan can never drift
        from the oracle-checked one."""
        from .endpoints_ext import _get_tokens

        account = int(params["account"])
        df, _ = _get_tokens(self.spark, self.sf_dir, account=account)
        return {
            "account": account,
            "tokens": [r.asDict() for r in df.collect()],
        }

    def get_key_accounts(self, params: dict) -> dict:
        """routes/v2-state/get_key_accounts: key → controlled
        accounts via the registered query's chooser core."""
        from .endpoints_ext import _get_key_accounts

        df, _ = _get_key_accounts(
            self.spark, self.sf_dir, key=params["public_key"]
        )
        return {"account_names": [r["account"] for r in df.collect()]}

    def get_table_rows(self, params: dict) -> dict:
        """routes/v2-state/get_table_rows: the dynamic-table endpoint
        with the Mongo find-grammar ``filters`` param
        (get_table_rows.ts:76-129) — POST a JSON object like
        ``{"table": "orders", "filters": {"o_totalprice":
        {"$gt": 50000}}, "limit": 20}``; every clause compiles to one
        Column predicate that lands in the scan's PushedFilters
        (plans/mongo_query.py)."""
        from ..plans.mongo_query import compile_mongo_query
        from ..tables import TABLE_NAMES

        table = params.get("table", "orders")
        if table not in TABLE_NAMES:
            raise ValueError(f"unknown table {table!r}")
        filters = params.get("filters", "{}")
        if isinstance(filters, str):
            filters = json.loads(filters)
        limit = _limit(params)
        df = _t(self.spark, self.sf_dir)[table]
        pred = compile_mongo_query(df, filters) if filters else F.lit(True)
        key = df.columns[0]
        rows = (
            df.where(pred).orderBy(key).limit(limit).collect()
        )
        return {
            "table": table,
            "rows": [
                {k: (str(v) if hasattr(v, "isoformat") else v)
                 for k, v in r.asDict().items()}
                for r in rows
            ],
        }

    # -- routing table ----------------------------------------------------
    @property
    def routes(self) -> dict:
        """The full REST surface: the handlers here plus the
        :mod:`.http_routes` extension families (v2-history tail,
        v2-state, v2-stats, v2 misc, v1 shims) — the reference
        autoloads every route dir the same way (routes.ts:18-25)."""
        from functools import partial

        from .http_routes import EXTRA_ROUTES

        base = {
            "/v2/health": self.health,
            "/v2/history/get_actions": self.get_actions,
            "/v2/history/get_deltas": self.get_deltas,
            "/v2/history/get_transaction": self.get_transaction,
            "/v2/history/get_created_accounts": self.get_created_accounts,
            "/v2/history/get_creator": self.get_creator,
            "/v2/state/get_tokens": self.get_tokens,
            "/v2/state/get_key_accounts": self.get_key_accounts,
            "/v2/state/get_top_holders": self.get_top_holders,
            "/v2/state/get_table_rows": self.get_table_rows,
        }
        return base | {
            path: partial(fn, self) for path, fn in EXTRA_ROUTES.items()
        }

    # -- SSE stream (socketManager.ts replay path) -------------------------
    def stream_rows(self, params: dict):
        """Replay (then optionally live-tail) a stream subscription:
        compile the request to ONE boolean column (the vectorized
        ws-router predicate, streaming/filters.py) and yield matching
        rows in sequence order.

        ``stream=deltas`` selects the StreamDeltasRequest shape
        (stream-requests.ts:25-49: code/table/scope/payer instead of
        contract/action/account) — same compiler, the delta column
        mapping (payer promoted from the JSON payload), exactly the
        two subscription kinds the reference's socketManager serves.

        ``read_until`` bounds the window exactly like the reference's
        past-range requests; ``follow=true`` is the replay→live
        switchover on the serving surface (socketManager.ts: history
        replay, then the relay pushes arrivals): after draining the
        current head the handler re-lists the lake every ``poll_sec``
        and pushes rows past the last served sequence — the same
        predicate, a fresh pruned scan per poll (the scan reads only
        ``event_id > last`` row groups, so a poll on an idle lake is
        metadata-cheap). The tail ends at ``read_until`` or after
        ``idle_timeout`` seconds without arrivals."""
        # parse/validate EAGERLY — this function must raise for bad
        # params BEFORE the handler commits a 200 + event-stream
        # header (a generator would defer the int()/float() failures
        # into mid-stream); read_until=0 is the reference's
        # "no end" convention (filters.py:compile_request skips the
        # bound the same way)
        req, kind = self.parse_stream_request(params)
        if (req.start_from or 0) < 0 or (req.read_until or 0) < 0:
            req = self.resolve_relative_bounds(req, self.head_block())
        read_until = req.read_until if req.read_until else None
        follow = params.get("follow") == "true"
        poll_sec = float(params.get("poll_sec", "0.5"))
        idle_timeout = float(params.get("idle_timeout", "30"))
        mark_filtered = str(params.get("mark_filtered", "")).lower() in (
            "true",
            "1",
        )
        return self._stream_iter(
            req,
            read_until,
            follow,
            poll_sec,
            idle_timeout,
            kind=kind,
            mark_filtered=mark_filtered,
        )

    @staticmethod
    def parse_stream_request(params: dict):
        """Parse/validate wire params into a (StreamRequest, kind)
        pair — shared by the SSE/WS replay path and the Socket.IO
        live-routing maps (which compile the SAME request against
        arriving rows). Raises for bad params so handlers can answer
        an error callback before committing a stream."""
        kind = params.get("stream", "actions")
        # the subscription's field-filter list (stream-requests.ts:1-6
        # + streamFunctions.ts:58-94 every/some semantics) — a JSON
        # array of {field, value, operator}; filter_op=or selects the
        # "some" form. The compiler (streaming/filters.py) already
        # vectorizes these; this just exposes them on the wire.
        from ..streaming.filters import RequestFilter

        raw_filters = params.get("filters", "[]")
        try:
            flist = json.loads(raw_filters) if isinstance(raw_filters, str) \
                else raw_filters
            if not isinstance(flist, list):
                raise ValueError("filters must be a JSON array")
            filters = tuple(
                RequestFilter(
                    field=str(f["field"]),
                    value=f["value"],
                    operator=str(f.get("operator", "eq")),
                )
                for f in flist
            )
        except (KeyError, TypeError) as e:
            raise ValueError(f"bad filters param: {e}") from None
        filter_op = params.get("filter_op", "and")
        if filter_op not in ("and", "or"):
            raise ValueError(f"filter_op must be and|or, not {filter_op!r}")
        if kind == "deltas":
            # StreamDeltasRequest: code/table -> the routing key,
            # scope -> the account dimension, payer -> the promoted
            # JSON field (the delta column mapping of the registered
            # get_deltas_by_scope plan)
            req = StreamRequest(
                contract=params.get("table", params.get("code", "*")),
                action="*",
                account=params.get("payer", ""),
                scope=params.get("scope", ""),
                start_from=int(params["start_from"])
                if "start_from" in params
                else None,
                read_until=int(params["read_until"])
                if "read_until" in params
                else None,
                filter_op=filter_op,
                filters=filters,
            )
        elif kind == "actions":
            req = StreamRequest(
                contract=params.get("contract", "*"),
                action=params.get("action", "*"),
                account=params.get("account", ""),
                start_from=int(params["start_from"])
                if "start_from" in params
                else None,
                read_until=int(params["read_until"])
                if "read_until" in params
                else None,
                filter_op=filter_op,
                filters=filters,
            )
        else:
            raise ValueError(f"stream must be actions|deltas, not {kind!r}")
        return req, kind

    def _stream_iter(
        self,
        req,
        read_until,
        follow,
        poll_sec,
        idle_timeout,
        *,
        kind="actions",
        mark_filtered=False,
    ):
        import time as _time

        from ..tables import _load_one

        # the nanos-timestamp shim normally set by load_tables — a
        # stream-only client may be this session's first reader
        self.spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        if kind == "deltas":
            # delta rows route on (code, scope, payer): payer is the
            # promoted JSON field, scope the account dimension;
            # json_col keeps payload-field filters reachable
            # (checkMetaFilter resolves data.* paths the same way)
            schema = StreamSchema(
                account_col="payer", scope_col="user_id", json_col="props"
            )
        else:
            # json_col="props" (round-11): a stock client's filter on a
            # PAYLOAD field must resolve through the JSON fallback like
            # the registered T1 rows do — with json_col=None it
            # compiled to never-match on the wire while the engine
            # supported it (checkMetaFilter data.* parity)
            schema = StreamSchema(json_col="props")
        last = (req.start_from or 0) - 1
        deadline = _time.monotonic() + idle_timeout
        # control-event tail (fork_event / lib_update): follow-mode
        # subscribers get the indexer's control broadcasts interleaved
        # with rows, exactly the reference's io.emit forwarding
        # (ws-router.ts:72-83). Start at the journal's current end —
        # history replays don't re-announce old forks.
        from ..streaming.control_log import tail_control

        _, control_at = tail_control(self.sf_dir, 0)

        def batch(after: int):
            # fresh load of ONLY the events table per poll: new spool
            # files must be visible (a DataFrame's file listing is
            # bound at creation), and a follow-mode subscriber polls
            # twice a second — re-reading the whole 10-table catalog
            # here was pure driver overhead
            ev = _load_one(self.spark, f"{self.sf_dir}/events.parquet")
            cols = ["event_id", "user_id", "event_type", "ts", "value"]
            if kind == "deltas":
                ev = ev.withColumn(
                    "payer", F.get_json_object("props", "$.k").cast("long")
                )
                cols.append("payer")
            if mark_filtered:
                # the reference's scroll counts docs that matched the
                # PRIMARY query (routing keys + block range) but were
                # dropped by the on-demand field filters
                # (functions.ts:226-247 filterCount) — so scan on the
                # routing predicate and FLAG filter failures instead
                # of hiding them; the consumer reports `filtered` and
                # still advances lastTransmittedBlock over them
                from dataclasses import replace as _replace

                routing = compile_request(
                    ev, _replace(req, filters=()), schema
                )
                full = compile_request(ev, req, schema)
                return (
                    ev.where(routing & (F.col("event_id") > after))
                    .withColumn("_filtered", ~full)
                    .orderBy("event_id")
                    .select(*cols, "_filtered")
                )
            return (
                ev.where(
                    compile_request(ev, req, schema)
                    & (F.col("event_id") > after)
                )
                .orderBy("event_id")
                .select(*cols)
            )

        while True:
            if follow:
                # control events FIRST: a fork must reach the client
                # before the corrected rows from the post-fork rescan
                events, control_at = tail_control(self.sf_dir, control_at)
                if events:
                    # control traffic is stream activity: an indexer
                    # mid-fork must not be idle-timed-out before its
                    # corrected rows land
                    deadline = _time.monotonic() + idle_timeout
                for ev in events:
                    if ev.get("event") == "fork_event":
                        fork = int(ev["data"].get("starting_block", 0))
                        # rewind: replacement rows land BELOW the
                        # cursor and must be re-delivered
                        last = min(last, fork - 1)
                    yield {
                        "_control": ev.get("event"),
                        "data": ev.get("data", {}),
                    }
            got_any = False
            # idle-poll short-circuit (round-12): the fingerprint-
            # memoized head (pure os.stat on an unchanged lake) proves
            # an empty window — a follow-mode subscriber on an idle
            # lake costs ZERO Spark jobs per poll
            if self.head_block() <= last:
                if read_until is not None and last >= read_until:
                    return
                if not follow:
                    return
                if _time.monotonic() >= deadline:
                    return
                _time.sleep(poll_sec)
                continue
            # toLocalIterator: one partition in flight — the driver
            # never holds the whole replay (same scroll discipline
            # as O7)
            for row in batch(last).toLocalIterator():
                d = row.asDict()
                d["ts"] = str(d["ts"])
                last = d["event_id"]
                got_any = True
                yield d
            if read_until is not None and last >= read_until:
                return
            if not follow:
                return
            if got_any:
                deadline = _time.monotonic() + idle_timeout
            elif _time.monotonic() >= deadline:
                return
            _time.sleep(poll_sec)

    def lib_block(self) -> int:
        """The ingested last-irreversible watermark — the engine's
        ``get_info().last_irreversible_block_num`` analog. The ingest
        side maintains ``{lake}/_meta/lib.json`` from the SHIP
        envelope's ``last_irreversible`` position
        (sources/ship_envelope.py get_blocks_result_v0;
        streaming/control_log.write_lib); reading it is one stat+read
        of a ~60-byte file, no Spark job."""
        from ..streaming.control_log import read_lib

        return int(read_lib(self.sf_dir).get("block_num", 0))

    @staticmethod
    def resolve_relative_bounds(req, head: int):
        """Negative ``start_from``/``read_until`` are HEAD-RELATIVE in
        the reference (functions.ts addBlockRangeOpts: ``start_from <
        0`` compiles to ``block_num >= head + start_from``; same for
        ``read_until``) — a ``start_from: -1000`` replay means "the
        last 1000 blocks", never "all of history from block 1"."""
        from dataclasses import replace as _replace

        changes: dict = {}
        if req.start_from is not None and req.start_from < 0:
            changes["start_from"] = head + req.start_from
        if req.read_until is not None and req.read_until < 0:
            changes["read_until"] = head + req.read_until
        return _replace(req, **changes) if changes else req

    # -- live-phase helpers (socketManager.ts relay analogs) ----------------
    def head_block(self) -> int:
        """Current head of the event log — the reference's
        ``currentBlockNum`` (socketManager.ts:565-570 puts the real
        head in every stream-request ack; clients use it for
        gap-healing math).

        Memoized on the lake fingerprint (tables._path_fingerprint,
        stat-only): the unmemoized version ran a max(event_id) Spark
        job PER stream request — footer-cheap at this lake, but at
        100× files it's per-request scan work for a value that only
        changes when the spool gains a file. A fingerprint hit is
        pure os.stat; a miss (new/rewritten file) re-scans."""
        from ..tables import _load_one, _path_fingerprint

        path = f"{self.sf_dir}/events.parquet"
        fp = _path_fingerprint(path)
        hit = self._head_cache
        if hit is not None and hit[0] == fp:
            return hit[1]
        self.spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        ev = _load_one(self.spark, path)
        row = ev.agg(F.max("event_id").alias("h")).first()
        head = int(row["h"] or 0)
        self._head_cache = (fp, head)
        return head

    def live_tagged_rows(
        self,
        requests: dict,
        after: int,
        kind: str = "actions",
        window_cap: int = 50_000,
    ) -> tuple[list, int]:
        """One poll of the live relay: rows past ``after`` tagged with
        the reqUUIDs they match (the vectorized ws-router fan-out,
        streaming/filters.py:route_to_subscribers — ONE codegen'd
        pass over the new rows regardless of subscription count).

        Returns ``(rows, new_cursor)`` where rows are
        ``(row_dict, [req_uuids])`` in sequence order — non-matching
        rows are scanned (they advance the cursor; the next poll must
        not re-read them) but not returned — and ``new_cursor`` is
        the highest sequence scanned (``after`` when idle).
        ``requests`` maps reqUUID -> StreamRequest (from
        :meth:`parse_stream_request`)."""
        from ..streaming.filters import route_to_subscribers
        from ..tables import _load_one

        # Idle-tick short-circuit (round-12): the lake head is
        # fingerprint-memoized (head_block — pure os.stat when no
        # spool file landed), and event_id is the append cursor, so
        # head <= after proves there is NOTHING to scan. An idle
        # relay tick therefore runs ZERO Spark jobs — per-tick work
        # is purely arrival-driven, at any connection count.
        head = self.head_block()
        if head <= after:
            return [], after
        # Cap the scan window (round-13): a deep fork rewind (or any
        # stale cursor) must not materialize an unbounded (after, head]
        # batch in driver memory at once. Sequence ids are dense-ish
        # append cursors, so (after, after+cap] chunks are delivered
        # in order across successive ticks until the cursor catches
        # the head; window_cap matches the relay's 50k slow-consumer
        # bound, so a single tick can never queue more than one drop
        # threshold's worth of rows anyway.
        target = min(head, after + window_cap)
        self.spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        ev = _load_one(self.spark, f"{self.sf_dir}/events.parquet")
        cols = ["event_id", "user_id", "event_type", "ts", "value"]
        if kind == "deltas":
            ev = ev.withColumn(
                "payer", F.get_json_object("props", "$.k").cast("long")
            )
            cols.append("payer")
            schema = StreamSchema(
                account_col="payer", scope_col="user_id", json_col="props"
            )
        else:
            # same json_col rationale as the replay path above
            schema = StreamSchema(json_col="props")
        # strip each request's start_from/read_until for LIVE routing:
        # the reference's relay matches arriving traces on routing keys
        # + field filters only (ws-router.ts); the history bounds
        # belong to the replay phase
        from dataclasses import replace as _replace

        live_reqs = {
            u: _replace(r, start_from=None, read_until=None)
            for u, r in requests.items()
        }
        # ONE routed scan, no orderBy: the exchange a Spark sort plans
        # would add 2-3 AQE stage-jobs per tick; the window is BOUNDED
        # (rows since the last poll; the relay drops slow consumers at
        # 50k queued rows), so the driver sorts the collected batch
        # instead — an arrival tick is exactly ONE Spark job (plus the
        # head-max job on the tick where the new spool file first
        # appears, amortized across kinds/ticks via the fingerprint
        # memo). Non-matching rows don't come back from the routed
        # scan, but the memoized head already bounds the cursor past
        # them — no tail-max job, ever.
        tagged = route_to_subscribers(
            ev.where(
                (F.col("event_id") > after) & (F.col("event_id") <= target)
            ),
            live_reqs,
            schema,
        ).select(*cols, "matching_requests")
        out = []
        cursor = target
        for row in tagged.collect():
            d = row.asDict()
            targets = list(d.pop("matching_requests"))
            d["ts"] = str(d["ts"])
            cursor = max(cursor, int(d["event_id"]))
            out.append((d, targets))
        out.sort(key=lambda dt: int(dt[0]["event_id"]))
        return out, cursor


def make_server(
    api: HyperionAPI, host: str = "127.0.0.1", port: int = 0
) -> ThreadingHTTPServer:
    """Build (not start) the HTTP server. ``port=0`` binds an
    ephemeral port (``server.server_address[1]`` after return)."""

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # silent under test
            pass

        def _reply(self, code: int, payload: dict) -> None:
            body = json.dumps(payload, default=str).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self) -> None:  # noqa: N802 (stdlib API name)
            """The reference accepts GET query strings AND POSTed JSON
            bodies on the same routes (fastify shared schemas) — both
            reach the same handler with one params dict."""
            n = int(self.headers.get("Content-Length", 0))
            raw = self.rfile.read(n) if n else b"{}"
            try:
                body = json.loads(raw) if raw.strip() else {}
                if not isinstance(body, dict):
                    raise ValueError("body must be a JSON object")
            except ValueError as e:
                self._reply(400, {"error": f"bad JSON body: {e}"})
                return
            # canonicalize to query-string form so typed JSON behaves
            # exactly like its GET twin: booleans become the lowercase
            # "true"/"false" the flag checks compare against, and
            # nested objects/arrays stay JSON text (a GET would carry
            # them URL-encoded the same way)
            self._dispatch(
                {
                    str(k): (
                        "true" if v is True
                        else "false" if v is False
                        else json.dumps(v) if isinstance(v, (dict, list))
                        else str(v)
                    )
                    for k, v in body.items()
                }
            )

        def do_GET(self) -> None:  # noqa: N802 (stdlib API name)
            url = urlsplit(self.path)
            self._dispatch(dict(parse_qsl(url.query)))

        def _dispatch(self, params: dict) -> None:
            url = urlsplit(self.path)
            if url.path == "/v2/stream":
                api.count_request(url.path)
                try:
                    rows = api.stream_rows(params)
                except (KeyError, ValueError) as e:
                    self._reply(400, {"error": str(e)})
                    return
                self.send_response(200)
                self.send_header("Content-Type", "text/event-stream")
                self.send_header("Cache-Control", "no-cache")
                self.end_headers()
                for d in rows:
                    if "_control" in d:
                        # indexer control broadcast (fork_event /
                        # lib_update) as a NAMED SSE event, so stock
                        # EventSource listeners bind by event name
                        frame = (
                            f"event: {d['_control']}\n"
                            f"data: {json.dumps(d['data'], default=str)}\n\n"
                        )
                    else:
                        frame = f"data: {json.dumps(d, default=str)}\n\n"
                    self.wfile.write(frame.encode())
                self.wfile.write(b"event: end\ndata: {}\n\n")
                return
            handler = api.routes.get(url.path)
            if handler is None:
                self._reply(404, {"error": f"no route {url.path}"})
                return
            api.count_request(url.path)
            try:
                body = timed_query(
                    api.cache,
                    url.path,
                    params,
                    lambda: handler(params),
                )
                self._reply(200, body)
            except QueryGuardError as e:
                self._reply(400, {"error": str(e)})
            except (KeyError, ValueError) as e:
                self._reply(400, {"error": f"bad request: {e}"})
            except Exception as e:  # noqa: BLE001 — serving boundary
                # user-controlled input can reach Catalyst analysis
                # (e.g. get_table_rows filters naming an unknown
                # column): the reference 400s on filter-processing
                # errors; anything else is a 500 JSON body instead of
                # a dropped connection + handler-thread traceback
                if type(e).__name__ in (
                    "AnalysisException",
                    "PySparkValueError",
                    "PySparkTypeError",
                ):
                    self._reply(400, {"error": f"bad request: {e}"})
                else:
                    # opaque body: the detail (class + message +
                    # traceback) goes to the server log under an error
                    # id the client can quote back — exception text
                    # can carry paths/SQL fragments a serving layer
                    # must not echo to callers
                    err_id = uuid.uuid4().hex[:12]
                    logging.getLogger(__name__).exception(
                        "request %s failed [id=%s]", url.path, err_id
                    )
                    self._reply(
                        500, {"error": "internal error", "id": err_id}
                    )

    return ThreadingHTTPServer((host, port), Handler)


def serve_background(
    api: HyperionAPI, host: str = "127.0.0.1", port: int = 0
) -> tuple[ThreadingHTTPServer, threading.Thread]:
    """Start the server on a daemon thread; returns (server, thread).
    Call ``server.shutdown()`` to stop."""
    server = make_server(api, host, port)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    return server, thread
