"""The reference's response envelope (SURVEY §3.1 step 6).

``get_actions``-family responses wrap the hits in a metadata envelope
— ``v2-history/get_actions/get_actions.ts:88-131`` and ``timedQuery``
(``functions.ts:946-1006``):

    {
      "query_time_ms": ..., "cached": false, "lib": 0,
      "total": {"value": N, "relation": "eq"},
      "simple_actions" | "actions": [...],
      "last_indexed_block": B, "last_indexed_block_time": T
    }

Spark-first shape: the page query and the two metadata scalars (total
matching count, head of the log) are separate small plans; the
envelope is assembled at the serving boundary. ``total`` is exact
(ES's track_total_hits cap is a serving choice, functions.ts:917-934);
``cached`` is always false here — the Redis response cache is a
serving-layer add-on the engine does not fake.

The oracle-backed query ``get_actions_response_envelope`` returns the
envelope's scalar fields as one row, so the metadata computation (not
just the page) is hash-checked against DuckDB.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.predicates import QueryParams, apply_query, compile_predicate
from ..registry import register, _t


def envelope_scalars(
    log: DataFrame,
    params: QueryParams,
    *,
    seq_field: str,
    ts_field: str = "ts",
    **compile_kw,
) -> DataFrame:
    """One-row frame with the envelope metadata: exact ``total`` under
    the request predicate plus the log head (last_indexed_block /
    _time, health.ts + get_actions.ts:121-126). Two tiny aggregates,
    both fed by pushed-down scans; crossJoin of two 1-row frames."""
    pred = compile_predicate(
        log, params, seq_field=seq_field, ts_field=ts_field, **compile_kw
    )
    matched = log.where(pred) if pred is not None else log
    total = matched.agg(F.count("*").alias("total"))
    head = log.orderBy(F.col(seq_field).desc()).limit(1).select(
        F.col(seq_field).alias("last_indexed_block"),
        F.col(ts_field).alias("last_indexed_block_time"),
    )
    return total.crossJoin(head).select(
        "total",
        F.lit("eq").alias("relation"),  # exact count => relation always eq
        F.lit(False).alias("cached"),
        "last_indexed_block",
        "last_indexed_block_time",
    )


def get_actions_with_envelope(
    spark: SparkSession,
    log: DataFrame,
    params: QueryParams,
    *,
    seq_field: str,
    simple: bool = False,
    lib: int | None = None,
    **query_kw,
) -> dict:
    """Full serving-boundary response: run the page query + metadata
    and assemble the reference's envelope dict. ``simple`` selects the
    ``simple_actions`` projection name (get_actions.ts:104-120).

    ``lib`` is the last-irreversible watermark to stamp into the
    envelope — the reference defaults ``lib: 0`` and only resolves the
    real value when the request asks (``query.checkLib``,
    get_actions.ts:71-80); when set, simple rows also carry the
    per-action ``irreversible`` flag (``block_num < lib``,
    get_actions.ts:118)."""
    t0 = time.perf_counter()
    # seq_field must reach the page query's predicate compiler too —
    # without it a numeric after/before bound (v2 get_actions
    # ?after=<seq>) is rejected as a non-ISO bound (caught by the
    # round-9 manifest e2e suite, pagination contract)
    page = apply_query(log, params, seq_field=seq_field, **query_kw)
    actions = [r.asDict(recursive=True) for r in page.collect()]
    # get_actions.ts:118 is a ternary: ``irreversible: response.lib
    # !== 0 ? block_num < lib : undefined`` — at lib==0 the value is
    # ``undefined`` and JSON.stringify DROPS the key entirely, so the
    # flag only appears once the watermark has advanced. Truthiness
    # (not an is-None test) is the reference-faithful gate.
    if simple and lib:
        for a in actions:
            if seq_field in a:
                a["irreversible"] = a[seq_field] < lib
    meta = envelope_scalars(
        log,
        params,
        seq_field=seq_field,
        **{
            k: v
            for k, v in query_kw.items()
            if k in ("numeric_fields", "array_fields", "ts_field")
        },
    ).first()
    return {
        "query_time_ms": round((time.perf_counter() - t0) * 1000, 1),
        "cached": bool(meta.cached),
        "lib": int(lib or 0),
        "total": {"value": meta.total, "relation": meta.relation},
        ("simple_actions" if simple else "actions"): actions,
        "last_indexed_block": meta.last_indexed_block,
        "last_indexed_block_time": str(meta.last_indexed_block_time),
    }


@register(
    "get_actions_response_envelope",
    """
    SELECT CAST(t.total AS BIGINT) AS total, 'eq' AS relation,
           false AS cached,
           h.last_indexed_block, h.last_indexed_block_time
    FROM (SELECT count(*) AS total FROM events
          WHERE user_id = 7 AND event_id >= 100) t
    CROSS JOIN (SELECT event_id AS last_indexed_block,
                       ts AS last_indexed_block_time
                FROM events ORDER BY event_id DESC LIMIT 1) h
    """,
    "response envelope metadata: exact total + last_indexed_block "
    "(get_actions.ts:88-131, functions.ts:917-1006)",
)
def get_actions_response_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir)["events"]
    return envelope_scalars(
        ev,
        QueryParams(terms={"user_id": "7"}, after="100"),
        seq_field="event_id",
        numeric_fields=frozenset({"user_id"}),
    )
