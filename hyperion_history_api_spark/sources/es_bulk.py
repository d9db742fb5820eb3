"""Elasticsearch-compatible bulk sink — the indexer's ES writer
(``src/indexer/helpers/elastic-routes.ts``) as a Spark connector.

The reference drains RabbitMQ batches into ES ``_bulk`` requests:
op-metadata line + source line per document (buildActionBulk:58-79),
``{index:{_id, _index: name-<router(block_num)>}}`` partition routing
(elastic-routes.ts:63-65), ``updateByBlock`` scripted upserts for
state tables (makeScriptedOp:23-28), plain ``{delete:{_id}}`` ops
(makeDelOp:30-34), and on a response with ``errors: true`` walks
``resp.items`` to ack/nack per document (ackOrNack:377-395, 409
conflicts retried).

Spark-first split:

- **Formatting is pure JVM codegen** (:func:`es_bulk_format`):
  ``to_json(struct(...))`` + ``concat`` build the exact NDJSON op
  pair per row inside whole-stage codegen — no Python touches the
  hot path, and the formatted frame partitions like any other column
  projection (at 100 TB the format step is a narrow map).
- **Transport is an Arrow-batched ``mapInPandas`` stage**
  (:func:`post_bulk`): each task accumulates op pairs into
  size-capped ``_bulk`` bodies, POSTs them (stdlib ``urllib`` — no
  client library needed; the wire protocol IS the contract), parses
  the bulk response, retries ONLY the failed items (the ackOrNack
  path) with backoff, and yields one summary row per request. Task
  retries re-POST the partition — safe because every op carries an
  explicit ``_id`` (index/update/delete by id are idempotent), the
  same at-least-once contract the reference's RabbitMQ requeue has.
- **File mode** (:func:`write_bulk_files`): the identical NDJSON
  landed as files for air-gapped replay (``curl --data-binary`` or a
  later connector run) — the environment has no live ES, so tests
  drive the HTTP path against a stdlib stub that implements the
  ``_bulk`` endpoint's response shape (tests/test_es_bulk.py).
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.request
from typing import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def block_router(block_col: Column, *, span: int = 10_000_000) -> Column:
    """The index-partition router: block_num → suffix, so one logical
    index is stored as ``name-000001, name-000002, ...`` ranges
    (elastic-routes.ts:63-65 ``routerFunc(body.block_num)``; the
    reference's adaptive partition sizing reduces to a fixed span
    here — span is the deployment knob)."""
    return F.lpad(
        F.floor(block_col / F.lit(span)).cast("string"), 6, "0"
    )


def es_bulk_format(
    df: DataFrame,
    *,
    op: str,
    index_name: str,
    id_col: str,
    router: Column | None = None,
    retry_on_conflict: int = 3,
    source_cols: list[str] | None = None,
) -> DataFrame:
    """Rows → ``(target_index, _id, ndjson)`` with ``ndjson`` the
    complete one-or-two-line bulk entry, built entirely from JVM
    expressions.

    op = ``index``  → ``{"index":{"_id","_index"}}`` + source
         (buildActionBulk / buildDeltaBulk);
    op = ``update_script`` → ``{"update":{"_id","_index",
         "retry_on_conflict"}}`` + ``{"script":{"id":"updateByBlock",
         "params":source},"scripted_upsert":true,"upsert":{}}``
         (makeScriptedOp);
    op = ``delete`` → ``{"delete":{"_id","_index"}}`` (makeDelOp).

    Every op kind carries ``_index``: the transport posts to the
    GLOBAL ``/_bulk`` endpoint, where real Elasticsearch rejects any
    action line without it (400 per item) — an update/delete without
    ``_index`` only ever worked against a stub that guessed.
    """
    target = (
        F.concat(F.lit(index_name + "-"), router)
        if router is not None
        else F.lit(index_name)
    )
    _id = F.col(id_col).cast("string")
    src_cols = source_cols or [c for c in df.columns]
    source = F.to_json(F.struct(*[F.col(c) for c in src_cols]))
    if op == "index":
        meta = F.to_json(
            F.struct(
                F.struct(
                    _id.alias("_id"), target.alias("_index")
                ).alias("index")
            )
        )
        ndjson = F.concat(meta, F.lit("\n"), source)
    elif op == "update_script":
        meta = F.to_json(
            F.struct(
                F.struct(
                    _id.alias("_id"),
                    target.alias("_index"),
                    F.lit(retry_on_conflict).alias("retry_on_conflict"),
                ).alias("update")
            )
        )
        body = F.concat(
            F.lit('{"script":{"id":"updateByBlock","params":'),
            source,
            F.lit('},"scripted_upsert":true,"upsert":{}}'),
        )
        ndjson = F.concat(meta, F.lit("\n"), body)
    elif op == "delete":
        ndjson = F.to_json(
            F.struct(
                F.struct(_id.alias("_id"), target.alias("_index")).alias(
                    "delete"
                )
            )
        )
    else:
        raise ValueError(f"unknown bulk op {op!r}")
    return df.select(
        target.alias("target_index"),
        _id.alias("_id"),
        ndjson.alias("ndjson"),
    )


def _post(url: str, body: bytes, timeout: float) -> dict:
    req = urllib.request.Request(
        url,
        data=body,
        headers={"Content-Type": "application/x-ndjson"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


def _item_failed(item: dict) -> tuple[str, int] | None:
    """(_id, status) when a response item failed — the ackOrNack walk
    (elastic-routes.ts:377-395): any op key, status >= 300 is a nack."""
    for verb in ("index", "update", "delete", "create"):
        if verb in item:
            st = int(item[verb].get("status", 200))
            if st >= 300:
                return str(item[verb].get("_id")), st
            return None
    return None


def post_bulk(
    formatted: DataFrame,
    url: str,
    *,
    max_ops_per_request: int = 2000,
    max_retries: int = 3,
    backoff_sec: float = 0.2,
    timeout_sec: float = 30.0,
) -> DataFrame:
    """POST formatted bulk entries to ``{url}/_bulk`` from the
    executors; returns a summary frame (one row per HTTP request:
    ops, failed-after-retry count, retried count) the caller actions.

    Failure discipline mirrors the reference: a response with
    ``errors: true`` retries ONLY the failed ``_id``s (ackOrNack),
    with backoff, ``max_retries`` times; anything still failing
    raises — the task fails and Spark re-runs the partition, which is
    safe because every op is id-addressed (the RabbitMQ nackAll
    requeue analog, elastic-routes.ts:332-339)."""
    endpoint = url.rstrip("/") + "/_bulk"

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        pending: list[tuple[str, str]] = []  # (_id, ndjson)

        def flush() -> Iterator[pd.DataFrame]:
            if not pending:
                return
            # entries stay a LIST: several ops may share an _id in one
            # request (repeated state updates); the response is
            # positional per op, but the ack walk is id-keyed exactly
            # like the reference's messageMap, so a failed id retries
            # every op that carries it
            entries = list(pending)
            pending.clear()
            total_ops = len(entries)
            retried = 0
            for attempt in range(max_retries + 1):
                body = (
                    "\n".join(nd for _, nd in entries) + "\n"
                ).encode()
                resp = _post(endpoint, body, timeout_sec)
                if not resp.get("errors"):
                    entries = []
                    break
                failures = dict(
                    f
                    for it in resp.get("items", [])
                    if (f := _item_failed(it)) is not None
                )
                entries = [e for e in entries if e[0] in failures]
                if not entries:
                    break
                retried += len(entries)
                if attempt < max_retries:
                    time.sleep(backoff_sec * (2**attempt))
            if entries:
                raise RuntimeError(
                    f"bulk items failed after {max_retries} retries: "
                    f"{sorted({i for i, _ in entries})[:5]}..."
                )
            yield pd.DataFrame(
                [
                    {
                        # ops = the ORIGINAL request size: the last
                        # resp only covers the retried remainder, so
                        # len(resp["items"]) under-counts any request
                        # that partially failed once
                        "ops": total_ops,
                        "retried": retried,
                        "took_ms": int(resp.get("took", 0)),
                    }
                ]
            )

        for pdf in batches:
            for _id, nd in zip(pdf["_id"], pdf["ndjson"]):
                pending.append((_id, nd))
                if len(pending) >= max_ops_per_request:
                    yield from flush()
        yield from flush()

    return formatted.mapInPandas(
        run, schema="ops long, retried long, took_ms long"
    )


def write_bulk_files(formatted: DataFrame, out_dir: str) -> None:
    """Land the identical NDJSON as text files partitioned by target
    index — the air-gapped form of the same protocol (replay with
    ``curl --data-binary @file``); one dir per ES index partition."""
    formatted.select("target_index", "ndjson").write.mode(
        "overwrite"
    ).partitionBy("target_index").text(out_dir)
