"""Binary ABI decode pipeline (SURVEY §2.10 UDF family + §2.2 P16).

End-to-end re-expression of the reference's per-action binary decode:

- versioned ABI fixture table (as-of validity windows) — the broadcast
  twin of the ES ``{chain}-abi-*`` index (index-templates.ts:261-275);
- Arrow-batched Pandas decode UDF running the pure-Python Antelope
  codec with the reference's fallback chain
  (``base-parser.ts:158-230 deserializeActionData``): (1) decode with
  the as-of ABI version; (2) retry with the PREVIOUS version (the
  "last abi before block_num - 1" retry); (3) give up -> ``ds_error``
  = true (the original blob is kept, like the reference storing the
  hex);
- P16 auto-blacklist: decode failures side-output their contract's
  validity window ``[valid_from, valid_until)``
  (``deserializer.ts:760-776 registerAutoBlacklist``) and the ingest
  stream anti-joins those windows (``checkBlacklist``,
  deserializer.ts:869-885).

Scale design: the decode is the ONLY Python in the pipeline and it is
Arrow-batched (`pandas_udf` over struct), with the tiny ABI-version
dict carried in the UDF closure (broadcast by Spark with the task
binary — the reference's equivalent is each ds-pool worker's abi
cache). Repartitioning the stream by contract before decode (the
reference's "heatmap" routing, deserializer.ts:562-678) would give
per-contract cache locality at 100 TB; with a dict this small it is
unnecessary. The blacklist windows are O(failing contracts) rows —
broadcast anti-join, no shuffle of the log.

Synthetic-binary fixture: blobs are ENCODED from the deterministic
scalar columns (same derivations as sources/hyperion_model.py), so the
DuckDB oracle can state the expected decode output directly from the
scalars — the Spark path must round-trip encode->decode through real
binary to match it. Failure injection:

- ``mycontract::doit`` blobs in blocks [101, 1001) are truncated to 4
  bytes -> decode fails under every version -> the whole v1 validity
  window [1, 1001) is auto-blacklisted;
- ``eosio.token::transfer`` blobs in blocks [1200, 1210) are encoded
  with the PREVIOUS ABI version (in-flight transactions across the
  ABI upgrade at 1200) -> as-of decode (v2 adds a ``fee`` field) hits
  EOF, the previous-version retry succeeds -> ``used_version`` = 1.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.abi_codec import AbiDecodeError, decode_fields, encode_fields

# ---------------------------------------------------------------------------
# ABI fixture: (contract, valid_from, version, type specs)
# ---------------------------------------------------------------------------

TRANSFER_V1 = [
    ("from", "name"),
    ("to", "name"),
    ("quantity", "asset"),
    ("memo", "string"),
]
TRANSFER_V2 = TRANSFER_V1 + [("fee", "asset")]
DOIT_V1 = [("payer", "name"), ("points", "uint64"), ("note", "string")]

ABI_VERSIONS: list[tuple[str, int, int, dict]] = [
    ("eosio.token", 1, 1, {"transfer": TRANSFER_V1}),
    ("eosio.token", 1200, 2, {"transfer": TRANSFER_V2}),
    ("mycontract", 1, 1, {"doit": DOIT_V1}),
    ("mycontract", 1001, 2, {"doit": DOIT_V1}),
]

# corrupt doit blobs in this block window (P16 trigger)
CORRUPT_FROM, CORRUPT_UNTIL = 101, 1001
# transfer blobs in this window are encoded with the previous version
OLDFORMAT_FROM, OLDFORMAT_UNTIL = 1200, 1210


def abi_version_table(spark: SparkSession) -> DataFrame:
    """The versioned ABI fixture as a DataFrame with as-of validity
    windows (valid_until = next version's valid_from; 0 = open)."""
    rows = []
    by_contract: dict[str, list[tuple[int, int]]] = {}
    for contract, valid_from, version, _ in ABI_VERSIONS:
        by_contract.setdefault(contract, []).append((valid_from, version))
    for contract, vers in by_contract.items():
        vers.sort()
        for i, (valid_from, version) in enumerate(vers):
            valid_until = vers[i + 1][0] if i + 1 < len(vers) else 0
            rows.append((contract, version, valid_from, valid_until))
    return spark.createDataFrame(
        rows, "contract string, version int, valid_from long, valid_until long"
    )


def _specs_for(contract: str) -> list[tuple[int, int, dict]]:
    """[(valid_from, version, types)] ascending for one contract."""
    out = [
        (valid_from, version, types)
        for c, valid_from, version, types in ABI_VERSIONS
        if c == contract
    ]
    out.sort()
    return out


def _asof_chain(contract: str, action: str, block: int) -> list[tuple[int, list]]:
    """[(version, spec)] to try, as-of first then previous versions —
    the base-parser.ts:193-196 'previous block' retry generalized."""
    chain = []
    for valid_from, version, types in reversed(_specs_for(contract)):
        if valid_from <= block and action in types:
            chain.append((version, types[action]))
    return chain


# ---------------------------------------------------------------------------
# encode fixture (synthetic binary generation; NOT part of the engine's
# hot path — this stands in for the chain producing SHIP blobs)
# ---------------------------------------------------------------------------

_ENCODE_IN = T.StructType(
    [
        T.StructField("contract", T.StringType()),
        T.StructField("action_name", T.StringType()),
        T.StructField("block_num", T.LongType()),
        T.StructField("abi_from", T.StringType()),
        T.StructField("abi_to", T.StringType()),
        T.StructField("amount_units", T.LongType()),
        T.StructField("symbol", T.StringType()),
        T.StructField("memo", T.StringType()),
        T.StructField("points", T.LongType()),
        T.StructField("note", T.StringType()),
    ]
)


@F.pandas_udf(T.BinaryType())
def _encode_blob(rows: pd.DataFrame) -> pd.Series:
    out = []
    for r in rows.itertuples(index=False):
        block = int(r.block_num)
        if r.action_name == "transfer":
            spec_version = (
                1
                if OLDFORMAT_FROM <= block < OLDFORMAT_UNTIL
                else _asof_chain(r.contract, "transfer", block)[0][0]
            )
            spec = TRANSFER_V1 if spec_version == 1 else TRANSFER_V2
            vals = {
                "from": r.abi_from,
                "to": r.abi_to,
                "quantity": (int(r.amount_units), 4, r.symbol),
                "memo": r.memo,
            }
            if spec is TRANSFER_V2:
                vals["fee"] = (int(r.amount_units) // 100, 4, r.symbol)
            blob = encode_fields(spec, vals)
        elif r.action_name == "doit":
            blob = encode_fields(
                DOIT_V1, {"payer": r.abi_from, "points": int(r.points), "note": r.note}
            )
            if CORRUPT_FROM <= block < CORRUPT_UNTIL:
                blob = blob[:4]  # truncated garbage -> AbiDecodeError
        else:
            out.append(None)
            continue
        out.append(blob)
    return pd.Series(out, dtype=object)


def binary_action_scalars(
    spark: SparkSession,
    sf_dir: str,
    *,
    event_types: tuple[str, ...] | None = None,
    pre_limit: int | None = None,
) -> DataFrame:
    """The deterministic scalar columns of :func:`build_binary_actions`
    WITHOUT the encoded blob — pure JVM expressions over the events
    scan. Exposed (round-14, guide §8 "decide with small rows") so
    queries that only need a row SUBSET decoded can restrict on these
    cheap columns first and pay the Python encode/decode boundary for
    exactly the surviving rows: both codec UDFs are row-local (each
    output row depends only on its own scalars), so filtering or
    top-k-limiting before the blob attach is semantics-preserving.

    ``event_types`` (round-15, guide §6): a filter on the DERIVED
    action_name column is a CASE expression Catalyst cannot invert, so
    it never reaches the parquet scan (r14 plans: PushedFilters: []
    with the whole corpus read and CASE-evaluated). Callers that want
    one action restrict on the BASE column here instead — action_name
    is a bijection of event_type ('purchase' <-> 'transfer',
    'error' <-> 'doit'), so the filter is identical row-for-row and
    lands in PushedFilters where footer min/max and dictionary pages
    can skip row groups at scale.

    ``pre_limit`` (round-15, guide §1.2 "don't compute what you throw
    away"): the derived columns are wide row-local string builds
    (translate/concat, a 280-char memo branch) and global_sequence ==
    event_id, so a top-k by global_sequence can be taken on the RAW
    scan columns FIRST and the projection applied to the k survivors —
    without it the plan computed the wide derivations for every
    filtered row below the TakeOrdered (all of them, corpus-
    proportional at the replicas)."""
    from ..tables import load_tables

    ev = load_tables(spark, sf_dir)["events"]
    if event_types is not None:
        ev = ev.where(F.col("event_type").isin(list(event_types)))
    if pre_limit is not None:
        # sort BELOW the projection, limit ABOVE it: the
        # Limit(Project(Sort)) shape is what the planner strategy
        # rewrites to TakeOrderedAndProject — map-side partial top-k on
        # the raw event_id, project evaluated on the k survivors only.
        # (Project(Limit(Sort)) does NOT match and planned as a global
        # range exchange + RangePartitioner sampling job — measured.)
        ev = ev.orderBy("event_id")
    out = ev.selectExpr(
        "event_id AS global_sequence",
        "CAST(floor(event_id / 5) AS BIGINT) + 1 AS block_num",
        "CASE event_type WHEN 'purchase' THEN 'eosio.token' "
        "WHEN 'error' THEN 'mycontract' ELSE 'eosio' END AS contract",
        "CASE event_type WHEN 'purchase' THEN 'transfer' "
        "WHEN 'error' THEN 'doit' ELSE 'other' END AS action_name",
        "'user' || translate(CAST(user_id AS STRING), '0123456789', "
        "'a12345bcde') AS abi_from",
        "'user' || translate(CAST((user_id + 1) % 150 AS STRING), "
        "'0123456789', 'a12345bcde') AS abi_to",
        "CAST(round(value * 10000, 0) AS BIGINT) AS amount_units",
        "CASE WHEN event_id % 2 = 0 THEN 'EOS' ELSE 'SYS' END AS symbol",
        "CASE user_id % 5 WHEN 0 THEN 'payment for model run' "
        "WHEN 1 THEN 'refund for order' "
        "WHEN 2 THEN 'tip for madel service' "
        "WHEN 3 THEN 'monthly subscription fee ' || repeat('x', 280) "
        "ELSE 'gift transfer memo' END AS memo",
        "user_id * 7 + 3 AS points",
        "'note ' || event_type AS note",
    )
    return out.limit(pre_limit) if pre_limit is not None else out


# Fan-out sizing for the Python codec boundary: below this many rows a
# single Arrow task finishes faster than the per-task constants of a
# fan-out (worker launch + Arrow batch framing + scheduling, ~10-30 ms
# per task), so a LIMIT-bounded feed skips the exchange entirely.
_CODEC_ROWS_PER_TASK = 4096


def attach_blob(scalars: DataFrame, *, n_est: int | None = None) -> DataFrame:
    """Attach the encoded ``abi_blob`` to scalar action rows.

    round-14 (guide §2.5 input skew): the events feed is ONE parquet
    file, so the scan is one partition and the whole Arrow
    encode/decode chain ran as a SINGLE serial Python task (plan:
    1 job / 1 stage; measured 1.17 -> 0.74 s at sf0.1 after the
    fix). Hash-repartition on the sequence key spreads the Python
    work over the session's ACTUAL parallelism (defaultParallelism =
    total cores on any master, so the width adapts to whatever
    session the driver builds instead of pinning a local constant);
    callers' selective filters (action_name/event_type) still push
    below the exchange to the scan. AQE byte-based coalescing is
    deliberately not relied on: the cost here is Python compute per
    row, not bytes, so a tiny (but corpus-proportional) input must
    still fan out.

    round-15 (r14 VERDICT item 2 — the unconditional fan-out was
    width-blind): callers that KNOW their row count (the LIMIT-bounded
    query paths: 500 rows after a TakeOrdered) pass ``n_est`` and the
    width derives from it — ``ceil(n_est / _CODEC_ROWS_PER_TASK)``
    capped at defaultParallelism; at or below one task's worth the
    exchange is skipped outright (the TakeOrdered output is a single
    partition already). 32 Arrow tasks under 500 rows made the 8-core
    driver run 3x FASTER than 32-core (c8/c32 ratio 0.34) because
    per-task constants, not compute, dominated. Unbounded
    (corpus-proportional) callers keep the full fan-out."""
    spark = scalars.sparkSession
    blob = _encode_blob(F.struct(*[f.name for f in _ENCODE_IN.fields]))
    if n_est is not None and n_est <= _CODEC_ROWS_PER_TASK:
        return scalars.withColumn("abi_blob", blob)
    npart = max(spark.sparkContext.defaultParallelism, 2)
    if n_est is not None:
        npart = min(npart, -(-n_est // _CODEC_ROWS_PER_TASK))
    return scalars.repartition(npart, "global_sequence").withColumn(
        "abi_blob", blob
    )


def build_binary_actions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic binary action rows: deterministic scalars (Antelope-
    name-safe variants of the hyperion_model derivations) + the encoded
    ``abi_blob``. The '0-9' -> name-charset translate keeps every
    account a valid Antelope name."""
    return attach_blob(binary_action_scalars(spark, sf_dir))


# ---------------------------------------------------------------------------
# decode UDF with fallback chain (the engine's hot path)
# ---------------------------------------------------------------------------

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("from_account", T.StringType()),
        T.StructField("to_account", T.StringType()),
        T.StructField("amount", T.DoubleType()),
        T.StructField("symbol", T.StringType()),
        T.StructField("memo", T.StringType()),
        T.StructField("payer", T.StringType()),
        T.StructField("points", T.LongType()),
        T.StructField("note", T.StringType()),
        T.StructField("used_version", T.IntegerType()),
        T.StructField("ds_error", T.BooleanType()),
    ]
)

_NULL_ROW = {f.name: None for f in DECODED_SCHEMA.fields}


@F.pandas_udf(DECODED_SCHEMA)
def _decode_blob(rows: pd.DataFrame) -> pd.DataFrame:
    """deserializeActionData (base-parser.ts:158-230): as-of decode,
    previous-version retry, else ds_error. Arrow-batched; the per-batch
    Python loop touches only decodable rows."""
    out = []
    for r in rows.itertuples(index=False):
        rec = dict(_NULL_ROW)
        rec["ds_error"] = False
        blob = r.abi_blob
        if blob is None:
            out.append(rec)
            continue
        decoded = None
        for version, spec in _asof_chain(r.contract, r.action_name, int(r.block_num)):
            try:
                decoded = decode_fields(spec, bytes(blob))
                rec["used_version"] = version
                break
            except AbiDecodeError:
                continue
        if decoded is None:
            rec["ds_error"] = True  # deserializer.ts ds_error branch
        elif r.action_name == "transfer":
            units, precision, code = decoded["quantity"]
            rec.update(
                from_account=decoded["from"],
                to_account=decoded["to"],
                amount=units / (10**precision),
                symbol=code,
                memo=decoded["memo"],
            )
        else:  # doit
            rec.update(
                payer=decoded["payer"],
                points=decoded["points"],
                note=decoded["note"],
            )
        out.append(rec)
    return pd.DataFrame(out, columns=[f.name for f in DECODED_SCHEMA.fields])


_DECODE_IN = ["contract", "action_name", "block_num", "abi_blob"]

# round-15 (guide §4.4): both codec UDFs are marked non-deterministic
# so the optimizer may not MOVE or DUPLICATE them. Concretely:
# PushProjectionThroughLimit was pushing the (deterministic) UDF
# projections below the LIMIT-bounded paths' top-k, which stopped the
# Limit(Project(Sort)) shape from planning as TakeOrderedAndProject —
# the top-500 degraded to a full range exchange + RangePartitioner
# sampling job (caught in the executed plan after the r15 fan-out
# change removed the repartition that had accidentally blocked the
# push). The functions are pure row-local transforms; the flag only
# constrains the optimizer.
_encode_blob = _encode_blob.asNondeterministic()
_decode_blob = _decode_blob.asNondeterministic()


def decode_actions(df: DataFrame) -> DataFrame:
    """Attach the decoded struct column ``decoded`` to binary action
    rows (expects the build_binary_actions columns)."""
    return df.withColumn("decoded", _decode_blob(F.struct(*_DECODE_IN)))


# ---------------------------------------------------------------------------
# P16 auto-blacklist
# ---------------------------------------------------------------------------


def auto_blacklist_windows(decoded: DataFrame, abis: DataFrame) -> DataFrame:
    """Decode failures -> the failing contract's ABI validity windows
    (registerAutoBlacklist, deserializer.ts:760-776): one row per
    (contract, valid_from, valid_until) whose window contains >=1
    failing block. The failure scan aggregates to O(contracts x
    versions) rows before the broadcast join — nothing wide."""
    fails = (
        decoded.where(F.col("decoded.ds_error") & F.col("abi_blob").isNotNull())
        .select("contract", "block_num")
        .distinct()
    )
    return (
        fails.join(F.broadcast(abis), on="contract")
        .where(
            (F.col("valid_from") <= F.col("block_num"))
            & ((F.col("valid_until") == 0) | (F.col("block_num") < F.col("valid_until")))
        )
        .select("contract", "valid_from", "valid_until")
        .distinct()
    )


def apply_blacklist(df: DataFrame, windows: DataFrame) -> DataFrame:
    """checkBlacklist (deserializer.ts:869-885): drop rows whose
    (contract, block) falls in a blacklisted window — broadcast
    anti-join, narrow over the log."""
    w = windows.select(
        F.col("contract").alias("__bl_contract"),
        F.col("valid_from").alias("__bl_from"),
        F.col("valid_until").alias("__bl_until"),
    )
    cond = (
        (df["contract"] == w["__bl_contract"])
        & (df["block_num"] >= w["__bl_from"])
        & ((w["__bl_until"] == 0) | (df["block_num"] < w["__bl_until"]))
    )
    return df.join(F.broadcast(w), on=cond, how="left_anti")


from ..udf_compat import pickle_by_value as _pbv  # noqa: E402

_pbv(__name__)
