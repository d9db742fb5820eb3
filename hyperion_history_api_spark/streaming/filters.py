"""Stream-subscription filter compiler (SURVEY §2.9 T1, §2.3 J6).

Re-expresses Hyperion's live-stream server-side filters as PySpark
Column predicates:

- ``RequestFilter`` operator table (eq, ne, gt, gte, lt, lte, contains,
  starts_with, ends_with) with unit-aware ``asset`` comparison —
  reference ``src/indexer/helpers/common_functions.ts:260-339``
  (checkMetaFilter).
- AND/OR combination via ``filter_op`` — reference
  ``src/api/helpers/streamFunctions.ts:58-94`` (checkActionFilters /
  checkDeltaFilters: ``every`` vs ``some``).
- Field fallback: a dotted field that is not a real column resolves
  into the JSON payload column (``data.*`` fallback and the
  ``@action``/``@table`` promoted-field convention) — reference
  ``common_functions.ts:265-283``.
- Request routing keys: (contract, action) + notified-account for
  actions; (code, table) + payer + scope for deltas — reference
  ``src/api/socketManager.ts:409-495``, ``ws-router.ts:147-241``.

Everything compiles to native Column expressions, so one streaming
query can serve many subscriptions: build one disjunction for the scan
filter and tag each row with the matching request UUIDs
(``matching_requests``), exactly the fan-out the reference's ws-router
does in JS — but vectorized and JVM-side.

Divergence note: the reference coerces falsy field values to "missing"
(JS ``if (!fieldValue)``), so ``0``/``""`` never reach the operator.
We treat only NULL as missing — documented, strictly more correct.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_OPERATORS = frozenset(
    {"eq", "ne", "gt", "gte", "lt", "lte", "contains", "starts_with", "ends_with"}
)


def _js_str(value) -> str:
    """JS ``String(value)`` for wire filter values: booleans render
    lowercase (``true``, not Python's ``True``) and integral numbers
    drop the decimal point (``String(100.0)`` is ``'100'``) — the
    reference's string ops run ``String(filter.value)``
    (common_functions.ts:319-327)."""
    if isinstance(value, bool):
        return "true" if value else "false"
    if isinstance(value, float) and value == int(value) and abs(value) < 1e21:
        return str(int(value))
    return str(value)


@dataclass(frozen=True)
class RequestFilter:
    """One field filter of a stream subscription
    (``src/interfaces/stream-requests.ts:1-6``)."""

    field: str
    value: str | int | float | bool
    operator: str = "eq"
    asset: str | None = None


@dataclass(frozen=True)
class StreamRequest:
    """A live subscription (StreamActionsRequest / StreamDeltasRequest,
    ``src/interfaces/stream-requests.ts:25-49``). Routing keys that are
    empty/``"*"`` match everything, as in the reference's wildcard maps.
    """

    contract: str = "*"  # actions: act.account | deltas: code
    action: str = "*"  # actions: act.name    | deltas: table
    account: str = ""  # actions: notified membership | deltas: payer
    scope: str = ""  # deltas only
    start_from: int | None = None
    read_until: int | None = None
    filter_op: str = "and"
    filters: tuple[RequestFilter, ...] = dc_field(default_factory=tuple)


def _resolve_field(
    df: DataFrame,
    dotted: str,
    json_fallback_col: str | None,
    action_col: str | None = None,
) -> tuple[Column, bool, Column | None]:
    """Resolve a dotted field to a Column.

    Returns (column, is_json, gate): real (possibly nested) columns are
    used directly; unknown fields fall back to ``get_json_object`` on
    the JSON payload column, mirroring the reference's ``data.*`` /
    ``@field`` fallback (common_functions.ts:265-283).

    A promoted-field prefix ``@name.field`` only resolves into the
    payload when the row's action/table name equals ``name`` — the
    reference checks ``_source.act.name === actName``
    (common_functions.ts:266-279). ``gate`` carries that extra
    predicate; with no action column in the schema the gate is
    never-match (the reference would find no ``@name`` object either).
    """
    root = dotted.split(".", 1)[0]
    if root in df.columns:
        return F.col(dotted), False, None
    path = dotted[1:] if dotted.startswith("@") else dotted
    gate: Column | None = None
    # promoted-table/action prefix: "@transfer.amount" -> data.amount,
    # gated on act.name == "transfer"
    if dotted.startswith("@") and "." in path:
        name, path = path.split(".", 1)
        gate = (
            F.col(action_col) == F.lit(name)
            if action_col and action_col in df.columns
            else F.lit(False)
        )
    if json_fallback_col is None:
        raise ValueError(f"unknown field {dotted!r} and no JSON fallback column")
    return F.get_json_object(F.col(json_fallback_col), f"$.{path}"), True, gate


def _field_dtype(df: DataFrame, dotted: str) -> str:
    """Resolve the Spark dtype of a (possibly nested) dotted field by
    walking ``df.schema`` — ``dict(df.dtypes)`` only sees top-level
    columns, so a numeric struct field addressed as ``a.b`` would
    otherwise slip past the wire type-mismatch discipline and compile
    to an ANSI cast that throws mid-scan. Unknown paths return ``""``
    (the JSON-fallback case, handled separately)."""
    from pyspark.sql.types import StructType

    cur = df.schema
    parts = dotted.split(".")
    for i, part in enumerate(parts):
        if not isinstance(cur, StructType) or part not in cur.names:
            return ""
        field_type = cur[part].dataType
        if i == len(parts) - 1:
            return field_type.simpleString()
        cur = field_type
    return ""


def compile_filter(
    df: DataFrame,
    flt: RequestFilter,
    *,
    json_fallback_col: str | None = "props",
    action_col: str | None = None,
) -> Column:
    """Compile one RequestFilter to a boolean Column.

    Operator semantics per checkMetaFilter (common_functions.ts:301-331);
    ``asset`` compare splits ``"1.0000 EOS"`` and compares the amount
    numerically only when the symbol matches (lines 294-299).
    """
    if flt.operator not in _OPERATORS:
        raise ValueError(f"unknown operator {flt.operator!r}")
    # checkMetaFilter's outer gate is `if (filter.field && filter.value)`
    # (common_functions.ts:261): a FALSY filter value (0, '', false)
    # makes the whole filter a non-match in the reference — compile to
    # a constant, don't run the operator
    if flt.value == 0 or flt.value == "" or flt.value is False:
        return F.lit(False)
    col, is_json, gate = _resolve_field(df, flt.field, json_fallback_col, action_col)
    value: Column = F.lit(flt.value)
    # Type-mismatch discipline (round-11, refined round-12 to match
    # checkMetaFilter exactly): filter values come off the WIRE, so a
    # string value against a numeric column (or vice versa, or a
    # malformed payload string under the JSON/asset casts) must never
    # compile to a bare ANSI cast — `double_col == 'click'` THROWS at
    # runtime and kills the whole subscription scan mid-stream. Per-op
    # semantics mirror the reference switch (common_functions.ts:
    # 301-331): eq/ne are STRICT ===/!== (a number-vs-string mismatch
    # is eq-false / ne-true wherever the field exists), relational ops
    # use JS loose numeric coercion (NaN never matches), and the
    # string ops run String(value) against the RAW field rendering,
    # never a coerced one. All coercions are try_cast (NULL on
    # malformed -> the coalesce False at the bottom).
    op = flt.operator
    relational = op in ("gt", "gte", "lt", "lte")
    string_op = op in ("contains", "starts_with", "ends_with")
    ne_on_mismatch: Column | None = None
    never_match = False
    num_val = isinstance(flt.value, (int, float)) and not isinstance(
        flt.value, bool
    )
    dtype = _field_dtype(df, flt.field)
    col_numeric = dtype in (
        "tinyint", "smallint", "int", "bigint", "float", "double"
    ) or dtype.startswith("decimal")
    str_col = col  # un-coerced, for contains/starts_with/ends_with
    asset_pred: Column | None = None
    if flt.asset and (dtype == "string" or is_json):
        # "<amount> <symbol>": the reference rewrites
        # fieldValue = parseFloat(amount) ONLY when the split symbol
        # equals filter.asset (common_functions.ts:294-299, and only
        # for string field values); on symbol MISMATCH the operator
        # runs against the RAW string unchanged — e.g. contains "10"
        # on "100 WAX" with asset=EOS still matches. (F.get, not
        # getItem: ANSI array indexing THROWS on a value with no
        # space — malformed quantities must be non-matches, not
        # scan-killers.)
        parts = F.split(col, " ")
        symbol_ok = F.coalesce(
            F.get(parts, 1) == F.lit(flt.asset), F.lit(False)
        )
        # parseFloat semantics, not bare try_cast: JS parses the
        # longest numeric PREFIX ("12.31x" -> 12.31, "0x10" -> 0,
        # "1.2.3" -> 1.2, "Infinity" included), where try_cast is
        # all-or-nothing. regexp_extract returns '' on no prefix ->
        # try_cast NULL (JS NaN: all compares false). nanvl: a literal
        # "NaN"-casting value would NaN-sort ABOVE everything in
        # Spark's comparison order — JS NaN comparisons are uniformly
        # false, so fold NaN into the NULL (-> coalesce False) path.
        amount = F.nanvl(
            F.regexp_extract(
                F.get(parts, 0),
                r"^[+-]?(Infinity|(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?)",
                0,
            ).try_cast("double"),
            F.lit(None).cast("double"),
        )
        raw = col
        if string_op:
            # match side: parseFloat yields a JS NUMBER; the reference
            # strictly TypeErrors on (number).includes — the total
            # analog keeps the compare but renders the number the way
            # JS Number#toString would: integral doubles print with no
            # trailing ".0" (and no Spark 1.0E7 scientific form), so
            # contains/starts_with/ends_with "1" on "1.0000 EOS" sees
            # "1", never "1.0" (r13 ADVICE). try_cast: a >38-digit
            # integral double overflows the decimal render — fall back
            # to the Spark rendering rather than throw mid-scan (JS
            # would print 1e+39; documented residual divergence along
            # with the no-throw behavior itself).
            js_num = F.coalesce(
                F.when(
                    amount % 1 == 0,
                    amount.try_cast("decimal(38,0)").cast("string"),
                ),
                amount.cast("string"),
            )
            s = F.when(symbol_ok, js_num).otherwise(raw)
            sv = _js_str(flt.value)
            if op == "contains":
                asset_pred = s.contains(F.lit(sv))
            elif op == "starts_with":
                asset_pred = s.startswith(sv)
            else:
                asset_pred = s.endswith(sv)
        elif relational:
            # loose JS relational, split by the FILTER value's type
            # (r13 ADVICE): a NUMERIC filter value coerces the raw
            # side to number on both paths (JS number-vs-string ->
            # ToNumber; NaN/unparseable -> NULL -> false); a STRING
            # filter value coerces only against the matched
            # (parseFloat'd) amount — on the MISMATCH path JS compares
            # string-vs-string LEXICOGRAPHICALLY ('100' >= '20' is
            # false in JS), so the raw side stays a string there.
            try:
                _fv = float(flt.value)
                # Number("NaN") is NaN; NaN relationals are false in
                # JS but NaN-sorts-high in Spark — force the NULL path
                v = (
                    F.lit(None).cast("double")
                    if _fv != _fv
                    else F.lit(_fv)
                )
            except (TypeError, ValueError):
                v = F.lit(None).cast("double")

            def _rel(lhs: Column, rhs: Column) -> Column:
                return {
                    "gt": lhs > rhs,
                    "gte": lhs >= rhs,
                    "lt": lhs < rhs,
                    "lte": lhs <= rhs,
                }[op]

            if isinstance(flt.value, str):
                asset_pred = F.when(symbol_ok, _rel(amount, v)).otherwise(
                    _rel(raw, F.lit(flt.value))
                )
            else:
                c = F.when(symbol_ok, amount).otherwise(
                    F.nanvl(
                        raw.try_cast("double"), F.lit(None).cast("double")
                    )
                )
                asset_pred = _rel(c, v)
        elif op == "eq":
            # strict ===: coerced double can only equal a numeric
            # filter value; the raw string only a string value; a BOOL
            # value equals neither (JS 'x' === true is false — never
            # Python's str(True) == "True" rendering)
            if isinstance(flt.value, bool):
                asset_pred = F.lit(False)
            elif num_val:
                asset_pred = symbol_ok & (amount == F.lit(float(flt.value)))
            else:
                asset_pred = (~symbol_ok) & (raw == F.lit(str(flt.value)))
        else:  # ne, strict !==
            if isinstance(flt.value, bool):
                # !== a bool is true wherever the field exists
                asset_pred = raw.isNotNull()
            elif num_val:
                # matched-but-unparseable amount is JS NaN; NaN !== n
                # is true, hence the coalesce(True) on the match side
                asset_pred = F.when(
                    symbol_ok,
                    F.coalesce(
                        amount != F.lit(float(flt.value)), F.lit(True)
                    ),
                ).otherwise(raw.isNotNull())
            else:
                asset_pred = F.when(symbol_ok, F.lit(True)).otherwise(
                    raw != F.lit(str(flt.value))
                )
    elif is_json and num_val and not string_op:
        # get_json_object loses the JSON number/string distinction, so
        # eq/ne coerce here too (documented divergence: a JSON *string*
        # "100" eq-matches 100 where the reference's parsed === would
        # not — the payload type is unrecoverable from the extract)
        col = col.try_cast("double")
        value = F.lit(float(flt.value))
    elif col_numeric and isinstance(flt.value, str):
        if relational:
            # JS loose relational: 7 > '5' coerces the string side
            try:
                value = F.lit(float(flt.value))
            except ValueError:
                never_match = True  # NaN comparisons are all false
        elif op == "eq":
            never_match = True  # strict ===: number === string is false
        elif op == "ne":
            ne_on_mismatch = col.isNotNull()  # strict !==: always true
    elif dtype == "string" and num_val:
        if relational:
            # JS loose relational: '5' > 3 coerces the string side
            col = col.try_cast("double")
            value = F.lit(float(flt.value))
        elif op == "eq":
            never_match = True
        elif op == "ne":
            ne_on_mismatch = col.isNotNull()
    if asset_pred is not None:
        pred = asset_pred
    elif never_match:
        pred = F.lit(False)
    elif ne_on_mismatch is not None:
        pred = ne_on_mismatch
    elif op == "eq":
        pred = col == value
    elif op == "ne":
        pred = col != value
    elif op == "gt":
        pred = col > value
    elif op == "gte":
        pred = col >= value
    elif op == "lt":
        pred = col < value
    elif op == "lte":
        pred = col <= value
    elif op == "contains":
        pred = str_col.cast("string").contains(F.lit(_js_str(flt.value)))
    elif op == "starts_with":
        pred = str_col.cast("string").startswith(_js_str(flt.value))
    else:  # ends_with
        pred = str_col.cast("string").endswith(_js_str(flt.value))
    # NULL field => no match (reference: missing field fails a truthy value)
    pred = F.coalesce(pred, F.lit(False))
    if gate is not None:
        pred = gate & pred
    return pred


@dataclass(frozen=True)
class StreamSchema:
    """Column mapping from the engine's row layout to the reference's
    routing fields. Defaults fit the synthetic ``events`` table."""

    contract_col: str = "event_type"  # act.account / code
    action_col: str | None = None  # act.name / table
    account_col: str = "user_id"  # notified / payer (scalar or array col)
    scope_col: str | None = None
    seq_col: str = "event_id"  # block_num / global_sequence
    json_col: str | None = "props"


def compile_request(
    df: DataFrame, req: StreamRequest, schema: StreamSchema = StreamSchema()
) -> Column:
    """Compile a full subscription to one boolean Column.

    Routing-key predicates AND together (socketManager.ts:409-450:
    contract/action map lookup, notified membership, scope guard), then
    the filter list applies with ``filter_op`` every/some semantics
    (streamFunctions.ts:58-94).
    """
    preds: list[Column] = []
    if req.contract and req.contract != "*":
        preds.append(F.col(schema.contract_col) == req.contract)
    if req.action and req.action != "*":
        # no action column in this schema -> never-match, NOT skip:
        # dropping the predicate would over-deliver every action type
        # to a subscriber that asked for one (same convention as
        # _resolve_field's missing-column gate)
        preds.append(
            F.col(schema.action_col) == req.action
            if schema.action_col
            else F.lit(False)
        )
    if req.account:
        acc = F.col(schema.account_col)
        acc_t = dict(df.dtypes).get(schema.account_col, "")
        if acc_t.startswith("array"):
            preds.append(F.array_contains(acc, req.account))
        else:
            preds.append(acc.cast("string") == str(req.account))
    if req.scope:
        preds.append(
            F.col(schema.scope_col) == req.scope
            if schema.scope_col
            else F.lit(False)
        )
    if req.start_from is not None:
        preds.append(F.col(schema.seq_col) >= F.lit(req.start_from))
    if req.read_until is not None and req.read_until != 0:
        # inclusive, like the reference's blockRange lte
        # (functions.ts:758-768 addBlockRangeOpts)
        preds.append(F.col(schema.seq_col) <= F.lit(req.read_until))
    if req.filters:
        fps = [
            compile_filter(
                df,
                f,
                json_fallback_col=schema.json_col,
                action_col=schema.action_col,
            )
            for f in req.filters
        ]
        combined = fps[0]
        for p in fps[1:]:
            combined = (combined | p) if req.filter_op == "or" else (combined & p)
        preds.append(combined)
    if not preds:
        return F.lit(True)
    out = preds[0]
    for p in preds[1:]:
        out = out & p
    return out


def route_to_subscribers(
    df: DataFrame,
    requests: dict[str, StreamRequest],
    schema: StreamSchema = StreamSchema(),
) -> DataFrame:
    """Tag each row with the request UUIDs it matches and drop rows that
    match none — the vectorized form of the ws-router fan-out
    (ws-router.ts:147-241: one pass per event over the subscription
    maps). One wide boolean projection per request keeps this a single
    whole-stage-codegen pass over the stream; at 100 TB this is a
    narrow map, no shuffle.
    """
    tags = F.array(
        *[
            F.when(compile_request(df, r, schema), F.lit(uuid))
            for uuid, r in requests.items()
        ]
    )
    return df.withColumn(
        "matching_requests", F.array_compact(tags)
    ).where(F.size("matching_requests") > 0)
