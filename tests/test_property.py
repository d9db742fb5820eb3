"""Property-based tests (hypothesis): the predicate-compiler grammar
and the updateByBlock merge are checked against independent Python
reference evaluators on randomized inputs — the sqllogictest-style
rigor the reference lacks (SURVEY §5)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hyperion_history_api_spark.plans.predicates import compile_value
from hyperion_history_api_spark.streaming.state_store import merge_update_by_block

from pyspark.sql import functions as F

# ------------------------------------------------------- compile_value

_NUM_VALUES = [0, 1, 2, 3, 4, 5]
_STR_VALUES = ["a", "b", "c", "d"]


def _num_raw() -> st.SearchStrategy[str]:
    single = st.sampled_from([str(v) for v in _NUM_VALUES])
    rng = st.tuples(
        st.sampled_from(_NUM_VALUES), st.sampled_from(_NUM_VALUES)
    ).map(lambda t: f"{min(t)}-{max(t)}")
    multi = st.lists(
        st.sampled_from([str(v) for v in _NUM_VALUES]
                        + [f"!{v}" for v in _NUM_VALUES]),
        min_size=1,
        max_size=3,
    ).map(",".join)
    return st.one_of(single, rng, multi)


def _py_eval_num(raw: str, x: int) -> bool:
    """Reference implementation of the mini-grammar on a numeric field
    (processMultiVars + addRangeQuery, functions.ts:16-69)."""
    raw = raw.strip()
    import re

    if m := re.match(r"^(-?\d+)-(-?\d+)$", raw):
        return int(m.group(1)) <= x <= int(m.group(2))
    values = [v for v in raw.split(",") if v]
    include = [int(v) for v in values if not v.startswith("!")]
    exclude = [int(v[1:]) for v in values if v.startswith("!")]
    ok = (x in include) if include else True
    return ok and all(x != e for e in exclude)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(raw=_num_raw())
def test_compile_value_numeric_matches_python(spark, raw):
    df = spark.createDataFrame([(v,) for v in _NUM_VALUES], "x long").coalesce(1)
    got = sorted(
        r["x"] for r in df.where(compile_value(F.col("x"), raw, numeric=True)).collect()
    )
    want = sorted(v for v in _NUM_VALUES if _py_eval_num(raw, v))
    assert got == want, f"raw={raw!r}"


def _str_raw() -> st.SearchStrategy[str]:
    item = st.sampled_from(_STR_VALUES + [f"!{v}" for v in _STR_VALUES])
    return st.lists(item, min_size=1, max_size=3).map(",".join)


def _py_eval_str(raw: str, x: str) -> bool:
    values = [v for v in raw.split(",") if v]
    include = [v for v in values if not v.startswith("!")]
    exclude = [v[1:] for v in values if v.startswith("!")]
    ok = (x in include) if include else True
    return ok and all(x != e for e in exclude)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(raw=_str_raw())
def test_compile_value_string_matches_python(spark, raw):
    df = spark.createDataFrame([(v,) for v in _STR_VALUES], "t string").coalesce(1)
    got = sorted(r["t"] for r in df.where(compile_value(F.col("t"), raw)).collect())
    want = sorted(v for v in _STR_VALUES if _py_eval_str(raw, v))
    assert got == want, f"raw={raw!r}"


# --------------------------------------------- merge_update_by_block

_UPDATE = st.tuples(
    st.integers(min_value=0, max_value=3),  # key
    st.integers(min_value=0, max_value=4),  # block
    st.sampled_from([0, 1, 1, 1]),  # present (delete 25%)
)


def _py_merge(batches: list[list[tuple[int, int, int]]]) -> dict[int, tuple]:
    """Last-writer-wins by (block, arrival order); present=0 deletes.
    The tombstone participates in ordering: a stale lower-block update
    arriving later must NOT resurrect the row (updateByBlock guard)."""
    state: dict[int, tuple[int, int, int, int]] = {}  # k -> (b, bi, i, p)
    for bi, batch in enumerate(batches):
        for i, (k, b, p) in enumerate(batch):
            cur = state.get(k)
            if cur is None or (b, bi, i) >= (cur[0], cur[1], cur[2]):
                state[k] = (b, bi, i, p)
    return {k: (b, p) for k, (b, bi, i, p) in state.items() if p != 0}


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    batches=st.lists(
        st.lists(_UPDATE, min_size=1, max_size=6), min_size=1, max_size=3
    )
)
def test_merge_update_by_block_matches_python_fold(spark, batches):
    """Fold the batches through the Spark MERGE (keeping tombstones in
    the snapshot so the >= guard sees them) and compare the visible
    rows against the Python reference."""
    current = None
    for batch in batches:
        rows = [(k, b, p, i) for i, (k, b, p) in enumerate(batch)]
        df = spark.createDataFrame(rows, "k long, b long, p long, ord long").coalesce(1)
        current = merge_update_by_block(
            current, df, ["k"], block_col="b", order_col="ord"
        )
    visible = {
        r["k"]: (r["b"], r["p"]) for r in current.where(F.col("p") != 0).collect()
    }
    assert visible == _py_merge(batches)


# ------------------------------------------------- mongo find compiler

_M_ROWS = [
    (i, [10, 20, 20, 30, 40, None][i % 6], ["x", "y", "z", None][i % 4])
    for i in range(24)
]

_M_OPS = ["$eq", "$ne", "$gt", "$gte", "$lt", "$lte"]


def _mongo_cond() -> st.SearchStrategy:
    scalar = st.sampled_from([10, 20, 30, "x", "y"])
    cmp_doc = st.dictionaries(
        st.sampled_from(_M_OPS), st.sampled_from([10, 20, 30]),
        min_size=1, max_size=2,
    )
    in_doc = st.fixed_dictionaries(
        {"$in": st.lists(st.sampled_from([10, 20, 30]), min_size=1, max_size=3)}
    )
    exists_doc = st.fixed_dictionaries({"$exists": st.booleans()})
    return st.one_of(scalar, cmp_doc, in_doc, exists_doc)


def _py_eval_mongo(cond, v) -> bool:
    """SQL three-valued-logic reference: NULL fails every comparison;
    only $exists observes it."""
    import operator as op

    if not isinstance(cond, dict):
        return v is not None and v == cond
    table = {"$eq": op.eq, "$ne": op.ne, "$gt": op.gt,
             "$gte": op.ge, "$lt": op.lt, "$lte": op.le}
    for o, raw in cond.items():
        if o == "$exists":
            if (v is not None) != raw:
                return False
        elif o == "$in":
            if v is None or v not in raw:
                return False
        else:
            if v is None or type(v) is str:
                return False  # string col vs numeric literal: no match
            if not table[o](v, raw):
                return False
    return True


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    num_cond=_mongo_cond(),
    use_str_field=st.booleans(),
)
def test_mongo_compiler_matches_reference(spark, num_cond, use_str_field):
    from hyperion_history_api_spark.plans.mongo_query import compile_mongo_query

    field = "s" if use_str_field else "num"
    # numeric-only operator docs on the string field are legal but
    # match nothing except $exists/$ne-style clauses — the reference
    # evaluator models that too
    df = spark.createDataFrame(_M_ROWS, "k: long, num: long, s: string")
    query = {field: num_cond}
    got = sorted(r["k"] for r in df.where(compile_mongo_query(df, query)).collect())
    want = []
    for k, num, s in _M_ROWS:
        v = s if use_str_field else num
        if _py_eval_mongo(num_cond, v):
            want.append(k)
    assert got == want


# ------------------------------------------- live-routing fan-out

_ROUTE_ETYPES = ["click", "view", "purchase"]


def _route_rows():
    row = st.tuples(
        st.integers(0, 5),              # user_id
        st.sampled_from(_ROUTE_ETYPES),  # event_type
        st.integers(0, 200),            # value
        st.one_of(st.none(), st.integers(0, 100)),  # props.k (or absent)
    )
    return st.lists(row, min_size=1, max_size=12)


def _route_requests():
    flt = st.tuples(
        st.sampled_from(["value", "k", "event_type", "nonexistent"]),
        st.sampled_from(
            ["eq", "ne", "gt", "gte", "lt", "lte",
             "contains", "starts_with"]
        ),
        st.one_of(st.integers(0, 200), st.sampled_from(_ROUTE_ETYPES)),
    )
    req = st.tuples(
        st.sampled_from(["*"] + _ROUTE_ETYPES),      # contract
        st.sampled_from(["", "1", "3", "9"]),        # account
        st.sampled_from(["and", "or"]),              # filter_op
        st.lists(flt, min_size=0, max_size=2),
    )
    return st.lists(req, min_size=1, max_size=3)


def _py_filter(field, op, val, row):
    """checkMetaFilter reference (common_functions.ts:301-331) over
    the serving schema: direct column else JSON payload fallback;
    missing/NULL field never matches; numeric JSON coercion mirrors
    compile_filter's is_json cast."""
    user_id, etype, value, k = row
    direct = {"event_type": etype, "value": float(value),
              "user_id": user_id}
    if field in direct:
        x = direct[field]
    elif field == "k":
        x = None if k is None else (
            float(k) if isinstance(val, (int, float)) else str(k)
        )
    else:
        x = None
    if x is None:
        return False
    mismatch = isinstance(x, str) != isinstance(val, str)
    if op in ("gt", "gte", "lt", "lte") and mismatch:
        # JS loose relational coercion: '5' > 3 / 7 > '5' compare
        # numerically; NaN never matches
        try:
            x, v = float(x), float(val)
        except (TypeError, ValueError):
            return False
    elif op == "eq" and mismatch:
        return False  # strict ===
    elif op == "ne" and mismatch:
        return True  # strict !==
    else:
        v = float(val) if isinstance(val, (int, float)) and not isinstance(
            x, str
        ) else val
    try:
        if op == "eq":
            return x == v
        if op == "ne":
            return x != v
        if op == "gt":
            return x > v
        if op == "gte":
            return x >= v
        if op == "lt":
            return x < v
        if op == "lte":
            return x <= v
        if op == "contains":
            return str(val) in str(_canon_num(x))
        if op == "starts_with":
            return str(_canon_num(x)).startswith(str(val))
    except TypeError:
        return False
    raise AssertionError(op)


def _canon_num(x):
    """Spark's cast(double AS string) renders 7.0, not 7 — mirror it."""
    return x


def _py_route(req, row):
    contract, account, fop, filters = req
    user_id, etype, value, k = row
    if contract != "*" and etype != contract:
        return False
    if account and str(user_id) != account:
        return False
    if filters:
        results = [_py_filter(f, o, v, row) for f, o, v in filters]
        return any(results) if fop == "or" else all(results)
    return True


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_route_rows(), reqs=_route_requests())
def test_route_to_subscribers_matches_python(spark, rows, reqs):
    """The vectorized live-relay fan-out (route_to_subscribers over
    the serving schema, one codegen'd pass) tags every row with
    exactly the subscriptions a row-at-a-time reference evaluator of
    the checkMetaFilter semantics selects."""
    import json as _json

    from hyperion_history_api_spark.streaming.filters import (
        RequestFilter,
        StreamRequest,
        StreamSchema,
        route_to_subscribers,
    )

    df = spark.createDataFrame(
        [
            (
                i,
                u,
                e,
                float(v),
                _json.dumps({} if k is None else {"k": k}),
            )
            for i, (u, e, v, k) in enumerate(rows)
        ],
        "event_id long, user_id long, event_type string, value double, "
        "props string",
    )
    requests = {
        f"r{j}": StreamRequest(
            contract=c,
            account=a,
            filter_op=fop,
            filters=tuple(
                RequestFilter(field=f, value=v, operator=o)
                for f, o, v in filters
            ),
        )
        for j, (c, a, fop, filters) in enumerate(reqs)
    }
    got = {
        r["event_id"]: sorted(r["matching_requests"])
        for r in route_to_subscribers(
            df, requests, StreamSchema(json_col="props")
        ).collect()
    }
    want = {}
    for i, row in enumerate(rows):
        tags = sorted(
            uid for uid, (c, a, fop, f) in zip(requests, reqs)
            if _py_route((c, a, fop, f), row)
        )
        if tags:
            want[i] = tags
    assert got == want


def test_filter_type_mismatch_never_throws(spark):
    """Pinned regressions for the wire type-mismatch discipline (the
    routing property test found `double_col == 'click'` THROWING under
    ANSI casts and killing the subscription scan): string-vs-numeric
    mismatches follow checkMetaFilter's loose semantics — NaN never
    matches, `ne` matches wherever the field exists — and malformed
    payload strings under the JSON/asset numeric coercions are NULL,
    not runtime errors."""
    import json as _json

    from hyperion_history_api_spark.streaming.filters import (
        RequestFilter,
        StreamRequest,
        compile_request,
    )

    df = spark.createDataFrame(
        [
            (1, 3, "click", 7.0, _json.dumps({"k": "abc"})),
            (2, 3, "100", 150.0, _json.dumps({"k": 60})),
        ],
        "event_id long, user_id long, event_type string, value double, "
        "props string",
    )

    def ids(*filters, op="and"):
        req = StreamRequest(filter_op=op, filters=tuple(filters))
        return sorted(
            r["event_id"]
            for r in df.where(compile_request(df, req)).collect()
        )

    # numeric column vs unparseable string: eq/gt never match, ne
    # matches every row with the field present (JS 7 != 'click')
    assert ids(RequestFilter("value", "click", "eq")) == []
    assert ids(RequestFilter("value", "click", "gt")) == []
    assert ids(RequestFilter("value", "click", "ne")) == [1, 2]
    # numeric column vs NUMERIC STRING: relational coerces (JS 7 > '5')
    # but eq stays strict (JS 150 === '150' is false)
    assert ids(RequestFilter("value", "100", "gt")) == [2]
    assert ids(RequestFilter("value", "150.0", "eq")) == []
    # string column vs number: eq/ne are STRICT ===/!== (checkMetaFilter
    # common_functions.ts:301-331 — '100' === 100 is false, !== true),
    # relational ops coerce ('100' >= 50 true, 'click' >= 50 NaN-false)
    assert ids(RequestFilter("event_type", 100, "eq")) == []
    assert ids(RequestFilter("event_type", 50, "ne")) == [1, 2]
    assert ids(RequestFilter("event_type", 100, "ne")) == [1, 2]
    assert ids(RequestFilter("event_type", 50, "gte")) == [2]
    # string ops run String(value) against the RAW string column, not a
    # numeric rendering ('100'.includes('100'), never '100.0')
    assert ids(RequestFilter("event_type", 100, "contains")) == [2]
    assert ids(RequestFilter("event_type", 100, "starts_with")) == [2]
    # malformed JSON payload under the numeric coercion: NULL, no match
    assert ids(RequestFilter("k", 50, "gte")) == [2]
    # asset on a symbol-less value: the reference only parseFloat-
    # coerces when the split symbol EQUALS filter.asset
    # (common_functions.ts:294-299) — otherwise the op runs against
    # the raw string. "100" has no symbol -> raw path -> loose
    # relational coerces "100" >= 10 -> MATCH; "click" -> NaN -> no
    # match, no throw.
    assert ids(RequestFilter("event_type", 10, "gte", asset="EOS")) == [2]


# ------------------------------------------- asset-filter JS-model net

# The asset compare (common_functions.ts:294-331) has a small set of
# DOCUMENTED divergences from exact JS semantics (streaming/filters.py
# asset branch). This net evaluates the compiled predicate against a
# faithful Python model of the JS code over a corpus x operator x
# value-type grid and asserts the divergence set is EXACTLY the
# documented classes — if a change silently widens it, this fails.

_THROW = "THROW"


def _js_parse_float(tok: str) -> float:
    """JS parseFloat: longest numeric prefix, NaN if none."""
    import re as _re

    m = _re.match(r"[+-]?(Infinity|(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?)", tok)
    if not m:
        return float("nan")
    t = m.group(0)
    if t.endswith("Infinity"):
        return float("-inf") if t.startswith("-") else float("inf")
    return float(t)


def _js_to_number(s: str) -> float:
    """JS Number(string): whole-string parse, '' -> 0, else NaN."""
    import re as _re

    t = s.strip()
    if t == "":
        return 0.0
    if _re.fullmatch(r"[+-]?(Infinity|(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?)", t):
        if t.lstrip("+-") == "Infinity":
            return float("-inf") if t.startswith("-") else float("inf")
        return float(t)
    if _re.fullmatch(r"0[xX][0-9a-fA-F]+", t):
        return float(int(t, 16))
    return float("nan")


def _js_render_num(n: float) -> str:
    """JS Number#toString for the corpus range."""
    if n != n:
        return "NaN"
    if n == float("inf"):
        return "Infinity"
    if n == float("-inf"):
        return "-Infinity"
    if n == int(n) and abs(n) < 1e21:
        return str(int(n))
    return repr(n)


def _js_meta_asset(fv, op: str, value, asset: str = "EOS"):
    """Python model of checkMetaFilter's asset path
    (common_functions.ts:261,294-331): outer falsy-value gate, falsy
    fieldValue -> !value, parseFloat only on symbol match, strict
    eq/ne, JS loose/lexicographic relationals, String() ops (which
    TypeError on a parsed number -> _THROW)."""
    from hyperion_history_api_spark.streaming.filters import _js_str

    if value == 0 or value == "" or value is False:
        return False  # outer `filter.value` gate (truthy test)
    if fv is None or fv == "":
        return False  # `if (!fieldValue) return !filter.value`
    out = fv
    parts = fv.split(" ")
    if len(parts) > 1 and parts[1] == asset:
        out = _js_parse_float(parts[0])
    isnum = isinstance(out, float)
    num_val = isinstance(value, (int, float)) and not isinstance(value, bool)
    if op in ("eq", "ne"):
        if isnum:
            strict_eq = num_val and out == value
        else:
            strict_eq = isinstance(value, str) and out == value
        return strict_eq if op == "eq" else not strict_eq
    if op in ("gt", "gte", "lt", "lte"):
        if not isnum and isinstance(value, str):
            a, b = out, value  # JS string-vs-string: lexicographic
        else:
            a = out if isnum else _js_to_number(out)
            if num_val:
                b = float(value)
            elif value is True:
                b = 1.0
            else:
                b = _js_to_number(str(value))
            if a != a or b != b:
                return False  # NaN relationals
        return {
            "gt": a > b, "gte": a >= b, "lt": a < b, "lte": a <= b
        }[op]
    if isnum:
        return _THROW  # (number).includes / startsWith / endsWith
    sv = _js_str(value)
    if op == "contains":
        return sv in out
    if op == "starts_with":
        return out.startswith(sv)
    return out.endswith(sv)


def _strop_analog(out: float, op: str, value) -> bool:
    """The engine's documented no-throw analog for string ops on a
    parsed (matched-symbol) amount: compare against the JS number
    rendering; unparseable (NaN) amounts never match."""
    from hyperion_history_api_spark.streaming.filters import _js_str

    if out != out:
        return False
    r = _js_render_num(out)
    sv = _js_str(value)
    if op == "contains":
        return sv in r
    if op == "starts_with":
        return r.startswith(sv)
    return r.endswith(sv)


def test_asset_filter_js_divergence_net(spark):
    """Every (corpus x op x value) disagreement between the compiled
    asset predicate and the JS model falls in EXACTLY the documented
    divergence classes: (1) string ops on a matched symbol — JS
    TypeErrors, we run the no-throw rendered-number analog; (2) falsy
    ('' / NULL-like) field values — JS coerces to missing, we only
    treat NULL as missing (module docstring). Anything else is a
    regression."""
    from hyperion_history_api_spark.streaming.filters import (
        RequestFilter,
        compile_filter,
    )

    corpus = [
        "150.0000 EOS", "123.45 EOS", "0.0001 EOS", "-5.5 EOS",
        "1e3 EOS", "abc EOS", "12.31x EOS", "0x10 EOS", "Infinity EOS",
        "NaN EOS", "0 EOS", "6.55 SYS", "12.31 SYS", "200 SYS",
        "NaN SYS", "100 WAX", "100", "2 0 0 EOS", "", None,
    ]
    grid: list[tuple[str, object]] = []
    for op in ("eq", "ne"):
        for v in (150, 123.45, "150.0000 EOS", "6.55 SYS", "abc", True,
                  1000):
            grid.append((op, v))
    for op in ("gt", "gte", "lt", "lte"):
        for v in (20, "20", 123.45, "abc", "1e3", True, 0):
            grid.append((op, v))
    for v in (".", "5", "0", "Inf", "EOS", 100, 1.0, True):
        grid.append(("contains", v))
    for v in ("1", "15", "-", 6):
        grid.append(("starts_with", v))
    for v in ("0", "5", "SYS", 0.5):
        grid.append(("ends_with", v))

    df = spark.createDataFrame(
        [(i, fv) for i, fv in enumerate(corpus)],
        "rid long, quantity string",
    )
    cols = [
        compile_filter(
            df, RequestFilter("quantity", v, op, asset="EOS")
        ).alias(f"c{i}")
        for i, (op, v) in enumerate(grid)
    ]
    rows = {r["rid"]: r for r in df.select("rid", *cols).collect()}

    # Spark's double rendering and JS Number#toString agree on this
    # zone; outside it (e.g. 1e-4 -> "1.0E-4" vs "0.0001") the analog
    # is checked for no-throw only (documented residual of class 1)
    def render_agrees(n: float) -> bool:
        return (
            n != n
            or abs(n) == float("inf")
            or (n == int(n) and abs(n) < 1e15)
            or 1e-3 <= abs(n) < 1e7
        )

    unexpected: list[tuple] = []
    for i, (op, v) in enumerate(grid):
        for rid, fv in enumerate(corpus):
            eng = bool(rows[rid][f"c{i}"])
            model = _js_meta_asset(fv, op, v)
            if model is _THROW:
                # class 1: no-throw analog on the parsed amount
                out = _js_parse_float(fv.split(" ")[0])
                if render_agrees(out) and eng != _strop_analog(out, op, v):
                    unexpected.append((fv, op, v, eng, "analog-mismatch"))
                continue
            if eng != model:
                if fv == "":  # class 2: falsy field value
                    continue
                unexpected.append((fv, op, v, eng, model))
    assert unexpected == [], unexpected
