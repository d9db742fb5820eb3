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
