"""Unit tests for the query-param predicate compiler (SURVEY §2.2) and
its cost guards (§2.6 O2/O3) — mirrors the reference's
tests/unit/query-guards.test.ts strategy."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hyperion_history_api_spark.plans.predicates import (
    MAX_SKIP,
    QueryGuardError,
    QueryParams,
    apply_query,
    compile_code_action_filter,
    compile_value,
)


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    from hyperion_history_api_spark.tables import load_tables

    return load_tables(spark, sf_dir)["events"]


def test_term_equality(events):
    n = events.where(compile_value(events["user_id"], "7", numeric=True)).count()
    assert n == events.where(F.col("user_id") == 7).count() > 0


def test_negation(events):
    pred = compile_value(events["event_type"], "!click")
    assert events.where(pred).where(F.col("event_type") == "click").count() == 0


def test_multi_or(events):
    pred = compile_value(events["event_type"], "click,view")
    got = {r[0] for r in events.where(pred).select("event_type").distinct().collect()}
    assert got == {"click", "view"}


def test_mixed_include_exclude(events):
    pred = compile_value(events["event_type"], "click,view,!click")
    got = {r[0] for r in events.where(pred).select("event_type").distinct().collect()}
    assert got == {"view"}


def test_numeric_range(events):
    pred = compile_value(events["value"], "50-60", numeric=True)
    row = events.where(pred).agg(F.min("value"), F.max("value")).first()
    assert row[0] >= 50 and row[1] <= 60


def test_code_action_filter(events):
    # filter=7:click,9:* semantics over (user_id, event_type)
    pred = compile_code_action_filter(
        F.col("user_id").cast("string"), F.col("event_type"), "7:click,9:*"
    )
    rows = events.where(pred).select("user_id", "event_type").distinct().collect()
    for r in rows:
        assert (r[0] == 7 and r[1] == "click") or r[0] == 9


def test_skip_guard(events):
    with pytest.raises(QueryGuardError):
        apply_query(
            events,
            QueryParams(skip=MAX_SKIP + 1),
            default_sort_field="event_id",
        )


def test_limit_guard(events):
    with pytest.raises(QueryGuardError):
        apply_query(
            events, QueryParams(limit=5000), default_sort_field="event_id"
        )


def test_sort_dir_guard(events):
    with pytest.raises(QueryGuardError):
        apply_query(
            events,
            QueryParams(sort="sideways"),
            default_sort_field="event_id",
        )


def test_pagination_disjoint(events):
    """Reference e2e invariant (api-tests.ts): consecutive pages share
    no rows when the sort is total."""
    p1 = apply_query(
        events, QueryParams(skip=0, limit=20), default_sort_field="event_id"
    )
    p2 = apply_query(
        events, QueryParams(skip=20, limit=20), default_sort_field="event_id"
    )
    ids1 = {r[0] for r in p1.select("event_id").collect()}
    ids2 = {r[0] for r in p2.select("event_id").collect()}
    assert len(ids1) == 20 and len(ids2) == 20 and not ids1 & ids2


def test_get_actions_with_envelope(spark):
    """Serving boundary: the reference's envelope dict shape
    (get_actions.ts:88-131) — total/relation, page under limit,
    last_indexed_block = head of log."""
    from hyperion_history_api_spark.api.envelope import get_actions_with_envelope
    from hyperion_history_api_spark.plans.predicates import QueryParams
    from hyperion_history_api_spark.tables import load_tables
    import os

    ev = load_tables(
        spark, os.environ.get("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.001")
    )["events"]
    resp = get_actions_with_envelope(
        spark,
        ev,
        QueryParams(terms={"user_id": "7"}, limit=10),
        seq_field="event_id",
        default_sort_field="event_id",
        tiebreaker="event_id",
        numeric_fields=frozenset({"user_id"}),
        simple=True,
    )
    assert resp["total"]["relation"] == "eq"
    assert resp["cached"] is False
    assert len(resp["simple_actions"]) <= 10
    assert resp["total"]["value"] >= len(resp["simple_actions"])
    head = ev.agg({"event_id": "max"}).first()[0]
    assert resp["last_indexed_block"] == head
    assert "query_time_ms" in resp and "last_indexed_block_time" in resp


def test_plugin_registry(spark):
    """§2.10 plugin hooks: registered transforms compose into the plan,
    gated on their contract; wildcard plugins see every row."""
    from pyspark.sql import functions as F

    from hyperion_history_api_spark.functions.plugins import (
        apply_plugins,
        clear_plugins,
        gated,
        register_plugin,
    )

    clear_plugins()
    try:
        register_plugin(
            "action",
            "eosio.token",
            gated("eosio.token", "usd_value", lambda df: F.col("amount") * 2),
        )
        register_plugin(
            "action", "*", gated("*", "seen_by_plugin", lambda df: F.lit(True))
        )
        df = spark.createDataFrame(
            [("eosio.token", 5.0), ("other", 7.0)], "contract string, amount double"
        )
        out = apply_plugins(df, "action")
        rows = {r.contract: (r.usd_value, r.seen_by_plugin) for r in out.collect()}
        assert rows == {"eosio.token": (10.0, True), "other": (None, True)}
        # delta-kind plugins don't fire on the action path
        assert apply_plugins(df, "delta").columns == df.columns
    finally:
        clear_plugins()


def test_asc_window_guard(spark):
    """O2: sort=asc demands a range bound; ISO windows over 90 days are
    rejected (functions.ts:269-298)."""
    import pytest as _pytest

    from hyperion_history_api_spark.plans.predicates import (
        QueryGuardError,
        QueryParams,
        apply_query,
    )

    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00")], "event_id long, ts_s string"
    ).withColumn("ts", __import__("pyspark.sql.functions", fromlist=["F"]).to_timestamp("ts_s"))
    with _pytest.raises(QueryGuardError):
        apply_query(
            df, QueryParams(sort="asc"), default_sort_field="event_id",
            seq_field="event_id",
        )
    with _pytest.raises(QueryGuardError):
        apply_query(
            df,
            QueryParams(sort="asc", after="2024-01-01", before="2024-06-01"),
            default_sort_field="event_id",
            seq_field="event_id",
        )
    # bounded asc is fine
    out = apply_query(
        df, QueryParams(sort="asc", after="0", before="10"),
        default_sort_field="event_id", seq_field="event_id",
    )
    assert out.count() == 1


# ---------------------------------------------------------------- mongo_query


class TestMongoQueryCompiler:
    def _df(self, spark):
        import datetime

        return spark.createDataFrame(
            [
                (1, "O", 100.0, datetime.datetime(1995, 6, 1), None),
                (2, "F", 300.0, datetime.datetime(1996, 1, 1), "x"),
                (3, "P", 200.0, datetime.datetime(1997, 1, 1), "y"),
            ],
            "k: long, status: string, price: double, d: timestamp, tag: string",
        )

    def test_scalar_and_operators(self, spark):
        from hyperion_history_api_spark.plans.mongo_query import (
            compile_mongo_query,
        )

        df = self._df(spark)
        got = df.where(
            compile_mongo_query(
                df, {"status": {"$in": ["O", "F"]}, "price": {"$gt": 50, "$lte": 300}}
            )
        )
        assert sorted(r["k"] for r in got.collect()) == [1, 2]

    def test_date_coercion_only_for_timestamp_columns(self, spark):
        from hyperion_history_api_spark.plans.mongo_query import (
            compile_mongo_query,
        )

        df = self._df(spark)
        got = df.where(compile_mongo_query(df, {"d": {"$gte": "1996-01-01"}}))
        assert sorted(r["k"] for r in got.collect()) == [2, 3]
        # same-looking string against a string column stays a string compare
        got2 = df.where(compile_mongo_query(df, {"status": {"$gte": "P"}}))
        assert sorted(r["k"] for r in got2.collect()) == [3]

    def test_exists_and_ne(self, spark):
        from hyperion_history_api_spark.plans.mongo_query import (
            compile_mongo_query,
        )

        df = self._df(spark)
        got = df.where(
            compile_mongo_query(df, {"tag": {"$exists": True}, "status": {"$ne": "P"}})
        )
        assert [r["k"] for r in got.collect()] == [2]

    def test_unknown_operator_raises(self, spark):
        import pytest as _pytest

        from hyperion_history_api_spark.plans.mongo_query import (
            compile_mongo_query,
        )

        df = self._df(spark)
        with _pytest.raises(ValueError):
            compile_mongo_query(df, {"price": {"$regex": ".*"}})
