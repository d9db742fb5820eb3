"""Nested Hyperion data-model invariants (sources/hyperion_model.py)
and plan-shape checks for the nested-predicate queries."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from hyperion_history_api_spark.sources.hyperion_model import (
    build_actions,
    build_deltas,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.001")


def test_notified_matches_receipt_receivers(spark):
    """ES keeps notified[] == distinct receipt receivers
    (ds-pool.ts:556-569); the model must preserve that invariant."""
    a = build_actions(spark, SF_DIR)
    bad = a.where(
        F.transform("receipts", lambda r: r["receiver"]) != F.col("notified")
    )
    assert bad.count() == 0


def test_usage_only_on_first_action(spark):
    """cpu/net billed once per trx (base-parser.ts:72-92): non-first
    actions carry zero usage."""
    a = build_actions(spark, SF_DIR)
    from pyspark.sql import Window

    w = Window.partitionBy("trx_id").orderBy("global_sequence")
    ranked = a.withColumn("rn", F.row_number().over(w))
    nonfirst_billed = ranked.where(
        (F.col("rn") > 1) & ((F.col("cpu_usage_us") > 0) | (F.col("net_usage_words") > 0))
    )
    assert nonfirst_billed.count() == 0


def test_regroup_pairs_share_digest_distinct_ordinals(spark):
    """Notification pairs: same (trx_id, act_digest), distinct
    action_ordinals (action-dedup.ts:44-57)."""
    a = build_actions(spark, SF_DIR)
    groups = a.groupBy("trx_id", "act_digest").agg(
        F.count("*").alias("n"),
        F.countDistinct("action_ordinal").alias("n_ord"),
    )
    assert groups.where(F.col("n") > 1).count() > 0  # pairs exist
    assert groups.where(F.col("n") != F.col("n_ord")).count() == 0


def test_transfer_struct_iff_transfer_action(spark):
    a = build_actions(spark, SF_DIR)
    assert a.where(
        (F.col("act.name") == "transfer") != F.col("transfer").isNotNull()
    ).count() == 0


def test_nested_filter_plan_is_narrow(spark):
    """The P7 disjunction compiles to a plain Filter over the scan —
    no Exchange, no Python eval (higher-order funcs stay JVM-side)."""
    a = build_actions(spark, SF_DIR)
    involved = (
        F.array_contains("notified", "user7")
        | F.exists("receipts", lambda r: r["receiver"] == "user7")
        | F.exists("act.authorization", lambda x: x["actor"] == "user7")
    )
    plan = a.where(involved)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_deltas_version_chains(spark):
    """Several versions per (code, table, scope, pk) so latest-state
    windows have real work to do."""
    d = build_deltas(spark, SF_DIR)
    multi = (
        d.groupBy("code", "table_name", "scope", "primary_key")
        .count()
        .where(F.col("count") > 1)
    )
    assert multi.count() > 0
    assert d.where((F.col("table_name") == "voters") & F.col("voters_data").isNull()).count() == 0
