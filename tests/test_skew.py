"""Skew-aware join strategies (operators/skew.py): salted-join
result equivalence, plan shape, profile determinism, and the
strategy chooser's three decisions."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from hyperion_history_api_spark.operators.skew import (
    choose_join_strategy,
    key_skew_profile,
    salted_join,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.001")


def _events(spark):
    return spark.read.parquet(f"{SF_DIR}/events.parquet")


def _dim(ev):
    return ev.groupBy("event_type").agg(
        F.count("*").alias("type_events"),
        F.round(F.avg("value"), 4).alias("type_avg_value"),
    )


def _rows(df):
    return sorted((tuple(r) for r in df.collect()), key=repr)


def test_salted_join_equals_plain_inner_across_salt_counts(spark):
    ev = _events(spark).select("event_id", "event_type", "value")
    dim = _dim(_events(spark))
    plain = _rows(ev.join(dim, "event_type"))
    for salts in (1, 3, 8):
        got = _rows(
            salted_join(
                ev, dim, "event_type", salt_id_col="event_id", salts=salts
            )
        )
        assert got == plain, f"salts={salts} diverged from plain join"


def test_salted_join_equals_plain_left_with_unmatched_fact_rows(spark):
    """Left join: fact rows whose key has no dim row must survive
    exactly once (not salts times, not zero)."""
    ev = _events(spark).select("event_id", "event_type", "value")
    dim = _dim(_events(spark)).where(F.col("event_type") != "error")
    plain = _rows(ev.join(dim, "event_type", "left"))
    got = _rows(
        salted_join(
            ev, dim, "event_type", salt_id_col="event_id", salts=5, how="left"
        )
    )
    assert got == plain
    n_error = sum(1 for r in got if r[0] == "error")
    assert n_error > 0 and any(r[-1] is None for r in got if r[0] == "error")


def test_salted_join_plan_shape(spark):
    """The scale contract: the join key includes the salt (hot key
    spread over `salts` reduce tasks), the dim side carries a
    replication generator, and nothing broadcast — this path exists
    for broadcast-ineligible dims."""
    ev = _events(spark).select("event_id", "event_type", "value")
    dim = _dim(_events(spark))
    df = salted_join(ev, dim, "event_type", salt_id_col="event_id", salts=8)
    # At fixture scale Catalyst correctly broadcasts the 5-row dim;
    # emulate the broadcast-INELIGIBLE dim this path exists for.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "__salt" in plan
    assert "Generate" in plan  # explode(sequence(0, salts-1)) on dim
    assert "BroadcastHashJoin" not in plan


def test_profile_partition_invariant_and_deterministic(spark):
    ev = _events(spark)
    a = key_skew_profile(
        ev, "event_type", id_col="event_id", sample_fraction=0.25
    ).collect()
    b = key_skew_profile(
        ev.repartition(13, "event_id"),
        "event_type",
        id_col="event_id",
        sample_fraction=0.25,
    ).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    shares = [r["share"] for r in a]
    assert shares == sorted(shares, reverse=True)
    assert abs(sum(shares) - 1.0) < 1e-6


def test_chooser_broadcasts_small_dim(spark):
    ev = _events(spark).select("event_id", "event_type", "value")
    dim = _dim(_events(spark))
    df, strategy = choose_join_strategy(
        ev, dim, "event_type", salt_id_col="event_id"
    )
    assert strategy == "broadcast"
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_chooser_salts_when_profile_shows_hot_key(spark):
    """With broadcast ruled out, ~5 uniform event types profile at
    ~0.2 share each — above a 0.15 gate a single reduce task would
    carry 1/5 of the fact table, so the chooser salts."""
    ev = _events(spark).select("event_id", "event_type", "value")
    dim = _dim(_events(spark))
    df, strategy = choose_join_strategy(
        ev,
        dim,
        "event_type",
        salt_id_col="event_id",
        broadcast_rows=0,
        skew_share=0.15,
        sample_fraction=0.5,
    )
    assert strategy == "salted"
    assert _rows(df) == _rows(ev.join(dim, "event_type"))


def test_chooser_plain_shuffle_when_keys_spread(spark):
    """user_id (~150 distinct, uniform) profiles far below the gate:
    replication would add dim IO for nothing."""
    ev = _events(spark).select("event_id", "user_id", "value")
    dim = ev.groupBy("user_id").agg(F.count("*").alias("user_events"))
    df, strategy = choose_join_strategy(
        ev,
        dim,
        "user_id",
        salt_id_col="event_id",
        broadcast_rows=0,
        skew_share=0.15,
        sample_fraction=0.5,
    )
    assert strategy == "shuffle"
    assert _rows(df) == _rows(ev.join(dim, "user_id"))


def test_salted_join_null_keys_and_empty_sides(spark):
    """Null join keys match nothing in either form; empty fact/dim
    degrade identically to the plain join."""
    from pyspark.sql import Row

    fact = spark.createDataFrame(
        [Row(id=1, k="a"), Row(id=2, k=None), Row(id=3, k="b")]
    )
    dim = spark.createDataFrame([Row(k="a", v=10), Row(k=None, v=99)])
    for how in ("inner", "left"):
        plain = _rows(fact.join(dim, "k", how))
        got = _rows(
            salted_join(fact, dim, "k", salt_id_col="id", salts=4, how=how)
        )
        assert got == plain, f"how={how}"
    empty_dim = dim.where(F.lit(False))
    assert _rows(
        salted_join(fact, empty_dim, "k", salt_id_col="id", salts=4)
    ) == _rows(fact.join(empty_dim, "k"))
    empty_fact = fact.where(F.lit(False))
    assert (
        salted_join(empty_fact, dim, "k", salt_id_col="id", salts=4).count()
        == 0
    )


def test_notified_enrichment_served_through_chooser(spark):
    """The hot serving path (api/skew_q.py:hyp_notified_enrichment)
    is planned by choose_join_strategy: at fixture scale the receiver
    dim broadcasts (decision + BroadcastHashJoin pinned); with
    broadcast ruled out, the receiver key's heat (hot contract
    accounts ride in notified[] of most rows) trips the skew gate and
    the SAME serving code salts — result identical both ways."""
    from hyperion_history_api_spark.api.skew_q import _notified_enrichment
    from hyperion_history_api_spark.sources.lake import lake_actions

    a = lake_actions(spark, SF_DIR)
    df, strategy = _notified_enrichment(a)
    assert strategy == "broadcast"
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    want = _rows(df)
    assert want

    salted_df, salted_strategy = _notified_enrichment(
        a, broadcast_rows=0, skew_share=0.15, sample_fraction=0.5
    )
    assert salted_strategy == "salted"
    assert _rows(salted_df) == want


def test_salted_join_rejects_dim_preserving_join_types(spark):
    """right/full would emit `salts` null-extended copies of each
    unmatched dim row — salted_join refuses them, and the chooser
    routes such joins to the plain shuffle past broadcast size."""
    import pytest

    ev = _events(spark).select("event_id", "event_type", "value")
    dim = _dim(_events(spark))
    for how in ("right", "right_outer", "full", "full_outer", "outer"):
        with pytest.raises(ValueError, match="salted_join"):
            salted_join(
                ev, dim, "event_type", salt_id_col="event_id", how=how
            )
    df, strategy = choose_join_strategy(
        ev,
        dim,
        "event_type",
        salt_id_col="event_id",
        broadcast_rows=0,   # force past the broadcast gate
        skew_share=0.0,     # would otherwise always salt
        how="full",
    )
    assert strategy == "shuffle"
    assert _rows(df) == _rows(ev.join(dim, "event_type", "full"))


def test_catalog_stats_feed_the_chooser_without_planner_jobs(spark):
    """sources/stats.py: the first column_ndv call runs the analyze
    job and caches; afterwards the SAME cache key answers from the
    dict even when the supplied frame would error if any job ran —
    proof the hot path is O(1). Injected stats skip the chooser's
    persist+count entirely, and the stats-fed serving decision is
    result-identical to the statless one."""
    from hyperion_history_api_spark.api.skew_q import _notified_enrichment
    from hyperion_history_api_spark.sources.lake import lake_actions
    from hyperion_history_api_spark.sources.stats import (
        column_ndv,
        invalidate_stats,
    )

    key = f"test-stats-{SF_DIR}"
    invalidate_stats(key)
    ev = _events(spark)
    ndv = column_ndv(ev, "event_type", cache_key=key)
    assert ndv == ev.select("event_type").distinct().count()  # rsd tiny here

    poisoned = spark.range(1).select(
        F.raise_error(F.lit("job ran on the stats hot path")).alias(
            "event_type"
        )
    )
    assert column_ndv(poisoned, "event_type", cache_key=key) == ndv
    invalidate_stats(key)

    a = lake_actions(spark, SF_DIR)
    df_stats, strat_stats = _notified_enrichment(a, stats_key=SF_DIR)
    assert strat_stats == "broadcast"
    plan = df_stats._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    df_plain, strat_plain = _notified_enrichment(a)
    assert strat_plain == "broadcast"
    assert _rows(df_stats) == _rows(df_plain)


def test_ndv_sketch_incremental_merge_equals_full_rebuild(spark):
    """Mergeable-sketch ANALYZE (sources/stats.py): HLL unions are
    exact over sketches, so build(first half) + merge(second half)
    must give the SAME estimate as build(full) — the property that
    makes stat refresh O(increment) instead of a history rescan. Also
    pins the O(1) read (no table scan after the merge) and the empty-
    increment no-op."""
    from hyperion_history_api_spark.sources.stats import (
        invalidate_sketches,
        ndv_sketch_build,
        ndv_sketch_estimate,
        ndv_sketch_merge,
    )

    key = f"sketch-{SF_DIR}"
    invalidate_sketches(key)
    ev = _events(spark)
    half1 = ev.where(F.col("event_id") % 2 == 0)
    half2 = ev.where(F.col("event_id") % 2 == 1)

    ndv_sketch_build(half1, "user_id", cache_key=key)
    merged = ndv_sketch_merge(half2, "user_id", cache_key=key)
    full_key = f"sketch-full-{SF_DIR}"
    invalidate_sketches(full_key)
    full = ndv_sketch_build(ev, "user_id", cache_key=full_key)
    assert merged == full

    # empty increment: estimate unchanged, no error
    empty = ev.where(F.lit(False))
    assert ndv_sketch_merge(empty, "user_id", cache_key=key) == merged
    # stored sketch answers O(1) — and a merge without a base refuses
    assert ndv_sketch_estimate("user_id", cache_key=key) == merged
    import pytest

    with pytest.raises(KeyError, match="no sketch"):
        ndv_sketch_merge(ev, "user_id", cache_key="never-built")
    invalidate_sketches(key)
    invalidate_sketches(full_key)


def test_account_profiles_served_through_chooser(spark):
    """Round-7: the get_account page composition
    (api/endpoints_ext.py:_account_profiles) is planned by
    choose_join_strategy with the broadcast gate fed from catalog
    stats (NDV capped by the page's range width) — zero planner-time
    jobs on the hot path once the NDV is cached, decision + plan
    pinned, and the non-default salted branch is result-identical."""
    from hyperion_history_api_spark.api.endpoints_ext import (
        _account_profiles,
    )
    from hyperion_history_api_spark.sources.stats import (
        column_ndv,
        invalidate_stats,
    )

    key = f"{SF_DIR}#customer"
    invalidate_stats(key)
    invalidate_stats(f"{SF_DIR}#orders")
    df, strategy = _account_profiles(spark, SF_DIR)
    # round-8: the chooser also weighs the FACT side (orders at
    # fixture scale is far below fact_floor_rows), so the scan-
    # dominated page path now takes the hash join without the
    # broadcast build; forcing a 100-TB-sized fact term flips it back
    assert strategy == "shuffle_hash"
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan
    want = _rows(df)
    assert want
    big_df, big_strategy = _account_profiles(
        spark, SF_DIR, fact_rows=10_000_000
    )
    assert big_strategy == "broadcast"
    assert (
        "BroadcastHashJoin"
        in big_df._jdf.queryExecution().executedPlan().toString()
    )
    assert _rows(big_df) == want

    # the NDV is now cached: the chooser plans again with ZERO jobs
    # (a poisoned frame under the same key would raise if any ran)
    poisoned = spark.range(1).select(
        F.raise_error(F.lit("job ran on the stats hot path")).alias(
            "c_custkey"
        )
    )
    assert column_ndv(poisoned, "c_custkey", cache_key=key) > 0
    df2, strategy2 = _account_profiles(spark, SF_DIR)
    assert strategy2 == "shuffle_hash"
    assert _rows(df2) == want

    # past the broadcast gate the SAME serving code salts the
    # semi-join; the page result is strategy-invariant
    salted_df, salted_strategy = _account_profiles(
        spark, SF_DIR, broadcast_rows=0, skew_share=0.0
    )
    assert salted_strategy == "salted"
    assert _rows(salted_df) == want
    invalidate_stats(key)


def test_key_accounts_enriched_served_through_chooser(spark):
    """Round-7: the get_key_accounts details composition
    (api/nested.py:_key_accounts_enriched) is chooser-planned, fed
    the owner NDV from the stats cache (pre-filter upper bound —
    conservative toward NOT broadcasting), and strategy-invariant."""
    from hyperion_history_api_spark.api.nested import (
        _key_accounts_enriched,
    )
    from hyperion_history_api_spark.sources.stats import invalidate_stats

    key = f"{SF_DIR}#permissions"
    invalidate_stats(key)
    df, strategy = _key_accounts_enriched(spark, SF_DIR)
    # round-8 fact-side term: the permission log at fixture scale is
    # below fact_floor_rows, so the hash join wins (see
    # JOIN_CHOOSER_BENCH_r08); a 100-TB-sized fact flips to broadcast
    assert strategy == "shuffle_hash"
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan
    want = _rows(df)
    assert want
    big_df, big_strategy = _key_accounts_enriched(
        spark, SF_DIR, fact_rows=10_000_000
    )
    assert big_strategy == "broadcast"
    assert _rows(big_df) == want

    shuffled_df, shuffled_strategy = _key_accounts_enriched(
        spark, SF_DIR, broadcast_rows=0, skew_share=1.1
    )
    assert shuffled_strategy == "shuffle"
    assert _rows(shuffled_df) == want
    invalidate_stats(key)


def test_catalog_stats_persist_across_sessions(spark, tmp_path):
    """Round-7: the stats catalog persists NEXT TO THE LAKE — a fresh
    process loads it and plans its first query with ZERO analyze jobs
    (poisoned-frame proof), and incremental ANALYZE resumes from the
    stored sketch registers instead of rescanning history."""
    from hyperion_history_api_spark.sources.stats import (
        column_ndv,
        invalidate_sketches,
        invalidate_stats,
        load_stats,
        ndv_sketch_build,
        ndv_sketch_estimate,
        ndv_sketch_merge,
        persist_stats,
    )

    key = f"persist-{SF_DIR}"
    invalidate_stats(key)
    invalidate_sketches(key)
    ev = _events(spark)
    half1 = ev.where(F.col("event_id") % 2 == 0)
    half2 = ev.where(F.col("event_id") % 2 == 1)
    ndv = column_ndv(ev, "event_type", cache_key=key)
    est1 = ndv_sketch_build(half1, "user_id", cache_key=key)
    assert est1 > 0
    persist_stats(str(tmp_path))

    # "restart": wipe the process caches, load from the lake-side file
    invalidate_stats()
    invalidate_sketches()
    assert load_stats(str(tmp_path)) >= 2  # whole process cache persists
    poisoned = spark.range(1).select(
        F.raise_error(F.lit("job ran on the stats hot path")).alias(
            "event_type"
        )
    )
    assert column_ndv(poisoned, "event_type", cache_key=key) == ndv
    assert ndv_sketch_estimate("user_id", cache_key=key) == est1
    # incremental ANALYZE continues from the stored registers:
    # merge(second half) onto the loaded sketch == build(full)
    merged = ndv_sketch_merge(half2, "user_id", cache_key=key)
    invalidate_sketches(f"full-{key}")
    assert merged == ndv_sketch_build(ev, "user_id", cache_key=f"full-{key}")

    # missing file is a clean no-op, not an exception
    assert load_stats(str(tmp_path / "nowhere")) == 0
    invalidate_stats()
    invalidate_sketches()


def test_invalidate_stats_reaches_suffixed_table_keys(spark):
    """Round-7 ADVICE: serving planners register per-table NDVs under
    suffixed keys (``f"{sf_dir}#customer"`` — endpoints_ext.py:496,
    nested.py:630). ``invalidate_stats(sf_dir)`` must drop those too,
    or a refresh/retraction of the lake leaves the chooser planning on
    stale NDVs under every suffixed spelling."""
    from hyperion_history_api_spark.sources.stats import (
        column_ndv,
        invalidate_sketches,
        invalidate_stats,
        ndv_sketch_build,
        ndv_sketch_estimate,
    )

    ev = _events(spark)
    base = f"{SF_DIR}/sfx-test"
    invalidate_stats(base)
    ndv = column_ndv(ev, "event_type", cache_key=f"{base}#events")
    poisoned = spark.range(1).select(
        F.raise_error(F.lit("boom")).alias("event_type")
    )
    # cached: no job
    assert column_ndv(poisoned, "event_type", cache_key=f"{base}#events") == ndv
    # invalidating the BASE key reaches the suffixed entry
    invalidate_stats(base)
    import pytest

    with pytest.raises(Exception, match="boom"):
        column_ndv(poisoned, "event_type", cache_key=f"{base}#events")
    # ...same contract for the sketch cache (retraction path)
    ndv_sketch_build(ev, "user_id", cache_key=f"{base}#events")
    assert ndv_sketch_estimate("user_id", cache_key=f"{base}#events") > 0
    invalidate_sketches(base)
    with pytest.raises(KeyError):
        ndv_sketch_estimate("user_id", cache_key=f"{base}#events")
    # a base key that merely shares a PREFIX is untouched (boundary is
    # the '#' separator, not startswith on the raw string)
    invalidate_stats(None)
    column_ndv(ev, "event_type", cache_key=f"{base}2")
    invalidate_stats(base)
    assert column_ndv(poisoned, "event_type", cache_key=f"{base}2") >= 0
    invalidate_stats(None)
    invalidate_sketches(None)


def test_load_stats_normalizes_stored_keys(spark, tmp_path):
    """Round-7 ADVICE: a catalog file holding RELATIVE keys (older
    format / hand-edited / copied between hosts) must load into
    entries the normalized lookup and invalidation paths can reach —
    load_stats applies _norm_key symmetrically with every other
    path."""
    import json

    from hyperion_history_api_spark.sources.stats import (
        column_ndv,
        invalidate_stats,
        load_stats,
    )

    rel = os.path.relpath(SF_DIR)  # relative spelling of the lake dir
    (tmp_path / "catalog_stats.json").write_text(
        json.dumps({"ndv": [[rel, "event_type", 7]], "sketches": []})
    )
    invalidate_stats(None)
    assert load_stats(str(tmp_path)) == 1
    poisoned = spark.range(1).select(
        F.raise_error(F.lit("boom")).alias("event_type")
    )
    # absolute-spelling lookup hits the loaded entry: zero jobs
    assert column_ndv(poisoned, "event_type", cache_key=SF_DIR) == 7
    # ...and absolute-spelling invalidation reaches it
    invalidate_stats(SF_DIR)
    import pytest

    with pytest.raises(Exception, match="boom"):
        column_ndv(poisoned, "event_type", cache_key=SF_DIR)
    invalidate_stats(None)
