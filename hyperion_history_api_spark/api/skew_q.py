"""Skew-handling queries — the heatmap profile and the salted hot-key
join (operators/skew.py), oracle-checked.

The reference ships skew handling as infrastructure config
(``scaling.routing_mode: "heatmap"``, deserializer.ts:612-645): hot
contract accounts get a worker pool instead of one queue. Here the
same capability is a query-plan property, so it is testable: the
profile is deterministic (hash-sampled) and the salted join's result
is provably identical to the plain join — the oracle for
``skew_join_salted`` IS the plain join SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register, _t
from ..sources.hyperion_model import ACTIONS_CTE


@register(
    "skew_key_profile",
    """
    WITH s AS (
      SELECT event_type FROM events
      WHERE substr(md5('skew' || CAST(event_id AS STRING)), 1, 4) < '4000'
    ), c AS (
      SELECT event_type, count(*) AS key_rows FROM s GROUP BY event_type
    ), t AS (SELECT sum(key_rows) AS tot FROM c)
    SELECT event_type, key_rows,
           round(key_rows * 1.0 / tot, 4) AS share
    FROM c CROSS JOIN t
    ORDER BY share DESC, event_type
    """,
    "scale/skew: deterministic key-heat profile (hash-sampled 25%) — "
    "the reference's heatmap routing input as an oracle-checked query",
)
def skew_key_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key share of the action log on a deterministic 25% sample;
    the planner input for ``choose_join_strategy``. The sample filter
    is the same salted-md5 bucket both engines compute bit-identically
    (cutoff 0.25 * 2^16 = 0x4000)."""
    from ..operators.skew import key_skew_profile

    ev = _t(spark, sf_dir)["events"]
    return key_skew_profile(
        ev, "event_type", id_col="event_id", sample_fraction=0.25
    )


@register(
    "skew_join_salted",
    """
    WITH d AS (
      SELECT event_type, count(*) AS type_events,
             round(avg(value), 4) AS type_avg_value
      FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type, e.value, d.type_events,
           d.type_avg_value
    FROM events e JOIN d USING (event_type)
    ORDER BY event_id
    """,
    "scale/skew: hot-key fact-dim join through the salted path "
    "(salts=8) — result provably equals the plain join, so the "
    "oracle is the unsalted SQL; plan audit pins the (key, salt) "
    "exchange and the dim-side replication generator",
)
def skew_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Enrich every event with its type's global stats through the
    salted join: `event_type` has ~5 distinct values, so an unsalted
    shuffle join would land the whole fact table on 5 reduce tasks
    no matter how many executors exist — the straggler shape the
    heatmap pool exists for. Salting with 8 sub-keys spreads each hot
    key over 8 tasks; the dim side (here deliberately NOT broadcast —
    this path exists for broadcast-ineligible dims) is replicated 8x
    by a generator, a dim-IO-for-parallelism trade taken only when
    the profile proves a straggler (`choose_join_strategy`)."""
    from ..operators.skew import salted_join

    ev = _t(spark, sf_dir)["events"]
    dim = ev.groupBy("event_type").agg(
        F.count("*").alias("type_events"),
        F.round(F.avg("value"), 4).alias("type_avg_value"),
    )
    fact = ev.select("event_id", "event_type", "value")
    return salted_join(
        fact, dim, "event_type", salt_id_col="event_id", salts=8
    ).orderBy("event_id")


def _notified_enrichment(
    a: DataFrame, stats_key: str | None = None, **chooser_kwargs
) -> tuple[DataFrame, str]:
    """Core of ``hyp_notified_enrichment``: explode the nested
    ``notified[]`` receivers into a fact stream and enrich each
    notification with its receiver's global profile through the
    COST-GATED join chooser (operators/skew.py:choose_join_strategy)
    — the first hot serving path planned by the chooser rather than a
    hand-picked strategy. Returns ``(df, strategy)`` so the plan audit
    can pin the decision.

    The dim is the fact's own groupBy, so its row count IS the
    receiver key's NDV — when ``stats_key`` names the lake, the
    chooser's broadcast gate is fed from the catalog-stats cache
    (sources/stats.py: one analyze job per process, O(1) after) and
    the hot path plans with ZERO planner-time jobs. Without a key the
    chooser falls back to its persist+count path."""
    from ..operators.skew import choose_join_strategy

    fact = a.select(
        "global_sequence",
        "block_num",
        F.explode("notified").alias("receiver"),
    )
    dim = fact.groupBy("receiver").agg(
        F.count("*").alias("recv_notifications"),
        F.max("block_num").alias("recv_last_block"),
    )
    if stats_key is not None and "dim_rows" not in chooser_kwargs:
        from ..sources.stats import column_ndv

        chooser_kwargs["dim_rows"] = column_ndv(
            fact, "receiver", cache_key=stats_key
        )
    joined, strategy = choose_join_strategy(
        fact, dim, "receiver", salt_id_col="global_sequence", **chooser_kwargs
    )
    return (
        joined.select(
            "global_sequence",
            "receiver",
            "recv_notifications",
            "recv_last_block",
        ).orderBy("global_sequence", "receiver"),
        strategy,
    )


@register(
    "hyp_notified_enrichment",
    ACTIONS_CTE
    + """
    , f AS (
      SELECT global_sequence, block_num, unnest(notified) AS receiver
      FROM actions
    ), d AS (
      SELECT receiver, count(*) AS recv_notifications,
             max(block_num) AS recv_last_block
      FROM f GROUP BY receiver
    )
    SELECT f.global_sequence, f.receiver, d.recv_notifications,
           d.recv_last_block
    FROM f JOIN d USING (receiver)
    ORDER BY global_sequence, receiver
    """,
    "scale/skew: notified-receiver enrichment served THROUGH the "
    "cost-gated join chooser (broadcast <-> salted <-> shuffle, "
    "operators/skew.py:choose_join_strategy) — the result is "
    "strategy-invariant (salted == broadcast == plain join), so the "
    "oracle is the plain-join SQL and the hash gate holds whichever "
    "branch the planner picks; the fixture decision and both "
    "non-default branches are pinned by tests/test_skew.py",
)
def hyp_notified_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every (action, notified-receiver) pair enriched with the
    receiver's notification count and last-seen block — the reference
    shape behind notified-account history pages
    (get_actions/functions.ts notified filter + account stats). The
    receiver key is exactly the heatmap-skewed dimension (hot
    contracts appear in notified[] of nearly every row they touch),
    so this is the join the chooser exists for: small dim at fixture
    scale -> broadcast; a 100-TB receiver dim past broadcast size
    with a hot key -> salted; uniform past broadcast -> shuffle."""
    from ..sources.lake import lake_actions

    df, _ = _notified_enrichment(lake_actions(spark, sf_dir), stats_key=sf_dir)
    return df


def _zorder_sql() -> str:
    from ..operators.zorder import zorder_terms

    body = " + ".join(
        zorder_terms("user_id", "(event_id div 16)", 16)
    ).replace(" div ", " // ")
    return f"""
    SELECT event_id, user_id, CAST({body} AS BIGINT) AS zkey
    FROM events WHERE event_id < 2000 ORDER BY event_id
    """


@register(
    "zorder_key_check",
    _zorder_sql(),
    "scale/layout: Morton (Z-order) clustering key over "
    "(user_id, block-scaled event_id) — pure integer arithmetic, the "
    "identical expression generated for both engines; the lake-layout "
    "technique that lets parquet min/max stats prune BOTH the account "
    "and the block-range predicate (Delta OPTIMIZE ZORDER analog)",
)
def zorder_key_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Z-order key as an oracle row: bit-interleaves the two hot
    filter dimensions of the action log. `cluster_by_zorder` writes
    files as compact (a, b) rectangles with this key (pruning proven
    by tests/test_zorder.py against real parquet footer stats);
    here the key itself is hash-checked so the layout is
    deterministic on any engine."""
    from ..operators.zorder import zorder_key

    ev = _t(spark, sf_dir)["events"]
    return (
        ev.where(F.col("event_id") < 2000)
        .select(
            "event_id",
            "user_id",
            zorder_key("user_id", "(event_id div 16)").alias("zkey"),
        )
        .orderBy("event_id")
    )


def _zorder_actions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The actions lake re-clustered on the Morton key of the two hot
    filter dimensions (account-carrying ``user_id``, block-scaled
    ``block_num``) — stored once via ``ensure_parquet`` like every
    other lake artifact. Files become compact (account, block)
    rectangles, so parquet min/max stats prune BOTH predicate
    dimensions of the reference's flagship scan
    (get_actions/functions.ts: account + block range), where the
    single-dim index sort prunes only the block side."""
    from ..operators.zorder import cluster_by_zorder
    from ..sources import hyperion_model as hm
    from ..sources.lake import ensure_parquet

    def build() -> DataFrame:
        return cluster_by_zorder(
            hm.build_actions(spark, sf_dir),
            "user_id",
            "(block_num div 16)",
            num_files=32,
        ).drop("__z")

    return ensure_parquet(
        spark, sf_dir, "actions_zorder", build, extra_key="zorder-v1"
    )


@register(
    "hyp_actions_zorder_scan",
    ACTIONS_CTE
    + """
    SELECT global_sequence, block_num, user_id, act_account,
           len(notified) AS n_notified
    FROM actions
    WHERE user_id = 7 AND block_num BETWEEN 200 AND 1200
    ORDER BY global_sequence
    """,
    "scale/layout: the flagship account+block-range scan served from "
    "a Z-order-clustered copy of the actions lake — both predicates "
    "reach the stored scan as PushedFilters AND both prune files via "
    "min/max stats (single-dim index sort prunes only the block side)",
)
def hyp_actions_zorder_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Account + block-range page query against the Z-ordered stored
    actions. Same result as the block-part lake (the oracle is the
    plain actions SQL); what changes is the LAYOUT: at 100 TB a hot
    account's rows live in ~sqrt(files) files instead of every file
    in the block range."""
    a = _zorder_actions(spark, sf_dir)
    return (
        a.where((F.col("user_id") == 7) & F.col("block_num").between(200, 1200))
        .select(
            "global_sequence",
            "block_num",
            "user_id",
            "act_account",
            F.size("notified").cast("long").alias("n_notified"),
        )
        .orderBy("global_sequence")
    )
