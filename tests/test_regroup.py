"""group_action_traces against the reference's own unit scenarios
(tests/unit/action-dedup.test.ts; bug #148 semantics)."""

from hyperion_history_api_spark.operators.regroup import group_action_traces

_SCHEMA = (
    "trx_id: string, action_ordinal: long, creator_action_ordinal: long, "
    "act_digest: string, global_sequence: long, receiver: string"
)


def _run(spark, rows):
    df = spark.createDataFrame(rows, _SCHEMA)
    out = group_action_traces(df).collect()
    return sorted(
        (
            r["trx_id"],
            r["act_digest"],
            r["canonical_ordinal"],
            tuple((x["ordinal"], x["receiver"]) for x in r["receipts"]),
        )
        for r in out
    )


def test_single_action_passthrough(spark):
    got = _run(spark, [("t1", 1, 0, "A", 1000, "eosio.token")])
    assert got == [("t1", "A", 1, ((1, "eosio.token"),))]


def test_notifications_merge_into_one_doc(spark):
    got = _run(
        spark,
        [
            ("t1", 1, 0, "A", 1000, "alice"),
            ("t1", 2, 1, "A", 1001, "bob"),
            ("t1", 3, 1, "A", 1002, "carol"),
        ],
    )
    assert got == [("t1", "A", 1, ((1, "alice"), (2, "bob"), (3, "carol")))]


def test_duplicate_independent_roots_stay_separate(spark):
    """Bug #148: same digest, both creator=0 -> two documents."""
    got = _run(
        spark,
        [("t1", 1, 0, "A", 1000, "x"), ("t1", 2, 0, "A", 1001, "x")],
    )
    assert got == [
        ("t1", "A", 1, ((1, "x"),)),
        ("t1", "A", 2, ((2, "x"),)),
    ]


def test_inline_action_with_different_digest_is_separate(spark):
    got = _run(
        spark,
        [("t1", 1, 0, "A", 1000, "alice"), ("t1", 2, 1, "B", 1001, "bob")],
    )
    assert got == [
        ("t1", "A", 1, ((1, "alice"),)),
        ("t1", "B", 2, ((2, "bob"),)),
    ]


def test_inline_heads_its_own_notification_chain(spark):
    got = _run(
        spark,
        [
            ("t1", 1, 0, "A", 1000, "alice"),
            ("t1", 2, 1, "B", 1001, "bob"),
            ("t1", 3, 2, "B", 1002, "carol"),
        ],
    )
    assert got == [
        ("t1", "A", 1, ((1, "alice"),)),
        ("t1", "B", 2, ((2, "bob"), (3, "carol"))),
    ]


def test_trx_isolation(spark):
    """Identical ordinals/digests in different transactions never mix."""
    got = _run(
        spark,
        [
            ("t1", 1, 0, "A", 1000, "alice"),
            ("t2", 1, 0, "A", 2000, "bob"),
            ("t2", 2, 1, "A", 2001, "carol"),
        ],
    )
    assert got == [
        ("t1", "A", 1, ((1, "alice"),)),
        ("t2", "A", 1, ((1, "bob"), (2, "carol"))),
    ]
