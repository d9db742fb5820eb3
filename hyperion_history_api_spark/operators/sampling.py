"""Deterministic hash sampling / dataset splitting — training-data
pipeline operators (beyond-reference, per the build brief).

A training pipeline needs REPRODUCIBLE sampling: the same document
must land in the same split on every run, on any cluster, regardless
of partitioning — so `rand()` and `df.sample` (partition-dependent)
are out. These operators key every decision on a salted md5 of the
row's stable id:

    bucket(id) = substr(md5(seed || id), 1, 4)    -- 16 bits, hex

and compare the HEX STRING against hex cutoffs — string comparison of
fixed-width lowercase hex is monotone in the integer value, and both
Spark and DuckDB produce identical md5 hex, so the assignment is
bit-reproducible across engines (which is exactly what the oracle
checks).

Scale: a single narrow projection per row (one md5 over the id, not
the payload); no shuffle, no state, trivially parallel at 100 TB.
Skew-free by construction (md5 uniformity).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = 1 << 16  # 4 hex digits


def _cutoff_hex(fraction: float) -> str:
    """Hex cutoff c such that P(bucket < c) ~ fraction (16-bit grid).

    fraction >= 1 returns "g": every 4-char hex bucket (digits 0-9a-f)
    is lexicographically below it, so the predicate keeps ALL rows.
    (format(65536) would be the 5-char "10000", which most 4-char hex
    strings compare ABOVE — a keep-everything fraction would silently
    keep ~1/16. Caught by the partition-invariance property test.)
    """
    n = int(round(fraction * _BUCKETS))
    if n >= _BUCKETS:
        return "g"
    return format(max(n, 0), "04x")


def hash_bucket(id_col: Column, seed: str) -> Column:
    return F.substring(F.md5(F.concat(F.lit(seed), id_col.cast("string"))), 1, 4)


def hash_sample(
    df: DataFrame, id_col: str, fraction: float, *, seed: str = "sample"
) -> DataFrame:
    """Deterministic Bernoulli sample: keep rows whose bucket falls
    under the fraction cutoff."""
    return df.where(hash_bucket(F.col(id_col), seed) < _cutoff_hex(fraction))


def hash_split(
    df: DataFrame,
    id_col: str,
    *,
    train: float = 0.8,
    val: float = 0.1,
    seed: str = "split",
    col_name: str = "split",
) -> DataFrame:
    """train/val/test assignment (test = remainder) as a derived
    column; same id -> same split everywhere, forever."""
    b = hash_bucket(F.col(id_col), seed)
    return df.withColumn(
        col_name,
        F.when(b < _cutoff_hex(train), "train")
        .when(b < _cutoff_hex(train + val), "val")
        .otherwise("test"),
    )


def split_case_sql(id_expr: str, *, train: float = 0.8, val: float = 0.1,
                   seed: str = "split") -> str:
    """The DuckDB-compatible SQL twin of :func:`hash_split` (shared by
    the oracle queries)."""
    t, v = _cutoff_hex(train), _cutoff_hex(train + val)
    b = f"substr(md5('{seed}' || CAST({id_expr} AS STRING)), 1, 4)"
    return (
        f"CASE WHEN {b} < '{t}' THEN 'train' "
        f"WHEN {b} < '{v}' THEN 'val' ELSE 'test' END"
    )


def sample_pred_sql(id_expr: str, fraction: float, *, seed: str = "sample") -> str:
    b = f"substr(md5('{seed}' || CAST({id_expr} AS STRING)), 1, 4)"
    return f"{b} < '{_cutoff_hex(fraction)}'"


def stratified_sample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    fractions: dict[str, float],
    *,
    default: float = 0.0,
    seed: str = "strat",
) -> DataFrame:
    """Per-stratum deterministic sampling — the language/source
    rebalancing step of a pretraining mix (downsample the dominant
    language, keep the tail): each stratum gets its own keep-fraction,
    decided by the same salted-md5 bucket as :func:`hash_sample`.

    Unlike ``DataFrame.sampleBy`` (seeded per-partition RNG: the kept
    set changes with partitioning), the assignment is a pure function
    of (seed, id) — bit-reproducible on any cluster and in the DuckDB
    oracle. One narrow projection, no shuffle, no skew.
    """
    cutoff = F.lit(_cutoff_hex(default))
    for value, frac in fractions.items():
        cutoff = F.when(
            F.col(stratum_col) == value, F.lit(_cutoff_hex(frac))
        ).otherwise(cutoff)
    return df.where(hash_bucket(F.col(id_col), seed) < cutoff)


def stratified_pred_sql(
    id_expr: str,
    stratum_expr: str,
    fractions: dict[str, float],
    *,
    default: float = 0.0,
    seed: str = "strat",
) -> str:
    """DuckDB twin of :func:`stratified_sample`'s keep predicate."""
    b = f"substr(md5('{seed}' || CAST({id_expr} AS STRING)), 1, 4)"
    whens = " ".join(
        f"WHEN {stratum_expr} = '{v}' THEN '{_cutoff_hex(f)}'"
        for v, f in fractions.items()
    )
    return f"{b} < (CASE {whens} ELSE '{_cutoff_hex(default)}' END)"


def global_shuffle(
    df: DataFrame, id_col: str, *, seed: str = "shuffle", key_name: str = "shuffle_key"
) -> DataFrame:
    """Deterministic global corpus shuffle: a total order by the salted
    md5 of the stable id (ties broken by the id itself, so the order is
    unique even under hash collisions).

    This is the shuffle a training pipeline runs before sequence
    packing / sharding. Physically it is ONE range-partitioned sort —
    Spark samples range boundaries and shuffles once; no window, no
    single-partition funnel — and because the key is a pure function of
    (seed, id), every run and every engine produces the identical
    permutation (epoch N = seed "epochN").
    """
    return df.withColumn(
        key_name, F.md5(F.concat(F.lit(seed), F.col(id_col).cast("string")))
    ).orderBy(key_name, id_col)


def shuffle_key_sql(id_expr: str, *, seed: str = "shuffle") -> str:
    return f"md5('{seed}' || CAST({id_expr} AS STRING))"


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    fraction: float,
    *,
    seed: str = "wsample",
) -> DataFrame:
    """Deterministic importance-weighted sampling — the resampling
    half of DSIR (Xie et al. 2023): keep a row iff

        u(id) < fraction * w / mean(w)        (clamped at 1)

    with u(id) = the 16-bit salted-md5 bucket of the stable id mapped
    to [0, 1). Expected kept fraction = ``fraction`` (exactly, when no
    row clamps); a row's fate is a pure function of (seed, id, its
    weight, the corpus mean weight) — partition-invariant and
    bit-reproducible in the DuckDB oracle, unlike RNG acceptance.

    Scale: ONE tiny mean-weight aggregate broadcast into a narrow
    filter projection — no shuffle of the corpus, no state. The
    comparison is integer-bucket < p*65536 (same double arithmetic in
    both engines)."""
    u = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(seed), F.col(id_col).cast("string"))), 1, 4
        ),
        16,
        10,
    ).cast("double")
    mean_w = df.agg(F.avg(weight_col).alias("__mw"))
    # explicit mean>0 guard: an all-zero-weight corpus keeps nothing
    # (NULL p fails the filter) instead of raising a divide-by-zero
    # under ANSI mode — and the guard must NOT go through
    # least(1.0, try_divide(...)), because least() skips NULL operands
    # and would silently turn the degenerate case into keep-all.
    # (Positive weights — e.g. exp(logweight) — never hit this, so the
    # SQL twin divides plainly.)
    p = F.when(
        F.col("__mw") > 0,
        F.least(
            F.lit(1.0),
            F.lit(fraction) * F.col(weight_col) / F.col("__mw"),
        ),
    )
    return (
        df.crossJoin(F.broadcast(mean_w))
        .where(u < p * F.lit(65536.0))
        .drop("__mw")
    )


def weighted_pred_sql(
    id_expr: str,
    weight_expr: str,
    mean_expr: str,
    fraction: float,
    *,
    seed: str = "wsample",
) -> str:
    """DuckDB twin of :func:`weighted_sample`'s keep predicate."""
    u = (
        f"CAST(concat('0x', substr(md5('{seed}' || "
        f"CAST({id_expr} AS STRING)), 1, 4)) AS BIGINT)"
    )
    return (
        f"{u} < least(1.0, {fraction} * ({weight_expr}) / ({mean_expr}))"
        " * 65536.0"
    )


def temperature_mix(
    df: DataFrame,
    *,
    group_col: str,
    id_col: str,
    weight_col: str,
    temperature: float = 2.0,
    fraction: float = 0.25,
    seed: str = "tmix",
) -> DataFrame:
    """Temperature-scaled source mixing — the multilingual/domain
    re-balancing rule (sampling share ∝ mass^(1/T); T=1 keeps natural
    proportions, T→∞ approaches uniform) used to up-weight small
    sources in a pretraining mix without a hand-written weight table.

    With per-source mass m_s = Σ weight (tokens/chars) and a total
    budget ``fraction × Σ m``, the per-source keep rate is

        f_s = min(1, fraction · Σm · m_s^(1/T) / (Z · m_s)),
        Z = Σ_t m_t^(1/T)

    and a doc survives iff its salted-md5 unit ``u(id) < f_s`` — the
    same deterministic acceptance as :func:`weighted_sample`, so the
    mix is partition-invariant and bit-reproducible in the oracle.

    Scale: one map-side-combining (source, Σweight) aggregate (rows =
    #sources, broadcast), a broadcast join back, and a narrow filter —
    the corpus is never shuffled. Returns kept rows with a ``__rate``
    column for the rollup."""
    mass = df.groupBy(group_col).agg(
        F.sum(weight_col).cast("double").alias("__m")
    )
    tot = mass.agg(
        F.sum("__m").alias("__tot"),
        F.sum(F.pow(F.col("__m"), 1.0 / temperature)).alias("__z"),
    )
    # zero-mass guard: a source whose every doc weighs 0 makes the
    # rate expression 0/0 = NaN, and least(1.0, NaN) returns 1.0
    # (Spark sorts NaN above every double) — i.e. the degenerate
    # group would be kept in FULL when its m^(1/T) share is 0. Same
    # least()-swallows-NaN hazard weighted_sample documents; rate is
    # pinned to 0 explicitly.
    rates = mass.crossJoin(F.broadcast(tot)).select(
        group_col,
        F.when(F.col("__m") <= 0, F.lit(0.0))
        .otherwise(
            F.least(
                F.lit(1.0),
                F.lit(fraction)
                * F.col("__tot")
                * F.pow(F.col("__m"), 1.0 / temperature)
                / (F.col("__z") * F.col("__m")),
            )
        )
        .alias("__rate"),
    )
    u = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(seed), F.col(id_col).cast("string"))), 1, 4
        ),
        16,
        10,
    ).cast("double")
    return df.join(F.broadcast(rates), group_col).where(
        u < F.col("__rate") * F.lit(65536.0)
    )


def quota_cap(
    df: DataFrame,
    *,
    group_col: str,
    quota: int,
    order_col: str,
    id_col: str,
    descending: bool = True,
) -> DataFrame:
    """Per-group QUOTA cap — the per-domain/per-source contribution
    limit of a pretraining mix (no single crawl domain may dominate
    the corpus, however large it is): within each ``group_col`` keep
    the top ``quota`` rows by ``order_col``, ties broken by
    ``id_col`` so the kept set is deterministic on any cluster.

    One shuffle on the group key, then a bounded rank inside each
    partition — ``row_number`` over (group, order) with an early cap.
    Unlike a fraction (:func:`stratified_sample`), the cap holds
    regardless of group size: a 10^9-doc domain contributes exactly
    ``quota`` docs, same as a 10^4-doc one. Skewed groups are the
    norm here (that is the point of the operator); the window sorts
    within the group's partition, and AQE splits oversized shuffle
    partitions before the sort.
    """
    from pyspark.sql import Window

    order = (
        F.col(order_col).desc() if descending else F.col(order_col).asc()
    )
    w = Window.partitionBy(group_col).orderBy(order, F.col(id_col).asc())
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= quota)
        .drop("__rk")
    )


def token_budget_cap(
    df: DataFrame,
    *,
    group_col: str,
    budget: int,
    tokens_col: str,
    order_col: str,
    id_col: str,
    descending: bool = True,
) -> DataFrame:
    """Per-group TOKEN-BUDGET cap — the budget form of
    :func:`quota_cap` (mixes are specified in tokens, not documents):
    walk each group in (``order_col``, ``id_col``) order and keep
    rows while the RUNNING token total stays within ``budget``; the
    first row that crosses the line is kept iff it starts inside it
    (standard greedy prefix — a group always contributes its best
    prefix, so a single over-budget doc at rank 1 still enters).

    Same single shuffle as :func:`quota_cap`; the running total is a
    cumulative window sum (rows unbounded-preceding..current), no
    second pass and no driver loop.
    """
    from pyspark.sql import Window

    order = (
        F.col(order_col).desc() if descending else F.col(order_col).asc()
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy(order, F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = F.sum(F.col(tokens_col).cast("long")).over(w)
    return (
        df.withColumn("__run", running)
        .where(F.col("__run") - F.col(tokens_col) < budget)
        .drop("__run")
    )
