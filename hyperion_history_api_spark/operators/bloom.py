"""Bloom-filter membership index for streaming exact dedup — the
trillion-token-scale pattern (Dolma's dedup and CCNet's hash lists
are public precedents): history membership compressed into a bit
set, arriving batches probed without joining the history corpus.

Determinism contract (what makes this oracle-checkable, unlike
library Bloom filters): the k bit positions of a fingerprint are

    pos_j(fp) = int(md5(fp || '#' || j)[:8 hex]) mod m,  j = 0..k-1

pure column expressions both engines compute bit-identically — so
the flagged set, INCLUDING any false positives, is a deterministic
function of (corpus, m, k), not of an engine's private hash mix.

Two physical forms of the same bit set:

- ``bloom_positions`` / ``bloom_probe_join``: the bit set as a
  DISTINCT positions table (<= m rows), probed with a broadcast
  equi-join on the position — everything JVM-side, Catalyst-visible.
  This is also the SCALE-OUT form: for a trillion-doc history m must
  grow past broadcast size (2^33+ bits), and then the same plan
  shuffles probe positions to bit-range partitions — a partitioned
  Bloom probe, no driver state.
- ``bloom_pack_bytes`` / ``bloom_probe_bytes``: the bit set packed
  into an m/8-byte numpy bitmap broadcast to executors, probed in an
  Arrow-batched pass — the constant-memory fast path when m fits
  (32 KiB at m=2^18), same flags bit-for-bit (pinned by
  tests/test_bloom.py).

False positives are the designed trade: P(fp) ~ (set_bits/m)^k.
``bloom_probe_join`` emits the bloom verdict NEXT TO the exact
verdict so a pipeline can route "bloom-hit" docs into the (rare,
expensive) exact confirmation join — probing cost stays O(batch),
history is touched only for the hits.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_M = 1 << 18  # bits; 32 KiB packed
DEFAULT_K = 4


def bloom_position(fp_col: Column, j: int, m: int = DEFAULT_M) -> Column:
    """Bit position j of a fingerprint: first 32 bits of
    md5(fp || '#' || j), mod m. Pure JVM column expression."""
    h = F.md5(F.concat_ws("#", fp_col, F.lit(str(j))))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % m).alias(
        f"pos{j}"
    )


def bloom_positions(
    history: DataFrame, fp_col: str, *, m: int = DEFAULT_M, k: int = DEFAULT_K
) -> DataFrame:
    """The bit set as a one-column DataFrame ``pos`` (distinct,
    <= m rows): k position expressions per history row, exploded and
    deduplicated. One narrow projection + one distinct exchange whose
    output is bounded by m regardless of history size."""
    return (
        history.select(
            F.explode(
                F.array(
                    *[
                        bloom_position(F.col(fp_col), j, m)
                        for j in range(k)
                    ]
                )
            ).alias("pos")
        )
        .distinct()
    )


def bloom_probe_join(
    batch: DataFrame,
    positions: DataFrame,
    fp_col: str,
    id_col: str,
    *,
    m: int = DEFAULT_M,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Probe a batch against the positions form of the bit set:
    ``(id, fp, bloom_hit)`` where bloom_hit <=> all k positions of
    the fingerprint are set. The positions table broadcasts while it
    fits; past broadcast size the same equi-join runs partitioned on
    ``pos`` — the scale-out Bloom probe.

    The broadcast hint is CONDITIONAL on m: the positions table is at
    most m rows, so it is hinted only while its worst-case packed size
    (m longs) stays under ~64 MB. Past that (the 2^33-bit trillion-doc
    sizing) no hint is applied and the optimizer plans a partitioned
    equi-join on ``pos`` — forcing the hint there would materialize a
    multi-GB broadcast on the driver."""
    probe = batch.select(
        F.col(id_col),
        F.col(fp_col),
        F.explode(
            F.map_from_arrays(
                F.array(*[F.lit(j) for j in range(k)]),
                F.array(
                    *[bloom_position(F.col(fp_col), j, m) for j in range(k)]
                ),
            )
        ).alias("j", "pos"),
    )
    # m rows x ~24B in-plan row width; 64MB gate => m <= ~2^21 hinted
    pos_side = (
        F.broadcast(positions) if m * 24 <= 64 * 1024 * 1024 else positions
    )
    # count(*) == k, not count_distinct(j): ``positions`` is a DISTINCT
    # bit set (bloom_positions dedups), so each of the k probe rows of
    # a doc matches at most one position row and (id, j) pairs are
    # unique by construction — the distinct was a no-op that cost a
    # whole extra exchange pair (expand + re-shuffle) in the plan
    # (round-14, guide §2.4). Callers passing a non-distinct positions
    # frame must dedup it first (the documented contract above).
    hits = (
        probe.join(pos_side, "pos")
        .groupBy(id_col)
        .agg((F.count(F.lit(1)) == k).alias("bloom_hit"))
    )
    return (
        batch.select(id_col, fp_col)
        .join(hits, id_col, "left")
        .withColumn("bloom_hit", F.coalesce("bloom_hit", F.lit(False)))
    )


def bloom_pack_bytes(
    positions: DataFrame, *, m: int = DEFAULT_M
) -> bytes:
    """Pack the positions table into an m/8-byte bitmap. The collect
    is bounded by m (<= m rows of one long), not by history size —
    the same documented driver-side-sketch budget as the PQ codebook
    sample; at m=2^18 it is 32 KiB."""
    import numpy as np

    bits = np.zeros(m // 8, dtype=np.uint8)
    pos = np.array(
        [r["pos"] for r in positions.collect()], dtype=np.int64
    )
    if pos.size:
        np.bitwise_or.at(bits, pos // 8, (1 << (pos % 8)).astype(np.uint8))
    return bits.tobytes()


def bloom_probe_bytes(
    batch: DataFrame,
    bloom: bytes,
    fp_col: str,
    id_col: str,
    *,
    m: int = DEFAULT_M,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Probe against the packed bitmap: Arrow-batched membership test
    under a broadcast 32 KiB constant — no join at all. Flags equal
    ``bloom_probe_join`` bit-for-bit (same position function)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("boolean")
    def _hit(fps: pd.Series) -> pd.Series:
        import hashlib

        import numpy as np

        bits = np.frombuffer(bloom, dtype=np.uint8)

        def one(fp: str) -> bool:
            for j in range(k):
                p = (
                    int(
                        hashlib.md5(f"{fp}#{j}".encode()).hexdigest()[:8], 16
                    )
                    % m
                )
                if not bits[p // 8] & (1 << (p % 8)):
                    return False
            return True

        return fps.map(one)

    return batch.select(
        id_col, fp_col, _hit(F.col(fp_col)).alias("bloom_hit")
    )


from ..udf_compat import pickle_by_value as _pbv  # noqa: E402

_pbv(__name__)
