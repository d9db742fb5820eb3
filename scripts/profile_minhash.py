"""A/B the MinHash signature construction (round-3): interpreted
higher-order `transform` x48 per row vs explode + codegen'd min() aggs
vs a numpy-vectorized Arrow-batched band-hash UDF.

Usage: python scripts/profile_minhash.py [current|agg|np] [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from hyperion_history_api_spark.operators.dedup import (  # noqa: E402
    minhash_lsh_pairs,
    with_shingles,
)
from hyperion_history_api_spark.session import get_spark  # noqa: E402
from hyperion_history_api_spark.tables import load_tables  # noqa: E402

VARIANT = sys.argv[1] if len(sys.argv) > 1 else "current"
SF = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

NUM_HASHES, BANDS, T = 48, 24, 0.7


def agg_pairs(df, text_col, id_col):
    rows = NUM_HASHES // BANDS
    npart = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200"))
    raw = df.select(F.col(id_col), F.col(text_col)).repartition(npart, F.col(id_col))
    hashed = (
        with_shingles(raw, text_col, 3)
        .select(
            F.col(id_col),
            F.transform("__shingles", lambda s: F.xxhash64(s)).alias("__h"),
        )
        .repartition(npart, F.col(id_col))
    )
    # explode once; 48 codegen'd min aggs (partial agg combines per
    # partition before the shuffle)
    sh = hashed.select(F.col(id_col), F.explode("__h").alias("h"))
    mins = sh.groupBy(id_col).agg(
        *[
            F.min(F.xxhash64(F.lit(i).cast("long"), F.col("h"))).alias(f"m{i}")
            for i in range(NUM_HASHES)
        ]
    )
    banded = mins.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.xxhash64(
                            *[F.col(f"m{b * rows + r}") for r in range(rows)]
                        ).alias("band_val"),
                    )
                    for b in range(BANDS)
                ]
            )
        ).alias("band"),
    ).select(id_col, "band.band_id", "band.band_val")
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    ha = hashed.select(F.col(id_col).alias("id_a"), F.col("__h").alias("h_a"))
    hb = hashed.select(F.col(id_col).alias("id_b"), F.col("__h").alias("h_b"))
    from hyperion_history_api_spark.operators.dedup import _jaccard

    return (
        cand.join(ha, "id_a")
        .join(hb, "id_b")
        .withColumn("jaccard", F.round(_jaccard(F.col("h_a"), F.col("h_b")), 4))
        .where(F.col("jaccard") >= T)
        .select("id_a", "id_b", "jaccard")
    )


def np_pairs(df, text_col, id_col):
    """Signature pass as ONE Arrow-batched numpy UDF over the base
    hash array: 48 permutations = splitmix64(h ^ seed_i), per-doc mins
    via minimum.reduceat over the flattened batch, band values mixed
    from the r mins. JVM keeps shingling/base-hash + banding/join."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, LongType

    rows = NUM_HASHES // BANDS
    C1 = np.uint64(0xBF58476D1CE4E5B9)
    C2 = np.uint64(0x94D049BB133111EB)
    GOLD = np.uint64(0x9E3779B97F4A7C15)
    seeds = (np.arange(1, NUM_HASHES + 1, dtype=np.uint64) * GOLD)

    def mix64(x):
        x = (x ^ (x >> np.uint64(30))) * C1
        x = (x ^ (x >> np.uint64(27))) * C2
        return x ^ (x >> np.uint64(31))

    @pandas_udf(ArrayType(LongType()))
    def band_vals(hs: pd.Series) -> pd.Series:
        n = len(hs)
        out = [None] * n
        arrs = [np.asarray(a, dtype=np.int64) for a in hs]
        lens = np.array([len(a) for a in arrs], dtype=np.int64)
        ne = np.flatnonzero(lens > 0)
        if len(ne) == 0:
            return pd.Series(out)
        flat = np.concatenate([arrs[i] for i in ne]).view(np.uint64)
        starts = np.zeros(len(ne), dtype=np.int64)
        np.cumsum(lens[ne][:-1], out=starts[1:])
        mins = np.empty((len(ne), NUM_HASHES), dtype=np.uint64)
        for i in range(NUM_HASHES):
            y = mix64(flat ^ seeds[i])
            mins[:, i] = np.minimum.reduceat(y, starts)
        m = mins.reshape(len(ne), BANDS, rows)
        acc = np.full((len(ne), BANDS), GOLD, dtype=np.uint64)
        for j in range(rows):
            acc = mix64(acc ^ m[:, :, j])
        acc = acc.view(np.int64)
        for k, i in enumerate(ne):
            out[i] = acc[k].tolist()
        return pd.Series(out)

    npart = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200"))
    raw = df.select(F.col(id_col), F.col(text_col)).repartition(npart, F.col(id_col))
    hashed = (
        with_shingles(raw, text_col, 3)
        .select(
            F.col(id_col),
            F.transform("__shingles", lambda s: F.xxhash64(s)).alias("__h"),
        )
        .repartition(npart, F.col(id_col))
    )
    banded = (
        hashed.select(F.col(id_col), F.posexplode(band_vals(F.col("__h"))))
        .withColumnRenamed("pos", "band_id")
        .withColumnRenamed("col", "band_val")
    )
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    ha = hashed.select(F.col(id_col).alias("id_a"), F.col("__h").alias("h_a"))
    hb = hashed.select(F.col(id_col).alias("id_b"), F.col("__h").alias("h_b"))
    from hyperion_history_api_spark.operators.dedup import _jaccard

    return (
        cand.join(ha, "id_a")
        .join(hb, "id_b")
        .withColumn("jaccard", F.round(_jaccard(F.col("h_a"), F.col("h_b")), 4))
        .where(F.col("jaccard") >= T)
        .select("id_a", "id_b", "jaccard")
    )


def main() -> None:
    spark = get_spark(f"minhash-prof-{VARIANT}")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_tables(spark, SF)["documents"]

    def run():
        if VARIANT == "agg":
            return agg_pairs(docs, "text", "doc_id")
        if VARIANT == "np":
            return np_pairs(docs, "text", "doc_id")
        return minhash_lsh_pairs(
            docs, "text", "doc_id", num_hashes=NUM_HASHES, bands=BANDS, threshold=T
        )

    rows = run().count()  # warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        n = run().count()
        best = min(best, time.perf_counter() - t0)
    print({"variant": VARIANT, "sec": round(best, 3), "pairs": rows, "check": n})


if __name__ == "__main__":
    main()
