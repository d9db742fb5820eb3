"""fastText-style linear quality classifier — the supervised document
quality filter every major curation pipeline runs (CCNet trains a
fastText classifier against Wikipedia as the "high quality" class;
LLaMA/RedPajama reuse the same recipe). Reference repo has no
equivalent; this is a beyond-reference training-data operator per the
build brief.

Train/ship split (the same pattern as the PQ codebook in
``operators/similarity.pq_train`` and the BPE merges in
``functions/bpe.py``): the linear model — a bag-of-words weight
vector, a bias, and a length feature — is trained ONCE, offline,
against labeled data, then shipped to the cluster as a tiny literal
table. The weights below stand in for that offline artifact; what the
engine owns (and what the oracle checks bit-for-bit) is the SCORING
plan:

    z     = bias + (sum_t tf(t) * w[t]) / n_tokens
                 + w_len * ln(1 + n_tokens)
    score = sigmoid(z)        label = score >= 0.5

Scale: one explode over tokens, one broadcast hash join against the
31-row weight table (OOV tokens fall out of the join and contribute
0, exactly fastText's finite-vocab behavior), one hash aggregation
back to doc_id. No UDFs, no driver loops; at 100 TB the weight table
is still a broadcast and the agg combiner absorbs the token fan-out
map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Offline-trained model artifact (see module docstring). Literal so
# the DuckDB oracle can embed the identical table.
QC_BIAS = -0.25
QC_W_LEN = 0.08
QC_WEIGHTS: list[tuple[str, float]] = [
    ("join", 0.42), ("hash", 0.35), ("row", -0.12), ("batch", 0.21),
    ("scan", -0.3), ("customer", 0.18), ("column", 0.27), ("filter", 0.33),
    ("small", -0.08), ("slow", -0.55), ("merge", 0.25), ("order", 0.11),
    ("vector", 0.4), ("line", -0.05), ("data", 0.09), ("table", 0.14),
    ("agg", 0.3), ("value", -0.02), ("key", 0.2), ("stream", 0.28),
    ("window", 0.24), ("spark", 0.5), ("a", -0.4), ("group", 0.16),
    ("part", -0.1), ("big", 0.06), ("sort", 0.13), ("query", 0.31),
    ("fast", 0.45), ("the", -0.35), ("dup", -0.6),
]


def weights_values_sql() -> str:
    """The weight table as a SQL VALUES list (oracle embedding)."""
    rows = ", ".join(f"('{t}', {w})" for t, w in QC_WEIGHTS)
    return f"(VALUES {rows}) AS w(tok, wt)"


def quality_classify(
    spark: SparkSession,
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score every document with the shipped linear model.

    Output: (id, n_tokens, score, label) — score rounded to 4 decimals
    (the registry's float-determinism rule), label = score >= 0.5.
    """
    w = spark.createDataFrame(QC_WEIGHTS, ["tok", "wt"])
    toks = docs.select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok"),
    )
    scored = (
        toks.join(F.broadcast(w), "tok", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum(F.coalesce(F.col("wt"), F.lit(0.0))).alias("s"),
        )
    )
    z = (
        F.lit(QC_BIAS)
        + F.col("s") / F.col("n_tokens")
        + F.lit(QC_W_LEN) * F.log(F.lit(1.0) + F.col("n_tokens"))
    )
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return scored.select(
        F.col(id_col),
        "n_tokens",
        F.round(score, 4).alias("score"),
        (F.round(score, 4) >= 0.5).cast("int").alias("label"),
    )
