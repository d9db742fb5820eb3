"""Benchmark decontamination: flag training documents that share
n-grams with an evaluation set.

The standard training-data hygiene step (n-gram-overlap
decontamination as described in the GPT-3 and PaLM papers' appendix
methodology — public knowledge): a training doc is contaminated when
it contains any n-gram that also occurs in a benchmark/eval document.

Scale shape (the whole point):
- the EVAL side is small by construction (benchmark suites are MBs) —
  its distinct n-grams broadcast;
- the corpus side is ONE narrow pass: shingle -> explode -> broadcast
  hash join -> partially-aggregated groupBy(doc_id). No corpus-sized
  shuffle of raw text; the only exchange carries (doc_id, matched
  gram) rows, i.e. hits only.
- ``hashed=True`` joins on ``xxhash64(gram)`` instead of the gram
  string: 8-byte broadcast keys and join probes (use at 100 TB;
  collision odds ~ |eval grams| * |corpus grams| / 2^64 — negligible,
  but the oracle-gated query keeps string equality so the gate is
  exact).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import word_shingles


def _grams(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int,
    hashed: bool,
    repartition: bool = False,
) -> DataFrame:
    src = df.select(F.col(id_col), F.col(text_col))
    npart = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200"))
    if hashed:
        # round-14: same token-triple hash space as
        # dedup.hashed_shingles (functions.text.hashed_word_shingles)
        # — hashed grams from the two operators MUST stay joinable
        # (api/curation.py joins rep __h explodes against eval grams);
        # skipping the per-gram string build is also the measured 3.5x
        # shingle-leg win. The repartition sits BETWEEN the token
        # split and the shingle lambda so the lambda reads a bound
        # (exchange-materialized) token array — projection collapse
        # would otherwise re-evaluate the split per element.
        from ..functions.text import hashed_word_shingles, tokens

        toks = src.select(F.col(id_col), tokens(F.col(text_col)).alias("__t"))
        if repartition:
            toks = toks.repartition(npart, F.col(id_col))
        return toks.select(
            F.col(id_col),
            F.explode(hashed_word_shingles(F.col("__t"), n)).alias("g"),
        )
    if repartition:
        # compute parallelism must not be dictated by source file count
        # (a single parquet file would serialize the shingle pass)
        src = src.repartition(npart, F.col(id_col))
    g = F.explode(F.array_distinct(word_shingles(F.col(text_col), n))).alias("g")
    return src.select(F.col(id_col), g)


def decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    text_col: str,
    id_col: str,
    *,
    eval_id_col: str | None = None,
    n: int = 3,
    hashed: bool = False,
    collapse: bool = False,
    eval_grams: DataFrame | None = None,
) -> DataFrame:
    """Per contaminated training doc: how many distinct n-grams hit the
    eval set (``hit_ngrams``) and how many distinct eval docs were hit
    (``hit_eval_docs``). Docs with zero overlap are absent — anti-join
    this result to get the clean corpus.

    ``collapse=True`` runs the gram pass on one representative per
    token-sequence-identical group (``dedup.collapse_exact``) and
    expands hit counts over the members — identical output (identical
    token sequences have identical n-gram sets, hence identical hit
    counts), and the interpreted shingle/explode pass touches each
    distinct text once. Use whenever the corpus carries many exact
    copies; the collapse costs one fp-keyed shuffle of (id, text).
    """
    eval_id_col = eval_id_col or id_col
    if eval_grams is not None:
        # precomputed (__eval_id, g) frame — a streaming sink computes
        # the STATIC benchmark's grams once and persists them instead
        # of re-shingling + re-broadcasting the eval set every
        # micro-batch; the caller owns matching ``n``/``hashed``
        ev = eval_grams
    else:
        ev = _grams(
            eval_docs, text_col, eval_id_col, n, hashed
        ).withColumnRenamed(eval_id_col, "__eval_id")
    if collapse:
        from .dedup import collapse_exact

        reps, mapping = collapse_exact(docs, text_col, id_col)
        # post-r13 collapse, reps keep the source scan partitioning —
        # redistribute the (one-per-distinct-text) frame before the
        # interpreted gram pass
        rep_hits = (
            _grams(reps, text_col, id_col, n, hashed, repartition=True)
            .join(F.broadcast(ev), "g")
            .groupBy(id_col)
            .agg(
                F.countDistinct("g").alias("hit_ngrams"),
                F.countDistinct("__eval_id").alias("hit_eval_docs"),
            )
            .withColumnRenamed(id_col, "__rep")
        )
        return mapping.join(rep_hits, "__rep").select(
            id_col, "hit_ngrams", "hit_eval_docs"
        )
    tr = _grams(docs, text_col, id_col, n, hashed, repartition=True)
    return (
        tr.join(F.broadcast(ev), "g")
        .groupBy(id_col)
        .agg(
            F.countDistinct("g").alias("hit_ngrams"),
            F.countDistinct("__eval_id").alias("hit_eval_docs"),
        )
    )


def clean_corpus(
    docs: DataFrame,
    eval_docs: DataFrame,
    text_col: str,
    id_col: str,
    *,
    n: int = 3,
    min_hits: int = 1,
    hashed: bool = True,
    collapse: bool = False,
    eval_grams: DataFrame | None = None,
) -> DataFrame:
    """The filtering form: drop training docs with >= ``min_hits``
    contaminated n-grams. Broadcast anti-join on the (small)
    contaminated-id set — the corpus itself is never shuffled."""
    hits = decontaminate(
        docs, eval_docs, text_col, id_col, n=n, hashed=hashed,
        collapse=collapse, eval_grams=eval_grams,
    ).where(F.col("hit_ngrams") >= min_hits)
    return docs.join(
        F.broadcast(hits.select(id_col)), id_col, "left_anti"
    )
