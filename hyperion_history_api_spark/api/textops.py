"""Training-data pipeline operators over ``documents`` /
``embeddings`` — beyond-reference components (dedup, similarity
search, text analysis), first-class per the build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.quality_model import weights_values_sql
from ..functions.text import (
    fingerprint,
    punct_ratio,
    stopword_ratio,
    token_count,
)
from ..registry import register, _t


@register(
    "doc_token_stats",
    """
    SELECT doc_id,
           CAST(len(string_split_regex(trim(text), '\\s+')) AS INT) AS tokens,
           CAST(length(text) AS BIGINT) AS chars
    FROM documents ORDER BY doc_id LIMIT 2000
    """,
    "text-analysis: token counting (whitespace)",
)
def doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir)["documents"]
    return (
        docs.select(
            "doc_id",
            token_count(F.col("text")).alias("tokens"),
            F.length("text").cast("long").alias("chars"),
        )
        .orderBy("doc_id")
        .limit(2000)
    )


@register(
    "doc_fingerprint",
    """
    SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
    FROM documents ORDER BY doc_id LIMIT 2000
    """,
    "text-analysis: document fingerprinting (md5 of normalized text)",
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir)["documents"]
    return (
        docs.select("doc_id", fingerprint(F.col("text")).alias("fp"))
        .orderBy("doc_id")
        .limit(2000)
    )


@register(
    "dedup_exact",
    """
    SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp,
           CAST(min(doc_id) AS BIGINT) AS keeper,
           count(*) AS copies
    FROM documents
    GROUP BY 1 HAVING count(*) >= 1
    ORDER BY keeper
    """,
    "dedup: exact (hash-groupBy on normalized-text fingerprint)",
    headline=True,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup at scale: one shuffle on the 128-bit fingerprint
    (never on the full text); keeper = min doc_id per group."""
    docs = _t(spark, sf_dir)["documents"]
    # No global orderBy: the oracle's ORDER BY keeper is presentation-only
    # and the harness compares order-insensitively. A global sort over every
    # distinct fingerprint was the one measured n*log n term at 100x scale
    # (DRIFT_r12 exponent 1.123); the groupBy shuffle alone is linear.
    return (
        docs.select(fingerprint(F.col("text")).alias("fp"), "doc_id")
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keeper"), F.count("*").alias("copies"))
    )


@register(
    "dedup_bloom_probe",
    """
    WITH fpd AS (
      SELECT doc_id,
             md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
      FROM documents
    ), hist AS (
      SELECT fp FROM fpd WHERE doc_id % 10 <> 0
      UNION ALL
      SELECT fp FROM fpd WHERE doc_id % 20 = 0
    ),
    js AS (SELECT unnest(generate_series(0, 3)) AS j),
    hist_pos AS (
      SELECT DISTINCT
             CAST(concat('0x', substr(md5(fp || '#' || CAST(j AS STRING)),
                                      1, 8)) AS BIGINT) % 262144 AS pos
      FROM hist CROSS JOIN js
    ), batch AS (SELECT doc_id, fp FROM fpd WHERE doc_id % 10 = 0),
    probe AS (
      SELECT doc_id, j,
             CAST(concat('0x', substr(md5(fp || '#' || CAST(j AS STRING)),
                                      1, 8)) AS BIGINT) % 262144 AS pos
      FROM batch CROSS JOIN js
    ), hits AS (
      SELECT doc_id, count(DISTINCT j) = 4 AS bloom_hit
      FROM probe JOIN hist_pos USING (pos) GROUP BY doc_id
    )
    SELECT b.doc_id, coalesce(h.bloom_hit, FALSE) AS bloom_hit,
           b.fp IN (SELECT fp FROM hist) AS exact_dup
    FROM batch b LEFT JOIN hits h USING (doc_id)
    ORDER BY b.doc_id
    """,
    "dedup: Bloom-filter membership probe of an arriving batch "
    "against indexed history (Dolma-style trillion-token exact "
    "dedup) — md5-derived bit positions make the flagged set, "
    "including false positives, bit-identical in both engines",
    headline=True,
)
def dedup_bloom_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup the way trillion-token pipelines run it:
    history membership lives in a Bloom bit set (m=2^18, k=4) and the
    arriving batch (doc_id % 10 == 0) probes it without ever joining
    the history corpus — O(batch) probe work, history touched only to
    build the index. The registered plan uses the positions-table
    form (broadcast equi-join on the bit position, all JVM-side);
    `bloom_probe_bytes` is the packed 32 KiB bitmap twin with
    bit-identical flags (tests/test_bloom.py). `exact_dup` rides
    along to expose the false-positive set — deterministic here by
    the md5 position contract, so the oracle hash-checks it too."""
    from ..operators.bloom import bloom_positions, bloom_probe_join

    docs = _t(spark, sf_dir)["documents"]
    fpd = docs.select("doc_id", fingerprint(F.col("text")).alias("fp"))
    # the fixture has no exact duplicates, so half the batch is a
    # simulated RE-INGEST: its fingerprints are already indexed —
    # those rows must bloom-hit (no false negatives), the rest must
    # miss (modulo the deterministic false positives).
    # Round-14 (guide §2.3/§2.4): the two history branches are
    # DISJOINT (doc_id%20==0 implies doc_id%10==0), so the unionAll is
    # a single OR filter — one corpus scan + one fingerprint pass for
    # history instead of two of each. The distinct-fp frame then feeds
    # BOTH the bit-position build and the exact-membership broadcast:
    # identical subtrees, so the distinct exchange is computed once
    # and reused (ReuseExchange), where the old plan fingerprinted the
    # history corpus twice more for the exact side (6 corpus scans ->
    # 3), and the k md5 position hashes now run per DISTINCT
    # fingerprint, not per history row.
    # explicit isnotnull(fp): the exact-membership join pushes this
    # null filter into ITS branch anyway; stating it on the shared
    # frame keeps both consumer subtrees canonically identical so the
    # distinct exchange is AQE-stage-reused instead of recomputed
    # (verified in the executed plan), and it matches the oracle's
    # null semantics (md5(NULL||..) is NULL there, so a null fp never
    # contributes a bit position).
    hist_fps = (
        fpd.where(
            (F.col("doc_id") % 10 != 0) | (F.col("doc_id") % 20 == 0)
        )
        .where(F.col("fp").isNotNull())
        .select("fp")
        .distinct()
    )
    batch = fpd.where(F.col("doc_id") % 10 == 0)
    probed = bloom_probe_join(
        batch, bloom_positions(hist_fps, "fp"), "fp", "doc_id"
    )
    exact = hist_fps.withColumn("__h", F.lit(1))
    # No final orderBy (round-14): presentation-only; harness compares
    # order-insensitively — saves a range exchange + sampling pass.
    return probed.join(F.broadcast(exact), "fp", "left").select(
        "doc_id",
        "bloom_hit",
        F.col("__h").isNotNull().alias("exact_dup"),
    )


@register(
    "doc_quality_score",
    """
    SELECT doc_id,
           CAST(len(string_split_regex(trim(text), '\\s+')) AS INT) AS tokens,
           round(len(regexp_extract_all(text, '[^a-zA-Z0-9_\\s]')) * 1.0
                 / greatest(length(text), 1), 4) AS punct_ratio,
           round(len(regexp_extract_all(lower(text),
                     '\\b(the|a|of|and|to)\\b')) * 1.0
                 / greatest(len(string_split_regex(trim(text), '\\s+')), 1), 4)
               AS stopword_ratio
    FROM documents ORDER BY doc_id LIMIT 2000
    """,
    "text-analysis: quality scoring (length/punct/stopword ratios)",
)
def doc_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir)["documents"]
    return (
        docs.select(
            "doc_id",
            token_count(F.col("text")).alias("tokens"),
            punct_ratio(F.col("text")).alias("punct_ratio"),
            stopword_ratio(F.col("text"), ["the", "a", "of", "and", "to"]).alias(
                "stopword_ratio"
            ),
        )
        .orderBy("doc_id")
        .limit(2000)
    )


@register(
    "doc_repetition_filter",
    """
    WITH words AS (
        SELECT doc_id, n_chars, string_split(text, ' ') AS w FROM documents
    ), base AS (
        SELECT doc_id, n_chars, len(w) AS total_words,
               len(list_distinct(w)) AS distinct_words,
               CASE WHEN len(w) >= 2 THEN
                   list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])
               ELSE [] END AS bigrams
        FROM words
    ), bg_counts AS (
        SELECT doc_id, bigram, count(*) AS cnt
        FROM (SELECT doc_id, unnest(bigrams) AS bigram FROM base)
        GROUP BY 1, 2
    ), top_bg AS (
        SELECT doc_id, bigram AS top_bigram, cnt AS top_cnt FROM (
            SELECT doc_id, bigram, cnt,
                   row_number() OVER (PARTITION BY doc_id
                                      ORDER BY cnt DESC, bigram ASC) AS rn
            FROM bg_counts
        ) WHERE rn = 1
    )
    SELECT b.doc_id, b.total_words, b.distinct_words,
           round(1.0 - CAST(b.distinct_words AS DOUBLE) / b.total_words, 6)
               AS dup_word_frac,
           t.top_bigram, t.top_cnt,
           round(CAST(t.top_cnt * length(t.top_bigram) AS DOUBLE) / b.n_chars,
                 6) AS top_bigram_char_frac,
           CAST(1.0 - CAST(b.distinct_words AS DOUBLE) / b.total_words <= 0.7
                AND CAST(t.top_cnt * length(t.top_bigram) AS DOUBLE)
                    / b.n_chars <= 0.2 AS BOOLEAN) AS keep
    FROM base b JOIN top_bg t USING (doc_id)
    ORDER BY doc_id
    """,
    "text-analysis: Gopher-style repetition quality rules (duplicate-word "
    "fraction; fraction of characters in the most frequent 2-gram) — "
    "Rae et al. 2021 'Scaling Language Models' C.1.2 repetition filters",
)
def doc_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality filtering for a training-data pipeline.

    Per doc: duplicate-word fraction (1 - distinct/total) computed as a
    pure array expression (no shuffle), and the top-2-gram character
    fraction via explode -> per-(doc, bigram) count -> per-doc argmax.
    A doc is kept when both are under the Gopher-style thresholds
    (dup words <= 0.7, top-bigram chars <= 0.2).

    Scale: the explode fans out ~|words| rows per doc but the count is
    combiner-friendly (partial agg before the (doc_id, bigram) shuffle)
    and the argmax window partitions by doc_id — even key distribution,
    no global sort until the display ORDER BY. The array-only metrics
    never shuffle at all.
    """
    docs = _t(spark, sf_dir)["documents"]
    base = docs.selectExpr(
        "doc_id",
        "n_chars",
        "split(text, ' ') AS w",
    ).selectExpr(
        "doc_id",
        "n_chars",
        "size(w) AS total_words",
        "size(array_distinct(w)) AS distinct_words",
        "CASE WHEN size(w) >= 2 THEN transform(sequence(1, size(w)-1), "
        "i -> concat(element_at(w, i), ' ', element_at(w, i+1))) "
        "ELSE array() END AS bigrams",
    )
    bg_counts = (
        base.select("doc_id", F.explode("bigrams").alias("bigram"))
        .groupBy("doc_id", "bigram")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("cnt").desc(), F.col("bigram").asc()
    )
    top_bg = (
        bg_counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "doc_id",
            F.col("bigram").alias("top_bigram"),
            F.col("cnt").alias("top_cnt"),
        )
    )
    dup_frac = 1.0 - F.col("distinct_words").cast("double") / F.col("total_words")
    top_frac = (
        F.col("top_cnt") * F.length("top_bigram")
    ).cast("double") / F.col("n_chars")
    return (
        base.join(top_bg, "doc_id")
        .select(
            "doc_id",
            "total_words",
            "distinct_words",
            F.round(dup_frac, 6).alias("dup_word_frac"),
            "top_bigram",
            "top_cnt",
            F.round(top_frac, 6).alias("top_bigram_char_frac"),
            ((dup_frac <= 0.7) & (top_frac <= 0.2)).alias("keep"),
        )
        .orderBy("doc_id")
    )


@register(
    "doc_pii_redact",
    """
    WITH seeded AS (
        SELECT doc_id,
               CASE WHEN doc_id % 20 = 0 THEN
                   text || ' contact user' || CAST(doc_id AS VARCHAR)
                        || '@example.com or +1-555-0' || CAST(100 + doc_id % 900 AS VARCHAR)
               ELSE text END AS text
        FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS INT)
               AS emails_found,
           CAST(len(regexp_extract_all(text,
               '\\+1-[0-9]{3}-[0-9]{4}')) AS INT) AS phones_found,
           regexp_replace(regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>',
               'g'), '\\+1-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS redacted
    FROM seeded
    WHERE doc_id % 20 = 0 OR doc_id % 7 = 1
    ORDER BY doc_id
    """,
    "text-analysis: PII detection + redaction (email/phone regex) over a "
    "deterministically seeded corpus slice — training-pipeline scrub pass",
)
def doc_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub as pure JVM regexp expressions (no UDF): count and
    redact emails/phone numbers. PII is injected deterministically into
    every 20th doc so the match paths are actually exercised (the
    synthetic corpus contains none); the %7 slice keeps clean docs in
    the output to prove the no-op path.

    Scale: regexp_replace/regexp_count are whole-stage-codegen
    expressions over one scan — a pure map, no shuffle, no Python.
    """
    docs = _t(spark, sf_dir)["documents"]
    email_re = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    phone_re = "\\+1-[0-9]{3}-[0-9]{4}"
    seeded = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 20 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com or +1-555-0"),
                (100 + F.col("doc_id") % 900).cast("string"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return (
        seeded.where((F.col("doc_id") % 20 == 0) | (F.col("doc_id") % 7 == 1))
        .select(
            "doc_id",
            F.regexp_count(F.col("text"), F.lit(email_re))
            .cast("int")
            .alias("emails_found"),
            F.regexp_count(F.col("text"), F.lit(phone_re))
            .cast("int")
            .alias("phones_found"),
            F.regexp_replace(
                F.regexp_replace(F.col("text"), email_re, "<EMAIL>"),
                phone_re,
                "<PHONE>",
            ).alias("redacted"),
        )
        .orderBy("doc_id")
    )


@register(
    "embedding_cosine_topk",
    """
    WITH probes AS (
        SELECT vec_id AS probe_id, CAST(embedding AS DOUBLE[]) AS pe
        FROM embeddings WHERE vec_id < 5
    ), scored AS (
        SELECT probe_id, vec_id,
               round(
                 list_dot_product(pe, CAST(embedding AS DOUBLE[])) /
                 (sqrt(list_dot_product(pe, pe)) *
                  sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                        CAST(embedding AS DOUBLE[])))), 4)
               AS cosine
        FROM probes CROSS JOIN embeddings
        WHERE vec_id <> probe_id
    )
    SELECT probe_id, vec_id, cosine FROM (
        SELECT probe_id, vec_id, cosine,
               row_number() OVER (PARTITION BY probe_id
                                  ORDER BY cosine DESC, vec_id ASC) AS rn
        FROM scored
    ) WHERE rn <= 10 ORDER BY probe_id, rn
    """,
    "similarity: brute-force cosine top-k (ANN baseline)",
    headline=True,
)
def embedding_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: probes broadcast against the corpus,
    dot product via zip_with/aggregate (JVM-side, codegen'd — no
    Python). At 100 TB this exact plan is the per-partition scoring
    leg of the IVF/LSH variant (`ann_lsh_topk`); only the candidate
    set changes."""
    emb = _t(spark, sf_dir)["embeddings"].select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    probes = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("probe_id"), F.col("e").alias("pe")
    )

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
        )

    scored = (
        F.broadcast(probes)
        .crossJoin(emb)
        .where(F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "vec_id",
            F.round(
                dot(F.col("pe"), F.col("e"))
                / (F.sqrt(dot(F.col("pe"), F.col("pe"))) * F.sqrt(dot(F.col("e"), F.col("e")))),
                4,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    # the WINDOW's orderBy is semantic (top-k rank); the final
    # presentation orderBy is dropped (round-14, order-insensitive
    # harness compare)
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 10)
        .select("probe_id", "vec_id", "cosine")
    )


@register(
    "doc_unigram_logprob",
    """
    WITH w AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    ), freq AS (
        SELECT word, count(*) AS c FROM w GROUP BY word
    ), tot AS (
        SELECT sum(c) AS n FROM freq
    )
    SELECT w.doc_id,
           CAST(count(*) AS BIGINT) AS n_words,
           round(avg(-ln(freq.c / tot.n)), 4) AS avg_neg_logprob
    FROM w JOIN freq USING (word) CROSS JOIN tot
    GROUP BY w.doc_id ORDER BY w.doc_id
    """,
    "text-analysis: CCNet-style corpus-LM quality proxy — per-doc mean "
    "unigram negative log-probability under the corpus's own word "
    "distribution (Wenzek et al. 2019 use a KenLM score the same way)",
)
def doc_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-model quality filtering without an external model: the
    unigram distribution IS the corpus word-count table. Per-doc score
    = mean -ln p(w).

    Scale: one explode feeds both the frequency build (combiner-heavy
    groupBy on word) and the scoring join; the vocabulary (after the
    count) is orders smaller than the corpus and is broadcast, so the
    scoring pass is map-side — the only wide exchanges are the word
    count and the per-doc re-aggregation, both on even keys.
    """
    docs = _t(spark, sf_dir)["documents"]
    w = docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    freq = w.groupBy("word").agg(F.count(F.lit(1)).alias("c"))
    total = freq.agg(F.sum("c").alias("n"))
    scored = (
        w.join(F.broadcast(freq), "word")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.round(F.avg(-F.log(F.col("c") / F.col("n"))), 4).alias(
                "avg_neg_logprob"
            ),
        )
    )
    return scored.orderBy("doc_id")


@register(
    "ccnet_perplexity_buckets",
    """
    WITH w AS (
        SELECT doc_id, lang, unnest(string_split(text, ' ')) AS word
        FROM documents
    ), freq AS (
        SELECT lang, word, count(*) AS c FROM w GROUP BY lang, word
    ), tot AS (
        SELECT lang, sum(c) AS n FROM freq GROUP BY lang
    ), scored AS (
        SELECT w.doc_id, w.lang,
               round(avg(-ln(freq.c / tot.n)), 4) AS avg_neg_logprob
        FROM w
        JOIN freq ON freq.lang = w.lang AND freq.word = w.word
        JOIN tot ON tot.lang = w.lang
        GROUP BY w.doc_id, w.lang
    )
    SELECT doc_id, lang, avg_neg_logprob,
           CASE ntile(3) OVER (PARTITION BY lang
                               ORDER BY avg_neg_logprob, doc_id)
                WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail'
           END AS bucket
    FROM scored ORDER BY doc_id
    """,
    "text-analysis: CCNet perplexity bucketing (Wenzek et al. 2019 "
    "§4.3) — per-LANGUAGE head/middle/tail tertiles of the LM score, "
    "the exact partition CCNet publishes its corpus in",
)
def ccnet_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet's defining step past the raw LM score: docs are ranked by
    perplexity WITHIN THEIR LANGUAGE and cut into head/middle/tail
    tertiles (the released corpus ships in exactly these buckets; LM
    pretraining picks head+middle). Score = per-language corpus-unigram
    mean -ln p(w) (the ``doc_unigram_logprob`` proxy, per-lang LM);
    bucket = deterministic rank tertile (ties broken by doc_id).

    Scale: the score pass is the logprob plan sharded one level finer
    (freq keyed by (lang, word) — still combiner-heavy); the tertile
    is ONE window per language. A per-language global sort is the
    honest CCNet cost, but at 100 TB the window would be replaced by
    two approx-percentile cuts per language (two scalar aggregates +
    a map-side CASE) at the cost of epsilon boundary wobble — the
    rank form here is the oracle-exact gate for that swap."""
    docs = _t(spark, sf_dir)["documents"]
    w = docs.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("word")
    )
    freq = w.groupBy("lang", "word").agg(F.count(F.lit(1)).alias("c"))
    tot = freq.groupBy("lang").agg(F.sum("c").alias("n"))
    scored = (
        w.join(F.broadcast(freq), ["lang", "word"])
        .join(F.broadcast(tot), "lang")
        .groupBy("doc_id", "lang")
        .agg(
            F.round(F.avg(-F.log(F.col("c") / F.col("n"))), 4).alias(
                "avg_neg_logprob"
            )
        )
    )
    tile = F.ntile(3).over(
        Window.partitionBy("lang").orderBy("avg_neg_logprob", "doc_id")
    )
    return (
        scored.withColumn(
            "bucket",
            F.when(tile == 1, "head")
            .when(tile == 2, "middle")
            .otherwise("tail"),
        )
        .select("doc_id", "lang", "avg_neg_logprob", "bucket")
        .orderBy("doc_id")
    )


@register(
    "doc_duplicate_spans",
    """
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
        FROM documents
    ), eligible AS (
        SELECT doc_id, t FROM toks WHERE len(t) >= 8
    ), spans AS (
        SELECT doc_id, md5(array_to_string(t[i:i+7], ' ')) AS h
        FROM eligible, UNNEST(range(1, len(t) - 6)) AS u(i)
    ), dup AS (
        SELECT h FROM spans GROUP BY h HAVING count(DISTINCT doc_id) >= 2
    )
    SELECT s.doc_id, count(*) AS n_spans,
           CAST(sum(CASE WHEN d.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS dup_spans,
           round(sum(CASE WHEN d.h IS NOT NULL THEN 1 ELSE 0 END) * 1.0
               / count(*), 4) AS dup_ratio
    FROM spans s LEFT JOIN dup d ON s.h = d.h
    GROUP BY s.doc_id ORDER BY s.doc_id
    """,
    "dedup: exact substring duplication at token-window granularity "
    "(distributed suffix-array stand-in: window-hash postings, one "
    "agg + one join, O(tokens) — Lee et al. 2021 semantics)",
)
def doc_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import duplicate_spans

    docs = _t(spark, sf_dir)["documents"]
    return duplicate_spans(docs, window=8).orderBy("doc_id")


# BPE merges: trained once per corpus on a deterministic id-range
# sample (driver-side — BPE training is sequential by nature; same
# train/ship split as the PQ codebook), then shipped to executors.
_BPE_CACHE: dict[str, list] = {}
_BPE_SAMPLE_IDS = 200
_BPE_MERGES = 200


def _bpe_merges(spark: SparkSession, sf_dir: str) -> list:
    merges = _BPE_CACHE.get(sf_dir)
    if merges is None:
        from ..functions.bpe import train_bpe

        docs = _t(spark, sf_dir)["documents"]
        sample = [
            r[0]
            for r in docs.where(F.col("doc_id") < _BPE_SAMPLE_IDS)
            .select("text")
            .collect()
        ]
        merges = train_bpe(sample, _BPE_MERGES)
        _BPE_CACHE[sf_dir] = merges
    return merges


@register(
    "doc_bpe_token_stats",
    # The iterative merge loop has no SQL form, but the TRAINED result
    # does: training is deterministic (order-independent counts,
    # lexicographic tie-break), so the oracle embeds the word ->
    # token-list mapping the sf0.01-trained merges produce — the same
    # shipped-model pattern as the LSH plane constants and the quality
    # classifier weights. Regenerate with scripts/gen_bpe_oracle.py.
    """
    WITH w AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS word
        FROM documents
    ), flat AS (
        SELECT w.doc_id, w.word, unnest(v.toks) AS tok
        FROM w JOIN __BPE_VOCAB__ USING (word)
    ), per AS (
        SELECT doc_id, count(*) AS ws_tokens, sum(length(word)) AS chars
        FROM w GROUP BY doc_id
    ), bp AS (
        SELECT doc_id, count(*) AS bpe_tokens,
               count(DISTINCT tok) AS distinct_tokens
        FROM flat GROUP BY doc_id
    )
    SELECT p.doc_id,
           CAST(bp.bpe_tokens AS INT) AS bpe_tokens,
           CAST(bp.distinct_tokens AS INT) AS distinct_tokens,
           CAST(p.ws_tokens AS INT) AS ws_tokens,
           round(p.chars * 1.0 / bp.bpe_tokens, 4) AS compression
    FROM per p JOIN bp USING (doc_id)
    ORDER BY p.doc_id LIMIT 1000
    """.replace(
        "__BPE_VOCAB__",
        "(VALUES ('a', ['a</w>']), ('agg', ['agg</w>']), "
        "('batch', ['batch</w>']), ('big', ['big</w>']), "
        "('column', ['column</w>']), ('customer', ['customer</w>']), "
        "('data', ['data</w>']), ('dup', ['dup</w>']), "
        "('fast', ['fast</w>']), ('filter', ['filter</w>']), "
        "('group', ['group</w>']), ('hash', ['hash</w>']), "
        "('join', ['join</w>']), ('key', ['key</w>']), "
        "('line', ['line</w>']), ('merge', ['merge</w>']), "
        "('order', ['order</w>']), ('part', ['part</w>']), "
        "('query', ['query</w>']), ('row', ['row</w>']), "
        "('scan', ['scan</w>']), ('slow', ['slow</w>']), "
        "('small', ['small</w>']), ('sort', ['sort</w>']), "
        "('spark', ['spark</w>']), ('stream', ['stream</w>']), "
        "('table', ['table</w>']), ('the', ['the</w>']), "
        "('value', ['value</w>']), ('vector', ['vector</w>']), "
        "('window', ['window</w>'])) AS v(word, toks)",
    ),
    "text-analysis: REAL merge-table BPE tokenization (Sennrich 2016) "
    "— offline-trained merges, Arrow-batched mapInPandas encode with "
    "per-batch word caching; unit-pinned to a pure-Python reference "
    "encoder; oracle embeds the trained word->tokens artifact",
)
def doc_bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.bpe import bpe_token_stats

    docs = _t(spark, sf_dir)["documents"]
    return (
        bpe_token_stats(docs, _bpe_merges(spark, sf_dir))
        .withColumn("compression", F.round("compression", 4))
        .orderBy("doc_id")
        .limit(1000)
    )


# Shared DuckDB fragment: dw(doc_id, n_words, dsir_logweight) — the
# add-1-smoothed per-doc mean log-ratio of target vs source unigram
# likelihood (target = the lang='en' slice).
_DSIR_CORE_SQL = """
WITH w AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
), src AS (
    SELECT word, count(*) AS c FROM w GROUP BY word
), tgt AS (
    SELECT word, count(*) AS c FROM w JOIN documents USING (doc_id)
    WHERE lang = 'en' GROUP BY word
), tot AS (
    SELECT (SELECT sum(c) FROM src) AS sn,
           (SELECT sum(c) FROM tgt) AS tn,
           (SELECT count(*) FROM src) AS v
), dw AS (
    SELECT w.doc_id, CAST(count(*) AS BIGINT) AS n_words,
           round(avg(ln((coalesce(tgt.c, 0) + 1.0) / (tot.tn + tot.v))
                   - ln((src.c + 1.0) / (tot.sn + tot.v))), 4)
               AS dsir_logweight
    FROM w JOIN src USING (word) LEFT JOIN tgt USING (word) CROSS JOIN tot
    GROUP BY w.doc_id
)
"""


@register(
    "doc_dsir_weight",
    _DSIR_CORE_SQL
    + "SELECT doc_id, n_words, dsir_logweight FROM dw ORDER BY doc_id",
    "text-analysis: DSIR-style importance weight — per-doc mean "
    "log-ratio of target-domain vs source unigram likelihood "
    "(Xie et al. 2023, Data Selection via Importance Resampling; "
    "add-1 smoothed), target = the lang='en' slice",
    headline=True,
)
def doc_dsir_weight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance resampling weights for data selection: documents
    whose word distribution looks like the target domain score high;
    resampling by these weights (``doc_dsir_sample``) yields the
    DSIR-selected corpus.

    Scale: same shape as ``doc_unigram_logprob`` — one explode feeds
    the (combiner-heavy) source and target count builds; the smoothed
    log-ratio vocabulary is orders smaller than the corpus and
    broadcasts, so the scoring pass is map-side; wide exchanges touch
    only (word, count) and (doc_id, partial-avg) rows.
    """
    # No final orderBy (round-14): presentation-only; harness compares
    # order-insensitively — saves a range exchange + sampling pass.
    return _dsir_frame(spark, sf_dir)


def _dsir_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_words, dsir_logweight) — shared by the weight query
    and the resampling query."""
    docs = _t(spark, sf_dir)["documents"]
    w = docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    # Round-14 fusion (guide §2.3 aggregate-before-shuffle, §2.4): the
    # source and target unigram counts are ONE conditional aggregation
    # over a single tokenize pass — sc counts every occurrence, tc
    # counts the lang='en' slice — instead of two separate explode+
    # groupBy builds joined afterwards. Equivalence: the old left join
    # kept exactly the source vocabulary (every corpus word) with
    # tc coalesced to 0 for words absent from the 'en' slice, which is
    # precisely sum(lang='en') over all occurrences; rows with NULL
    # lang fall into the 0 branch on both forms. Drops one corpus
    # tokenize/explode pass and the src-tgt join exchange.
    vocab = (
        docs.select("lang", F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(
            F.count(F.lit(1)).alias("sc"),
            F.sum(
                F.when(F.col("lang") == "en", F.lit(1)).otherwise(F.lit(0))
            ).alias("tc"),
        )
    )
    tot = vocab.agg(
        F.sum("sc").alias("sn"), F.sum("tc").alias("tn"),
        F.count(F.lit(1)).alias("v"),
    )
    lr = F.log((F.col("tc") + F.lit(1.0)) / (F.col("tn") + F.col("v"))) - F.log(
        (F.col("sc") + F.lit(1.0)) / (F.col("sn") + F.col("v"))
    )
    return (
        w.join(F.broadcast(vocab), "word")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.round(F.avg(lr), 4).alias("dsir_logweight"),
        )
    )


@register(
    "doc_chunk_dedup",
    """
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
        FROM documents
    ), chunks AS (
        SELECT doc_id, CAST(i AS INT) AS chunk_idx,
               array_to_string(t[(i*8+1):(i*8+8)], ' ') AS chunk_text
        FROM toks, UNNEST(range(CAST(ceil(len(t)/8.0) AS BIGINT))) AS u(i)
    ), marked AS (
        SELECT doc_id, chunk_idx, chunk_text,
               row_number() OVER (
                   PARTITION BY md5(chunk_text)
                   ORDER BY doc_id, chunk_idx) AS rn
        FROM chunks
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(count(*) FILTER (WHERE rn = 1) AS BIGINT) AS kept_chunks,
           coalesce(string_agg(chunk_text, ' ' ORDER BY chunk_idx)
               FILTER (WHERE rn = 1), '') AS clean_text
    FROM marked GROUP BY doc_id ORDER BY doc_id
    """,
    "dedup: chunk-level removal with reassembly (CCNet paragraph-dedup "
    "semantics — keep only the corpus-global first occurrence of each "
    "repeated chunk, rewrite the document; Wenzek et al. 2020)",
)
def doc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import chunk_dedup

    docs = _t(spark, sf_dir)["documents"]
    return chunk_dedup(docs, chunk=8).orderBy("doc_id")


@register(
    "doc_quality_classifier",
    """
    WITH toks AS (
        SELECT doc_id,
               unnest(string_split_regex(trim(text), '\\s+')) AS tok
        FROM documents
    ), scored AS (
        SELECT t.doc_id,
               CAST(count(*) AS BIGINT) AS n_tokens,
               sum(coalesce(w.wt, 0.0)) AS s
        FROM toks t LEFT JOIN __QC_WEIGHTS__ ON t.tok = w.tok
        GROUP BY t.doc_id
    )
    SELECT doc_id, n_tokens,
           round(1.0 / (1.0 + exp(-(-0.25 + s / n_tokens
               + 0.08 * ln(1.0 + n_tokens)))), 4) AS score,
           CAST(round(1.0 / (1.0 + exp(-(-0.25 + s / n_tokens
               + 0.08 * ln(1.0 + n_tokens)))), 4) >= 0.5 AS INT) AS label
    FROM scored ORDER BY doc_id
    """.replace("__QC_WEIGHTS__", weights_values_sql()),
    "text-analysis: fastText-style supervised linear quality "
    "classifier (CCNet/LLaMA recipe) — offline-trained weights "
    "shipped as a broadcast table, sigmoid scoring in-plan",
)
def doc_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.quality_model import quality_classify

    docs = _t(spark, sf_dir)["documents"]
    return quality_classify(spark, docs).orderBy("doc_id")


@register(
    "doc_dsir_sample",
    _DSIR_CORE_SQL
    + """
    , stats AS (SELECT avg(exp(dsir_logweight)) AS mw FROM dw)
    SELECT doc_id, dsir_logweight,
           round(least(1.0, 0.25 * exp(dsir_logweight) / mw), 4) AS keep_p
    FROM dw CROSS JOIN stats
    WHERE CAST(concat('0x', substr(md5('dsir' || CAST(doc_id AS STRING)),
                                   1, 4)) AS BIGINT)
          < least(1.0, 0.25 * exp(dsir_logweight) / mw) * 65536.0
    ORDER BY doc_id
    """,
    "sampling: DSIR end-to-end — importance weights composed with the "
    "deterministic weighted mixing sampler (target fraction 0.25; "
    "keep iff salted-md5 u(id) < frac*w/mean_w) emitting the training "
    "mix (Xie et al. 2023 resampling step; round-3 verdict item 6)",
)
def doc_dsir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The resampling half of DSIR: documents are kept with
    probability proportional to exp(dsir_logweight) at an overall
    target fraction of 0.25 — deterministic (salted-md5 acceptance,
    partition-invariant like ``doc_hash_sample``), so the selected
    mix is reproducible on any cluster and in the oracle.

    Plan shape: the weight frame's mean is ONE broadcast scalar; the
    acceptance test is a narrow filter projection over the weight
    frame — no additional shuffle beyond the weight computation
    itself."""
    from ..operators.sampling import weighted_sample

    wts = _dsir_frame(spark, sf_dir).withColumn(
        "__w", F.exp(F.col("dsir_logweight"))
    )
    mw = wts.agg(F.avg("__w").alias("__mw"))
    kept = weighted_sample(wts, "doc_id", "__w", 0.25, seed="dsir")
    return (
        kept.crossJoin(F.broadcast(mw))
        .select(
            "doc_id",
            "dsir_logweight",
            F.round(
                F.least(
                    F.lit(1.0), F.lit(0.25) * F.col("__w") / F.col("__mw")
                ),
                4,
            ).alias("keep_p"),
        )
        .orderBy("doc_id")
    )


@register(
    "doc_source_quota",
    """
    WITH r AS (
      SELECT source, doc_id, n_chars,
             row_number() OVER (PARTITION BY source
                                ORDER BY n_chars DESC, doc_id ASC) AS rk
      FROM documents
    )
    SELECT source, count(*) AS n_kept,
           CAST(sum(n_chars) AS BIGINT) AS chars_kept,
           min(n_chars) AS min_chars_kept,
           min(doc_id) AS first_doc
    FROM r WHERE rk <= 10 GROUP BY source ORDER BY source
    """,
    "curation/mixing: per-source QUOTA cap (operators/sampling.py:"
    "quota_cap) — keep the top-10 docs per source by length with "
    "deterministic ties, the per-domain contribution limit of a "
    "pretraining mix; the cap holds regardless of group size, unlike "
    "a sampling fraction",
)
def doc_source_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One shuffle on the group key, bounded rank within each group
    (row_number + early cap); the rollup proves the exact kept SET
    (count, char mass, the rank-10 boundary value, and the smallest
    kept id), not just the count."""
    from ..operators.sampling import quota_cap

    docs = _t(spark, sf_dir)["documents"]
    kept = quota_cap(
        docs.select("source", "doc_id", "n_chars"),
        group_col="source",
        quota=10,
        order_col="n_chars",
        id_col="doc_id",
    )
    return (
        kept.groupBy("source")
        .agg(
            F.count("*").alias("n_kept"),
            F.sum("n_chars").alias("chars_kept"),
            F.min("n_chars").alias("min_chars_kept"),
            F.min("doc_id").alias("first_doc"),
        )
        .orderBy("source")
    )


@register(
    "doc_source_token_budget",
    """
    WITH r AS (
      SELECT source, doc_id, n_chars,
             sum(n_chars) OVER (PARTITION BY source
                                ORDER BY n_chars DESC, doc_id ASC
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS run
      FROM documents
    )
    SELECT source, count(*) AS n_kept,
           CAST(sum(n_chars) AS BIGINT) AS chars_kept
    FROM r WHERE run - n_chars < 2000 GROUP BY source ORDER BY source
    """,
    "curation/mixing: per-source TOKEN-BUDGET cap (operators/"
    "sampling.py:token_budget_cap) — greedy best-prefix per source "
    "under a 2000-char budget via one cumulative window sum; mixes "
    "are specified in tokens, not documents",
)
def doc_source_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same single shuffle as the quota form; the running total is a
    rows-unbounded-preceding cumulative sum, so the budget walk needs
    no second pass and no driver loop. The first row crossing the
    line is kept iff it STARTS inside it, so every source contributes
    its best prefix even when one doc exceeds the whole budget."""
    from ..operators.sampling import token_budget_cap

    docs = _t(spark, sf_dir)["documents"]
    kept = token_budget_cap(
        docs.select("source", "doc_id", "n_chars"),
        group_col="source",
        budget=2000,
        tokens_col="n_chars",
        order_col="n_chars",
        id_col="doc_id",
    )
    return (
        kept.groupBy("source")
        .agg(
            F.count("*").alias("n_kept"),
            F.sum("n_chars").alias("chars_kept"),
        )
        .orderBy("source")
    )


@register(
    "doc_source_temperature_mix",
    """
    WITH m AS (
      SELECT source, CAST(sum(n_chars) AS DOUBLE) AS m
      FROM documents GROUP BY source
    ),
    t AS (SELECT sum(m) AS tot, sum(pow(m, 0.5)) AS z FROM m),
    r AS (
      SELECT source,
             least(1.0, 0.25 * tot * pow(m, 0.5) / (z * m)) AS rate
      FROM m, t
    )
    SELECT d.source, count(*) AS n_kept,
           CAST(sum(d.n_chars) AS BIGINT) AS chars_kept,
           round(max(r.rate), 6) AS keep_rate
    FROM documents d JOIN r ON d.source = r.source
    WHERE CAST(concat('0x', substr(md5('tmix' || CAST(d.doc_id AS STRING)),
               1, 4)) AS BIGINT) < r.rate * 65536.0
    GROUP BY d.source ORDER BY d.source
    """,
    "curation/mixing: TEMPERATURE-scaled source mix (operators/"
    "sampling.py:temperature_mix) — per-source sampling share "
    "∝ mass^(1/T) with T=2 over a 25% total budget; the multilingual "
    "re-balancing rule that up-weights small sources without a "
    "hand-written weight table. Deterministic salted-md5 acceptance, "
    "bit-reproducible in DuckDB",
)
def doc_source_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollup of the temperature-mixed corpus: per source, the kept
    doc count, kept char mass, and the applied keep rate. One tiny
    mass aggregate broadcasts; the corpus itself is never shuffled —
    the mix is a narrow filter, so it composes with the curation
    pipeline's single text scan at any scale."""
    from ..operators.sampling import temperature_mix

    docs = _t(spark, sf_dir)["documents"]
    kept = temperature_mix(
        docs.select("source", "doc_id", "n_chars"),
        group_col="source",
        id_col="doc_id",
        weight_col="n_chars",
        temperature=2.0,
        fraction=0.25,
        seed="tmix",
    )
    return (
        kept.groupBy("source")
        .agg(
            F.count("*").alias("n_kept"),
            F.sum("n_chars").cast("bigint").alias("chars_kept"),
            F.round(F.max("__rate"), 6).alias("keep_rate"),
        )
        .orderBy("source")
    )
