"""Real byte-pair-encoding tokenization for the training-data pipeline
(beyond-reference, per the build brief's "token counting" family —
this is the merge-table-driven upgrade over the whitespace/regex
counters in ``functions/text.py``).

Train/ship split (the same pattern as PQ codebook training in
``operators/similarity.pq_train``): merges are learned ONCE, offline,
on a deterministic corpus sample (driver-side — BPE training is
inherently sequential: merge i+1 depends on the counts after merge i),
then shipped to executors as a broadcast rank table. Encoding is the
distributed hot path: an Arrow-batched ``mapInPandas`` pass — Python
is unavoidable here (iterative data-dependent merging has no Column
expression form), so it is the batched slow-path, never row-at-a-time,
and a per-batch word cache collapses the Zipf head (each distinct word
is encoded once per batch, not once per occurrence).

Determinism: ties in pair frequency break lexicographically, so the
learned merge list — and therefore every token count — is a pure
function of (sample, num_merges); the unit suite pins Spark output to
the pure-Python reference encoder.
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

END = "</w>"  # end-of-word marker: merges cannot cross word boundaries


def _words(text: str) -> list[str]:
    return text.split()


def _word_symbols(word: str) -> tuple[str, ...]:
    return tuple(word) + (END,)


def train_bpe(texts: list[str], num_merges: int) -> list[tuple[str, str]]:
    """Learn ``num_merges`` merges from ``texts`` (classic BPE,
    Sennrich et al. 2016). Offline/driver-side by design — see module
    docstring. Deterministic: frequency ties break lexicographically.
    """
    vocab: Counter[tuple[str, ...]] = Counter()
    for t in texts:
        for w in _words(t):
            vocab[_word_symbols(w)] += 1
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: Counter[tuple[str, str]] = Counter()
        for sym, freq in vocab.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += freq
        if not pairs:
            break
        best = max(pairs.items(), key=lambda kv: (kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab: Counter[tuple[str, ...]] = Counter()
        for sym, freq in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(sym):
                if i < len(sym) - 1 and sym[i] == best[0] and sym[i + 1] == best[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] += freq
        vocab = new_vocab
    return merges


def encode_word(
    word: str, ranks: dict[tuple[str, str], int], cache: dict[str, tuple[str, ...]]
) -> tuple[str, ...]:
    """Greedy BPE encode of one word: repeatedly apply the
    lowest-rank applicable merge (reference encoder; also runs inside
    the executor batches)."""
    hit = cache.get(word)
    if hit is not None:
        return hit
    sym = list(_word_symbols(word))
    while len(sym) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i < 0:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    out = tuple(sym)
    cache[word] = out
    return out


def encode_text(text: str, ranks: dict[tuple[str, str], int],
                cache: dict[str, tuple[str, ...]] | None = None) -> list[str]:
    cache = {} if cache is None else cache
    toks: list[str] = []
    for w in _words(text):
        toks.extend(encode_word(w, ranks, cache))
    return toks


BPE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("bpe_tokens", T.IntegerType()),
        T.StructField("distinct_tokens", T.IntegerType()),
        T.StructField("ws_tokens", T.IntegerType()),
        T.StructField("compression", T.DoubleType()),
    ]
)


def bpe_token_stats(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Distributed encode: per-document BPE token count, distinct-token
    count, whitespace-token count and chars-per-token compression.

    One ``mapInPandas`` pass (Arrow batches in and out); the merge rank
    table rides the closure (a few KB — the task-binary twin of a
    broadcast var), and the per-batch word cache makes the cost per
    batch ~O(distinct words), not O(occurrences).
    """
    ranks = {pair: i for i, pair in enumerate(merges)}

    def encode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cache: dict[str, tuple[str, ...]] = {}
            ids, n_bpe, n_dist, n_ws, comp = [], [], [], [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                text = text or ""
                toks = encode_text(text, ranks, cache)
                words = _words(text)
                chars = sum(len(w) for w in words)
                ids.append(doc_id)
                n_bpe.append(len(toks))
                n_dist.append(len(set(toks)))
                n_ws.append(len(words))
                # raw ratio; the caller rounds with F.round so the
                # rounding rule (HALF_UP) matches the DuckDB oracle —
                # Python's round() is banker's and can differ at .xxxx5
                comp.append(chars / len(toks) if toks else 0.0)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "bpe_tokens": pd.Series(n_bpe, dtype="int32"),
                    "distinct_tokens": pd.Series(n_dist, dtype="int32"),
                    "ws_tokens": pd.Series(n_ws, dtype="int32"),
                    "compression": pd.Series(comp, dtype="float64"),
                }
            )

    return docs.select(id_col, text_col).mapInPandas(
        encode_batches, schema=BPE_STATS_SCHEMA
    )


from ..udf_compat import pickle_by_value as _pbv  # noqa: E402

_pbv(__name__)
