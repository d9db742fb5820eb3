"""Regenerate the embedded BPE oracle artifact for
``doc_bpe_token_stats`` (api/textops.py).

The oracle-side twin of the shipped-model pattern used for the LSH
plane constants and the quality-classifier weights: BPE merges are a
TRAINED artifact (deterministic — counts are order-independent, ties
break lexicographically, see functions/bpe.train_bpe), so the DuckDB
oracle embeds the word -> token-list mapping the trained merges
produce over the correctness-gate corpus (sf0.01, the driver's
compare point). Re-run this script and paste the printed VALUES list
into the registration whenever _BPE_SAMPLE_IDS / _BPE_MERGES or the
fixture corpus change.
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hyperion_history_api_spark.api.textops import _BPE_MERGES, _BPE_SAMPLE_IDS
from hyperion_history_api_spark.functions.bpe import (
    _words,
    encode_word,
    train_bpe,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    texts = [
        r[0]
        for r in duckdb.sql(
            f"SELECT text FROM '{sf_dir}/documents.parquet' "
            f"WHERE doc_id < {_BPE_SAMPLE_IDS}"
        ).fetchall()
    ]
    merges = train_bpe(texts, _BPE_MERGES)
    ranks = {p: i for i, p in enumerate(merges)}
    words = sorted(
        {
            w
            for (t,) in duckdb.sql(
                f"SELECT text FROM '{sf_dir}/documents.parquet'"
            ).fetchall()
            for w in _words(t)
        }
    )
    cache: dict[str, tuple[str, ...]] = {}
    rows = ", ".join(
        "('{}', [{}])".format(
            w, ", ".join("'" + t.replace("'", "''") + "'" for t in encode_word(w, ranks, cache))
        )
        for w in words
    )
    print(f"(VALUES {rows}) AS v(word, toks)")


if __name__ == "__main__":
    main()
