"""Eval decontamination: planted overlaps, n-gram boundary semantics."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from aisdb_ray.stages import contamination as cont


def test_word_ngrams_block_boundaries():
    t = pa.table(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "a b c d",          # 2 trigram(s): 'a b c', 'b c d'
                "  x   y z  ",      # ragged whitespace: 1 trigram 'x y z'
                "p q",              # shorter than n: none
                "",                 # empty: none
            ],
        }
    )
    g = cont.word_ngrams_block(t, n=3)
    got = sorted(zip(g["doc_id"].to_pylist(), g["gram"].to_pylist()))
    assert got == [(1, "a b c"), (1, "b c d"), (2, "x y z")]


def test_contamination_planted():
    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 words
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                f"BENCH {shared} tail words here",          # benchmark
                f"clean doc with no overlap at all okay yes",  # train, clean
                f"prefix {shared} suffix",                   # train, hit
                f"{shared}",                                 # train, hit (exact)
            ],
        }
    )

    def bench_pred(b: pa.Table) -> pa.Array:
        return pa.array(np.array(b["doc_id"].to_pylist()) == 0)

    got = (
        cont.contamination(rd.from_pandas(docs), bench_pred, n=8)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert got["doc_id"].tolist() == [2, 3]
    # each hit shares exactly the one planted 8-gram
    assert got["n_shared"].tolist() == [1, 1]
