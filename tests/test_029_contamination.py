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


def test_dup_ngram_stats_planted():
    shared = "one two three four five six seven eight"  # exactly one 8-gram
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                f"{shared} tail0 tail1",       # 3 grams, 1 duplicated
                f"lead0 {shared}",             # 2 grams, 1 duplicated
                "u1 u2 u3 u4 u5 u6 u7 u8 u9",  # 2 grams, all unique
                "too short",                   # < 8 words: no row
            ],
        }
    )
    got = (
        cont.dup_ngram_stats(rd.from_pandas(docs), n=8, num_parts=4)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert got["doc_id"].tolist() == [0, 1, 2]
    assert got["n_grams"].tolist() == [3, 2, 2]
    assert got["n_dup"].tolist() == [1, 1, 0]


def test_dup_ngram_stats_within_doc_repeat_not_dup():
    # a gram repeated INSIDE one doc but in no other doc is not duplicated
    rep = "r1 r2 r3 r4 r5 r6 r7 r8"
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1],
            "text": [f"{rep} {rep}", "z1 z2 z3 z4 z5 z6 z7 z8"],
        }
    )
    got = (
        cont.dup_ngram_stats(rd.from_pandas(docs), n=8, num_parts=2)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    # doc 0 has 9 distinct grams (window slides across the doubled text)
    assert int(got.loc[got.doc_id == 0, "n_dup"].iloc[0]) == 0
    assert int(got.loc[got.doc_id == 1, "n_dup"].iloc[0]) == 0


def test_bigram_familiarity_counts_and_bits():
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                "a b c",    # pairs: (a b), (b c)
                "a b",      # pair:  (a b)
                "a b d",    # pairs: (a b), (b d)
                "solo",     # < 2 words: no row
            ],
        }
    )
    got = (
        cont.bigram_familiarity(rd.from_pandas(docs), num_parts=3)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    # corpus counts: "a b"=3 (bits 2), "b c"=1 (1), "b d"=1 (1)
    assert got["doc_id"].tolist() == [0, 1, 2]
    assert got["n_bigrams"].tolist() == [2, 1, 2]
    assert got["familiarity"].tolist() == [3, 2, 3]


def test_bit_length_matches_python():
    import numpy as np

    vals = np.array([1, 2, 3, 4, 7, 8, 1023, 1024, 5_000_000], dtype=np.int64)
    got = cont._bit_length(vals)
    assert got.tolist() == [int(v).bit_length() for v in vals]
