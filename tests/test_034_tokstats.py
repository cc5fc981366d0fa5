"""Token-payload corpus statistics: bigram/unigram over list<int32>."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data as rd

from aisdb_ray.stages import tokstats


def _ds(rows):
    return rd.from_arrow(
        pa.table(
            {
                "tokens": pa.array([r[0] for r in rows], pa.list_(pa.int32())),
                "n_tok": pa.array([r[1] for r in rows], pa.int32()),
            }
        )
    )


def test_bigram_topk_counts_and_ties():
    rows = [
        ([1, 2, 3], 3),      # bigrams (1,2) (2,3)
        ([1, 2], 2),         # (1,2) again
        ([9], 1),            # too short: none
        ([5, 6], 3),         # len != n_tok: dropped by the contract filter
        ([2, 3], 2),         # (2,3) again
        ([0, 1], 2),         # (0,1) once
    ]
    got = tokstats.bigram_topk(_ds(rows), k=2).to_pandas()
    # (1,2) and (2,3) both count 2; k=2 keeps them, tie-ordering by code
    assert got[["tok_a", "tok_b", "n"]].values.tolist() == [[1, 2, 2], [2, 3, 2]]


def test_bigram_never_crosses_rows():
    rows = [([7, 8], 2), ([8, 9], 2)]
    got = tokstats.bigram_topk(_ds(rows), k=10).to_pandas()
    pairs = set(map(tuple, got[["tok_a", "tok_b"]].values.tolist()))
    assert pairs == {(7, 8), (8, 9)}  # no phantom (8, 8) across the boundary


def test_unigram_hist_exact():
    rows = [([1, 1, 2], 3), ([2, 3], 2), ([4], 0)]  # last row invalid
    got = (
        tokstats.unigram_hist(_ds(rows))
        .to_pandas().sort_values("token_id").reset_index(drop=True)
    )
    assert got.values.tolist() == [[1, 2], [2, 2], [3, 1]]


def test_oov_stats_planted():
    from aisdb_ray.stages import textstats

    common = "the quick fox"
    docs = pd.DataFrame(
        {
            "doc_id": ["a", "b", "c", "d"],
            "text": [
                f"{common} alpha",      # alpha df=1 -> OOV
                f"{common} beta",       # beta  df=1 -> OOV
                f"{common}",
                "",                      # no words: no row
            ],
        }
    )
    got = (
        textstats.oov_stats(rd.from_pandas(docs), min_df=2)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert got["doc_id"].tolist() == ["a", "b", "c"]
    assert got["n_words"].tolist() == [4, 4, 3]
    assert got["n_oov"].tolist() == [1, 1, 0]


def test_simpson_diversity_exact():
    t = pa.table(
        {
            "source": ["a", "a", "b"],
            "tokens": pa.array([[1, 1, 2], [1], [5, 5, 5]], pa.list_(pa.int32())),
            "n_tok": pa.array([3, 1, 3], pa.int32()),
        }
    )
    got = (
        tokstats.simpson_diversity(rd.from_arrow(t), key="source")
        .to_pandas().sort_values("source").reset_index(drop=True)
    )
    # a: counts {1:3, 2:1} -> n=4, sum_c2=10 ; b: {5:3} -> n=3, sum_c2=9
    assert got.values.tolist() == [["a", 4, 10], ["b", 3, 9]]


def test_winnow_fingerprints_window_and_dedup():
    import hashlib

    import numpy as np

    from aisdb_ray.stages import textstats

    words = ["w%d" % i for i in range(8)]
    docs = pd.DataFrame(
        {
            "doc_id": ["a", "b"],
            "text": [" ".join(words), "too short here"],  # b: 3 words < k
        }
    )
    got = textstats.winnow_fingerprints(rd.from_pandas(docs), k=4, w=4).to_pandas()
    assert got["doc_id"].tolist() == ["a"]
    # brute-force reference: 5 grams, windows at positions 3..4 (0-based)
    grams = [" ".join(words[i:i + 4]) for i in range(5)]
    hv = np.array(
        [int(hashlib.md5(g.encode()).hexdigest()[:8], 16) for g in grams]
    )
    sel = {hv[max(0, i - 3):i + 1].min() for i in range(3, 5)}
    assert int(got.n_fp.iloc[0]) == len(sel)
    assert int(got.fp_sum.iloc[0]) == sum(int(x) for x in sel)


def test_zipf_evidence_hand_case():
    # counts: token 7 -> 4, token 3 -> 2, token 9 -> 1
    rows = [([7, 7, 7], 3), ([7, 3], 2), ([3, 9], 2)]
    out = tokstats.zipf_evidence(_ds(rows)).to_pandas()
    # ranks (n desc, id asc): 7@r1(n=4), 3@r2(n=2), 9@r3(n=1)
    # x = bl(rank) = [1, 2, 2]; y = bl(n) = [3, 2, 1]
    assert len(out) == 1
    r = out.iloc[0]
    assert r["n_terms"] == 3 and r["sum_x"] == 5 and r["sum_y"] == 6
    # sxy = 1*3+2*2+2*1 = 9 -> sxy_n = 3*9 - 5*6 = -3 (freq falls with rank)
    # sxx = 1+4+4 = 9 -> sxx_n = 3*9 - 25 = 2
    assert r["sxy_n"] == -3 and r["sxx_n"] == 2


def test_zipf_evidence_empty_corpus():
    out = tokstats.zipf_evidence(_ds([([9], 0)])).to_pandas()
    assert len(out) == 0


def test_lm_score_bruteforce():
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd
    from collections import Counter
    from aisdb_ray.stages import tokstats

    rng = np.random.default_rng(43)
    seqs = [rng.integers(0, 12, rng.integers(2, 20)).tolist()
            for _ in range(120)]
    t = pa.table({
        "doc_id": [f"d{i:03d}" for i in range(len(seqs))],
        "tokens": pa.array(seqs, pa.list_(pa.int32())),
        "n_tok": pa.array([len(s) for s in seqs], pa.int32()),
        "source": ["s"] * len(seqs),
    })
    got = tokstats.lm_score(
        rd.from_arrow(t).repartition(4)
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)

    big = Counter()
    prev = Counter()
    for s in seqs:
        for a, b in zip(s[:-1], s[1:]):
            big[(a, b)] += 1
            prev[a] += 1
    rows = []
    for i, s in enumerate(seqs):
        sc = sum((big[(a, b)] * 1_000_000) // prev[a]
                 for a, b in zip(s[:-1], s[1:]))
        rows.append((f"d{i:03d}", sc, len(s) - 1))
    want = pd.DataFrame(rows, columns=["doc_id", "lm_score", "n_bigrams"])
    want = want.sort_values("doc_id").reset_index(drop=True)
    assert len(got) == len(want)
    np.testing.assert_array_equal(got["lm_score"].to_numpy(np.int64),
                                  want["lm_score"].to_numpy(np.int64))
    np.testing.assert_array_equal(got["n_bigrams"].to_numpy(np.int64),
                                  want["n_bigrams"].to_numpy(np.int64))


def test_valid_tokens_rejects_null_elements():
    """A row whose tokens list CONTAINS nulls must be dropped: a null id
    flattens to NaN and casts to INT64_MIN — garbage codes downstream."""
    import pyarrow as pa

    from aisdb_ray.stages.tokstats import _valid_tokens

    t = pa.table({
        "tokens": pa.array([[1, 2, 3], [4, None, 6], [7, 8]],
                           pa.list_(pa.int32())),
        "n_tok": pa.array([3, 3, 2], pa.int32()),
    })
    got = _valid_tokens(t)
    assert len(got) == 2
    assert got.to_pylist() == [[1, 2, 3], [7, 8]]


def test_null_token_elements_dropped_by_all_payload_kernels():
    """Rows whose token list contains a null ELEMENT violate the payload
    contract and must drop from simpson/rle/lm_score — a null id would
    flatten to NaN and cast to INT64_MIN garbage codes."""
    import pyarrow as pa

    t = pa.table({
        "doc_id": pa.array(["d1", "d2"]),
        "tokens": pa.array([[5, 5, None, 5, 5], [7, 7, 8]],
                           pa.list_(pa.int32())),
        "n_tok": pa.array([5, 3], pa.int32()),
        "source": pa.array(["s", "s"]),
    })
    sp = tokstats.simpson_partial(t)
    assert set(sp["token_id"].to_pylist()) == {7, 8}
    rr = tokstats.rle_runs(rd.from_arrow(t)).to_pandas()
    assert list(rr.doc_id) == ["d2"] and int(rr.n_runs.iloc[0]) == 2
    lm = tokstats.lm_score(rd.from_arrow(t)).to_pandas()
    assert list(lm.doc_id) == ["d2"]
