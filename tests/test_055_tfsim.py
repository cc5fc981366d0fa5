"""Exact sparse TF-cosine pair join (stages/tfsim.py) vs brute force."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from aisdb_ray.stages import tfsim

WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta"]


def _mk_docs(rng, n, n_sources=3):
    rows = []
    for i in range(n):
        k = rng.integers(3, 20)
        text = " ".join(rng.choice(WORDS, size=k))
        rows.append((i, f"s{rng.integers(0, n_sources)}", text))
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "source": pa.array([r[1] for r in rows]),
        "text": pa.array([r[2] for r in rows]),
    })


def _brute(tbl, thr_num, thr_den):
    from collections import Counter

    docs = list(zip(tbl["doc_id"].to_pylist(), tbl["source"].to_pylist(),
                    tbl["text"].to_pylist()))
    tf = {d: Counter(t.split()) for d, _s, t in docs}
    out = set()
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            a, sa, _ = docs[i]
            b, sb, _ = docs[j]
            if sa != sb:
                continue
            ca, cb = tf[a], tf[b]
            dot = sum(ca[w] * cb[w] for w in ca)
            na2 = sum(v * v for v in ca.values())
            nb2 = sum(v * v for v in cb.values())
            if dot * dot * thr_den >= thr_num * na2 * nb2:
                out.add((min(a, b), max(a, b), dot,
                         na2 if a < b else nb2, nb2 if a < b else na2))
    return out


def test_tf_cosine_matches_brute_force():
    rng = np.random.default_rng(9)
    tbl = _mk_docs(rng, 120)
    got = tfsim.tf_cosine_pairs(
        rd.from_arrow(tbl), thr_num=16, thr_den=25, num_parts=4
    ).to_pandas()
    got_set = {
        (int(r.a), int(r.b), int(r.dot), int(r.na2), int(r.nb2))
        for r in got.itertuples()
    }
    want = _brute(tbl, 16, 25)
    assert got_set == want
    assert len(want) > 0  # the fixture actually produces pairs


def test_tf_cosine_blocking_respects_source():
    tbl = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "source": pa.array(["x", "y"]),
        "text": pa.array(["alpha beta", "alpha beta"]),
    })
    got = tfsim.tf_cosine_pairs(rd.from_arrow(tbl), 16, 25, num_parts=2)
    assert got.count() == 0  # identical docs in different blocks: no pair


def test_tf_cosine_max_df_prunes_hot_terms():
    # every doc shares 'alpha'; with max_df=1 no posting list survives
    tbl = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "source": pa.array(["x", "x", "x"]),
        "text": pa.array(["alpha", "alpha", "alpha"]),
    })
    full = tfsim.tf_cosine_pairs(rd.from_arrow(tbl), 16, 25, num_parts=2)
    assert full.count() == 3  # all identical: C(3,2) pairs
    pruned = tfsim.tf_cosine_pairs(
        rd.from_arrow(tbl), 16, 25, max_df=1, num_parts=2
    )
    assert pruned.count() == 0


def test_pair_indices_matches_triu_property():
    """Property: the segmented pair expansion equals np.triu_indices per
    group, for random group layouts (incl. size-2 and large groups)."""
    from hypothesis import given, settings, strategies as st

    from aisdb_ray.stages.tfsim import _pair_indices

    @settings(max_examples=60, deadline=None)
    @given(st.lists(st.integers(min_value=2, max_value=23),
                    min_size=1, max_size=12))
    def check(sizes_list):
        sizes = np.asarray(sizes_list, dtype=np.int64)
        starts = np.r_[0, np.cumsum(sizes)[:-1]]
        ii, jj = _pair_indices(sizes, starts)
        want_i, want_j = [], []
        for s, m in zip(starts, sizes):
            a, b = np.triu_indices(m, k=1)
            want_i.append(s + a)
            want_j.append(s + b)
        np.testing.assert_array_equal(ii, np.concatenate(want_i))
        np.testing.assert_array_equal(jj, np.concatenate(want_j))

    check()
