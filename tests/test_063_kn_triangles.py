"""Kneser–Ney continuation counts and distributed triangle counting,
both vs brute force."""

from __future__ import annotations

import itertools

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from aisdb_ray.stages import tokstats, triangles


def _tok_table(seqs):
    return pa.table({
        "doc_id": [f"d{i}" for i in range(len(seqs))],
        "tokens": pa.array(seqs, pa.list_(pa.int32())),
        "n_tok": pa.array([len(s) for s in seqs], pa.int32()),
        "source": ["s"] * len(seqs),
    })


def test_kn_continuation_bruteforce():
    rng = np.random.default_rng(3)
    seqs = [rng.integers(0, 30, rng.integers(0, 12)).tolist()
            for _ in range(400)]
    got = tokstats.kn_continuation(
        rd.from_arrow(_tok_table(seqs)).repartition(5)
    ).to_pandas().sort_values("token").reset_index(drop=True)

    prevs: dict[int, set] = {}
    for s in seqs:
        for a, b in zip(s[:-1], s[1:]):
            prevs.setdefault(b, set()).add(a)
    want = pd.DataFrame(
        sorted((k, len(v)) for k, v in prevs.items()),
        columns=["token", "n_prev"],
    )
    assert len(got) == len(want)
    np.testing.assert_array_equal(got["token"].to_numpy(np.int64),
                                  want["token"].to_numpy(np.int64))
    np.testing.assert_array_equal(got["n_prev"].to_numpy(np.int64),
                                  want["n_prev"].to_numpy(np.int64))


def test_kn_continuation_skips_invalid_rows():
    t = pa.table({
        "doc_id": ["a", "b"],
        "tokens": pa.array([[1, 2, 1], [5, 6]], pa.list_(pa.int32())),
        "n_tok": pa.array([3, 99], pa.int32()),  # row b violates contract
        "source": ["s", "s"],
    })
    got = tokstats.kn_continuation(rd.from_arrow(t)).to_pandas()
    got = got.sort_values("token").reset_index(drop=True)
    # only doc a counts: prev(2)={1}, prev(1)={2}
    assert got["token"].tolist() == [1, 2]
    assert got["n_prev"].tolist() == [1, 1]


def _brute_triangles(edges):
    adj: dict[int, set] = {}
    und = set()
    for s, d in edges:
        if s == d:
            continue
        und.add((min(s, d), max(s, d)))
    for u, v in und:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    counts: dict[int, int] = {}
    nodes = sorted(adj)
    for a, b, c in itertools.combinations(nodes, 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            for x in (a, b, c):
                counts[x] = counts.get(x, 0) + 1
    return counts


def _check_triangles(edges):
    ds = rd.from_pandas(pd.DataFrame(edges, columns=["src", "dst"]))
    got = triangles.triangle_counts(ds).to_pandas()
    got = dict(zip(got["node"].astype(int), got["n_tri"].astype(int)))
    assert got == _brute_triangles(edges)


def test_triangles_random_graph():
    rng = np.random.default_rng(11)
    n_nodes, n_edges = 40, 220
    edges = list(zip(rng.integers(0, n_nodes, n_edges).tolist(),
                     rng.integers(0, n_nodes, n_edges).tolist()))
    _check_triangles(edges)


def test_triangles_hub_node():
    # star + one rim edge: exactly one triangle despite the hub
    edges = [(0, i) for i in range(1, 20)] + [(1, 2)]
    _check_triangles(edges)
    # duplicate + reversed edges collapse to the same undirected set
    _check_triangles(edges + [(2, 1), (5, 0), (0, 5)])


def test_triangles_none():
    edges = [(0, 1), (1, 2), (2, 3), (3, 4)]  # a path: no triangles
    ds = rd.from_pandas(pd.DataFrame(edges, columns=["src", "dst"]))
    got = triangles.triangle_counts(ds).to_pandas()
    assert len(got) == 0


def test_triangles_reject_out_of_range_ids():
    """Node ids outside [0, 2^32) would silently corrupt the packed-code
    dedup — must raise, not miscount."""
    import pyarrow as pa
    import pytest

    edges = rd.from_arrow(pa.table({
        "src": pa.array([1 << 33, 1], pa.int64()),
        "dst": pa.array([1, 2], pa.int64()),
    }))
    with pytest.raises(Exception, match="2\\^32|remap"):
        triangles.triangle_counts(edges).take_all()
