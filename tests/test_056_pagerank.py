"""Integer PageRank (stages/pagerank.py): local fast path ≡ distributed
rounds ≡ a scalar reference implementation."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from aisdb_ray.stages import pagerank as pr_mod


def _scalar_pr(edges, node_ids, iters, damp_num=85, damp_den=100,
               scale=1_000_000):
    from collections import defaultdict

    deg = defaultdict(int)
    for s, _d in edges:
        deg[s] += 1
    base = (scale * (damp_den - damp_num)) // damp_den
    r = {n: scale for n in node_ids}
    for _ in range(iters):
        got = {n: 0 for n in node_ids}
        for s, d in edges:
            got[d] += (damp_num * r[s]) // (damp_den * deg[s])
        r = {n: base + got[n] for n in node_ids}
    return r


def _rand_graph(rng, n=60, m=300):
    s = rng.integers(0, n, m)
    d = (s + rng.integers(1, n, m)) % n
    edges = list({(int(a), int(b)) for a, b in zip(s, d) if a != b})
    return edges, list(range(n))


def test_local_path_matches_scalar():
    rng = np.random.default_rng(2)
    edges, nodes = _rand_graph(rng)
    e = rd.from_arrow(pa.table({
        "src": pa.array([a for a, _ in edges], pa.int64()),
        "dst": pa.array([b for _, b in edges], pa.int64()),
    }))
    nds = rd.from_arrow(pa.table({"node": pa.array(nodes, pa.int64())}))
    got = pr_mod.pagerank(e, nds, iters=3).to_pandas()
    want = _scalar_pr(edges, nodes, 3)
    assert dict(zip(got["node"], got["pr"])) == want


def test_distributed_rounds_match_local():
    rng = np.random.default_rng(4)
    edges, nodes = _rand_graph(rng, n=40, m=160)
    e = rd.from_arrow(pa.table({
        "src": pa.array([a for a, _ in edges], pa.int64()),
        "dst": pa.array([b for _, b in edges], pa.int64()),
    }))
    nds = rd.from_arrow(pa.table({"node": pa.array(nodes, pa.int64())}))
    local = pr_mod.pagerank(e, nds, iters=2).to_pandas()
    dist = pr_mod.pagerank(
        e, nds, iters=2, local_edge_limit=0, num_parts=4
    ).to_pandas()
    assert (
        dict(zip(local["node"], local["pr"]))
        == dict(zip(dist["node"], dist["pr"]))
    )


def test_isolated_nodes_score_base_only():
    e = rd.from_arrow(pa.table({
        "src": pa.array([1], pa.int64()), "dst": pa.array([2], pa.int64())
    }))
    nds = rd.from_arrow(pa.table({"node": pa.array([1, 2, 3], pa.int64())}))
    got = pr_mod.pagerank(e, nds, iters=1).to_pandas()
    r = dict(zip(got["node"], got["pr"]))
    base = (1_000_000 * 15) // 100
    assert r[3] == base                       # isolated: bare base
    assert r[1] == base                       # no in-edges
    assert r[2] == base + (85 * 1_000_000) // 100  # full mass of node 1


def test_personalized_seeds_localize_mass():
    # chain 0 -> 1 -> 2 -> 3; seed at 0: mass decays along the chain,
    # nodes far from the seed (and the seed-less tail) score 0 base
    e = rd.from_arrow(pa.table({
        "src": pa.array([0, 1, 2], pa.int64()),
        "dst": pa.array([1, 2, 3], pa.int64()),
    }))
    nds = rd.from_arrow(pa.table({"node": pa.array([0, 1, 2, 3, 9], pa.int64())}))
    got = pr_mod.pagerank(e, nds, iters=3, seeds=(0,)).to_pandas()
    r = dict(zip(got["node"], got["pr"]))
    base = (1_000_000 * 15) // 100
    assert r[0] == base           # seed keeps only its restart mass
    assert r[9] == 0              # disconnected non-seed: nothing
    # hand-traced recurrence: the initial 1e6 pulse travels the chain
    # (t1: 850000@1 -> t2: 722500@2 -> t3: 614125@3) while the steady
    # restart mass trails behind it
    assert r == {0: 150_000, 1: 127_500, 2: 108_375, 3: 614_125, 9: 0}


def test_personalized_distributed_matches_local():
    rng = np.random.default_rng(12)
    edges, nodes = _rand_graph(rng, n=30, m=140)
    e = rd.from_arrow(pa.table({
        "src": pa.array([a for a, _ in edges], pa.int64()),
        "dst": pa.array([b for _, b in edges], pa.int64()),
    }))
    nds = rd.from_arrow(pa.table({"node": pa.array(nodes, pa.int64())}))
    seeds = (0, 5, 11)
    local = pr_mod.pagerank(e, nds, iters=2, seeds=seeds).to_pandas()
    dist = pr_mod.pagerank(
        e, nds, iters=2, seeds=seeds, local_edge_limit=0, num_parts=4
    ).to_pandas()
    assert (
        dict(zip(local["node"], local["pr"]))
        == dict(zip(dist["node"], dist["pr"]))
    )


def test_pagerank_edge_free_graph_scores_base():
    """An all-isolated-nodes graph (zero edges) must score the bare base
    everywhere, not crash concat_tables."""
    import pyarrow as pa

    edges = rd.from_arrow(pa.table({
        "src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64()),
    }))
    nodes = rd.from_arrow(pa.table({"node": pa.array([1, 2, 3], pa.int64())}))
    got = pr_mod.pagerank(edges, nodes, iters=2).to_pandas()
    base = (1_000_000 * 15) // 100
    assert sorted(got.node) == [1, 2, 3]
    assert set(got.pr) == {base}


def test_pagerank_local_drops_unknown_endpoints_like_distributed():
    """An edge endpoint absent from the node list drops (the distributed
    inner-join semantics) instead of IndexError / silent aliasing."""
    import pyarrow as pa

    edges = rd.from_arrow(pa.table({
        "src": pa.array([1, 99], pa.int64()),
        "dst": pa.array([2, 1], pa.int64()),
    }))
    nodes = rd.from_arrow(pa.table({"node": pa.array([1, 2], pa.int64())}))
    loc = pr_mod.pagerank(edges, nodes, iters=2).to_pandas()
    dist = pr_mod.pagerank(edges, nodes, iters=2,
                            local_edge_limit=0).to_pandas()
    merged = loc.merge(dist, on="node", suffixes=("_l", "_d"))
    assert (merged.pr_l == merged.pr_d).all()
