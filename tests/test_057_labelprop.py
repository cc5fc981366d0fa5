"""Label propagation (stages/labelprop.py): scalar parity, clamping,
tie rule, and local ≡ distributed rounds."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from aisdb_ray.stages import labelprop


def _scalar_lp(edges, labels, iters):
    cur = dict(labels)
    for _ in range(iters):
        votes = {}
        for s, d in edges:
            if cur[s] != -1:
                votes.setdefault(d, {}).setdefault(cur[s], 0)
                votes[d][cur[s]] += 1
        nxt = dict(cur)
        for d, vc in votes.items():
            if cur[d] == -1:
                best = sorted(vc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
                nxt[d] = best[0]
        cur = nxt
    return cur


def _mk(rng, n=50, m=220, seed_pct=20):
    s = rng.integers(0, n, m)
    d = (s + rng.integers(1, n, m)) % n
    edges = list({(int(a), int(b)) for a, b in zip(s, d) if a != b})
    labels = {
        i: (int(rng.integers(0, 4)) if rng.integers(0, 100) < seed_pct else -1)
        for i in range(n)
    }
    e = rd.from_arrow(pa.table({
        "src": pa.array([a for a, _ in edges], pa.int64()),
        "dst": pa.array([b for _, b in edges], pa.int64()),
    }))
    l = rd.from_arrow(pa.table({
        "node": pa.array(list(labels), pa.int64()),
        "label": pa.array(list(labels.values()), pa.int64()),
    }))
    return edges, labels, e, l


def test_local_matches_scalar_and_clamps_seeds():
    rng = np.random.default_rng(6)
    edges, labels, e, l = _mk(rng)
    got = labelprop.label_propagation(e, l, iters=3).to_pandas()
    want = _scalar_lp(edges, labels, 3)
    assert dict(zip(got["node"], got["label"])) == want
    # seeds never change
    for n, lab in labels.items():
        if lab != -1:
            assert want[n] == lab
    # propagation actually labeled some previously-unlabeled nodes
    newly = sum(
        1 for n, lab in labels.items() if lab == -1 and want[n] != -1
    )
    assert newly > 0


def test_distributed_matches_local():
    rng = np.random.default_rng(8)
    _, _, e, l = _mk(rng, n=30, m=120)
    local = labelprop.label_propagation(e, l, iters=2).to_pandas()
    dist = labelprop.label_propagation(
        e, l, iters=2, local_edge_limit=0, num_parts=4
    ).to_pandas()
    assert (
        dict(zip(local["node"], local["label"]))
        == dict(zip(dist["node"], dist["label"]))
    )


def test_tie_breaks_to_smallest_label():
    # node 0 unlabeled, two in-neighbors with labels 2 and 1 (one vote each)
    e = rd.from_arrow(pa.table({
        "src": pa.array([1, 2], pa.int64()),
        "dst": pa.array([0, 0], pa.int64()),
    }))
    l = rd.from_arrow(pa.table({
        "node": pa.array([0, 1, 2], pa.int64()),
        "label": pa.array([-1, 2, 1], pa.int64()),
    }))
    got = labelprop.label_propagation(e, l, iters=1).to_pandas()
    assert dict(zip(got["node"], got["label"]))[0] == 1


def test_labelprop_hash_sized_labels_local_equals_distributed():
    """Hash-sized label values: the old packed di*labmax+lab key wrapped
    int64 on the local path and diverged from the distributed rounds."""
    import pyarrow as pa

    big = 1 << 45
    edges = rd.from_arrow(pa.table({
        "src": pa.array([1, 2], pa.int64()),
        "dst": pa.array([3, 3], pa.int64()),
    }))
    labels = rd.from_arrow(pa.table({
        "node": pa.array([1, 2, 3], pa.int64()),
        "label": pa.array([big + 1, big + 1, labelprop.UNLABELED], pa.int64()),
    }))
    loc = labelprop.label_propagation(edges, labels, iters=1).to_pandas()
    dist = labelprop.label_propagation(edges, labels, iters=1,
                                       local_edge_limit=0).to_pandas()
    m = loc.merge(dist, on="node", suffixes=("_l", "_d"))
    assert (m.label_l == m.label_d).all()
    assert int(loc.set_index("node").loc[3, "label"]) == big + 1
