"""Connected components + cluster dedup: parity with a union-find oracle on
random graphs (chains force multi-round propagation), plus edge cases."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from aisdb_ray.stages import components


def _uf_oracle(edges: list[tuple[str, str]]) -> dict[str, str]:
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    roots = {n: find(n) for n in parent}
    comp_min: dict[str, str] = {}
    for n, r in roots.items():
        comp_min[r] = min(comp_min.get(r, n), n)
    return {n: comp_min[r] for n, r in roots.items()}


def _edges_ds(edges: list[tuple[str, str]]):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "a": pa.array([e[0] for e in edges]),
                "b": pa.array([e[1] for e in edges]),
            }
        )
    )


def _got(edges):
    df = components.connected_components(
        _edges_ds(edges), num_parts=4
    ).to_pandas()
    return dict(zip(df["node"], df["component"]))


def test_chain_needs_multiple_rounds():
    # a 12-node path: diameter 11, exercises the iteration + convergence
    chain = [(f"n{i:02d}", f"n{i + 1:02d}") for i in range(11)]
    got = _got(chain)
    assert got == {f"n{i:02d}": "n00" for i in range(12)}


def test_random_graph_matches_union_find():
    rng = np.random.default_rng(7)
    nodes = [f"d{i:03d}" for i in range(120)]
    edges = [
        (nodes[i], nodes[j])
        for i, j in rng.integers(0, len(nodes), (150, 2))
    ]
    edges += [(n, n) for n in nodes[:5]]  # self-loops must be harmless
    want = _uf_oracle([(a, b) for a, b in edges if a != b])
    assert _got(edges) == want


def test_empty_edges():
    got = components.connected_components(_edges_ds([]).filter(lambda r: False))
    assert got.count() == 0


def test_dedup_survivors():
    import ray.data as rd

    edges = [("d1", "d2"), ("d2", "d3"), ("d5", "d4")]
    ids = rd.from_arrow(
        pa.table({"doc_id": pa.array([f"d{i}" for i in range(8)])})
    )
    comp = components.connected_components(_edges_ds(edges))
    surv = sorted(
        components.dedup_survivors(ids, comp)
        .to_pandas()["doc_id"]
        .tolist()
    )
    # clusters {d1,d2,d3} -> d1 and {d4,d5} -> d4; d0,d6,d7 unpaired
    assert surv == ["d0", "d1", "d4", "d6", "d7"]
