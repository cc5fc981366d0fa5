"""Leakage-safe splits and per-source volume capping (training-data
governance operators in pipelines/queries.py).

The split property that matters: two documents connected in the near-dup
graph must NEVER land in different splits — the eval-contamination mode a
per-doc hash split cannot prevent.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from aisdb_ray.stages import components
from aisdb_ray.stages.sample import md5_u32


def _assign_split(grp: pa.Array) -> np.ndarray:
    import pyarrow.compute as pc

    salted = pc.binary_join_element_wise(grp, pa.scalar(":split"), "")
    b = md5_u32(salted) % 100
    return np.where(b < 80, "train", np.where(b < 90, "val", "test"))


def test_component_members_share_a_split():
    # a random pair graph; every edge's two endpoints must co-locate
    rng = np.random.default_rng(5)
    n = 400
    a = rng.integers(0, n, 300)
    off = rng.integers(1, 40, 300)
    b = np.minimum(a + off, n - 1)
    keep = a != b
    edges = pa.table({
        "a": pa.array(a[keep], pa.int64()), "b": pa.array(b[keep], pa.int64())
    })
    comp = components.connected_components(rd.from_arrow(edges)).to_pandas()
    node2comp = dict(zip(comp["node"], comp["component"]))
    ids = np.arange(n, dtype=np.int64)
    grp = pa.array(
        [str(node2comp.get(i, i)) for i in ids], pa.string()
    )
    split = _assign_split(grp)
    by_id = dict(zip(ids.tolist(), split.tolist()))
    for x, y in zip(a[keep].tolist(), b[keep].tolist()):
        assert by_id[x] == by_id[y], (x, y)
    # all three splits exist and train dominates
    vals, counts = np.unique(split, return_counts=True)
    assert set(vals) == {"train", "val", "test"}
    assert counts[list(vals).index("train")] > counts.sum() // 2


def test_source_cap_expectation_and_determinism():
    # cap rule: keep iff md5(doc||':cap') * n_source < cap * 2^32
    import pyarrow.compute as pc

    cap = 15
    n_src = 60
    ids = pa.array([str(i) for i in range(n_src)], pa.string())
    salted = pc.binary_join_element_wise(ids, pa.scalar(":cap"), "")
    h = md5_u32(salted)
    keep = h * n_src < cap * (1 << 32)
    kept = int(keep.sum())
    # expectation cap/n = 25%; the deterministic draw lands near it
    assert 0.10 * n_src < kept < 0.45 * n_src
    # a source under the cap passes through whole
    small_n = 10
    keep_small = h[:small_n] * small_n < cap * (1 << 32)
    assert keep_small.all()
    # determinism: same inputs, same decisions
    h2 = md5_u32(salted)
    assert (h == h2).all()


def test_refresh_components_equals_full_recompute():
    """Folding new edges into an existing labeling (compressed spanning
    forest) must reproduce the from-scratch components exactly."""
    rng = np.random.default_rng(17)
    n, m = 300, 500
    a = rng.integers(0, n, m).astype(np.int64)
    b = ((a + rng.integers(1, 50, m)) % n).astype(np.int64)
    keep = a != b
    a, b = a[keep], b[keep]
    half = rng.integers(0, 2, len(a)).astype(bool)
    mk = lambda aa, bb: rd.from_arrow(pa.table({
        "a": pa.array(aa, pa.int64()), "b": pa.array(bb, pa.int64())
    }))
    full = components.connected_components(mk(a, b)).to_pandas()
    c0 = components.connected_components(mk(a[~half], b[~half]))
    inc = components.refresh_components(c0, mk(a[half], b[half])).to_pandas()
    assert (
        dict(zip(full["node"], full["component"]))
        == dict(zip(inc["node"], inc["component"]))
    )
