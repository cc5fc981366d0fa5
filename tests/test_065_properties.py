"""Property-based tests (hypothesis) for the fourth-wave operators:
interval coalesce and the global-rank byte encoding.

The Ray-level parity of both operators is pinned by tests 061/062; these
properties exercise the PURE kernels (no Ray session per example) over
randomized inputs — the same split as the tierquery plan properties."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from aisdb_ray.stages import ranksort


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 60), st.integers(0, 60),
                  st.text(alphabet="ab", min_size=0, max_size=3)),
        min_size=1, max_size=60,
    )
)
def test_encode_order_matches_tuple_order(rows):
    t = pa.table({
        "x": pa.array([r[0] for r in rows], pa.int64()),
        "y": pa.array([r[1] for r in rows], pa.int64()),
        "s": pa.array([r[2] for r in rows], pa.string()),
    })
    keys = ranksort._encode_order_keys(t, ["x", "y", "s"])
    order = np.argsort(keys, kind="stable")
    want = sorted(range(len(rows)), key=lambda i: rows[i])
    # stable argsort of an order-preserving encoding == stable tuple sort
    assert order.tolist() == want


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 200), st.integers(0, 50)),
        min_size=1, max_size=80,
    )
)
def test_coalesce_islands_kernel_properties(iv):
    """The island kernel (as used inside coalesce_intervals.per_part):
    merged windows are disjoint, non-touching, cover every input
    interval, and conserve the interval count."""
    s = np.asarray([a for a, _ in iv], dtype=np.int64)
    e = s + np.asarray([b for _, b in iv], dtype=np.int64)
    order = np.lexsort((e, s))
    s, e = s[order], e[order]
    neg = np.iinfo(np.int64).min
    cmax = np.maximum.accumulate(e)
    prev_max = np.r_[neg, cmax[:-1]]
    brk = s > prev_max
    brk[0] = True
    island = np.cumsum(brk)
    w_start = [int(s[island == i].min()) for i in range(1, island[-1] + 1)]
    w_end = [int(e[island == i].max()) for i in range(1, island[-1] + 1)]
    counts = [int((island == i).sum()) for i in range(1, island[-1] + 1)]
    # disjoint and strictly separated
    for i in range(1, len(w_start)):
        assert w_start[i] > w_end[i - 1]
    # every interval inside its island's window
    for a, b, isl in zip(s, e, island):
        assert w_start[isl - 1] <= a and b <= w_end[isl - 1]
    assert sum(counts) == len(s)


@settings(max_examples=100, deadline=None)
@given(st.integers(1, 500), st.integers(1, 20))
def test_ntile_partitions_exactly(total, k):
    rn = np.arange(1, total + 1, dtype=np.int64)
    tiles = ranksort._ntile(rn, total, k)
    # non-decreasing, starts at 1, ends at min(total, k)
    assert tiles[0] == 1 and tiles[-1] == min(total, k)
    assert (np.diff(tiles) >= 0).all()
    if total >= k:
        sizes = np.bincount(tiles)[1:]
        q, r = divmod(total, k)
        assert sorted(sizes.tolist(), reverse=True) == (
            [q + 1] * r + [q] * (k - r)
        )
        # big tiles come first (SQL NTILE)
        assert (np.diff(sizes) <= 0).all() or r == 0


@settings(max_examples=150, deadline=None)
@given(
    st.lists(st.tuples(st.integers(1, 50), st.integers(-40, 40)),
             min_size=1, max_size=120),
    st.sampled_from([4, 32, 128]),
)
def test_sdt_kernel_properties(steps, E):
    from aisdb_ray.stages import sdt

    t = np.cumsum(np.asarray([s for s, _ in steps], np.int64))
    v = np.cumsum(np.asarray([d for _, d in steps], np.int64)) + 500
    m = sdt.sdt_keep_mask(t, v, E)
    # endpoints always kept
    assert m[0] and m[-1]
    # reconstruction error bounded by the door guarantee (±E pivots)
    if len(t) > 2:
        kt, kv = t[m], v[m]
        pos = np.clip(np.searchsorted(kt, t, side="right") - 1,
                      0, max(len(kt) - 2, 0))
        if len(kt) >= 2:
            recon = kv[pos] + (kv[pos + 1] - kv[pos]) * (t - kt[pos]) / (
                kt[pos + 1] - kt[pos])
            assert np.abs(recon - v).max() <= 2 * E
