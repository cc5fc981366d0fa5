"""Time-range windowed aggregates (the streaming-window operator).

Semantics: for each row, aggregate the group's rows with
``time in [t - width, t]`` — SQL's ``RANGE BETWEEN width PRECEDING AND
CURRENT ROW``.  The reference's nearest analog is its per-track rate
kernels (delta windows over sorted tracks, /root/reference/aisdb/gis.py
delta_knots/delta_meters); this generalizes them to arbitrary trailing
windows, which is also what a streaming engine computes per watermark.

Shape: one ``groupby(group).map_groups`` (the engine's standard per-key
exchange — the salted time-chunk layout applies if a key is hot, with a
``width``-sized halo exactly like the gap-fill halo).  Inside a group
everything is vectorized:

- sum / count: prefix sums, window edges found by ``np.searchsorted``;
- mean: the exact IEEE division sum/count (int64 exact operands) — the
  same float-determinism contract as stages/rollup.py, so the SQL oracle
  (CAST(sum AS DOUBLE)/count) matches bit-for-bit;
- min / max over *variable-width* windows: a sparse-table RMQ
  (O(n log n) build, O(1) vectorized query) — no per-row Python loop and
  no monotonic-deque scan.

Tie handling follows SQL RANGE windows: rows sharing a timestamp are
peers — every peer's window includes all of them.  Aggregates are exact,
no sketching.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _sparse_table(v: np.ndarray, reduce_fn) -> np.ndarray:
    """st[k][i] = reduce(v[i : i + 2**k]) for i + 2**k <= n (rest padded
    with v[-trailing] values — never queried past the valid range)."""
    n = len(v)
    levels = max(1, int(np.floor(np.log2(n))) + 1)
    st = np.empty((levels, n), dtype=v.dtype)
    st[0] = v
    for k in range(1, levels):
        half = 1 << (k - 1)
        m = n - (1 << k) + 1
        if m <= 0:
            st[k] = st[k - 1]
            continue
        st[k, :m] = reduce_fn(st[k - 1, :m], st[k - 1, half : half + m])
        st[k, m:] = st[k - 1, m:]
    return st


def _range_query(st: np.ndarray, lo: np.ndarray, hi: np.ndarray, reduce_fn):
    """Vectorized reduce over v[lo..hi] inclusive (lo <= hi elementwise)."""
    length = hi - lo + 1
    k = np.floor(np.log2(length)).astype(np.int64)
    span = np.left_shift(1, k)
    return reduce_fn(st[k, lo], st[k, hi - span + 1])


def rolling_group(
    tbl: pa.Table, time_col: str, value: str, width: int
) -> pa.Table:
    """One group's rows -> the same rows (time-sorted) + trailing-window
    sum / count / mean / min / max of ``value``."""
    t_raw = tbl[time_col].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(t_raw, kind="stable")
    tbl = tbl.take(pa.array(order))
    t = t_raw[order]
    v = tbl[value].to_numpy(zero_copy_only=False).astype(np.int64)
    n = len(t)

    lo = np.searchsorted(t, t - width, side="left")
    # RANGE semantics: the window closes at the last PEER (equal-time) row,
    # not at this row's position — same-timestamp bursts aggregate together
    hi = np.searchsorted(t, t, side="right") - 1
    cum = np.concatenate(([0], np.cumsum(v, dtype=np.int64)))
    w_sum = cum[hi + 1] - cum[lo]
    w_n = hi - lo + 1

    st_min = _sparse_table(v, np.minimum)
    st_max = _sparse_table(v, np.maximum)
    w_min = _range_query(st_min, lo, hi, np.minimum)
    w_max = _range_query(st_max, lo, hi, np.maximum)

    out = tbl
    out = out.append_column("w_sum", pa.array(w_sum, pa.int64()))
    out = out.append_column("w_n", pa.array(w_n, pa.int64()))
    out = out.append_column(
        "w_mean", pa.array(w_sum.astype(np.float64) / w_n, pa.float64())
    )
    out = out.append_column("w_min", pa.array(w_min, pa.int64()))
    out = out.append_column("w_max", pa.array(w_max, pa.int64()))
    return out


def rolling_time_aggregate(ds, group: str, time_col: str, value: str, width: int):
    """Per-(group, row) trailing-window aggregates over a Dataset."""
    return ds.groupby(group).map_groups(
        lambda g: rolling_group(g, time_col, value, width),
        batch_format="pyarrow",
    )
