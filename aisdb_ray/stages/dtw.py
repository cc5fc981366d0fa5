"""Dynamic time warping distance between per-key bucket series.

Elastic similarity: unlike the lock-step distances (ts_pattern_topk,
ts_source_corr), DTW aligns series that run at different speeds — the
classic |a|×|b| dynamic program

    d(i,j) = |a_i − b_j| + min(d(i−1,j), d(i,j−1), d(i−1,j−1))

kept EXACTLY in int64 (integer costs, no floats anywhere), so a SQL
oracle can replay it bit-for-bit: the DP is evaluated wavefront-by-
wavefront (anti-diagonal k = i+j depends only on diagonals k−1 and k−2),
which a recursive CTE can iterate by carrying the last two diagonals.

Distribution shape: series are first collapsed to bounded per-key bucket
vectors (the rollup contract), pairs of keys fan out as independent
tasks — each DP is one numpy vectorized-diagonal kernel, O(len²) ints
per pair, nothing shuffles but the bounded vectors.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def dtw_distance(a: np.ndarray, b: np.ndarray, band: int | None = None) -> int:
    """Exact integer DTW distance; optional Sakoe–Chiba band half-width
    (cells outside the band are +inf).  Vectorized over anti-diagonals."""
    a = np.asarray(a, np.int64)
    b = np.asarray(b, np.int64)
    n, m = len(a), len(b)
    if n == 0 or m == 0:
        raise ValueError("dtw_distance: empty series")
    INF = np.int64(1) << 60  # saturating: INF+INF stays < 2^63 (no wrap)
    # rows i in 0..n-1 (a), cols j in 0..m-1 (b); diagonals k = i + j
    prev2 = None  # diagonal k-2, as a dense vector indexed by i
    prev1 = None  # diagonal k-1
    for k in range(n + m - 1):
        i_lo = max(0, k - (m - 1))
        i_hi = min(n - 1, k)
        i = np.arange(i_lo, i_hi + 1)
        j = k - i
        cost = np.abs(a[i] - b[j])
        if band is not None:
            cost = np.where(np.abs(i - j) <= band, cost, INF)
        if k == 0:
            cur = cost
        else:
            def get(diag, lo, idx):
                if diag is None:
                    return np.full(len(idx), INF)
                arr, alo = diag
                pos = idx - alo
                ok = (pos >= 0) & (pos < len(arr))
                out = np.full(len(idx), INF)
                out[ok] = arr[pos[ok]]
                return out

            up = get(prev1, 0, i - 1)        # d(i-1, j)   on diag k-1
            left = get(prev1, 0, i)         # d(i, j-1)   on diag k-1
            diag = get(prev2, 0, i - 1)     # d(i-1, j-1) on diag k-2
            # edges: d(0, j) extends left only; d(i, 0) extends up only
            best = np.minimum(np.minimum(up, left), diag)
            best = np.where((i == 0) & (j == 0), 0, best)
            cur = np.minimum(np.minimum(cost, INF) + np.minimum(best, INF),
                             INF)  # saturating add: blocked paths stay INF
        prev2 = (prev1[0], prev1[1]) if prev1 is not None else None
        prev1 = (cur, i_lo)
        if k == 0:
            prev1 = (cur, 0)
    return int(prev1[0][0])


def pairwise_dtw(ds_vectors, key_col: str, vec_col: str,
                 band: int | None = None, max_len: int = 256):
    """All key pairs' DTW distances from a Dataset of (key, list<int64>)
    bucket vectors (bounded by ``max_len``); pairs fan out as one
    vectorized task each via flat_map over the broadcast vector table —
    apply to a bounded key set (the pairwise-output caveat of
    stages/corr.py)."""
    import ray
    import ray.data as rd

    rows = ds_vectors.take_all()  # bounded: one row per key
    # validate on the driver, where the error is cheap and clear: a null /
    # duplicate key or an empty / null vector would otherwise surface as a
    # worker traceback (dtw_distance ValueError) or silently keep only the
    # last duplicate's vector
    seen = set()
    for r in rows:
        k, v = r[key_col], r[vec_col]
        if k is None:
            raise ValueError("pairwise_dtw: null key")
        if k in seen:
            raise ValueError(f"pairwise_dtw: duplicate key {k!r}")
        seen.add(k)
        if v is None or len(v) == 0:
            raise ValueError(f"pairwise_dtw: empty vector for key {k!r}")
    keys = sorted(r[key_col] for r in rows)
    vec_of = {r[key_col]: np.asarray(r[vec_col], np.int64)[:max_len]
              for r in rows}
    ref = ray.put(vec_of)
    pairs = [(a, b) for idx, a in enumerate(keys) for b in keys[idx + 1:]]

    def dist(batch):
        vm = ray.get(ref)
        out_a, out_b, out_d = [], [], []
        for a, b in zip(batch["a"].to_pylist(), batch["b"].to_pylist()):
            out_a.append(a)
            out_b.append(b)
            out_d.append(dtw_distance(vm[a], vm[b], band=band))
        return pa.table({
            "a": pa.array(out_a, pa.string()),
            "b": pa.array(out_b, pa.string()),
            "dtw": pa.array(out_d, pa.int64()),
        })

    items = rd.from_items([{"a": a, "b": b} for a, b in pairs])
    return items.map_batches(dist, batch_format="pyarrow", batch_size=64)
