"""Swinging-door trending (SDT) compression: bounded-deviation
downsampling of each series segment.

The classic industrial time-series compressor (Bristol 1990, public; the
PI-historian "swinging door" algorithm): keep a point only when the
"door" — the wedge of slopes from the last archived point's ±E pivots
that could still cover every point seen since — closes.  The linear
interpolation between consecutive kept points reconstructs every dropped
point within ±E.  This is the deviation-bounded compression family next
to the engine's exact Gorilla codec (stages/compress.py): Gorilla is
lossless bits, SDT is lossy points-with-error-contract — the reference's
decimation slot (SURVEY §2.2 M9) taken to its archival extreme.

Float contract: door slopes are the single IEEE expression
``(v − va ∓ E) / (t − ta)`` (int64 operands, ONE divide), running
max/min, strict ``>`` crossing test — the recursive-CTE oracle writes
the identical expressions, so kept sets match bit-for-bit.

Scale shape: one source-keyed co-shuffle; per segment the kernel jumps
anchor-to-anchor — each iteration is a VECTORIZED cummax/cummin over the
points after the anchor and archives one point, so work is
O(kept × segment) numpy ops, not per-point Python; at high compression
(the operating regime) kept ≪ n.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from aisdb_ray.schema import N_TOK, SEG, SOURCE, TIME


def sdt_keep_mask(t: np.ndarray, v: np.ndarray, E: int) -> np.ndarray:
    """Kept-point mask for ONE segment (t strictly increasing)."""
    if E < 0:
        # the door test crosses immediately for E < 0 (argmax j = 0), so
        # the anchor never advances and the loop spins forever
        raise ValueError("sdt_keep_mask: tolerance E must be >= 0")
    n = len(t)
    keep = np.zeros(n, dtype=bool)
    if n == 0:
        return keep
    keep[0] = keep[-1] = True
    a = 0
    while a < n - 1:
        dt = (t[a + 1:] - t[a]).astype(np.float64)
        dv = (v[a + 1:] - v[a]).astype(np.float64)
        hi = (dv - E) / dt
        lo = (dv + E) / dt
        crossed = np.maximum.accumulate(hi) > np.minimum.accumulate(lo)
        if not crossed.any():
            break
        j = int(np.argmax(crossed))  # first crossing; j >= 1 always
        a = a + j  # archive the point BEFORE the crossing one; restart
        keep[a] = True
    return keep


def swing_door(ds, E: int = 64, num_parts: int | None = None):
    """SDT-compress a cleaned series Dataset: keep per-(source, seg) the
    door-closing points plus each segment's first and last.  Output
    columns: (source, seg, time, n_tok)."""
    from aisdb_ray.stages._dist import co_shuffle

    def per_part(part: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        idx = pc.sort_indices(part, sort_keys=[
            (SOURCE, "ascending"), (SEG, "ascending"),
            (TIME, "ascending"), ("seq", "ascending"),
        ])
        s = part.take(idx)
        src = s[SOURCE].to_numpy(zero_copy_only=False)
        seg = s[SEG].to_numpy(zero_copy_only=False)
        t = s[TIME].to_numpy(zero_copy_only=False).astype(np.int64)
        # SDT needs strictly increasing time: duplicate timestamps keep
        # the first row (by seq) — mirrored by the oracle's QUALIFY
        uniq = np.r_[True, (src[1:] != src[:-1]) | (seg[1:] != seg[:-1])
                     | (t[1:] != t[:-1])] if len(t) else np.zeros(0, bool)
        s = s.filter(pa.array(uniq))
        src = s[SOURCE].to_numpy(zero_copy_only=False)
        seg = s[SEG].to_numpy(zero_copy_only=False)
        t = s[TIME].to_numpy(zero_copy_only=False).astype(np.int64)
        v = s[N_TOK].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(t)
        if n == 0:
            return pa.table({SOURCE: s[SOURCE], SEG: pa.array([], pa.int64()),
                             TIME: pa.array([], pa.int64()),
                             N_TOK: pa.array([], pa.int64())})
        new = np.r_[True, (src[1:] != src[:-1]) | (seg[1:] != seg[:-1])]
        starts = np.flatnonzero(new)
        ends = np.r_[starts[1:], n]
        keep = np.zeros(n, dtype=bool)
        for a, b in zip(starts, ends):
            keep[a:b] = sdt_keep_mask(t[a:b], v[a:b], E)
        k = s.filter(pa.array(keep))
        return pa.table({
            SOURCE: k[SOURCE],
            SEG: pc.cast(k[SEG], pa.int64()),
            TIME: pc.cast(k[TIME], pa.int64()),
            N_TOK: pc.cast(k[N_TOK], pa.int64()),
        })

    return co_shuffle(ds, [SOURCE], per_part, num_parts)
