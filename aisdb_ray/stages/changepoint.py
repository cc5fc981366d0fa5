"""Single best mean-shift changepoint per series (binary segmentation,
one level).

For each key's ordered bucket series y_1..y_n, pick the split 1 <= t < n
that minimizes total squared error of a two-segment piecewise-constant fit.
Since sum(y_i^2) is constant in t, that equals MAXIMIZING

    gain(t) = Sl^2 / nl + Sr^2 / nr

with Sl/Sr the left/right sums and nl/nr the part sizes — the classic
CUSUM-of-squares identity binary segmentation recurses on (the engine's
ts_cusum covers the sequential drift alarm; this is the retrospective
split).  All evidence stays int64 (prefix sums); the gain itself is two
exact int64 squares each followed by ONE IEEE division and one add, the
same operand order a SQL oracle states, so even the float column
hash-matches bit for bit.

Distribution shape: the bucket series is a grouped rollup (bounded rows
per key), co-shuffled once on the key; per partition the kernel is
vectorized across ALL groups at once — global cumsum minus per-group
offsets, masked candidates, lexsort argmax — no per-group Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_OUT = {
    "source": pa.string(),
    "cp_time": pa.int64(),
    "n_left": pa.int64(),
    "n_right": pa.int64(),
    "sum_left": pa.int64(),
    "sum_right": pa.int64(),
    "gain": pa.float64(),
}


def _empty(key_type: pa.DataType = None) -> pa.Table:
    # the key column's dtype follows the INPUT (int64 keys must not get a
    # string-typed empty partition — block schema unification would fail)
    types = dict(_OUT)
    if key_type is not None:
        types["source"] = key_type
    return pa.table({k: pa.array([], t) for k, t in types.items()})


def best_split(ds, key_col: str, order_col: str, value_col: str,
               num_parts: int | None = None):
    """One row per key with >=2 buckets: the argmax-gain split.

    ``cp_time`` is the ``order_col`` value of the FIRST right-part row;
    ties on gain break toward the earliest split.
    """
    from aisdb_ray.stages._dist import co_shuffle

    def per_part(part: pa.Table) -> pa.Table:
        kt = part.schema.field(key_col).type
        if part.num_rows == 0:
            return _empty(kt)
        src = part[key_col].to_numpy(zero_copy_only=False)
        bkt = part[order_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = part[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((bkt, src))
        src, bkt, y = src[order], bkt[order], y[order]
        n = len(y)
        gstart = np.r_[0, np.flatnonzero(src[1:] != src[:-1]) + 1]
        glen = np.diff(np.r_[gstart, n])
        g0 = np.repeat(gstart, glen)              # group start index per row
        gn = np.repeat(glen, glen)                # group size per row
        cs = np.cumsum(y)
        sl = cs - np.where(g0 > 0, cs[np.maximum(g0 - 1, 0)], 0)
        tot = np.repeat(cs[gstart + glen - 1], glen) - np.where(
            g0 > 0, np.repeat(cs[np.maximum(gstart - 1, 0)], glen), 0
        )
        # bound the PREFIX sums, not just the totals: mixed-sign values
        # (e.g. [4e9, -4e9, 0]) give tot = 0 but sl = 4e9, whose square
        # silently wraps int64 and corrupts the argmax
        if n and max(int(np.abs(sl).max()),
                     int(np.abs(tot - sl).max())) > 3_000_000_000:
            raise OverflowError(
                "best_split: |group prefix sum| > 3e9 — gain squares "
                "would overflow int64; rescale the value channel first"
            )
        rn = np.arange(n, dtype=np.int64) - g0 + 1
        cand = rn < gn                            # split after row i
        if not cand.any():
            return _empty(kt)
        i = np.flatnonzero(cand)
        nl, nr = rn[i], gn[i] - rn[i]
        sli, sri = sl[i], tot[i] - sl[i]
        gain = (sli * sli).astype(np.float64) / nl.astype(np.float64) + (
            sri * sri
        ).astype(np.float64) / nr.astype(np.float64)
        cp = bkt[i + 1]                           # first right-part bucket
        gi = src[i]
        # argmax per group, ties -> earliest cp: sort (group, -gain, cp)
        sel = np.lexsort((cp, -gain, gi))
        first = np.r_[0, np.flatnonzero(gi[sel][1:] != gi[sel][:-1]) + 1]
        pick = sel[first]
        return pa.table(
            {
                "source": pa.array(gi[pick]),
                "cp_time": pa.array(cp[pick]),
                "n_left": pa.array(nl[pick]),
                "n_right": pa.array(nr[pick]),
                "sum_left": pa.array(sli[pick]),
                "sum_right": pa.array(sri[pick]),
                "gain": pa.array(gain[pick]),
            }
        )

    return co_shuffle(ds, [key_col], per_part, num_parts=num_parts)
