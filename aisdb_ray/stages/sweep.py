"""Sweep-line interval analytics: peak concurrency per time bucket.

``peak_concurrency`` answers "how many sessions were open at once, per
hour?" over an interval table — the load-planning / capacity query every
session store grows (the reference's transit counting in
/root/reference/aisdb/track_gen.py segments tracks but never overlaps
them; this operator is the overlap-counting dual).

Scale design (the reason this is not one global sort):

1. Each interval row becomes exactly two boundary events (+1 at
   ``t_start``, -1 at ``t_end``) — the shuffled payload is 2 rows per
   SESSION, independent of how many raw events the session had.
2. Boundary events co-locate by time bucket (``groupby(bucket)``): the
   within-bucket sweep (sort by (t, kind), running sum, max prefix) only
   ever sees one bucket's events.  Hot buckets are bounded by per-bucket
   activity, not by key skew.
3. Each bucket emits ONE summary row ``(bucket, net, mx)``.  The
   cross-bucket carry (sessions opened in earlier buckets and still
   open) is a prefix sum over that summary table — O(#buckets) rows,
   buckets are wall-clock hours, so even a decade of data is <10^5 rows:
   a single-block vectorized pass, the same bounded-funnel trade as the
   tier rollups' collapsed partials.

Tie rule (pinned by the SQL oracle): at equal time, starts count before
ends — intervals are closed, so a session ending at t and one starting
at t DO overlap.  Within a tie group the per-row running values depend
on tie order, but the per-bucket MAX does not: m starts at equal t reach
base+m regardless of order; m ends at equal t never exceed base.  Only
the max is emitted, so the result is deterministic.

Output: one row per bucket that contains at least one boundary event —
``(bucket-start epoch, peak)``.  A bucket silently spanned by open
sessions (no starts, no ends) has peak == the carry and is derivable,
but is not emitted; the oracle states the same contract.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _boundaries(b: pa.Table, start_col: str, end_col: str, bucket_s: int) -> pa.Table:
    """(bucket, t, kind, d) boundary events for one batch of intervals."""
    if b[start_col].null_count or b[end_col].null_count:
        # a null would float64 the cast and the NaN -> int64 garbage event
        # (t ~ -2^63) silently inflates the cross-bucket carry for every
        # real bucket after it — refuse, same posture as the e < s check
        raise ValueError("peak_concurrency: null interval bounds")
    s = b[start_col].to_numpy(zero_copy_only=False).astype(np.int64)
    e = b[end_col].to_numpy(zero_copy_only=False).astype(np.int64)
    if np.any(e < s):
        raise ValueError("peak_concurrency: t_end < t_start")
    t = np.concatenate([s, e])
    kind = np.concatenate(
        [np.zeros(len(s), np.int64), np.ones(len(e), np.int64)]
    )
    d = np.concatenate(
        [np.ones(len(s), np.int64), -np.ones(len(e), np.int64)]
    )
    return pa.table(
        {
            "bucket": pa.array((t // bucket_s) * bucket_s),
            "t": pa.array(t),
            "kind": pa.array(kind),
            "d": pa.array(d),
        }
    )


def _bucket_sweep(g: pa.Table) -> pa.Table:
    """One bucket's sweep: sort (t, kind), running sum, max prefix."""
    t = g["t"].to_numpy(zero_copy_only=False)
    kind = g["kind"].to_numpy(zero_copy_only=False)
    d = g["d"].to_numpy(zero_copy_only=False)
    order = np.lexsort((kind, t))  # starts (kind 0) before ends at equal t
    run = np.cumsum(d[order])
    # clamp at 0: a bucket whose events are ONLY ends still has every one
    # of those sessions open AT its end instant (closed intervals), so the
    # in-bucket peak relative to the carry is never negative — raw
    # run.max() = -1 would undercount the bucket by one
    return pa.table(
        {
            "bucket": pa.array([g["bucket"][0].as_py()], pa.int64()),
            "net": pa.array([int(run[-1])], pa.int64()),
            "mx": pa.array([max(0, int(run.max()))], pa.int64()),
        }
    )


def peak_concurrency(
    intervals,
    *,
    start_col: str = "t_start",
    end_col: str = "t_end",
    bucket_s: int = 3600,
):
    """Max concurrently-open intervals per ``bucket_s`` bucket.

    Input: a Dataset of intervals (epoch-second ``start_col``/``end_col``,
    closed on both ends).  Output: ``(bucket, peak)`` for every bucket
    with >= 1 boundary event.
    """

    boundaries = intervals.map_batches(
        lambda b: _boundaries(b, start_col, end_col, bucket_s),
        batch_format="pyarrow",
    )
    per_bucket = boundaries.groupby("bucket").map_groups(
        _bucket_sweep, batch_format="pyarrow"
    )

    # cross-bucket carry: one vectorized prefix over the O(#buckets)
    # summary — bounded, single block by construction.
    def carry(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {"bucket": pa.array([], pa.int64()),
                 "peak": pa.array([], pa.int64())}
            )
        order = pc.sort_indices(b["bucket"])
        b = b.take(order)
        net = b["net"].to_numpy(zero_copy_only=False)
        mx = b["mx"].to_numpy(zero_copy_only=False)
        open_before = np.r_[0, np.cumsum(net)[:-1]]
        return pa.table(
            {"bucket": b["bucket"], "peak": pa.array(open_before + mx)}
        )

    return per_bucket.repartition(1).map_batches(
        carry, batch_format="pyarrow", batch_size=None
    )
