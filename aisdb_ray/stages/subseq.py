"""Subsequence (pattern) similarity search over per-key ordered series.

Time-series "query by shape": given a short integer query pattern q of
length m, find the k windows of m consecutive observations — within one
(source, segment), in (time, seq) order — whose squared Euclidean distance
to q is smallest.  The UCR-suite / MASS family of subsequence search,
restated for a distributed engine; the reference's nearest analog is its
track-distance scoring inside encode_greatcircledistance
(/root/reference/aisdb/track_gen.py:156-210), which scores candidate
segment continuations pairwise — here the "candidate" is every window in
the lake and the query is an arbitrary shape.

Distribution shape: ONE co-shuffle on the series key (each partition holds
whole sources), then per partition a vectorized sliding kernel:

    dist(i) = W2(i) - 2*C(i) + Q2

with W2 the sliding sum of v**2 (cumsum difference), C the sliding
cross-correlation of v with q (np.correlate on int64 — an exact integer
dot per lag), and Q2 = sum(q**2) a constant.  All arithmetic is int64 and
exact, so the result hash-matches a SQL restatement (self-join on
row-number offsets) bit for bit.  Only the per-partition top-k rows leave
the task; the global merge sees O(k * partitions) rows regardless of lake
size.  Windows never cross a segment boundary — a gap the segmenter cut
is not a place a pattern can occur.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from aisdb_ray.schema import SEG, SEQ, SOURCE, TIME

_OUT = {
    "source": pa.string(),
    "start_time": pa.int64(),
    "start_seq": pa.int64(),
    "dist": pa.int64(),
}


def _empty() -> pa.Table:
    return pa.table({k: pa.array([], t) for k, t in _OUT.items()})


def _topk_rows(src, st, sq, dist, k: int):
    """k best (dist asc, source, start_time, start_seq asc) rows."""
    if len(dist) == 0:
        return _empty()
    take = min(k, len(dist))
    # lexsort: last key is primary
    order = np.lexsort((sq, st, src, dist))[:take]
    return pa.table(
        {
            "source": pa.array(src[order]),
            "start_time": pa.array(st[order].astype(np.int64)),
            "start_seq": pa.array(sq[order].astype(np.int64)),
            "dist": pa.array(dist[order].astype(np.int64)),
        }
    )


def pattern_search(ds, query, value_col: str, k: int = 10,
                   num_parts: int | None = None):
    """Top-k nearest length-m windows to ``query`` across the lake.

    ``ds`` must carry (source, seg, time, seq, value_col) — the cleaned
    series contract (stages/series.clean_series output).  Returns a
    Dataset of k rows (source, start_time, start_seq, dist), dist ascending.
    """
    from aisdb_ray.stages._dist import co_shuffle

    q = np.asarray(query, dtype=np.int64)
    m = len(q)
    if m == 0:
        raise ValueError("pattern_search: empty query pattern")
    # int64-exactness guard (the changepoint-stage policy): the distance
    # is a sum of m squared differences, each up to (|v| + |q|)^2, so
    # magnitudes above sqrt(9e18 / m) / 2 can wrap int64 and silently
    # rank the farthest window first (intermediates are modular, so only
    # the FINAL distance needs to fit)
    bound = int((9.0e18 / m) ** 0.5 / 2)
    if int(np.abs(q).max()) > bound:
        raise OverflowError(
            f"pattern_search: |query| > {bound} would overflow the exact "
            "int64 window distances; rescale the pattern first"
        )
    q2 = int(np.dot(q, q))

    def per_part(part: pa.Table) -> pa.Table:
        if part.num_rows < m:
            return _empty()
        src = part[SOURCE].to_numpy(zero_copy_only=False)
        t = part[TIME].to_numpy(zero_copy_only=False).astype(np.int64)
        s = part[SEQ].to_numpy(zero_copy_only=False).astype(np.int64)
        seg = part[SEG].to_numpy(zero_copy_only=False).astype(np.int64)
        v = part[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(v) and int(np.abs(v).max()) > bound:
            raise OverflowError(
                f"pattern_search: |{value_col}| > {bound} would overflow "
                "the exact int64 window distances; rescale first"
            )
        # (source, seg, time, seq) order; a partition holds whole sources
        order = np.lexsort((s, t, seg, src))
        src, t, s, seg, v = src[order], t[order], s[order], seg[order], v[order]
        n = len(v)
        # sliding sums over the concatenated series, then mask any window
        # that crosses a (source, seg) run boundary
        c = np.correlate(v, q, mode="valid")          # exact int64 dots
        cs2 = np.concatenate(([0], np.cumsum(v * v)))
        w2 = cs2[m:] - cs2[:-m]
        dist = w2 - 2 * c + q2
        run_change = np.r_[False, (src[1:] != src[:-1]) | (seg[1:] != seg[:-1])]
        # window starting at i is valid iff no run change in rows i+1..i+m-1
        cc = np.concatenate(([0], np.cumsum(run_change.astype(np.int64))))
        valid = (cc[m:] - cc[1:n - m + 2]) == 0
        starts = np.flatnonzero(valid)
        return _topk_rows(src[starts], t[starts], s[starts], dist[starts], k)

    partials = co_shuffle(ds, [SOURCE], per_part, num_parts=num_parts)

    def merge(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _empty()
        return _topk_rows(
            b["source"].to_numpy(zero_copy_only=False),
            b["start_time"].to_numpy(zero_copy_only=False),
            b["start_seq"].to_numpy(zero_copy_only=False),
            b["dist"].to_numpy(zero_copy_only=False),
            k,
        )

    return partials.repartition(1).map_batches(
        merge, batch_format="pyarrow", batch_size=None
    )
