"""Time-weighted average rollup (LOCF step-hold integral per bucket).

Plain per-bucket means over-weight bursts: a sensor emitting 100 points in
one minute and 1 point the next should not count the burst 100×.  The
time-weighted form integrates the last-observation-carried-forward step
function over wall time — TimescaleDB's ``time_weight('LOCF', ...)``; the
reference's per-visit minutes-in-band clock
(/root/reference/aisdb/network_graph.py:160-178) is the same integral with
an indicator value.

Semantics: within each (key, seg) — segments already bound >= max_gap
holes, so a value never holds across a data gap — point i holds its value
on [t_i, t_{i+1}); the last point of a segment holds nothing.  Each hold
interval is split EXACTLY at bucket boundaries (vectorized: one
``np.repeat`` explode by buckets-spanned, no per-row Python), yielding
per-(key, bucket) integer evidence ``twa_num = Σ v·overlap_s`` and
``dur_s = Σ overlap_s``; ``twa = twa_num / dur_s`` finalizes in float.
Zero-width holds (same-timestamp peers) contribute nothing on both the
engine and SQL sides.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from aisdb_ray.schema import N_TOK, SEG, SOURCE, TIME

TWA_NUM = "twa_num"
DUR_S = "dur_s"
TWA = "twa"
BUCKET = "bucket"


def twa_block(
    tbl: pa.Table,
    width_s: int,
    key_col: str = SOURCE,
    seg_col: str = SEG,
    time_col: str = TIME,
    seq_col: str = "seq",
    value_col: str = N_TOK,
) -> pa.Table:
    """One partition's (key, bucket, twa_num, dur_s) partials."""
    key_type = tbl.schema.field(key_col).type if key_col in tbl.column_names \
        else pa.string()
    empty = pa.table(
        {key_col: pa.array([], key_type),
         BUCKET: pa.array([], pa.int64()),
         TWA_NUM: pa.array([], pa.int64()),
         DUR_S: pa.array([], pa.int64())}
    )
    n = len(tbl)
    if n == 0:
        return empty
    import pyarrow.compute as pc

    t = tbl[time_col].to_numpy(zero_copy_only=False).astype(np.int64)
    sq = tbl[seq_col].to_numpy(zero_copy_only=False).astype(np.int64)
    sg = tbl[seg_col].to_numpy(zero_copy_only=False).astype(np.int64)
    v = tbl[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
    kcol = tbl[key_col]
    if isinstance(kcol, pa.ChunkedArray):
        kcol = kcol.combine_chunks()
    enc = pc.dictionary_encode(kcol)
    kinv = enc.indices.to_numpy().astype(np.int64)

    order = np.lexsort((sq, t, sg, kinv))
    k, g, ts, vs = kinv[order], sg[order], t[order], v[order]

    # hold intervals: consecutive rows of the same (key, seg), width > 0
    same = (k[1:] == k[:-1]) & (g[1:] == g[:-1])
    a = ts[:-1][same]
    b = ts[1:][same]
    hv = vs[:-1][same]
    hk = k[:-1][same]
    pos = b > a
    a, b, hv, hk = a[pos], b[pos], hv[pos], hk[pos]
    if len(a) == 0:
        return empty

    if int(a.min()) < 0:
        # numpy // floors while the DuckDB oracle's // truncates — the two
        # agree only on non-negative epochs, the engine's bucket-domain
        # contract (see rollup._bucket)
        raise ValueError(
            "twa: negative epochs are outside the bucket-domain contract")
    w = np.int64(width_s)
    b0 = (a // w) * w
    nb = ((b - 1) // w) - (a // w) + 1
    # explode each interval into the buckets it spans
    ridx = np.repeat(np.arange(len(a)), nb)
    # bucket offset within each interval: global arange minus per-interval start
    off = np.arange(nb.sum(), dtype=np.int64) - np.repeat(
        np.concatenate(([0], np.cumsum(nb)[:-1])), nb
    )
    bk = b0[ridx] + off * w
    overlap = np.minimum(b[ridx], bk + w) - np.maximum(a[ridx], bk)

    key_arr = enc.dictionary.take(pa.array(hk[ridx]))
    part = pa.table(
        {
            key_col: key_arr,
            BUCKET: pa.array(bk, pa.int64()),
            TWA_NUM: pa.array(hv[ridx] * overlap, pa.int64()),
            DUR_S: pa.array(overlap, pa.int64()),
        }
    )
    gres = part.group_by([key_col, BUCKET], use_threads=False).aggregate(
        [(TWA_NUM, "sum"), (DUR_S, "sum")]
    )
    return gres.rename_columns([key_col, BUCKET, TWA_NUM, DUR_S])


def _merge_b(b: pa.Table, key_col: str) -> pa.Table:
    g = b.group_by([key_col, BUCKET], use_threads=False).aggregate(
        [(TWA_NUM, "sum"), (DUR_S, "sum")]
    )
    return g.rename_columns([key_col, BUCKET, TWA_NUM, DUR_S])


def _finalize(b: pa.Table, key_col: str) -> pa.Table:
    import pyarrow.compute as pc

    return pa.table(
        {
            key_col: b[key_col],
            BUCKET: pc.cast(b[BUCKET], pa.int64()),
            TWA_NUM: pc.cast(b[TWA_NUM], pa.int64()),
            DUR_S: pc.cast(b[DUR_S], pa.int64()),
            TWA: pc.divide(
                pc.cast(b[TWA_NUM], pa.float64()), pc.cast(b[DUR_S], pa.float64())
            ),
        }
    )


def twa_rollup(
    ds,
    width_s: int,
    key_col: str = SOURCE,
    seg_col: str = SEG,
    time_col: str = TIME,
    seq_col: str = "seq",
    value_col: str = N_TOK,
    num_parts: int | None = None,
    hash_combine: bool = False,
):
    """Per-(key, bucket) time-weighted average over a cleaned/segmented
    dataset: one co-shuffle, vectorized interval explode, algebraic sum
    combine.  Holds need same-SEGMENT neighbors only, so the shuffle
    hashes on (key, seg) — a hot source's segments spread across
    partitions instead of pinning the source to one task."""
    from aisdb_ray.stages._dist import co_shuffle, funnel_combine

    partials = co_shuffle(
        ds, [key_col, seg_col],
        lambda part: twa_block(
            part, width_s, key_col, seg_col, time_col, seq_col, value_col
        ),
        num_parts,
    )
    return funnel_combine(
        partials,
        lambda b: _merge_b(b, key_col),
        key_col,
        hash_combine,
        lambda b: _finalize(b, key_col),
    )
