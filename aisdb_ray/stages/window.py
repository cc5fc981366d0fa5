"""Time-range windowed aggregates (the streaming-window operator).

Semantics: for each row, aggregate the group's rows with
``time in [t - width, t]`` — SQL's ``RANGE BETWEEN width PRECEDING AND
CURRENT ROW``.  The reference's nearest analog is its per-track rate
kernels (delta windows over sorted tracks, /root/reference/aisdb/gis.py
delta_knots/delta_meters); this generalizes them to arbitrary trailing
windows, which is also what a streaming engine computes per watermark.

Shape: ONE co-shuffle by ``hash(group) % P`` (P ≈ 2×cluster CPUs) and one
vectorized task per partition that processes ALL of its groups in a single
pass — not ``groupby(group).map_groups``, whose per-group invocation
overhead dominates when groups are small (measured 22 s → ~6 s on 4 M
rows × 512 groups).  Inside a partition:

- rows lexsort by (group, time); a composite key
  ``gidx * stride + (t - tmin)`` with ``stride > span + width`` makes one
  global ``np.searchsorted`` resolve every row's window edges WITHIN its
  group (the offset can never cross a group boundary);
- sum / count: prefix sums over the sorted values;
- mean: the exact IEEE division sum/count (int64 exact operands) — the
  same float-determinism contract as stages/rollup.py, so the SQL oracle
  (CAST(sum AS DOUBLE)/count) matches bit-for-bit;
- min / max over *variable-width* windows: a sparse-table RMQ
  (O(n log n) build, O(1) vectorized query) — no per-row Python loop.

Tie handling follows SQL RANGE windows: rows sharing a timestamp are
peers — every peer's window includes all of them.  Aggregates are exact,
no sketching.  Skewed groups: a group hotter than one partition's memory
needs the salted time-chunk layout with a ``width``-sized halo (exactly
the gap-fill halo contract in stages/salted.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _sparse_table(v: np.ndarray, reduce_fn, levels: int | None = None) -> np.ndarray:
    """st[k][i] = reduce(v[i : i + 2**k]) for i + 2**k <= n (rest padded
    with shorter suffix reductions — never queried past the valid range).
    ``levels`` caps the build at what the longest query needs — windows
    are usually far shorter than the partition."""
    n = len(v)
    if levels is None:
        levels = max(1, int(np.floor(np.log2(n))) + 1)
    st = np.empty((levels, n), dtype=v.dtype)
    st[0] = v
    for k in range(1, levels):
        half = 1 << (k - 1)
        m = n - (1 << k) + 1
        st[k, :m] = reduce_fn(st[k - 1, :m], st[k - 1, half : half + m])
        st[k, m:] = st[k - 1, m:]
    return st


def _range_query(st: np.ndarray, lo: np.ndarray, hi: np.ndarray, reduce_fn):
    """Vectorized reduce over v[lo..hi] inclusive (lo <= hi elementwise)."""
    length = hi - lo + 1
    k = np.floor(np.log2(length)).astype(np.int64)
    span = np.left_shift(1, k)
    return reduce_fn(st[k, lo], st[k, hi - span + 1])


def rolling_block(
    tbl: pa.Table,
    group: str,
    time_col: str,
    value: str,
    width: int | None,
    with_sumsq: bool = False,
    with_minmax: bool = True,
) -> pa.Table:
    """All groups in one table -> the same rows (group+time sorted) +
    trailing-window sum / count / mean / min / max of ``value``.

    ``width=None`` means RANGE UNBOUNDED PRECEDING (running aggregates):
    the window opens at the group's first row instead of ``t - width``.
    ``with_minmax=False`` skips the two sparse-table builds (the dominant
    O(n log n) cost) for consumers that only need sum/count/moments —
    e.g. the z-score flag."""
    n = len(tbl)
    if n == 0:
        # keep the OUTPUT schema stable for empty partitions (the staged
        # exchange runs block_fn on empty partitions; mixed schemas break
        # downstream unification)
        out = tbl
        for c in ("w_sum", "w_n"):
            out = out.append_column(c, pa.array([], pa.int64()))
        out = out.append_column("w_mean", pa.array([], pa.float64()))
        if with_minmax:
            for c in ("w_min", "w_max"):
                out = out.append_column(c, pa.array([], pa.int64()))
        if with_sumsq:
            out = out.append_column("w_sumsq", pa.array([], pa.int64()))
        return out
    import pyarrow.compute as pc

    t_raw = tbl[time_col].to_numpy(zero_copy_only=False).astype(np.int64)
    # factorize the group column in C (dictionary encode): windows only need
    # group CONTIGUITY after the sort, not any particular group order
    gcol = tbl[group]
    if isinstance(gcol, pa.ChunkedArray):
        gcol = gcol.combine_chunks()
    ginv = pc.dictionary_encode(gcol).indices.to_numpy().astype(np.int64)
    order = np.lexsort((t_raw, ginv))
    tbl = tbl.take(pa.array(order))
    t = t_raw[order]
    g = ginv[order].astype(np.int64)
    v = tbl[value].to_numpy(zero_copy_only=False).astype(np.int64)

    tmin = t.min()
    w = np.int64(0 if width is None else width)
    stride = (t.max() - tmin) + w + 2
    key = g * stride + (t - tmin)

    if width is None:
        gchange = np.r_[True, g[1:] != g[:-1]]
        lo = np.maximum.accumulate(np.where(gchange, np.arange(n), 0))
    else:
        lo = np.searchsorted(key, key - w, side="left")
    # RANGE semantics: the window closes at the last PEER (equal-time) row,
    # not at this row's position — same-timestamp bursts aggregate together
    hi = np.searchsorted(key, key, side="right") - 1

    cum = np.concatenate(([0], np.cumsum(v, dtype=np.int64)))
    w_sum = cum[hi + 1] - cum[lo]
    w_n = hi - lo + 1
    w_sumsq = None
    if with_sumsq:
        # second moment for variance / z-score consumers; v < 2^20 is
        # enforced by the packable-value contract elsewhere, so v**2 sums
        # stay far inside int64 for any realistic window population
        cum2 = np.concatenate(([0], np.cumsum(v * v, dtype=np.int64)))
        w_sumsq = cum2[hi + 1] - cum2[lo]

    w_min = w_max = None
    if with_minmax:
        levels = max(1, int(np.floor(np.log2(int(w_n.max())))) + 1)
        st_min = _sparse_table(v, np.minimum, levels)
        st_max = _sparse_table(v, np.maximum, levels)
        w_min = _range_query(st_min, lo, hi, np.minimum)
        w_max = _range_query(st_max, lo, hi, np.maximum)

    out = tbl
    out = out.append_column("w_sum", pa.array(w_sum, pa.int64()))
    out = out.append_column("w_n", pa.array(w_n, pa.int64()))
    out = out.append_column(
        "w_mean", pa.array(w_sum.astype(np.float64) / w_n, pa.float64())
    )
    if with_minmax:
        out = out.append_column("w_min", pa.array(w_min, pa.int64()))
        out = out.append_column("w_max", pa.array(w_max, pa.int64()))
    if w_sumsq is not None:
        out = out.append_column("w_sumsq", pa.array(w_sumsq, pa.int64()))
    return out


def rolling_group(
    tbl: pa.Table, time_col: str, value: str, width: int | None
) -> pa.Table:
    """Single-group convenience wrapper (one series already in hand)."""
    tagged = tbl.append_column("_one", pa.array(np.zeros(len(tbl), np.int8)))
    return rolling_block(tagged, "_one", time_col, value, width).drop_columns(
        ["_one"]
    )


def rolling_time_aggregate(
    ds,
    group: str,
    time_col: str,
    value: str,
    width: int | None,
    num_parts: int | None = None,
    with_sumsq: bool = False,
    staging_dir: str | None = None,
    with_minmax: bool = True,
):
    """Per-(group, row) trailing-window aggregates over a Dataset
    (``width=None`` -> running/unbounded-preceding aggregates).

    One hash-partition co-shuffle (same pattern as stages/join.py), then
    one multi-group vectorized task per partition.  ``staging_dir`` routes
    the exchange through the disk-staged map-side shuffle instead of the
    object-store sort (stages/_dist.co_shuffle_staged) — the scale path
    for inputs whose sort barrier dominates.
    """
    from aisdb_ray.stages._dist import co_shuffle, co_shuffle_staged

    def block(part: pa.Table) -> pa.Table:
        return rolling_block(part, group, time_col, value, width, with_sumsq,
                             with_minmax)

    if staging_dir is not None:
        return co_shuffle_staged(ds, [group], block, staging_dir, num_parts)
    return co_shuffle(ds, [group], block, num_parts)


def deltas_block(
    tbl: pa.Table, group: str, time_col: str, seq_col: str,
    value_col: str | None = None,
) -> pa.Table:
    """(group, time, seq, dt [, dv]) rows: per-group deltas in (time, seq)
    order, each row carrying the LATER point's (time, seq); the group's
    first row (no predecessor) is dropped.  ``value_col`` adds the value
    delta ``dv`` (later − earlier)."""
    import pyarrow.compute as pc

    n = len(tbl)
    if n == 0:
        cols = {group: pa.array([], tbl.schema.field(group).type),
                time_col: pa.array([], pa.int64()),
                seq_col: pa.array([], pa.int64()),
                "dt": pa.array([], pa.int64())}
        if value_col is not None:
            cols["dv"] = pa.array([], pa.int64())
        return pa.table(cols)
    t = tbl[time_col].to_numpy(zero_copy_only=False).astype(np.int64)
    sq = tbl[seq_col].to_numpy(zero_copy_only=False).astype(np.int64)
    gcol = tbl[group]
    if isinstance(gcol, pa.ChunkedArray):
        gcol = gcol.combine_chunks()
    ginv = pc.dictionary_encode(gcol).indices.to_numpy().astype(np.int64)
    order = np.lexsort((sq, t, ginv))
    g, ts, ss = ginv[order], t[order], sq[order]
    same = np.r_[False, g[1:] == g[:-1]]
    dt = np.empty(n, np.int64)
    dt[1:] = ts[1:] - ts[:-1]
    keep = pa.array(same)
    cols = {
        group: gcol.take(pa.array(order)).filter(keep),
        time_col: pa.array(ts, pa.int64()).filter(keep),
        seq_col: pa.array(ss, pa.int64()).filter(keep),
        "dt": pa.array(dt, pa.int64()).filter(keep),
    }
    if value_col is not None:
        v = tbl[value_col].to_numpy(zero_copy_only=False).astype(np.int64)[order]
        dv = np.empty(n, np.int64)
        dv[1:] = v[1:] - v[:-1]
        cols["dv"] = pa.array(dv, pa.int64()).filter(keep)
    return pa.table(cols)


def group_deltas(ds, group: str, time_col: str, seq_col: str,
                 value_col: str | None = None, num_parts: int | None = None):
    """Per-group deltas over a Dataset — the M11 Δt/Δvalue kernel as a
    standalone stage (one co-shuffle, multi-group vectorized tasks)."""
    from aisdb_ray.stages._dist import co_shuffle

    return co_shuffle(
        ds, [group],
        lambda part: deltas_block(part, group, time_col, seq_col, value_col),
        num_parts,
    )


def cusum_block(
    tbl: pa.Table,
    group: str,
    time_col: str,
    seq_col: str,
    value: str,
    h: int,
    baseline_k: int = 32,
) -> pa.Table:
    """One partition's CUSUM change-points, exact in int64.

    The classic one-sided CUSUM recurrence ``s_i = max(0, s_{i-1} + x_i)``
    (x = value − per-group baseline) has the closed form
    ``s_i = P_i − min(0, min_{j≤i} P_j)`` over the prefix sums P — a pure
    cumsum + segmented running-min, so the whole detector vectorizes with
    no sequential Python loop.  The baseline is the integer-floor mean of
    the group's first ``baseline_k`` rows (drift is measured against the
    series' own early behavior).  Rows with ``s > h`` are returned with the
    ``cusum`` evidence column."""
    import pyarrow.compute as pc

    n = len(tbl)
    if n == 0:
        return tbl.append_column("cusum", pa.array([], pa.int64()))
    t = tbl[time_col].to_numpy(zero_copy_only=False).astype(np.int64)
    sq = tbl[seq_col].to_numpy(zero_copy_only=False).astype(np.int64)
    gcol = tbl[group]
    if isinstance(gcol, pa.ChunkedArray):
        gcol = gcol.combine_chunks()
    ginv = pc.dictionary_encode(gcol).indices.to_numpy().astype(np.int64)
    order = np.lexsort((sq, t, ginv))
    tbl = tbl.take(pa.array(order))
    g = ginv[order]
    v = tbl[value].to_numpy(zero_copy_only=False).astype(np.int64)

    starts = np.flatnonzero(np.r_[True, g[1:] != g[:-1]])
    ends = np.r_[starts[1:], n]
    # per-group baseline: floor-mean of the first baseline_k rows
    cv = np.concatenate(([0], np.cumsum(v, dtype=np.int64)))
    k = np.minimum(ends - starts, baseline_k)
    target = (cv[starts + k] - cv[starts]) // k
    seg_id = np.repeat(np.arange(len(starts)), ends - starts)
    xv = v - target[seg_id]

    cx = np.cumsum(xv, dtype=np.int64)
    p = cx - np.repeat(cx[starts] - xv[starts], ends - starts)
    big = 2 * (np.abs(p).max() + 1)
    q = p - seg_id * big  # later groups strictly below all earlier ones
    runmin = np.minimum.accumulate(q) + seg_id * big
    s = p - np.minimum(0, runmin)
    out = tbl.append_column("cusum", pa.array(s, pa.int64()))
    return out.filter(pa.array(s > h))


def cusum_changepoints(
    ds,
    group: str,
    time_col: str,
    seq_col: str,
    value: str,
    h: int,
    baseline_k: int = 32,
    num_parts: int | None = None,
):
    """Distributed CUSUM drift detection per group (one co-shuffle, then a
    fully-vectorized multi-group task per partition)."""
    from aisdb_ray.stages._dist import co_shuffle

    return co_shuffle(
        ds, [group],
        lambda part: cusum_block(
            part, group, time_col, seq_col, value, h, baseline_k
        ),
        num_parts,
    )


def zscore_anomalies(
    ds,
    group: str,
    time_col: str,
    value: str,
    width: int,
    k2_num: int = 9,
    k2_den: int = 1,
    min_n: int = 8,
    num_parts: int | None = None,
):
    """Trailing-window z-score anomaly detection, exact in integers.

    A row is anomalous when its deviation from the trailing-window mean
    exceeds ``k`` window standard deviations (population variance, window =
    ``[t - width, t]`` including peers), with ``k² = k2_num / k2_den``:

        (v - mean)² > k²·var
      ⇔ (v·n - sum)² · k2_den  >  k2_num · (n·sumsq - sum²)

    — both sides int64, so the flag is bit-exact vs a SQL window oracle
    (no float thresholds).  Windows with fewer than ``min_n`` rows never
    flag (cold-start rule).  Returns only the anomalous rows, carrying the
    integer evidence columns (w_sum / w_n / w_sumsq)."""
    import pyarrow.compute as pc

    rolled = rolling_time_aggregate(
        ds, group, time_col, value, width, num_parts, with_sumsq=True,
        with_minmax=False,  # the flag never reads min/max — skip the two
                            # sparse-table builds (the dominant cost)
    )

    def flag(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b.drop_columns(["w_mean"])
        v = b[value].to_numpy(zero_copy_only=False).astype(np.int64)
        n = b["w_n"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = b["w_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
        ss = b["w_sumsq"].to_numpy(zero_copy_only=False).astype(np.int64)
        # int64 safety: with mixed-sign values |dev| = |v·n − sum| can reach
        # 2·n·max|v| (|sum| ≤ n·max|v| alone), and the flag squares it, so
        # the exact-integer contract needs 2·n·max|v|·max(k2) < 2^31 (then
        # dev²·k2_den < 2^62 and k2_num·n·sumsq < 2^62 too).  Denser windows
        # must rescale or narrow — raise rather than silently wrap (the SQL
        # oracle errors likewise).
        vmax = int(np.abs(v).max()) if len(v) else 0
        if 2 * int(n.max()) * max(vmax, 1) * max(k2_num, k2_den) >= (1 << 31):
            raise ValueError(
                "z-score flag would overflow int64: window population × "
                "value magnitude too large — narrow the window or rescale"
            )
        dev = v * n - s
        keep = (n >= min_n) & (dev * dev * k2_den > k2_num * (n * ss - s * s))
        return b.filter(pa.array(keep)).drop_columns(["w_mean"])

    return rolled.map_batches(flag, batch_format="pyarrow")


def ewma_block(
    tbl: pa.Table,
    group: str,
    time_col: str,
    value: str,
    a_num: int = 1,
    a_den: int = 4,
) -> pa.Table:
    """One partition's exponentially-weighted moving average per group.

    The recurrence ``s_0 = v_0; s_i = s_{i-1} + (v_i - s_{i-1}) * alpha``
    (alpha = a_num/a_den, evaluated once as a double — write the SAME
    literal division in the SQL oracle) is sequential in i but independent
    across groups, so it runs RANK-synchronously: one vectorized step per
    in-group rank over all groups at once — the loop count is the longest
    group's length, not the row count, and each element sees the exact
    IEEE op sequence of the scalar recurrence (bit-identical to a
    per-group recursive CTE)."""
    n = len(tbl)
    if n == 0:
        return tbl.append_column("ewma", pa.array([], pa.float64()))
    import pyarrow.compute as pc

    gcol = tbl[group]
    if isinstance(gcol, pa.ChunkedArray):
        gcol = gcol.combine_chunks()
    ginv = pc.dictionary_encode(gcol).indices.to_numpy().astype(np.int64)
    t = tbl[time_col].to_numpy(zero_copy_only=False).astype(np.int64)
    v_all = tbl[value].to_numpy(zero_copy_only=False).astype(np.float64)
    # value as the final tiebreaker: without it, rows sharing (group,
    # time) would order by incoming block layout and the recurrence
    # result would vary run to run (shuffle order is not deterministic)
    order = np.lexsort((v_all, t, ginv))
    tbl = tbl.take(pa.array(order))
    g = ginv[order]
    v = v_all[order]

    starts = np.flatnonzero(np.r_[True, g[1:] != g[:-1]])
    ends = np.r_[starts[1:], n]
    alpha = float(a_num) / float(a_den)
    s = np.empty(n, dtype=np.float64)
    s[starts] = v[starts]
    for j in range(1, int((ends - starts).max())):
        idx = starts + j
        live = idx[idx < ends]
        s[live] = s[live - 1] + (v[live] - s[live - 1]) * alpha
    return tbl.append_column("ewma", pa.array(s, pa.float64()))


def ewma(
    ds,
    group: str,
    time_col: str,
    value: str,
    a_num: int = 1,
    a_den: int = 4,
    num_parts: int | None = None,
):
    """Distributed per-group EWMA: one co-shuffle on the group key, then
    the rank-synchronous vectorized recurrence per partition."""
    from aisdb_ray.stages._dist import co_shuffle

    return co_shuffle(
        ds, [group],
        lambda part: ewma_block(part, group, time_col, value, a_num, a_den),
        num_parts,
    )


def mad_outliers(
    ds,
    group: str = "source",
    value: str = "n_tok",
    k: int = 3,
    keep_cols: tuple[str, ...] = ("source", "doc_id", "time", "n_tok"),
    num_parts: int | None = None,
):
    """Per-series robust outliers: rows where |v − median| > k · MAD
    (median absolute deviation) — the standard robust alternative to the
    z-score flag (:func:`zscore_anomalies`) when the channel has heavy
    tails or level shifts.

    Exact integer evidence: with med2 = 2·median(v) (an integer for any
    int series: the middle pair's sum) and mad4 = 2·median(|2v − med2|),
    the flag is ``2·|2v − med2| > k·mad4`` — all-integer, so Ray and the
    SQL oracle agree bit-for-bit; no float median ever compares.

    Shape: one hash co-shuffle on the series key, then a vectorized
    two-median kernel per partition (every row of a series lands in one
    partition, so partition-local medians are exact)."""
    from aisdb_ray.stages._dist import co_shuffle

    def block(part: pa.Table) -> pa.Table:
        out = part.select(list(keep_cols))
        if part.num_rows == 0:
            return out
        import pyarrow.compute as pc

        g = part[group]
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        codes = pc.dictionary_encode(g)
        if isinstance(codes, pa.ChunkedArray):
            codes = codes.combine_chunks()
        gid = codes.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        v = part[value].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(gid, kind="stable")
        gs, vs = gid[order], v[order]
        starts = np.flatnonzero(np.r_[True, gs[1:] != gs[:-1]])
        bounds = np.r_[starts, len(gs)]
        keep_sorted = np.zeros(len(gs), dtype=bool)
        for b0, b1 in zip(bounds[:-1], bounds[1:]):
            seg = vs[b0:b1]
            med2 = int(round(2 * float(np.median(seg))))
            dev2 = np.abs(2 * seg - med2)
            mad4 = int(round(2 * float(np.median(dev2))))
            keep_sorted[b0:b1] = 2 * dev2 > k * mad4
        keep = np.zeros(len(gs), dtype=bool)
        keep[order] = keep_sorted
        return out.filter(pa.array(keep))

    return co_shuffle(ds, [group], block, num_parts)


def holt_block(
    tbl: pa.Table,
    group: str,
    time_col: str,
    value: str,
    a_num: int = 1,
    a_den: int = 4,
    b_num: int = 1,
    b_den: int = 8,
) -> pa.Table:
    """One partition's Holt linear-trend smoothing per group — the
    two-state extension of :func:`ewma_block`:

        level_0 = v_0;  trend_0 = v_1 - v_0 (0 for length-1 groups)
        lp      = level + trend                      (one-step forecast)
        level'  = lp + (v - lp) * alpha
        trend'  = trend + ((level' - level) - trend) * beta

    Same rank-synchronous execution: the coupled recurrence is sequential
    in rank but independent across groups, so each rank step is one
    vectorized update of BOTH state vectors over all groups, and every
    element sees the exact IEEE op sequence of the scalar recurrence —
    bit-identical to a per-group recursive CTE that spells out the same
    expressions."""
    n = len(tbl)
    if n == 0:
        t0 = tbl.append_column("holt_level", pa.array([], pa.float64()))
        return t0.append_column("holt_trend", pa.array([], pa.float64()))
    import pyarrow.compute as pc

    gcol = tbl[group]
    if isinstance(gcol, pa.ChunkedArray):
        gcol = gcol.combine_chunks()
    ginv = pc.dictionary_encode(gcol).indices.to_numpy().astype(np.int64)
    t = tbl[time_col].to_numpy(zero_copy_only=False).astype(np.int64)
    v_all = tbl[value].to_numpy(zero_copy_only=False).astype(np.float64)
    # value tiebreaker: same determinism rationale as ewma_block
    order = np.lexsort((v_all, t, ginv))
    tbl = tbl.take(pa.array(order))
    g = ginv[order]
    v = v_all[order]

    starts = np.flatnonzero(np.r_[True, g[1:] != g[:-1]])
    ends = np.r_[starts[1:], n]
    alpha = float(a_num) / float(a_den)
    beta = float(b_num) / float(b_den)
    lev = np.empty(n, dtype=np.float64)
    trd = np.empty(n, dtype=np.float64)
    lev[starts] = v[starts]
    two = starts + 1 < ends
    trd[starts[two]] = v[starts[two] + 1] - v[starts[two]]
    trd[starts[~two]] = 0.0
    for j in range(1, int((ends - starts).max())):
        idx = starts + j
        live = idx[idx < ends]
        lp = lev[live - 1] + trd[live - 1]
        lev[live] = lp + (v[live] - lp) * alpha
        trd[live] = trd[live - 1] + ((lev[live] - lev[live - 1]) - trd[live - 1]) * beta
    out = tbl.append_column("holt_level", pa.array(lev, pa.float64()))
    return out.append_column("holt_trend", pa.array(trd, pa.float64()))


def holt(
    ds,
    group: str,
    time_col: str,
    value: str,
    a_num: int = 1,
    a_den: int = 4,
    b_num: int = 1,
    b_den: int = 8,
    num_parts: int | None = None,
):
    """Distributed per-group Holt smoothing: one co-shuffle on the group
    key, then the rank-synchronous two-state recurrence per partition."""
    from aisdb_ray.stages._dist import co_shuffle

    return co_shuffle(
        ds, [group],
        lambda part: holt_block(
            part, group, time_col, value, a_num, a_den, b_num, b_den
        ),
        num_parts,
    )


def top_movers(
    ds,
    group: str = "source",
    time_col: str = "bucket",
    value: str = "sum_n_tok",
    num_parts: int | None = None,
):
    """Per-series largest step change: for each group, the (time, value)
    row whose delta vs the previous row has the greatest |delta| (ties ->
    earliest time) — the day-over-day anomaly surfaced by monitoring
    dashboards, computed over an already-rolled-up tier so only tier rows
    shuffle.  Groups with a single row emit nothing.

    One group-keyed co-shuffle, then a vectorized diff + segmented argmax
    per partition.  Output: (group, time, prev_time, prev_value, value,
    delta), all exact integers."""
    from aisdb_ray.stages._dist import co_shuffle

    def block(part: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        empty = pa.table(
            {
                group: pa.array([], part.schema.field(group).type),
                time_col: pa.array([], pa.int64()),
                "prev_" + time_col: pa.array([], pa.int64()),
                "prev_" + value: pa.array([], pa.int64()),
                value: pa.array([], pa.int64()),
                "delta": pa.array([], pa.int64()),
            }
        )
        if part.num_rows == 0:
            return empty
        gcol = part[group]
        if isinstance(gcol, pa.ChunkedArray):
            gcol = gcol.combine_chunks()
        codes = pc.dictionary_encode(gcol)
        if isinstance(codes, pa.ChunkedArray):
            codes = codes.combine_chunks()
        gid = codes.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        t = part[time_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = part[value].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((t, gid))
        gs, ts, vs = gid[order], t[order], v[order]
        same = np.r_[False, gs[1:] == gs[:-1]]  # row has an in-group predecessor
        if not same.any():
            return empty
        idx = np.flatnonzero(same)
        delta = vs[idx] - vs[idx - 1]
        # argmax |delta| per group, ties -> earliest time: lexsort by
        # (time asc) then stable-argsort on -|delta| keeps time order
        g_of = gs[idx]
        pick_order = np.lexsort((ts[idx], -np.abs(delta), g_of))
        first = np.r_[True, g_of[pick_order][1:] != g_of[pick_order][:-1]]
        win = pick_order[first]
        rows = idx[win]
        srcs = gcol.take(pa.array(order[rows]))
        return pa.table(
            {
                group: srcs,
                time_col: pa.array(ts[rows]),
                "prev_" + time_col: pa.array(ts[rows - 1]),
                "prev_" + value: pa.array(vs[rows - 1]),
                value: pa.array(vs[rows]),
                "delta": pa.array(delta[win]),
            }
        )

    return co_shuffle(ds, [group], block, num_parts)


def rolling_median(
    ds,
    w: int = 8,
    group: str = "source",
    time_col: str = "time",
    seq_col: str = "seq",
    value: str = "n_tok",
    num_parts: int | None = None,
):
    """Trailing ``w``-row median per series — the robust smoother used
    where a mean window (:func:`rolling_time_aggregate`) would chase
    spikes.  SQL semantics: ``median(v) OVER (PARTITION BY group ORDER BY
    time, seq ROWS BETWEEN w-1 PRECEDING AND CURRENT ROW)``.

    Exact integer evidence: emits ``med2 = 2·median`` (the middle pair's
    sum — an integer for any int series), so Ray and the SQL oracle
    (``CAST(2*median(...) AS BIGINT)``) agree bit-for-bit with no float
    median ever compared.

    Shape: one hash co-shuffle on the series key (every row of a series
    lands in one partition), then one vectorized task per partition:
    full windows sort via ``sliding_window_view`` (O(n·w log w), no
    per-row Python), the w-1 warm-up prefixes via a bounded loop."""
    from numpy.lib.stride_tricks import sliding_window_view

    from aisdb_ray.stages._dist import co_shuffle

    def block(part: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if part.num_rows == 0:
            return part.append_column("med2", pa.array([], pa.int64()))
        gcol = part[group]
        if isinstance(gcol, pa.ChunkedArray):
            gcol = gcol.combine_chunks()
        codes = pc.dictionary_encode(gcol)
        if isinstance(codes, pa.ChunkedArray):
            codes = codes.combine_chunks()
        gid = codes.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        t = part[time_col].to_numpy(zero_copy_only=False).astype(np.int64)
        q = part[seq_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = part[value].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((q, t, gid))
        gs, vs = gid[order], v[order]
        starts = np.flatnonzero(np.r_[True, gs[1:] != gs[:-1]])
        bounds = np.r_[starts, len(gs)]
        med2 = np.empty(len(gs), dtype=np.int64)
        for b0, b1 in zip(bounds[:-1], bounds[1:]):
            seg = vs[b0:b1]
            n = len(seg)
            head = min(w - 1, n)
            for i in range(head):  # warm-up: w-1 growing prefixes
                s = np.sort(seg[: i + 1])
                med2[b0 + i] = s[i // 2] + s[(i + 1) // 2]
            if n >= w:
                win = np.sort(sliding_window_view(seg, w), axis=1)
                med2[b0 + w - 1 : b1] = (
                    win[:, (w - 1) // 2] + win[:, w // 2]
                )
        out = np.empty(len(gs), dtype=np.int64)
        out[order] = med2
        return part.append_column("med2", pa.array(out))

    return co_shuffle(ds, [group], block, num_parts)


def theil_sen(
    ds,
    group: str = "source",
    time_col: str = "time",
    value: str = "n_tok",
    day: int = 86400,
    scale: int = 1_000_000,
    num_parts: int | None = None,
):
    """Per-(series, day) Theil–Sen robust trend: the median of all
    pairwise slopes ``(v_j - v_i) / (t_j - t_i)`` over the bucket's
    points (Sen 1968) — the regression-slope estimator immune to the
    outliers that wreck least squares on telemetry channels.

    Exact integer evidence: each pairwise slope is fixed-point
    ``trunc((v_j - v_i) · scale / (t_j - t_i))`` (truncation toward zero
    — DuckDB's ``//``), and the output carries ``slope2_fx = 2·median``
    of those integers plus the pair count, so the oracle matches
    bit-for-bit.  Equal-timestamp pairs are excluded (undefined slope);
    buckets with no valid pair emit nothing.

    Shape: one hash co-shuffle on the series key; per-bucket O(n²) pair
    enumeration is vectorized (triu indices) and bounded by the bucket
    width — a day of one series, the same bounded-group assumption as
    the gap-fill halo contract.  At wider buckets, feed a rolled-up tier
    instead of raw points."""
    from aisdb_ray.stages._dist import co_shuffle

    def block(part: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        empty = pa.table(
            {
                group: pa.array([], part.schema.field(group).type),
                "day": pa.array([], pa.int64()),
                "n_pairs": pa.array([], pa.int64()),
                "slope2_fx": pa.array([], pa.int64()),
            }
        )
        if part.num_rows == 0:
            return empty
        gcol = part[group]
        if isinstance(gcol, pa.ChunkedArray):
            gcol = gcol.combine_chunks()
        codes = pc.dictionary_encode(gcol)
        if isinstance(codes, pa.ChunkedArray):
            codes = codes.combine_chunks()
        gid = codes.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        t = part[time_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = part[value].to_numpy(zero_copy_only=False).astype(np.int64)
        d = (t // day) * day
        key = gid * (1 << 40) + (d // day)  # day fits far below 2^40
        order = np.lexsort((t, key))
        ks, ts, vs = key[order], t[order], v[order]
        starts = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]])
        bounds = np.r_[starts, len(ks)]
        rows_g, rows_d, rows_n, rows_s = [], [], [], []
        for b0, b1 in zip(bounds[:-1], bounds[1:]):
            tt, vv = ts[b0:b1], vs[b0:b1]
            n = len(tt)
            if n < 2:
                continue
            i, j = np.triu_indices(n, k=1)
            dt = tt[j] - tt[i]
            ok = dt > 0
            if not ok.any():
                continue
            dt = dt[ok]
            num = (vv[j] - vv[i])[ok] * scale
            # truncation toward zero, matching DuckDB's integer //
            s = np.sign(num) * (np.abs(num) // dt)
            s.sort()
            m = len(s)
            rows_g.append(order[b0])
            rows_d.append((ts[b0] // day) * day)
            rows_n.append(m)
            rows_s.append(int(s[(m - 1) // 2] + s[m // 2]))
        if not rows_g:
            return empty
        return pa.table(
            {
                group: gcol.take(pa.array(rows_g, pa.int64())),
                "day": pa.array(rows_d, pa.int64()),
                "n_pairs": pa.array(rows_n, pa.int64()),
                "slope2_fx": pa.array(rows_s, pa.int64()),
            }
        )

    return co_shuffle(ds, [group], block, num_parts)


def flatline_runs(
    ds,
    min_len: int = 3,
    group: str = "source",
    time_col: str = "time",
    seq_col: str = "seq",
    value: str = "n_tok",
    num_parts: int | None = None,
):
    """Stuck-channel detection: maximal runs of ``min_len``-or-more
    consecutive points (time order) carrying the SAME value — the
    flatline signature of a wedged sensor / stalled producer, the dual of
    the reference's anchored-ping filter (T7: /root/reference/aisdb/
    track_gen.py min-speed family flags points that move too little;
    this flags the value channel not moving at all).

    Output: one row per run — (group, value, start_time, end_time,
    n_points), all exact integers.  One hash co-shuffle on the series
    key, then a vectorized run-length encode per partition (no per-row
    Python)."""
    from aisdb_ray.stages._dist import co_shuffle

    def block(part: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        empty = pa.table(
            {
                group: pa.array([], part.schema.field(group).type),
                value: pa.array([], pa.int64()),
                "start_time": pa.array([], pa.int64()),
                "end_time": pa.array([], pa.int64()),
                "n_points": pa.array([], pa.int64()),
            }
        )
        if part.num_rows == 0:
            return empty
        gcol = part[group]
        if isinstance(gcol, pa.ChunkedArray):
            gcol = gcol.combine_chunks()
        codes = pc.dictionary_encode(gcol)
        if isinstance(codes, pa.ChunkedArray):
            codes = codes.combine_chunks()
        gid = codes.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        t = part[time_col].to_numpy(zero_copy_only=False).astype(np.int64)
        q = part[seq_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = part[value].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((q, t, gid))
        gs, ts, vs = gid[order], t[order], v[order]
        # run boundary: new group OR value change
        brk = np.r_[True, (gs[1:] != gs[:-1]) | (vs[1:] != vs[:-1])]
        starts = np.flatnonzero(brk)
        ends = np.r_[starts[1:], len(gs)]
        lens = ends - starts
        keep = lens >= min_len
        s, e, L = starts[keep], ends[keep] - 1, lens[keep]
        if len(s) == 0:
            return empty
        return pa.table(
            {
                group: gcol.take(pa.array(order[s])),
                value: pa.array(vs[s]),
                "start_time": pa.array(ts[s]),
                "end_time": pa.array(ts[e]),
                "n_points": pa.array(L.astype(np.int64)),
            }
        )

    return co_shuffle(ds, [group], block, num_parts)


def benford_digits(
    ds,
    group: str = "source",
    value: str = "n_tok",
):
    """First-significant-digit histogram per series (Benford screening —
    the cheap fabricated-data / unit-mix-up detector for positive
    channels).  Counts are algebraic: per-batch (group, digit) partials,
    one digit-bounded hash combine; the leading digit of a positive int
    is extracted by a bounded divide-by-10 loop (vectorized, ≤ 19
    iterations for int64 — no string conversion)."""
    from aisdb_ray.stages._dist import funnel_combine

    def partial(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        empty = pa.table(
            {
                group: pa.array([], b.schema.field(group).type),
                "digit": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            }
        )
        if b.num_rows == 0:
            return empty
        v = b[value].to_numpy(zero_copy_only=False).astype(np.int64)
        # Benford's law is a statement about positive significands: zeros
        # and negatives have no leading digit 1-9 — drop them rather than
        # emit nonsense buckets (digit=0 or digit=-25) the scorer would
        # silently mis-screen on
        keep = v > 0
        if not keep.all():
            b = b.filter(pa.array(keep))
            v = v[keep]
            if len(v) == 0:
                return empty
        d = v.copy()
        big = d >= 10
        while big.any():
            d[big] //= 10
            big = d >= 10
        t = pa.table({group: b[group], "digit": pa.array(d)})
        g = t.group_by([group, "digit"], use_threads=False).aggregate(
            [([], "count_all")]
        )
        return g.rename_columns([group, "digit", "n"])

    def merge(b: pa.Table) -> pa.Table:
        g = b.group_by([group, "digit"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        return g.rename_columns([group, "digit", "n"])

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return funnel_combine(partials, merge, key_col=group, hash_combine=True)


def longest_rising_streak(
    ds,
    group: str = "source",
    time_col: str = "time",
    seq_col: str = "seq",
    value: str = "n_tok",
    num_parts: int | None = None,
):
    """Longest strictly-increasing run per series (monotone-streak
    detection — sustained-growth spans on a counter-like channel; the
    directional dual of :func:`flatline_runs`).  A run of k points spans
    k-1 consecutive rising steps in (time, seq) order; ties on length
    break to the earliest start.  Output: (group, n_points, start_time,
    end_time).

    One hash co-shuffle on the series key, then a vectorized
    gaps-and-islands pass per partition (cumsum of break flags, segmented
    reduce, per-group arg-max)."""
    from aisdb_ray.stages._dist import co_shuffle

    def block(part: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        empty = pa.table(
            {
                group: pa.array([], part.schema.field(group).type),
                "n_points": pa.array([], pa.int64()),
                "start_time": pa.array([], pa.int64()),
                "end_time": pa.array([], pa.int64()),
            }
        )
        if part.num_rows == 0:
            return empty
        gcol = part[group]
        if isinstance(gcol, pa.ChunkedArray):
            gcol = gcol.combine_chunks()
        codes = pc.dictionary_encode(gcol)
        if isinstance(codes, pa.ChunkedArray):
            codes = codes.combine_chunks()
        gid = codes.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        t = part[time_col].to_numpy(zero_copy_only=False).astype(np.int64)
        q = part[seq_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = part[value].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((q, t, gid))
        gs, ts, vs = gid[order], t[order], v[order]
        brk = np.r_[True, (gs[1:] != gs[:-1]) | (vs[1:] <= vs[:-1])]
        starts = np.flatnonzero(brk)
        ends = np.r_[starts[1:], len(gs)]
        lens = (ends - starts).astype(np.int64)
        run_g = gs[starts]
        # argmax per group: sort runs by (group, -len, start_time) and
        # keep each group's first
        pick = np.lexsort((ts[starts], -lens, run_g))
        first = np.r_[True, run_g[pick][1:] != run_g[pick][:-1]]
        win = pick[first]
        return pa.table(
            {
                group: gcol.take(pa.array(order[starts[win]])),
                "n_points": pa.array(lens[win]),
                "start_time": pa.array(ts[starts[win]]),
                "end_time": pa.array(ts[ends[win] - 1]),
            }
        )

    return co_shuffle(ds, [group], block, num_parts)


def lag_backtest(
    ds,
    group: str = "source",
    time_col: str = "bucket",
    value: str = "sum_n_tok",
    lag: int = 3600,
    num_parts: int | None = None,
):
    """Seasonal-naive backtest: score the forecast "this bucket = the
    bucket exactly ``lag`` seconds earlier" against the realized series —
    the baseline every forecasting deployment must beat (Hyndman &
    Athanasopoulos, *Forecasting: Principles and Practice*, §5.2), run
    here over an already-rolled-up tier so only tier rows shuffle.

    The reference's analogue is its per-track interp-vs-observed
    comparisons (/root/reference/aisdb/track_interp.py semantics); this is
    that evaluation reshaped as a distributed operator: one group-keyed
    co-shuffle, then a composite-key searchsorted pairs each bucket with
    its in-group ``t - lag`` predecessor (exact match only — missing
    seasonal ancestors drop out, they are not imputed).

    Output per group with >= 1 pair: (group, n_pairs, sae, sse) — all
    exact int64 (|err| and err^2 summed over pairs)."""
    from aisdb_ray.stages._dist import co_shuffle

    def block(part: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        empty = pa.table(
            {
                group: pa.array([], part.schema.field(group).type),
                "n_pairs": pa.array([], pa.int64()),
                "sae": pa.array([], pa.int64()),
                "sse": pa.array([], pa.int64()),
            }
        )
        if part.num_rows == 0:
            return empty
        gcol = part[group]
        if isinstance(gcol, pa.ChunkedArray):
            gcol = gcol.combine_chunks()
        codes = pc.dictionary_encode(gcol)
        if isinstance(codes, pa.ChunkedArray):
            codes = codes.combine_chunks()
        gid = codes.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        t = part[time_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = part[value].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((t, gid))
        gs, ts, vs = gid[order], t[order], v[order]
        # composite (group, time) key: group ids are partition-local and
        # small, times are nonnegative epochs < 2^40 — no collision
        comp = gs * (1 << 41) + ts
        want = comp - lag
        pos = np.searchsorted(comp, want)
        pos_c = np.minimum(pos, len(comp) - 1)
        hit = comp[pos_c] == want
        if not hit.any():
            return empty
        err = vs[hit] - vs[pos_c[hit]]
        g_of = gs[hit]
        uniq, inv = np.unique(g_of, return_inverse=True)
        n_pairs = np.bincount(inv).astype(np.int64)
        sae = np.bincount(inv, weights=np.abs(err)).astype(np.int64)
        sse = np.bincount(inv, weights=err.astype(np.float64) ** 2).astype(np.int64)
        # bincount sums float64: exact while |err| sums stay < 2^53 —
        # guard so a hotter fixture raises instead of rounding
        if sae.max(initial=0) >= (1 << 52) or sse.max(initial=0) >= (1 << 52):
            raise ValueError("lag_backtest sums exceed float53-exact range")
        srcs = gcol.take(pa.array(order[np.searchsorted(gs, uniq)]))
        return pa.table(
            {
                group: srcs,
                "n_pairs": pa.array(n_pairs),
                "sae": pa.array(sae),
                "sse": pa.array(sse),
            }
        )

    return co_shuffle(ds, [group], block, num_parts)


def late_data_block(
    tbl: pa.Table,
    group: str,
    time_col: str,
    arrival_col: str,
    allowed_lateness: int,
) -> pa.Table:
    """One partition's late-arrival flags, exact in int64.

    Streaming semantics (the watermark rule every event-time engine
    applies before window assignment): rows arrive in ``arrival_col``
    order; the stream's watermark at a row is ``max(time) over all
    PREVIOUSLY-arrived rows of the group minus allowed_lateness``; a row
    whose event time falls below that watermark is LATE — a real engine
    would route it to a side output instead of its (already closed)
    window.  This is that side output, with the watermark as evidence.

    Vectorized multi-group: sort by (group, arrival), group-offset
    composite values make one ``np.maximum.accumulate`` reset per group,
    shift-by-one excludes the current row (the first arrival of a group
    is never late)."""
    n = len(tbl)
    if n == 0:
        return tbl.append_column("watermark", pa.array([], pa.int64()))
    import pyarrow.compute as pc

    gcol = tbl[group]
    if isinstance(gcol, pa.ChunkedArray):
        gcol = gcol.combine_chunks()
    ginv = pc.dictionary_encode(gcol).indices.to_numpy().astype(np.int64)
    arr = tbl[arrival_col].to_numpy(zero_copy_only=False).astype(np.int64)
    t_pre = tbl[time_col].to_numpy(zero_copy_only=False).astype(np.int64)
    # event time as tiebreak, and REQUIRE arrival to totally order each
    # group: with duplicate (group, arrival) pairs "prior arrivals" is
    # ambiguous, and a stable sort on nondeterministic shuffle order
    # would flag a run-dependent late-row set
    order = np.lexsort((t_pre, arr, ginv))
    ga, aa = ginv[order], arr[order]
    dup = (ga[1:] == ga[:-1]) & (aa[1:] == aa[:-1])
    if dup.any():
        raise ValueError(
            "late_data: duplicate (group, arrival) — the arrival column "
            "must totally order each group's rows (add a sequence "
            "component, cf. q_ev_late_data's *1e6 + event_id)")
    tbl = tbl.take(pa.array(order))
    g = ga
    t = t_pre[order]

    starts = np.r_[True, g[1:] != g[:-1]]
    big = (t.max() - t.min()) + 2 if n else 2
    seg_id = np.cumsum(starts) - 1
    q = (t - t.min()) + seg_id * big  # group k strictly above group k-1
    runmax = np.maximum.accumulate(q) - seg_id * big + t.min()
    # shift by one within the group: watermark sees only PRIOR arrivals
    wm = np.empty(n, dtype=np.int64)
    wm[1:] = runmax[:-1]
    wm[starts] = np.iinfo(np.int64).min  # first arrival: no watermark yet
    late = ~starts & (t < wm - allowed_lateness)
    out = tbl.append_column(
        "watermark", pa.array(np.where(starts, 0, wm), pa.int64())
    )
    return out.filter(pa.array(late))


def late_data(ds, group: str, time_col: str, arrival_col: str,
              allowed_lateness: int, num_parts: int | None = None):
    """Distributed late-arrival detection per group (one co-shuffle, then
    a fully-vectorized multi-group task per partition)."""
    from aisdb_ray.stages._dist import co_shuffle

    return co_shuffle(
        ds, [group],
        lambda part: late_data_block(
            part, group, time_col, arrival_col, allowed_lateness
        ),
        num_parts,
    )


def debounce_block(
    tbl: pa.Table,
    keys: list[str],
    time_col: str,
    seq_col: str,
    ttl: int,
) -> pa.Table:
    """One partition's debounce pass: drop a row if the group's
    IMMEDIATELY preceding row (by (time, seq)) is less than ``ttl``
    seconds older — collapse each rapid-fire burst to the rows that break
    the cadence.  Pure lag comparison (SQL: lag(time) OVER w), so exact
    and stateless; contrast with the kept-chain rate limiter
    (:func:`rate_limit`), which compares against the last KEPT row."""
    n = len(tbl)
    if n == 0:
        return tbl
    import pyarrow.compute as pc

    ginv = np.zeros(n, dtype=np.int64)
    for kcol in keys:
        c = tbl[kcol]
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        enc = pc.dictionary_encode(c).indices.to_numpy().astype(np.int64)
        ginv = ginv * (int(enc.max()) + 1) + enc
    t = tbl[time_col].to_numpy(zero_copy_only=False).astype(np.int64)
    sq = tbl[seq_col].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((sq, t, ginv))
    tbl = tbl.take(pa.array(order))
    g = ginv[order]
    ts = t[order]
    starts = np.r_[True, g[1:] != g[:-1]]
    dt = np.empty(n, dtype=np.int64)
    dt[1:] = ts[1:] - ts[:-1]
    keep = starts | (dt >= ttl)
    return tbl.filter(pa.array(keep))


def debounce(ds, keys: list[str], time_col: str, seq_col: str, ttl: int,
             num_parts: int | None = None):
    """Distributed debounce dedup (streaming TTL dedup vs the previous
    row) — one co-shuffle on the key set, vectorized lag filter per
    partition."""
    from aisdb_ray.stages._dist import co_shuffle

    return co_shuffle(
        ds, keys,
        lambda part: debounce_block(part, keys, time_col, seq_col, ttl),
        num_parts,
    )


def rate_limit_block(
    tbl: pa.Table,
    group: str,
    time_col: str,
    ttl: int,
) -> pa.Table:
    """One partition's kept-chain rate limit over DISTINCT group times:
    the first time of each group is kept; every subsequent kept time is
    the group's first time ``>= last_kept + ttl`` (the token-bucket /
    throttle rule — compared against the last KEPT row, not the previous
    row, so a long burst under the TTL collapses to its opening edge
    while :func:`debounce` would drop it entirely only if every
    consecutive gap is short).

    Vectorized multi-group: one searchsorted over the group-offset
    composite time axis advances EVERY active group's chain per loop
    turn — the loop runs max-kept-per-group times, each turn O(#groups
    log n), never a per-row Python walk.  Output: (group, time) kept
    markers."""
    import pyarrow.compute as pc

    if ttl <= 0:
        raise ValueError("rate_limit ttl must be >= 1")
    if len(tbl) == 0:
        return pa.table({
            group: pa.array([], tbl[group].type),
            time_col: pa.array([], pa.int64()),
        })
    gcol = tbl[group]
    if isinstance(gcol, pa.ChunkedArray):
        gcol = gcol.combine_chunks()
    enc = pc.dictionary_encode(gcol)
    ginv = enc.indices.to_numpy().astype(np.int64)
    gdict = enc.dictionary
    t = tbl[time_col].to_numpy(zero_copy_only=False).astype(np.int64)
    # distinct (group, time), sorted
    comp = np.unique(ginv * ((t.max() - t.min()) + 2) + (t - t.min()))
    big = (t.max() - t.min()) + 2
    gids = comp // big
    ts = comp % big + t.min()
    n = len(comp)
    starts = np.flatnonzero(np.r_[True, gids[1:] != gids[:-1]])
    ends = np.r_[starts[1:], n]

    kept_idx = []
    pos = starts.copy()          # each group's current kept position
    active = np.ones(len(starts), dtype=bool)
    while active.any():
        kept_idx.append(pos[active])
        target = ts[pos[active]] + ttl
        # searchsorted on the composite axis stays inside each group:
        # targets are offset by the SAME group id as the kept row
        nxt = np.searchsorted(comp, gids[pos[active]] * big
                              + np.minimum(target - t.min(), big - 1))
        done = nxt >= ends[active]
        pos[active] = np.where(done, pos[active], nxt)
        upd = active.copy()
        active[upd] = ~done
    kept = np.sort(np.concatenate(kept_idx))
    return pa.table({
        group: gdict.take(pa.array(gids[kept], pa.int64())),
        time_col: pa.array(ts[kept], pa.int64()),
    })


def rate_limit(ds, group: str, time_col: str, ttl: int,
               num_parts: int | None = None):
    """Distributed kept-chain throttle: one co-shuffle by group, then the
    vectorized multi-group chain advance per partition."""
    from aisdb_ray.stages._dist import co_shuffle

    return co_shuffle(
        ds, [group],
        lambda part: rate_limit_block(part, group, time_col, ttl),
        num_parts,
    )


def percent_rank(ds, group: str, value: str, num_parts: int | None = None):
    """SQL ``percent_rank() OVER (PARTITION BY group ORDER BY value)``:
    (rank − 1) / (n − 1) with ``rank()`` tie semantics (equal values
    share the min rank), appended as a float64 ``pct`` column — the
    per-key distributional position feature (data-selection by relative
    position beats absolute thresholds across heterogeneous sources).
    One group co-shuffle; per partition a vectorized sort + searchsorted
    per group — the single IEEE divide mirrors the SQL expression."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from aisdb_ray.stages._dist import co_shuffle

    def per_part(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return part.append_column("pct", pa.array([], pa.float64()))
        idx = pc.sort_indices(part, sort_keys=[(group, "ascending"),
                                               (value, "ascending")])
        s = part.take(idx)
        k = s[group].to_numpy(zero_copy_only=False)
        v = s[value].to_numpy(zero_copy_only=False)
        n = len(k)
        new = np.r_[True, k[1:] != k[:-1]]
        starts = np.flatnonzero(new)
        ends = np.r_[starts[1:], n]
        pct = np.zeros(n, dtype=np.float64)
        for a, b in zip(starts, ends):
            m = b - a
            if m == 1:
                pct[a] = 0.0
                continue
            vv = v[a:b]
            # min rank among ties, 1-based
            r = np.searchsorted(vv, vv, side="left") + 1
            pct[a:b] = (r - 1) / float(m - 1)
        return s.append_column("pct", pa.array(pct))

    return co_shuffle(ds, [group], per_part, num_parts)


def cume_dist(ds, group: str, value: str, num_parts: int | None = None):
    """SQL ``cume_dist() OVER (PARTITION BY group ORDER BY value)``:
    count(v' <= v) / n — percent_rank's ≤-counting sibling (completes
    the analytic rank family next to rownum/ntile/percent_rank).  Same
    one-co-shuffle sort+searchsorted shape; single IEEE divide."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from aisdb_ray.stages._dist import co_shuffle

    def per_part(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return part.append_column("cd", pa.array([], pa.float64()))
        idx = pc.sort_indices(part, sort_keys=[(group, "ascending"),
                                               (value, "ascending")])
        s = part.take(idx)
        k = s[group].to_numpy(zero_copy_only=False)
        v = s[value].to_numpy(zero_copy_only=False)
        n = len(k)
        new = np.r_[True, k[1:] != k[:-1]]
        starts = np.flatnonzero(new)
        ends = np.r_[starts[1:], n]
        cd = np.zeros(n, dtype=np.float64)
        for a, b in zip(starts, ends):
            vv = v[a:b]
            c = np.searchsorted(vv, vv, side="right")
            cd[a:b] = c / float(b - a)
        return s.append_column("cd", pa.array(cd))

    return co_shuffle(ds, [group], per_part, num_parts)
