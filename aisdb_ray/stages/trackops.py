"""Per-series track operators beyond gap segmentation: the AISdb
split/denoise/decimate/resample family re-expressed for token series.

All are group-local passes inside ``groupby(source).map_groups`` (or the
salted variant) — sequential per series, parallel across series, exactly the
reference's execution shape.

Operators and their reference anchors:

- ``split_multi`` — multi-criteria segmentation: out-of-bounds value rows
  removed, splits at time gaps and value-rate jumps, short segments
  DISCARDED, sub-series relabeled ``"{source}-{n}"``
  (``split_tracks`` + ``_segment_rng_all``,
  /root/reference/aisdb/track_gen.py:207-263,
  /root/reference/aisdb/proc_util.py:80-163, discard at :161-163).
- ``relink_segments`` — greedy score-based pathway linking: each split
  segment appended to the best-scoring open pathway, new pathway when the
  high score is below ``minscore``; emits a ``label`` per pathway
  (``encode_greatcircledistance`` / ``encoder_score_fcn``,
  /root/reference/aisdb/denoising_encoder.py:16-228,
  /root/reference/src/lib.rs:475-497; Δt clamp 10 s at lib.rs:488;
  tie -> latest pathway, lib.rs:16-21).
- ``decimate_lttb`` — largest-triangle-three-buckets downsampling of
  (time, n_tok), the 1-D analog of Visvalingam-Whyatt track decimation
  (``simplify_linestring_idx``, /root/reference/src/lib.rs:432-440, applied
  at /root/reference/aisdb/track_gen.py:74-77).
- ``resample_by_tokens`` — resampling on the cumulative-value axis (a row
  every K tokens), the analog of distance-spaced interpolation
  (``interp_spacing``, /root/reference/aisdb/interp.py:195-270).
- ``resample_cubic`` — natural cubic-spline resample with duplicate-epoch
  dedup and <2-unique-points skip (``interp_cubic_spline``,
  /root/reference/aisdb/interp.py:273-356); NumPy tridiagonal solve (no
  scipy in this environment).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from aisdb_ray.schema import N_TOK, SEG, SEQ, SOURCE, TIME
from aisdb_ray.stages.series import DEFAULT_MAX_GAP, clean_group


# ----------------------------------------------------------- split_multi

def split_multi_group(
    group: pa.Table,
    max_gap: int = DEFAULT_MAX_GAP,
    max_rate: float = 50.0,        # |Δn_tok| per minute considered a break
    value_lo: int = 1,
    value_hi: int = 1 << 30,
    min_segment_length: int = 3,
) -> pa.Table:
    """Multi-criteria split of one source; returns surviving rows with a
    ``track`` id column relabeled '{source}-{n}'."""
    g = clean_group(group, max_gap)
    t = g[TIME].to_numpy(zero_copy_only=False)
    v = g[N_TOK].to_numpy(zero_copy_only=False).astype(np.float64)
    # bound filter first (reference removes over-speed points before splits)
    ok = (v >= value_lo) & (v <= value_hi)
    g = g.take(pa.array(np.flatnonzero(ok)))
    t, v = t[ok], v[ok]
    n = len(t)
    src = g[SOURCE][0].as_py() if n else ""
    if n == 0:
        return g.append_column("track", pa.array([], pa.string()))
    dt = np.diff(t)
    rate = np.abs(np.diff(v)) / np.maximum(dt / 60.0, 1.0 / 60.0)
    cut = (dt >= max_gap) | (rate > max_rate)
    # union of split points (reference: np.unique over concatenated criteria)
    seg = np.zeros(n, dtype=np.int64)
    np.cumsum(cut, out=seg[1:])
    # discard short segments
    first = np.flatnonzero(np.r_[True, seg[1:] != seg[:-1]])
    sizes = np.diff(np.r_[first, n])
    keep_seg = sizes >= min_segment_length
    keep_mask = np.repeat(keep_seg, sizes)
    kept_ids = np.cumsum(np.r_[True, np.diff(seg[keep_mask]) != 0]) - 1 if keep_mask.any() else np.array([], np.int64)
    g = g.take(pa.array(np.flatnonzero(keep_mask)))
    labels = np.char.add(f"{src}-", kept_ids.astype(str))
    return g.append_column("track", pa.array(labels, pa.string()))


def split_multi(ds, **kw):
    return ds.groupby(SOURCE).map_groups(
        lambda g: split_multi_group(g, **kw), batch_format="pyarrow"
    )


# ------------------------------------------------------ relink_segments

def relink_group(
    group: pa.Table,
    max_gap: int = DEFAULT_MAX_GAP,
    minscore: float = 1e-5,
    dt_clamp: int = 10,
) -> pa.Table:
    """Greedy pathway linking of one source's split segments.

    Score of appending a segment (head time t0, head value v0) to an open
    pathway with tail (t1, v1):

        score = 1 / (max(t0 - t1, dt_clamp) * (1 + |v0 - v1|))   if 0 <= t0 - t1 < 2*max_gap
        score = -1                                                otherwise

    Highest score wins; ties -> the most recently updated pathway (the
    reference's tie rule); below ``minscore`` starts a new pathway.  Emits a
    ``label`` column: '{source}:{pathway}'.  State = open pathway tails,
    group-local (no actor needed) — the T5 pattern.
    """
    g = clean_group(group, max_gap)
    t = g[TIME].to_numpy(zero_copy_only=False)
    seg = g[SEG].to_numpy(zero_copy_only=False)
    v = g[N_TOK].to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(t)
    src = g[SOURCE][0].as_py() if n else ""
    labels = np.zeros(n, dtype=np.int64)
    first = np.flatnonzero(np.r_[True, seg[1:] != seg[:-1]]) if n else np.array([], int)
    bounds = np.r_[first, n]
    pathways: list[tuple[float, float, int]] = []  # (tail_t, tail_v, label)
    next_label = 0
    for a, b in zip(bounds[:-1], bounds[1:]):
        t0, v0 = t[a], v[a]
        best, best_i = -1.0, -1
        for i, (pt, pv, _lab) in enumerate(pathways):
            d = t0 - pt
            if 0 <= d < 2 * max_gap:
                s = 1.0 / (max(d, dt_clamp) * (1.0 + abs(v0 - pv)))
            else:
                s = -1.0
            if s >= best:  # >= : tie goes to the latest pathway
                best, best_i = s, i
        if best >= minscore and best_i >= 0:
            lab = pathways[best_i][2]
            pathways[best_i] = (float(t[b - 1]), float(v[b - 1]), lab)
        else:
            lab = next_label
            next_label += 1
            pathways.append((float(t[b - 1]), float(v[b - 1]), lab))
        labels[a:b] = lab
    lab_str = np.char.add(f"{src}:", labels.astype(str))
    return g.append_column("label", pa.array(lab_str, pa.string()))


def relink_segments(ds, **kw):
    return ds.groupby(SOURCE).map_groups(
        lambda g: relink_group(g, **kw), batch_format="pyarrow"
    )


# ------------------------------------------------------- decimate (LTTB)

def lttb_indices(t: np.ndarray, v: np.ndarray, n_out: int) -> np.ndarray:
    """Largest-triangle-three-buckets kept-index selection (sorted input)."""
    n = len(t)
    if n_out >= n or n_out < 3:
        return np.arange(n)
    keep = np.empty(n_out, dtype=np.int64)
    keep[0], keep[-1] = 0, n - 1
    edges = np.linspace(1, n - 1, n_out - 1).astype(np.int64)
    a = 0
    for i in range(n_out - 2):
        lo, hi = edges[i], edges[i + 1]
        if hi <= lo:
            hi = lo + 1
        nxt_lo, nxt_hi = edges[i + 1], (edges[i + 2] if i + 2 < len(edges) else n)
        cx = t[nxt_lo:nxt_hi].mean() if nxt_hi > nxt_lo else t[-1]
        cy = v[nxt_lo:nxt_hi].mean() if nxt_hi > nxt_lo else v[-1]
        ax, ay = t[a], v[a]
        area = np.abs(
            (ax - cx) * (v[lo:hi] - ay) - (ax - t[lo:hi]) * (cy - ay)
        )
        a = lo + int(np.argmax(area))
        keep[i + 1] = a
    return np.unique(keep)


def decimate_group(group: pa.Table, n_out: int = 100,
                   max_gap: int = DEFAULT_MAX_GAP) -> pa.Table:
    g = clean_group(group, max_gap)
    t = g[TIME].to_numpy(zero_copy_only=False).astype(np.float64)
    v = g[N_TOK].to_numpy(zero_copy_only=False).astype(np.float64)
    if len(t) == 0:
        return g
    return g.take(pa.array(lttb_indices(t, v, n_out)))


def decimate(ds, n_out: int = 100, max_gap: int = DEFAULT_MAX_GAP):
    return ds.groupby(SOURCE).map_groups(
        lambda g: decimate_group(g, n_out, max_gap), batch_format="pyarrow"
    )


# ------------------------------------------- resample on cumulative tokens

def resample_by_tokens_group(
    group: pa.Table, every: int = 10_000, max_gap: int = DEFAULT_MAX_GAP
) -> pa.Table:
    """One output row per ``every`` cumulative tokens: interpolated epoch at
    each mark (interp_spacing semantics: series shorter than the spacing are
    skipped, /root/reference/aisdb/interp.py:195-270)."""
    g = clean_group(group, max_gap)
    t = g[TIME].to_numpy(zero_copy_only=False).astype(np.float64)
    v = g[N_TOK].to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(t)
    src = g[SOURCE][0].as_py() if n else ""
    empty = pa.table(
        {
            SOURCE: pa.array([], pa.string()),
            "cum_tokens": pa.array([], pa.int64()),
            TIME: pa.array([], pa.float64()),
        }
    )
    if n < 2:
        return empty
    cum = np.cumsum(v)
    if cum[-1] < every:
        return empty
    marks = np.arange(every, cum[-1] + 1, every, dtype=np.float64)
    # cum is strictly increasing (n_tok >= 1): invertible for np.interp
    ti = np.interp(marks, cum, t)
    return pa.table(
        {
            SOURCE: pa.array([src] * len(marks), pa.string()),
            "cum_tokens": pa.array(marks.astype(np.int64)),
            TIME: pa.array(ti),
        }
    )


def resample_by_tokens(ds, every: int = 10_000, max_gap: int = DEFAULT_MAX_GAP):
    return ds.groupby(SOURCE).map_groups(
        lambda g: resample_by_tokens_group(g, every, max_gap),
        batch_format="pyarrow",
    )


# --------------------------------------------------- natural cubic spline

def natural_cubic_spline(x: np.ndarray, y: np.ndarray, xq: np.ndarray) -> np.ndarray:
    """Evaluate the natural cubic spline through (x, y) at xq.

    Plain NumPy tridiagonal (Thomas) solve; x strictly increasing.
    """
    n = len(x)
    if n == 2:
        return np.interp(xq, x, y)
    h = np.diff(x)
    # second-derivative system (natural boundary: M0 = Mn-1 = 0)
    a = h[:-1].copy()
    b = 2 * (h[:-1] + h[1:])
    c = h[1:].copy()
    d = 6 * (np.diff(y[1:]) / h[1:] - np.diff(y[:-1]) / h[:-1])
    # Thomas algorithm.  Row i's multiplier is ITS OWN sub-diagonal a[i]
    # over the previous pivot — a[i-1] here would only coincide for
    # uniform spacing (equal h), which is exactly why the straight-line /
    # knot-round-trip tests could not see the difference; irregular knots
    # (the real epoch case) diverge from the true natural spline without
    # this.  Verified against a dense np.linalg.solve of the same system.
    for i in range(1, len(b)):
        w = a[i] / b[i - 1]
        b[i] -= w * c[i - 1]
        d[i] -= w * d[i - 1]
    m_inner = np.zeros(len(b))
    if len(b):
        m_inner[-1] = d[-1] / b[-1]
        for i in range(len(b) - 2, -1, -1):
            m_inner[i] = (d[i] - c[i] * m_inner[i + 1]) / b[i]
    m = np.r_[0.0, m_inner, 0.0]
    idx = np.clip(np.searchsorted(x, xq) - 1, 0, n - 2)
    x0, x1 = x[idx], x[idx + 1]
    y0, y1 = y[idx], y[idx + 1]
    m0, m1 = m[idx], m[idx + 1]
    hseg = x1 - x0
    A = (x1 - xq) / hseg
    B = (xq - x0) / hseg
    return (
        A * y0
        + B * y1
        + ((A**3 - A) * m0 + (B**3 - B) * m1) * hseg**2 / 6.0
    )


def resample_cubic_group(
    group: pa.Table, step: int = 60, max_gap: int = DEFAULT_MAX_GAP
) -> pa.Table:
    """Cubic-spline resample of n_tok onto the per-segment epoch grid.

    Mirrors interp_cubic_spline's guards: duplicate timestamps deduped
    keep-first, segments with <2 unique points skipped (interp.py:273-356).
    """
    g = clean_group(group, max_gap)
    t = g[TIME].to_numpy(zero_copy_only=False)
    seg = g[SEG].to_numpy(zero_copy_only=False)
    v = g[N_TOK].to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(t)
    src = g[SOURCE][0].as_py() if n else ""
    out_t, out_v, out_s = [], [], []
    first = np.flatnonzero(np.r_[True, seg[1:] != seg[:-1]]) if n else np.array([], int)
    bounds = np.r_[first, n]
    for a, b in zip(bounds[:-1], bounds[1:]):
        ts = t[a:b]
        uniq = np.r_[True, ts[1:] != ts[:-1]]
        ui = np.flatnonzero(uniq) + a
        if len(ui) < 2:
            continue
        grid = np.arange(t[ui[0]], t[ui[-1]] + step, step, dtype=np.int64)
        vi = natural_cubic_spline(t[ui].astype(np.float64), v[ui], grid.astype(np.float64))
        out_t.append(grid)
        out_v.append(vi)
        out_s.append(np.full(len(grid), seg[a], dtype=np.int64))
    if not out_t:
        return pa.table(
            {
                SOURCE: pa.array([], pa.string()),
                "seg": pa.array([], pa.int64()),
                TIME: pa.array([], pa.int64()),
                N_TOK: pa.array([], pa.float64()),
            }
        )
    gt = np.concatenate(out_t)
    return pa.table(
        {
            SOURCE: pa.array([src] * len(gt), pa.string()),
            "seg": pa.array(np.concatenate(out_s)),
            TIME: pa.array(gt),
            N_TOK: pa.array(np.concatenate(out_v)),
        }
    )


def resample_cubic(ds, step: int = 60, max_gap: int = DEFAULT_MAX_GAP):
    return ds.groupby(SOURCE).map_groups(
        lambda g: resample_cubic_group(g, step, max_gap), batch_format="pyarrow"
    )


# --------------------------------------------------------- value masks

def mask_value_window(ds, lo: float, hi: float):
    """Drop points outside [lo, hi] (mask_in_radius_2D / min_speed_filter
    analog, /root/reference/aisdb/gis.py:261-283, track_gen.py:287-300)."""
    import pyarrow.compute as pc

    return ds.map_batches(
        lambda b: b.filter(
            pc.and_(
                pc.greater_equal(b[N_TOK], pa.scalar(lo)),
                pc.less_equal(b[N_TOK], pa.scalar(hi)),
            )
        ),
        batch_format="pyarrow",
    )


def sax_symbols(locf_ds, step: int = 60, p: int = 8):
    """SAX symbolic representation (Lin et al. 2003) over the LOCF grid:
    PAA windows of ``p`` consecutive grid points (absolute-epoch aligned,
    partial edge windows dropped), discretized into 4 symbols by the
    EXACT empirical quartiles of the window sums — the integer-parity
    variant of SAX's Gaussian breakpoints (the input grid is already
    integer-valued, window sums stay integers, and the discrete-quantile
    pick mirrors the histogram rule of stages/rank.group_quantiles, so
    the SQL oracle matches bit-for-bit).

    Output: one row per full window — (source, seg, wstart, paa,
    symbol ∈ 0..3) with symbol = Σ (paa > quartile).

    Scale shape: PAA sums are algebraic (per-batch partials, one
    source-keyed hash combine); the breakpoint pass runs on the PAA
    VALUE histogram (bounded by the value range, never window count),
    funneled to one block and returned as a single 3-int row — the
    documented small-side pick; symbols are then a broadcast-compare
    map.  The PAA tier is materialized once (grid/p rows — tier-sized,
    same footprint class as the 1m rollup) because two consumers read
    it."""
    import pyarrow.compute as pc

    from aisdb_ray.stages._dist import funnel_combine

    W = step * p

    def paa_partial(b: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "source": pa.array([], pa.string()),
                "seg": pa.array([], pa.int64()),
                "wstart": pa.array([], pa.int64()),
                "s": pa.array([], pa.int64()),
                "c": pa.array([], pa.int64()),
            }
        )
        if b.num_rows == 0:
            return empty
        # numpy floor division, NOT pc.divide: Arrow integer divide
        # truncates toward zero, pooling (-W, 0) epochs into window 0
        # (same rule as asof.l_tag / corr windowed starts)
        tt = b["time"].to_numpy(zero_copy_only=False).astype(np.int64)
        w = pa.array((tt // W) * W)
        t = pa.table(
            {
                "source": b["source"],
                "seg": pc.cast(b["seg"], pa.int64()),
                "wstart": w,
                "v": pc.cast(b["n_tok"], pa.int64()),
            }
        )
        g = t.group_by(["source", "seg", "wstart"], use_threads=False).aggregate(
            [("v", "sum"), ("v", "count")]
        )
        return g.rename_columns(["source", "seg", "wstart", "s", "c"])

    def paa_merge(b: pa.Table) -> pa.Table:
        g = b.group_by(["source", "seg", "wstart"], use_threads=False).aggregate(
            [("s", "sum"), ("c", "sum")]
        )
        return g.rename_columns(["source", "seg", "wstart", "s", "c"])

    partials = locf_ds.map_batches(paa_partial, batch_format="pyarrow")
    combined = funnel_combine(
        partials, paa_merge, key_col="source", hash_combine=True
    )

    def full_windows(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b["c"], pa.scalar(p, pa.int64())))
        return pa.table(
            {
                "source": b["source"],
                "seg": b["seg"],
                "wstart": b["wstart"],
                "paa": b["s"],
            }
        )

    paa = combined.map_batches(full_windows, batch_format="pyarrow").materialize()

    def h_part(b: pa.Table) -> pa.Table:
        g = pa.table({"v": b["paa"]}).group_by(["v"], use_threads=False).aggregate(
            [([], "count_all")]
        )
        return g.rename_columns(["v", "n"])

    def h_merge(b: pa.Table) -> pa.Table:
        g = b.group_by(["v"], use_threads=False).aggregate([("n", "sum")])
        return g.rename_columns(["v", "n"])

    hist = funnel_combine(paa.map_batches(h_part, batch_format="pyarrow"), h_merge)

    def pick(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"b25": pa.array([], pa.int64()),
                             "b50": pa.array([], pa.int64()),
                             "b75": pa.array([], pa.int64())})
        v = b["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = b["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        o = np.argsort(v)
        v, n = v[o], n[o]
        cum = np.cumsum(n)
        tot = int(cum[-1])
        out = []
        for pct in (25, 50, 75):
            rank = (pct * tot + 99) // 100
            out.append(int(v[np.searchsorted(cum, rank)]))
        return pa.table({"b25": [out[0]], "b50": [out[1]], "b75": [out[2]]})

    rows = hist.repartition(1).map_batches(
        pick, batch_format="pyarrow", batch_size=None
    ).take_all()
    if not rows:
        return paa.map_batches(
            lambda b: b.append_column("symbol", pa.array([], pa.int64())),
            batch_format="pyarrow",
        )
    b25, b50, b75 = rows[0]["b25"], rows[0]["b50"], rows[0]["b75"]

    def sym(b: pa.Table) -> pa.Table:
        v = b["paa"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = (v > b25).astype(np.int64) + (v > b50) + (v > b75)
        return b.append_column("symbol", pa.array(s.astype(np.int64)))

    return paa.map_batches(sym, batch_format="pyarrow")
