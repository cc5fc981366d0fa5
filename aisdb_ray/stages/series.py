"""Per-series operators: sort, exact dedup, gap segmentation, gap-fill.

These are the AISdb track-gen semantics re-expressed per source:

- within-series time sort — the ORDER BY (mmsi, time) contract
  (/root/reference/aisdb/database/sqlfcn.py:58); done per group, not as a
  global ``ds.sort`` (order only matters within a series, and the reference
  itself re-sorts defensively, /root/reference/aisdb/interp.py:334-338).
- exact dedup keep-first — PK ``ON CONFLICT DO NOTHING``
  (/root/reference/aisdb/aisdb_sql/insert_dynamic_clusteredidx.sql:16).
- gap segmentation: split where dt >= max_gap — ``split_timedelta``
  (/root/reference/aisdb/track_gen.py:167-204; split-index math
  /root/reference/aisdb/proc_util.py:53-68).
- gap-fill: per-segment epoch grid ``np.arange(t0, t_end + step, step)`` with
  linear ``np.interp`` of the value channel — ``aisdb.interp`` semantics
  (/root/reference/aisdb/interp.py:25-41); same-timestamp dedup keep-first
  before interpolation (interp.py:275-277); segments with <2 unique
  timestamps skipped (interp.py:98-100). Original epochs round-trip their
  exact ``n_tok`` and ``tokens`` arrays (the per-row token-array-equality
  invariant).

All functions are group-local: state never crosses a series, so they run as
plain tasks inside ``groupby(source).map_groups`` — sequential per series,
parallel across series (the T5 pattern in SURVEY.md §2.3).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from aisdb_ray.schema import (
    DOC_ID,
    IS_ORIGINAL,
    N_TOK,
    SEG,
    SEQ,
    SOURCE,
    TIME,
    TOKENS,
)

# default split threshold: AISdb's split_timedelta default is 2 weeks
# (track_gen.py:167); for minute-cadence token series we default to 2 hours.
DEFAULT_MAX_GAP = 7200
DEFAULT_STEP = 60


def _sorted_dedup_indices(t: np.ndarray, s: np.ndarray) -> np.ndarray:
    """Stable (time, seq) sort order with adjacent-duplicate keys dropped.

    (time, seq) uniquely identifies a row within a source, so exact duplicate
    rows collapse to their first occurrence — keep-first dedup.
    """
    if len(t) == 0:  # np.r_[True, ...] would build a length-1 mask
        return np.array([], dtype=np.int64)
    order = np.lexsort((s, t))
    t2, s2 = t[order], s[order]
    keep = np.r_[True, (t2[1:] != t2[:-1]) | (s2[1:] != s2[:-1])]
    return order[keep]


def clean_group(
    group: pa.Table,
    max_gap: int = DEFAULT_MAX_GAP,
    *,
    time_col: str = TIME,
    seq_col: str = SEQ,
) -> pa.Table:
    """Sort one key's rows by (time, seq), dedup, append int64 ``seg``.

    Generic over column names: the token table is one instance (source/time/
    seq); any keyed event stream with an epoch + disambiguator works.
    """
    if SEG in group.column_names:
        # re-cleaning already-segmented input (split -> relink, tier ->
        # cubic resample) recomputes seg from scratch: a blind append
        # would emit a DUPLICATE seg field and every by-name access
        # downstream raises KeyError 'exists 2 times in schema'
        group = group.drop_columns([SEG])
    t = group[time_col].to_numpy(zero_copy_only=False)
    s = group[seq_col].to_numpy(zero_copy_only=False)
    idx = _sorted_dedup_indices(t, s)
    g = group.take(pa.array(idx))
    ts = t[idx]
    seg = np.zeros(len(ts), dtype=np.int64)
    if len(ts) > 1:
        np.cumsum(np.diff(ts) >= max_gap, out=seg[1:])
    return g.append_column(SEG, pa.array(seg))


def segment_summary_group(
    group: pa.Table,
    max_gap: int = DEFAULT_MAX_GAP,
    *,
    key_col: str = SOURCE,
    time_col: str = TIME,
    seq_col: str = SEQ,
) -> pa.Table:
    """(key, seg, t_start, t_end, n_rows) for one key — the
    split_timedelta summary table."""
    g = clean_group(group, max_gap, time_col=time_col, seq_col=seq_col)
    t = g[time_col].to_numpy(zero_copy_only=False)
    seg = g[SEG].to_numpy(zero_copy_only=False)
    n = len(t)
    first = np.flatnonzero(np.r_[True, seg[1:] != seg[:-1]]) if n else np.array([], int)
    last = np.r_[first[1:] - 1, n - 1] if n else np.array([], int)
    key_val = group[key_col][0].as_py() if group.num_rows else None
    return pa.table(
        {
            key_col: pa.array([key_val] * len(first), type=group[key_col].type),
            SEG: pa.array(seg[first] if n else [], type=pa.int64()),
            "t_start": pa.array(t[first] if n else [], type=pa.int64()),
            "t_end": pa.array(t[last] if n else [], type=pa.int64()),
            "n_rows": pa.array((last - first + 1) if n else [], type=pa.int64()),
        }
    )


def _resort_cleaned(group: pa.Table) -> pa.Table:
    """Defensive (time, seq) re-sort of one cleaned key group — the key
    shuffle need not preserve within-key order, mirroring the reference's
    own defensiveness (/root/reference/aisdb/interp.py:334-338).  Null
    seq (gap-filled rows re-entering) normalizes to -1 before the sort.
    One definition: gapfill/gapfill_rate/locf/nearest all share it."""
    t0 = group[TIME].to_numpy(zero_copy_only=False)
    s0 = group[SEQ].to_numpy(zero_copy_only=False)
    if s0.dtype.kind == "f":
        s0 = np.where(np.isnan(s0.astype(np.float64)), -1, s0)
    return group.take(pa.array(np.lexsort((s0, t0))))


def gapfill_group(
    group: pa.Table,
    step: int = DEFAULT_STEP,
    max_gap: int = DEFAULT_MAX_GAP,
    cleaned: bool = False,
) -> pa.Table:
    """Gap-fill one source onto the per-segment epoch grid.

    Output columns: doc_id, tokens, n_tok (float64 — interpolation is real-
    valued, as in the reference), source, time, seq, seg, is_original.
    Gap-filled rows get ``doc_id = '{source}:{epoch:010d}:gapfill'``, null
    tokens and null seq.  Original rows carry their exact tokens array.
    """
    if cleaned:
        g = _resort_cleaned(group)
    else:
        g = clean_group(group, max_gap)
    t = g[TIME].to_numpy(zero_copy_only=False)
    seg = g[SEG].to_numpy(zero_copy_only=False)
    n = len(t)
    src = g[SOURCE][0].as_py() if n else ""
    v = g[N_TOK].to_numpy(zero_copy_only=False).astype(np.float64)

    out_time: list[np.ndarray] = []
    out_val: list[np.ndarray] = []
    out_seg: list[np.ndarray] = []
    out_orig_idx: list[np.ndarray] = []  # index into g for original rows, -1 filled
    first = np.flatnonzero(np.r_[True, seg[1:] != seg[:-1]]) if n else np.array([], int)
    bounds = np.r_[first, n]
    for b0, b1 in zip(bounds[:-1], bounds[1:]):
        ts = t[b0:b1]
        # same-timestamp dedup keep-first before interpolation (interp.py:275-277)
        uniq = np.r_[True, ts[1:] != ts[:-1]]
        ui = np.flatnonzero(uniq) + b0
        ts_u = t[ui]
        if len(ts_u) < 2:  # skip length-1 segments (interp.py:98-100)
            continue
        grid = np.arange(ts_u[0], ts_u[-1] + step, step, dtype=np.int64)
        vi = np.interp(grid, ts_u, v[ui])
        pos = np.searchsorted(ts_u, grid)
        pos = np.clip(pos, 0, len(ts_u) - 1)
        orig = ts_u[pos] == grid
        oidx = np.where(orig, ui[pos], -1)
        out_time.append(grid)
        out_val.append(vi)
        out_seg.append(np.full(len(grid), seg[b0], dtype=np.int64))
        out_orig_idx.append(oidx)

    with_tokens = TOKENS in g.column_names
    if not out_time:
        cols = {DOC_ID: pa.array([], pa.string())}
        if with_tokens:
            cols[TOKENS] = pa.array([], pa.list_(pa.int32()))
        cols.update(
            {
                N_TOK: pa.array([], pa.float64()),
                SOURCE: pa.array([], pa.string()),
                TIME: pa.array([], pa.int64()),
                SEQ: pa.array([], pa.int32()),
                SEG: pa.array([], pa.int64()),
                IS_ORIGINAL: pa.array([], pa.bool_()),
            }
        )
        return pa.table(cols)

    grid_t = np.concatenate(out_time)
    grid_v = np.concatenate(out_val)
    grid_s = np.concatenate(out_seg)
    oidx = np.concatenate(out_orig_idx)
    orig_mask = oidx >= 0

    # carry original payload columns via take(); filled rows -> null
    take_idx = pa.array(np.where(orig_mask, oidx, -1), type=pa.int64())
    take_idx = pc.if_else(pa.array(orig_mask), take_idx, pa.scalar(None, pa.int64()))
    tokens = g[TOKENS].combine_chunks().take(take_idx) if with_tokens else None
    doc_orig = g[DOC_ID].combine_chunks().take(take_idx)
    seq_col = g[SEQ].combine_chunks().take(take_idx)

    ep_str = pc.utf8_lpad(pc.cast(pa.array(grid_t), pa.string()), 10, "0")
    doc_fill = pc.binary_join_element_wise(
        pa.scalar(src), ep_str, pa.scalar("gapfill"), ":"
    )
    doc_id = pc.if_else(pa.array(orig_mask), doc_orig, doc_fill)

    cols = {DOC_ID: doc_id}
    if with_tokens:
        cols[TOKENS] = tokens
    cols.update(
        {
            N_TOK: pa.array(grid_v),
            SOURCE: pa.array(np.full(len(grid_t), src, dtype=object), pa.string()),
            TIME: pa.array(grid_t),
            SEQ: seq_col,
            SEG: pa.array(grid_s),
            IS_ORIGINAL: pa.array(orig_mask),
        }
    )
    return pa.table(cols)


def gapfill_rate_group(
    group: pa.Table,
    step: int = DEFAULT_STEP,
    max_gap: int = DEFAULT_MAX_GAP,
    cleaned: bool = False,
) -> pa.Table:
    """Gap-fill, then RECOMPUTE the derived rate channel from the filled
    series — the geo_interp_time contract (T8c).

    The reference interpolates position and then re-derives course over
    ground from consecutive INTERPOLATED points, with the final point
    carrying the original channel's last value
    (/root/reference/aisdb/interp.py:121-192, cog recompute :180-184
    ``np.append(courses, track['cog'][-1])``).  Here: ``rate[i] =
    (v[i+1] - v[i]) / step`` over the filled grid within a segment; the
    segment's last grid point carries the ORIGINAL series' final hop rate
    (last two unique-timestamp points).
    """
    if cleaned:
        g = _resort_cleaned(group)
    else:
        g = clean_group(group, max_gap)

    # original final-hop rate per segment (unique timestamps, keep-first)
    t = g[TIME].to_numpy(zero_copy_only=False)
    seg = g[SEG].to_numpy(zero_copy_only=False)
    v = g[N_TOK].to_numpy(zero_copy_only=False).astype(np.float64)
    uniq = np.r_[True, (t[1:] != t[:-1]) | (seg[1:] != seg[:-1])] if len(t) else np.array([], bool)
    ui = np.flatnonzero(uniq)
    ts_u, seg_u, v_u = t[ui], seg[ui], v[ui]
    firstu = (
        np.flatnonzero(np.r_[True, seg_u[1:] != seg_u[:-1]])
        if len(seg_u)
        else np.array([], int)
    )
    lastu = np.r_[firstu[1:] - 1, len(seg_u) - 1] if len(seg_u) else np.array([], int)
    ok = lastu > firstu  # segments with >= 2 unique timestamps get filled
    last_rate = (v_u[lastu[ok]] - v_u[lastu[ok] - 1]) / (
        ts_u[lastu[ok]] - ts_u[lastu[ok] - 1]
    )
    ok_segs = seg_u[firstu][ok]

    gf = gapfill_group(g, step, max_gap, cleaned=True)
    n = gf.num_rows
    if n == 0:
        return gf.append_column("rate", pa.array([], pa.float64()))

    vf = gf[N_TOK].to_numpy(zero_copy_only=False)
    segf = gf[SEG].to_numpy(zero_copy_only=False)
    firstf = np.flatnonzero(np.r_[True, segf[1:] != segf[:-1]])
    lastf = np.r_[firstf[1:] - 1, n - 1]
    if not np.array_equal(segf[firstf], ok_segs):
        # contract guard, NOT an assert: under python -O an assert
        # vanishes and the final-hop rates below would silently land on
        # the wrong rows
        raise ValueError(
            "gapfill_rate: filled segments misaligned with source "
            "segments — input violates the cleaned-group contract")

    rate = np.empty(n, dtype=np.float64)
    rate[:-1] = np.diff(vf) / step
    rate[lastf] = last_rate
    return gf.append_column("rate", pa.array(rate))


# ------------------------------------------------------------ dataset-level

def clean_series(
    ds,
    max_gap: int = DEFAULT_MAX_GAP,
    *,
    key_col: str = SOURCE,
    time_col: str = TIME,
    seq_col: str = SEQ,
):
    """groupby(key) shuffle → per-series sort+dedup+segment.

    This is the engine's single key-shuffle for the sequence path; rollup
    tiers downstream reuse its partitioning (SURVEY.md §7.3).
    """
    return ds.groupby(key_col).map_groups(
        lambda g: clean_group(g, max_gap, time_col=time_col, seq_col=seq_col),
        batch_format="pyarrow",
    )


def segment_table(
    ds,
    max_gap: int = DEFAULT_MAX_GAP,
    *,
    key_col: str = SOURCE,
    time_col: str = TIME,
    seq_col: str = SEQ,
):
    return ds.groupby(key_col).map_groups(
        lambda g: segment_summary_group(
            g, max_gap, key_col=key_col, time_col=time_col, seq_col=seq_col
        ),
        batch_format="pyarrow",
    )


def gapfill_series(
    ds,
    step: int = DEFAULT_STEP,
    max_gap: int = DEFAULT_MAX_GAP,
    cleaned: bool = False,
):
    return ds.groupby(SOURCE).map_groups(
        lambda g: gapfill_group(g, step, max_gap, cleaned=cleaned),
        batch_format="pyarrow",
    )


def gapfill_rate_series(
    ds,
    step: int = DEFAULT_STEP,
    max_gap: int = DEFAULT_MAX_GAP,
    cleaned: bool = False,
):
    """Gap-fill + post-fill derived-rate recompute (T8c), one shuffle."""
    return ds.groupby(SOURCE).map_groups(
        lambda g: gapfill_rate_group(g, step, max_gap, cleaned=cleaned),
        batch_format="pyarrow",
    )


def locf_group(
    group: pa.Table,
    step: int = DEFAULT_STEP,
    max_gap: int = DEFAULT_MAX_GAP,
    cleaned: bool = False,
) -> pa.Table:
    """Grid-aligned last-observation-carried-forward sampling — the
    step-function counterpart of :func:`gapfill_group`'s linear fill
    (TimescaleDB's ``locf()`` continuous-aggregate helper; the reference's
    nearest-before lookup is the backward half of its raster join,
    /root/reference/src/lib.rs:514-539).

    Same grid/segment/dedup contract as gapfill (per-segment epoch grid,
    same-timestamp keep-first, <2-unique-timestamp segments skipped), but
    each grid point carries the value of the latest observation at-or-
    before it — so ``n_tok`` stays int64: LOCF never invents values.
    Output: (source, seg, time, n_tok, is_original)."""
    if cleaned:
        g = _resort_cleaned(group)
    else:
        g = clean_group(group, max_gap)
    t = g[TIME].to_numpy(zero_copy_only=False)
    seg = g[SEG].to_numpy(zero_copy_only=False)
    n = len(t)
    src = g[SOURCE][0].as_py() if n else ""
    v = g[N_TOK].to_numpy(zero_copy_only=False).astype(np.int64)

    out_time: list[np.ndarray] = []
    out_val: list[np.ndarray] = []
    out_seg: list[np.ndarray] = []
    out_orig: list[np.ndarray] = []
    first = np.flatnonzero(np.r_[True, seg[1:] != seg[:-1]]) if n else np.array([], int)
    bounds = np.r_[first, n]
    for b0, b1 in zip(bounds[:-1], bounds[1:]):
        ts = t[b0:b1]
        uniq = np.r_[True, ts[1:] != ts[:-1]]
        ui = np.flatnonzero(uniq) + b0
        ts_u = t[ui]
        if len(ts_u) < 2:
            continue
        grid = np.arange(ts_u[0], ts_u[-1] + step, step, dtype=np.int64)
        pos = np.searchsorted(ts_u, grid, side="right") - 1
        out_time.append(grid)
        out_val.append(v[ui[pos]])
        out_seg.append(np.full(len(grid), seg[b0], dtype=np.int64))
        out_orig.append(ts_u[pos] == grid)

    if not out_time:
        return pa.table(
            {
                SOURCE: pa.array([], pa.string()),
                SEG: pa.array([], pa.int64()),
                TIME: pa.array([], pa.int64()),
                N_TOK: pa.array([], pa.int64()),
                IS_ORIGINAL: pa.array([], pa.bool_()),
            }
        )
    grid_t = np.concatenate(out_time)
    return pa.table(
        {
            SOURCE: pa.array(np.full(len(grid_t), src, dtype=object), pa.string()),
            SEG: pa.array(np.concatenate(out_seg)),
            TIME: pa.array(grid_t),
            N_TOK: pa.array(np.concatenate(out_val)),
            IS_ORIGINAL: pa.array(np.concatenate(out_orig)),
        }
    )


def locf_series(
    ds,
    step: int = DEFAULT_STEP,
    max_gap: int = DEFAULT_MAX_GAP,
    cleaned: bool = False,
):
    """LOCF sampling onto the per-segment grid, one shuffle."""
    return ds.groupby(SOURCE).map_groups(
        lambda g: locf_group(g, step, max_gap, cleaned=cleaned),
        batch_format="pyarrow",
    )


def nearest_group(
    group: pa.Table,
    step: int = DEFAULT_STEP,
    max_gap: int = DEFAULT_MAX_GAP,
    cleaned: bool = False,
) -> pa.Table:
    """Grid-aligned NEAREST-observation sampling — the method='nearest'
    member of the interpolation family (linear: gapfill_group; step:
    locf_group; spline: trackops.natural_cubic_spline), with the
    reference's backward tie rule (equidistant neighbors -> the EARLIER
    observation, the xarray-nearest convention of stages/asof.py).

    Same grid/segment/dedup contract as gapfill; values stay int64 —
    nearest never invents values.  Output: (source, seg, time, n_tok,
    is_original)."""
    if cleaned:
        g = _resort_cleaned(group)
    else:
        g = clean_group(group, max_gap)
    t = g[TIME].to_numpy(zero_copy_only=False)
    seg = g[SEG].to_numpy(zero_copy_only=False)
    n = len(t)
    src = g[SOURCE][0].as_py() if n else ""
    v = g[N_TOK].to_numpy(zero_copy_only=False).astype(np.int64)

    out_time: list[np.ndarray] = []
    out_val: list[np.ndarray] = []
    out_seg: list[np.ndarray] = []
    out_orig: list[np.ndarray] = []
    first = np.flatnonzero(np.r_[True, seg[1:] != seg[:-1]]) if n else np.array([], int)
    bounds = np.r_[first, n]
    for b0, b1 in zip(bounds[:-1], bounds[1:]):
        ts = t[b0:b1]
        uniq = np.r_[True, ts[1:] != ts[:-1]]
        ui = np.flatnonzero(uniq) + b0
        ts_u = t[ui]
        if len(ts_u) < 2:
            continue
        grid = np.arange(ts_u[0], ts_u[-1] + step, step, dtype=np.int64)
        lo = np.searchsorted(ts_u, grid, side="right") - 1
        hi = np.minimum(lo + 1, len(ts_u) - 1)
        # backward tie rule: strictly closer forward neighbor required
        take_hi = (ts_u[hi] - grid) < (grid - ts_u[lo])
        pick = np.where(take_hi, hi, lo)
        out_time.append(grid)
        out_val.append(v[ui[pick]])
        out_seg.append(np.full(len(grid), seg[b0], dtype=np.int64))
        out_orig.append(ts_u[pick] == grid)

    if not out_time:
        return pa.table(
            {
                SOURCE: pa.array([], pa.string()),
                SEG: pa.array([], pa.int64()),
                TIME: pa.array([], pa.int64()),
                N_TOK: pa.array([], pa.int64()),
                IS_ORIGINAL: pa.array([], pa.bool_()),
            }
        )
    grid_t = np.concatenate(out_time)
    return pa.table(
        {
            SOURCE: pa.array(np.full(len(grid_t), src, dtype=object), pa.string()),
            SEG: pa.array(np.concatenate(out_seg)),
            TIME: pa.array(grid_t),
            N_TOK: pa.array(np.concatenate(out_val)),
            IS_ORIGINAL: pa.array(np.concatenate(out_orig)),
        }
    )


def nearest_series(
    ds,
    step: int = DEFAULT_STEP,
    max_gap: int = DEFAULT_MAX_GAP,
    cleaned: bool = False,
):
    """Nearest sampling onto the per-segment grid, one shuffle."""
    return ds.groupby(SOURCE).map_groups(
        lambda g: nearest_group(g, step, max_gap, cleaned=cleaned),
        batch_format="pyarrow",
    )
