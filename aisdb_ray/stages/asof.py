"""As-of / nearest-grid joins — the reference's raster-lookup and weather
enrichment patterns (SURVEY.md §2.4 J3/J4) as engine operators.

Three kernels:

- :func:`binarysearch_vector` — exact NumPy replica of the reference's
  vectorized grid binary search (/root/reference/src/lib.rs:514-539):
  exact hit -> its index; miss -> the insertion point clamped to the last
  index (ceiling snap); descending axes supported by reverse + mirror;
  edge cases pinned by the reference's own expectations
  (/root/reference/aisdb/tests/test_013_proc_util.py:83-90).
- :class:`GridLookup` — stateful actor-pool stage holding a broadcast
  grid (axes + value array, ``ray.put`` once, read per actor): per-batch
  vectorized snap + gather, the raster-pixel-fetch pattern
  (/root/reference/aisdb/webdata/load_raster.py:27-79 routes each point
  through the same binary search into tile axes).
- :func:`asof_join` — per-key as-of join with ``direction`` 'backward'
  (DuckDB ``ASOF JOIN`` semantics: greatest ``t_right <= t``), 'forward'
  (least ``t_right >= t``), or 'nearest' (min ``|t_right - t|``, ties ->
  the earlier right row, matching xarray's lower-index tie rule the
  reference's weather join relies on,
  /root/reference/aisdb/weather/data_store.py:244-289); optional
  tolerance on the matched distance; unmatched rows drop (inner) or keep
  nulls (left).  The right side is the small side (a rollup tier, a
  dimension series) and is broadcast — the weather-cube-in-every-worker
  pattern (the reference loads the cube once per process and does
  vectorized nearest selection per track).
  :func:`asof_backward_join` is the backward-direction alias.

All lookups are O(log n) vectorized searchsorted per batch — no shuffle
of the big side, ever.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from aisdb_ray.schema import SOURCE, TIME

from aisdb_ray.functions.codes import factorize_sorted


def binarysearch_vector(arr: np.ndarray, search: np.ndarray) -> np.ndarray:
    """Vectorized grid snap, exact semantics of the reference kernel.

    Exact match -> its index; miss -> insertion point clamped to
    ``len(arr) - 1``; empty grid -> -1; descending input handled by
    reverse + index mirror (src/lib.rs:514-539).
    """
    arr = np.asarray(arr, dtype=np.float64)
    search = np.asarray(search, dtype=np.float64)
    if len(arr) == 0:
        return np.full(len(search), -1, dtype=np.int32)
    descending = len(arr) > 1 and arr[0] > arr[-1]
    a = arr[::-1] if descending else arr
    idx = np.searchsorted(a, search, side="left")
    idx = np.minimum(idx, len(a) - 1)
    if descending:
        idx = len(a) - 1 - idx
    return idx.astype(np.int32)


class GridLookup:
    """Actor-pool map: append grid values sampled at each row's coordinates.

    ``axes_ref`` is a ``ray.put`` handle to ``(axes, values)`` where
    ``axes`` is a tuple of 1-D arrays (ascending or descending) and
    ``values`` is an ndarray with one dim per axis.  The grid loads ONCE
    per actor in ``__init__`` (the heavyweight-state actor precedent,
    /root/reference/aisdb/denoising_encoder.py:262-337); ``__call__``
    snaps each coordinate column and gathers.
    """

    def __init__(self, axes_ref, coord_cols: list[str], out_col: str):
        self.axes, self.values = ray.get(axes_ref)
        assert len(self.axes) == len(coord_cols) == np.ndim(self.values)
        self.coord_cols = coord_cols
        self.out_col = out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        idxs = tuple(
            binarysearch_vector(
                ax, batch[c].to_numpy(zero_copy_only=False)
            ).astype(np.int64)
            for ax, c in zip(self.axes, self.coord_cols)
        )
        return batch.append_column(self.out_col, pa.array(self.values[idxs]))


def grid_lookup(ds, axes, values, coord_cols, out_col, concurrency: int = 4):
    """Dataset-level grid join: broadcast once, snap+gather per batch."""
    axes_ref = ray.put((tuple(np.asarray(a) for a in axes), np.asarray(values)))
    return ds.map_batches(
        GridLookup,
        batch_format="pyarrow",
        concurrency=(1, concurrency),
        fn_constructor_args=(axes_ref, list(coord_cols), out_col),
    )


def _val_np(col) -> np.ndarray:
    """Value column -> numpy WITHOUT the float64/NaN detour for nullable
    non-float columns: an int64 with one null would otherwise convert
    wholesale to float64, silently retyping the join output to double
    (values past 2^53 corrupt) and surfacing matched nulls as NaN.
    Object-with-None keeps exact values and real nulls; the Arrow
    rebuild restores the declared type."""
    if col.null_count and not pa.types.is_floating(col.type):
        return np.array(col.to_pylist(), dtype=object)
    return col.to_numpy(zero_copy_only=False)


def _right_index(right: pa.Table, by: str, on: str, value_cols: list[str]):
    """Sorted per-key arrays for the broadcast side: {key: (t[], values...)}."""
    key = right[by].to_numpy(zero_copy_only=False)
    t = right[on].to_numpy(zero_copy_only=False).astype(np.int64)
    vals = [_val_np(right[c]) for c in value_cols]
    order = np.lexsort((t, key))
    key, t = key[order], t[order]
    vals = [v[order] for v in vals]
    starts = np.flatnonzero(np.r_[True, key[1:] != key[:-1]])
    bounds = np.r_[starts, len(key)]
    return {
        key[a]: (t[a:b], tuple(v[a:b] for v in vals))
        for a, b in zip(bounds[:-1], bounds[1:])
    }


def asof_join(
    left_ds,
    right: pa.Table,
    *,
    by: str = SOURCE,
    on: str = TIME,
    right_on: str | None = None,
    value_cols: list[str],
    tolerance: int | None = None,
    how: str = "inner",
    direction: str = "backward",
):
    """For each left row, attach the right row selected by ``direction``:
    'backward' = greatest rt <= t, 'forward' = least rt >= t, 'nearest' =
    min |rt - t| with ties to the earlier right row.

    The right side is broadcast (``ray.put`` once); each batch groups its
    rows by key and does one vectorized ``searchsorted`` per key — the
    as-of kernel.  ``tolerance`` drops matches farther than it (in the
    chosen direction's distance).  ``how='left'`` keeps unmatched rows
    with nulls.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction={direction!r}")
    if how not in ("inner", "left"):
        # only `how == "inner"` is ever compared below, so a typo would
        # silently flip to left-join semantics
        raise ValueError(f"how={how!r}; expected 'inner' or 'left'")
    right_on = right_on or on
    idx_ref = ray.put(_right_index(right, by, right_on, value_cols))
    out_dtypes = [_val_np(right[c]).dtype for c in value_cols]
    # keep the Arrow types: numpy object dtypes (strings etc.) can't
    # round-trip through pa.from_numpy_dtype, and their unmatched filler
    # must be None, not 0
    out_types = [right.schema.field(c).type for c in value_cols]
    FAR = np.int64(1) << 62

    def join(batch: pa.Table) -> pa.Table:
        rindex = ray.get(idx_ref)
        key = batch[by].to_numpy(zero_copy_only=False)
        t = batch[on].to_numpy(zero_copy_only=False).astype(np.int64)
        # a null probe time matches NOTHING (ASOF SQL semantics): the NaN
        # -> INT64_MIN cast would otherwise "forward"-match the key's
        # first right row (and its wrapped distance even passes tolerance)
        tnull = (pa.compute.is_null(batch[on]).to_numpy(
            zero_copy_only=False) if batch[on].null_count else None)
        n = len(key)
        match_t = np.full(n, -1, dtype=np.int64)
        outs = [np.full(n, None, dtype=object) if dt == object
                else np.zeros(n, dtype=dt) for dt in out_dtypes]
        matched = np.zeros(n, dtype=bool)
        uniq, inv = factorize_sorted(key)
        # one argsort + boundary slices, NOT flatnonzero(inv == ui) per
        # key (O(U·n) per batch — quadratic when batches span many keys;
        # this is join_part's shape from the stream-stream path)
        gorder = np.argsort(inv, kind="stable")
        sinv = inv[gorder]
        gb = (np.r_[np.flatnonzero(np.r_[True, sinv[1:] != sinv[:-1]]), n]
              if n else np.zeros(1, dtype=np.int64))
        for gi in range(len(gb) - 1):
            code = sinv[gb[gi]]
            if code < 0:
                continue  # null keys match nothing (factorize codes -1)
            rows = gorder[gb[gi]:gb[gi + 1]]
            k = uniq[code]
            entry = rindex.get(k)
            if entry is None:
                continue
            rt, vs = entry
            tr = t[rows]
            pos_b = np.searchsorted(rt, tr, side="right") - 1
            ok_b = pos_b >= 0
            dist_b = np.where(ok_b, tr - rt[np.maximum(pos_b, 0)], FAR)
            if direction == "backward":
                pos, ok, dist = pos_b, ok_b, dist_b
            else:
                pos_f = np.searchsorted(rt, tr, side="left")
                ok_f = pos_f < len(rt)
                dist_f = np.where(
                    ok_f, rt[np.minimum(pos_f, len(rt) - 1)] - tr, FAR
                )
                if direction == "forward":
                    pos, ok, dist = pos_f, ok_f, dist_f
                else:  # nearest: strict < keeps ties on the backward side
                    use_f = dist_f < dist_b
                    pos = np.where(use_f, pos_f, pos_b)
                    ok = ok_b | ok_f
                    dist = np.minimum(dist_b, dist_f)
            if tolerance is not None:
                ok &= dist <= tolerance
            rsel = rows[ok]
            psel = pos[ok]
            matched[rsel] = True
            match_t[rsel] = rt[psel]
            for o, v in zip(outs, vs):
                o[rsel] = v[psel]
        if tnull is not None:
            matched[tnull] = False
        cols = dict(zip(batch.column_names, batch.columns))
        mt = pa.array(match_t)
        mm = pa.array(matched)
        import pyarrow.compute as pc

        cols[f"r_{right_on}"] = pc.if_else(mm, mt, pa.scalar(None, pa.int64()))
        for name, o, typ in zip(value_cols, outs, out_types):
            arr = pa.array(o, type=typ) if o.dtype == object else pa.array(o)
            cols[name] = pc.if_else(mm, arr, pa.scalar(None, typ))
        out = pa.table(cols)
        if how == "inner":
            out = out.filter(mm)
        return out

    return left_ds.map_batches(join, batch_format="pyarrow")


def asof_backward_join(left_ds, right: pa.Table, **kw):
    """Backward-direction alias (DuckDB ``ASOF JOIN`` semantics)."""
    return asof_join(left_ds, right, direction="backward", **kw)


def interp_join(
    left_ds,
    right: pa.Table,
    *,
    by: str = SOURCE,
    on: str = TIME,
    right_on: str | None = None,
    value_col: str,
    out_col: str = "v_interp",
):
    """Linear-interpolated as-of join: for each left row, find its BRACKET
    in the right series (greatest rt <= t and least rt >= t per key) and
    attach the value linearly interpolated between them — the reference's
    ``interp_time`` gap-fill semantics (aisdb/track_interp.py) applied at
    JOIN time against an arbitrary probe stream, instead of at grid-fill
    time against a fixed epoch grid.

    Inner semantics: only rows with BOTH neighbors survive (t inside the
    key's [first rt, last rt] span).  An exact hit (t0 == t1 == t) yields
    the right value itself.  Evidence columns (t0, t1, and the int64
    endpoint values) ride along so the float result is auditable; the
    interpolation itself is the single IEEE expression
    ``v0 + ((v1 - v0)*(t - t0)) / (t1 - t0)`` with one int64 product, one
    divide, one add — reproducible bit-for-bit by a SQL oracle.

    Same scale shape as :func:`asof_join`: the right side (a rollup tier)
    is broadcast once via ``ray.put``; the big probe side streams through
    ``map_batches`` with one vectorized searchsorted per key — no shuffle.
    """
    right_on = right_on or on
    rv = right[value_col].to_numpy(zero_copy_only=False)
    if not np.issubdtype(rv.dtype, np.integer):
        raise TypeError("interp_join expects an integer value_col "
                        "(exact endpoints; the interpolation is the only "
                        "float step)")
    idx_ref = ray.put(_right_index(right, by, right_on, [value_col]))

    def join(batch: pa.Table) -> pa.Table:
        rindex = ray.get(idx_ref)
        key = batch[by].to_numpy(zero_copy_only=False)
        t = batch[on].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(key)
        t0 = np.zeros(n, dtype=np.int64)
        t1 = np.zeros(n, dtype=np.int64)
        v0 = np.zeros(n, dtype=np.int64)
        v1 = np.zeros(n, dtype=np.int64)
        matched = np.zeros(n, dtype=bool)
        uniq, inv = factorize_sorted(key)
        # one argsort + boundary slices, NOT flatnonzero(inv == ui) per
        # key (O(U·n) per batch — quadratic when batches span many keys;
        # this is join_part's shape from the stream-stream path)
        gorder = np.argsort(inv, kind="stable")
        sinv = inv[gorder]
        gb = (np.r_[np.flatnonzero(np.r_[True, sinv[1:] != sinv[:-1]]), n]
              if n else np.zeros(1, dtype=np.int64))
        for gi in range(len(gb) - 1):
            code = sinv[gb[gi]]
            if code < 0:
                continue  # null keys match nothing (factorize codes -1)
            rows = gorder[gb[gi]:gb[gi + 1]]
            k = uniq[code]
            entry = rindex.get(k)
            if entry is None:
                continue
            rt, (vals,) = entry
            tr = t[rows]
            pos_b = np.searchsorted(rt, tr, side="right") - 1
            pos_f = np.searchsorted(rt, tr, side="left")
            ok = (pos_b >= 0) & (pos_f < len(rt))
            rsel = rows[ok]
            pb, pf = pos_b[ok], pos_f[ok]
            matched[rsel] = True
            t0[rsel] = rt[pb]
            t1[rsel] = rt[pf]
            v0[rsel] = vals[pb].astype(np.int64)
            v1[rsel] = vals[pf].astype(np.int64)
        # v0 + ((v1-v0)*(t-t0))/(t1-t0): int64 product, then ONE float
        # divide and ONE float add — the SQL oracle writes the identical
        # expression, so results match bit-for-bit.  Guard the product.
        dt = t - t0
        dv = v1 - v0
        if matched.any():
            # guard the PER-ROW product (a max|Δv|·max|Δt| cross-row bound
            # would falsely abort when the extremes sit on different
            # rows): float screen with margin, exact python-int check on
            # the few candidates the screen flags
            prod = np.abs(dv[matched].astype(np.float64)
                          * dt[matched].astype(np.float64))
            if (prod > float(1 << 61)).any():
                dvm, dtm = dv[matched], dt[matched]
                for i in np.flatnonzero(prod > float(1 << 61)):
                    if abs(int(dvm[i]) * int(dtm[i])) >= (1 << 62):
                        raise OverflowError(
                            "interp_join: (Δv·Δt) overflows int64")
        den = t1 - t0
        exact = den == 0
        interp = np.where(
            exact,
            v0.astype(np.float64),
            v0.astype(np.float64)
            + (dv * dt).astype(np.float64)
            / np.where(exact, 1, den).astype(np.float64),
        )
        cols = dict(zip(batch.column_names, batch.columns))
        cols["t0"] = pa.array(t0)
        cols["t1"] = pa.array(t1)
        cols["v0"] = pa.array(v0)
        cols["v1"] = pa.array(v1)
        cols[out_col] = pa.array(interp)
        return pa.table(cols).filter(pa.array(matched))

    return left_ds.map_batches(join, batch_format="pyarrow")


def asof_join_streams(
    left,
    right,
    *,
    by: str = SOURCE,
    on: str = TIME,
    right_on: str | None = None,
    value_cols: list[str],
    chunk_s: int = 86400,
    tolerance: int | None = None,
    how: str = "inner",
    num_parts: int | None = None,
    direction: str = "backward",
):
    """As-of join where BOTH sides are big Datasets — the stream-stream
    enrichment :func:`asof_join`'s broadcast right side can't do (e.g.
    every purchase event joined to the user's latest click across
    billions of each).  ``direction='backward'`` picks the greatest
    rt <= t, ``'forward'`` the least rt >= t.

    Shape: both streams co-partition ONCE by (key, time-chunk); each
    partition answers its lefts from its local rights PLUS a carry —
    the extreme right row strictly before (backward) / after (forward)
    each chunk — looked up in a per-(key, chunk) carry table that is
    bounded by keys × touched chunks (arg-extreme-time partials, one
    funnel, ``ray.put`` broadcast; the same bounded-summary trade as
    the salted reconcile).  Right rows must be unique per (key, t) —
    pre-aggregate duplicates (the oracle does the same).
    """
    import pyarrow.compute as pc

    from aisdb_ray.stages._dist import co_shuffle

    if direction not in ("backward", "forward"):
        raise ValueError(f"direction={direction!r}")
    reserved = {"_t", "_chunk", "_side", "_rt"} | {
        f"_rv_{c}" for c in value_cols
    }
    clash = reserved & set(left.schema().names)
    if clash:
        # '_chunk' in particular is a REAL column on cascade datasets
        # (salted.CHUNK_COL) — silently overwriting it with this join's
        # own chunk ids would corrupt the output with no error
        raise ValueError(
            f"asof_join_streams: left columns {sorted(clash)} collide "
            "with the join's internal bookkeeping names — rename or drop "
            "them first"
        )
    bwd = direction == "backward"
    right_on = right_on or on
    rschema0 = right.schema().base_schema
    if not isinstance(rschema0, pa.Schema):
        rschema0 = (right.map_batches(lambda b: b, batch_format="pyarrow")
                    .schema().base_schema)

    def r_norm(b: pa.Table) -> pa.Table:
        cols = {by: b[by], "_rt": pc.cast(b[right_on], pa.int64())}
        for c in value_cols:
            cols[c] = b[c]
        return pa.table(cols)

    rightn = right.map_batches(r_norm, batch_format="pyarrow")

    # ---- carry table: per (key, chunk) the arg-extreme-time right row
    # (max for backward, min for forward) ----
    def _extreme_sel(key, ch, t):
        order = np.lexsort((t, ch, key))
        k2, c2 = key[order], ch[order]
        if bwd:
            mask = np.r_[(k2[1:] != k2[:-1]) | (c2[1:] != c2[:-1]), True]
        else:
            mask = np.r_[True, (k2[1:] != k2[:-1]) | (c2[1:] != c2[:-1])]
        sel = np.asarray(order)[np.flatnonzero(mask)]
        return sel, ch[sel]

    def carry_partial(b: pa.Table) -> pa.Table:
        key = b[by].to_numpy(zero_copy_only=False)
        t = b["_rt"].to_numpy(zero_copy_only=False)
        ch = t // chunk_s
        sel, csel = _extreme_sel(key, ch, t)
        picked = b.take(pa.array(sel))
        return picked.append_column("_chunk", pa.array(csel))

    def carry_merge(b: pa.Table) -> pa.Table:
        # keep the extreme-_rt row per (key, chunk) — idempotent
        key = b[by].to_numpy(zero_copy_only=False)
        ch = b["_chunk"].to_numpy(zero_copy_only=False)
        t = b["_rt"].to_numpy(zero_copy_only=False)
        sel, _ = _extreme_sel(key, ch, t)
        return b.take(pa.array(sel))

    from aisdb_ray.stages._dist import funnel_combine

    carry_tbl = pa.concat_tables(
        ray.get(
            funnel_combine(
                rightn.map_batches(carry_partial, batch_format="pyarrow"),
                carry_merge,
            ).to_arrow_refs()
        ),
        promote_options="default",
    )
    if by not in carry_tbl.column_names:
        # entirely empty right side: Ray's empty blocks carry no schema —
        # rebuild the carry table's shape from the right's own schema
        cols = {by: pa.array([], rschema0.field(by).type),
                "_rt": pa.array([], pa.int64())}
        for c in value_cols:
            cols[c] = pa.array([], rschema0.field(c).type)
        cols["_chunk"] = pa.array([], pa.int64())
        carry_tbl = pa.table(cols)
    # per-key sorted chunk lists for the carry lookup
    ckey = carry_tbl[by].to_numpy(zero_copy_only=False)
    cch = carry_tbl["_chunk"].to_numpy(zero_copy_only=False).astype(np.int64)
    crt = carry_tbl["_rt"].to_numpy(zero_copy_only=False).astype(np.int64)
    cvals = [_val_np(carry_tbl[c]) for c in value_cols]
    order = np.lexsort((cch, ckey))
    ckey, cch, crt = ckey[order], cch[order], crt[order]
    cvals = [v[order] for v in cvals]
    if len(ckey):
        starts = np.flatnonzero(np.r_[True, ckey[1:] != ckey[:-1]])
        bounds = np.r_[starts, len(ckey)]
        carry_map = {
            ckey[a]: (cch[a:b], crt[a:b], tuple(v[a:b] for v in cvals))
            for a, b in zip(bounds[:-1], bounds[1:])
        }
    else:
        carry_map = {}
    carry_ref = ray.put(carry_map)

    # ---- one co-shuffle of both streams by (key, chunk) ----
    # resolve schemas ONCE: closures must capture plain pa.Schema /
    # type dicts, never the Dataset or the carry table itself
    lschema = left.schema().base_schema
    if not isinstance(lschema, pa.Schema):
        lschema = (left.map_batches(lambda b: b, batch_format="pyarrow")
                   .schema().base_schema)
    lcols = list(lschema.names)
    ltypes = {c: lschema.field(c).type for c in lcols}
    vtypes = {c: carry_tbl.schema.field(c).type for c in value_cols}
    vdtypes = {
        c: (v.dtype if pa.types.is_floating(carry_tbl[c].type)
            else np.dtype(object))
        for c, v in zip(value_cols, cvals)
    }
    del carry_tbl, cvals  # broadcast via carry_ref only — never closures

    def l_tag(b: pa.Table) -> pa.Table:
        t = pc.cast(b[on], pa.int64())
        cols = {c: b[c] for c in lcols}
        cols["_t"] = t
        # numpy FLOOR division, matching the carry table's chunk ids —
        # Arrow pc.divide truncates, which diverges on negative epochs
        cols["_chunk"] = pa.array(
            t.to_numpy(zero_copy_only=False) // chunk_s)
        cols["_side"] = pa.array(np.zeros(b.num_rows, np.int8))
        cols["_rt"] = pa.nulls(b.num_rows, pa.int64())
        for c in value_cols:
            cols[f"_rv_{c}"] = pa.nulls(b.num_rows, vtypes[c])
        return pa.table(cols)

    def r_tag(b: pa.Table) -> pa.Table:
        cols = {c: pa.nulls(b.num_rows, ltypes[c]) for c in lcols}
        cols["_t"] = b["_rt"]
        cols["_chunk"] = pa.array(
            b["_rt"].to_numpy(zero_copy_only=False) // chunk_s)
        cols["_side"] = pa.array(np.ones(b.num_rows, np.int8))
        cols["_rt"] = b["_rt"]
        for c in value_cols:
            cols[f"_rv_{c}"] = b[c]
        cols[by] = b[by]
        return pa.table(cols)

    unioned = (
        left.map_batches(l_tag, batch_format="pyarrow")
        .union(rightn.map_batches(r_tag, batch_format="pyarrow"))
    )

    def join_part(part: pa.Table) -> pa.Table:
        cmap = ray.get(carry_ref)
        side = part["_side"].to_numpy(zero_copy_only=False)
        lt = part.filter(pa.array(side == 0))
        rt = part.filter(pa.array(side == 1))
        n = lt.num_rows
        if n == 0:
            out = {c: lt[c] for c in lcols}
            out["r_t"] = pa.array([], pa.int64())
            for c in value_cols:
                out[c] = pa.array([], vtypes[c])
            return pa.table(out)
        key_l = lt[by].to_numpy(zero_copy_only=False)
        ch_l = lt["_chunk"].to_numpy(zero_copy_only=False)
        t_l = lt["_t"].to_numpy(zero_copy_only=False)
        key_r = rt[by].to_numpy(zero_copy_only=False)
        ch_r = rt["_chunk"].to_numpy(zero_copy_only=False)
        t_r = rt["_rt"].to_numpy(zero_copy_only=False)
        rvals = [_val_np(rt[f"_rv_{c}"]) for c in value_cols]
        ro = np.lexsort((t_r, ch_r, key_r))
        key_r, ch_r, t_r = key_r[ro], ch_r[ro], t_r[ro]
        rvals = [v[ro] for v in rvals]

        match_t = np.full(n, np.iinfo(np.int64).min, dtype=np.int64)
        out_idx = np.full(n, -1, dtype=np.int64)      # into local rights
        carry_pick = np.full(n, -1, dtype=np.int64)   # into carry arrays
        carry_key = np.empty(n, dtype=object)

        lo = np.lexsort((t_l, ch_l, key_l))
        kl, cl, tl = key_l[lo], ch_l[lo], t_l[lo]
        gstart = np.flatnonzero(
            np.r_[True, (kl[1:] != kl[:-1]) | (cl[1:] != cl[:-1])])
        gbound = np.r_[gstart, n]
        # right group offsets: searchsorted over the (key, chunk) pairs
        for a, b2 in zip(gbound[:-1], gbound[1:]):
            k, c = kl[a], cl[a]
            # local rights of this (key, chunk)
            rlo = np.searchsorted(key_r, k, side="left")
            rhi = np.searchsorted(key_r, k, side="right")
            cslice = ch_r[rlo:rhi]
            r0 = rlo + np.searchsorted(cslice, c, side="left")
            r1 = rlo + np.searchsorted(cslice, c, side="right")
            ts = tl[a:b2]
            if bwd:
                pos = r0 + np.searchsorted(t_r[r0:r1], ts, side="right") - 1
                okl = pos >= r0
            else:
                pos = r0 + np.searchsorted(t_r[r0:r1], ts, side="left")
                okl = pos < r1
            rows = lo[a:b2]
            out_idx[rows[okl]] = pos[okl]
            match_t[rows[okl]] = t_r[pos[okl]]
            # carry: extreme right strictly before (bwd) / after (fwd)
            # this chunk
            entry = cmap.get(k)
            if entry is not None:
                cchs, crts, _ = entry
                if bwd:
                    cp = int(np.searchsorted(cchs, c, side="left")) - 1
                    ok_cp = cp >= 0
                else:
                    cp = int(np.searchsorted(cchs, c, side="right"))
                    ok_cp = cp < len(cchs)
                if ok_cp:
                    need = rows[~okl]
                    carry_pick[need] = cp
                    carry_key[need] = k
                    match_t[need] = crts[cp]
        matched = (out_idx >= 0) | (carry_pick >= 0)
        if tolerance is not None:
            d = (t_l - match_t) if bwd else (match_t - t_l)
            matched &= d <= tolerance
        outs = {}
        for c in lcols:
            outs[c] = lt[c]
        mt = np.where(matched, match_t, 0)
        outs["r_t"] = pc.if_else(pa.array(matched), pa.array(mt),
                                 pa.scalar(None, pa.int64()))
        for i, c in enumerate(value_cols):
            v = (np.full(n, None, dtype=object)
                 if vdtypes[c] == object else np.zeros(n, dtype=vdtypes[c]))
            lm = out_idx >= 0
            if lm.any():
                v[lm] = rvals[i][out_idx[lm]]
            cm = carry_pick >= 0
            if cm.any():
                cvi = np.empty(int(cm.sum()), dtype=v.dtype)
                for j, row in enumerate(np.flatnonzero(cm)):
                    _, _, cvs = cmap[carry_key[row]]
                    cvi[j] = cvs[i][carry_pick[row]]
                v[cm] = cvi
            arr = (pa.array(v, type=vtypes[c]) if vdtypes[c] == object
                   else pa.array(v))
            outs[c] = pc.if_else(
                pa.array(matched), arr, pa.scalar(None, vtypes[c]))
        out = pa.table(outs)
        if how == "inner":
            out = out.filter(pa.array(matched))
        return out

    return co_shuffle(unioned, [by, "_chunk"], join_part, num_parts)
