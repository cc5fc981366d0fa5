"""Co-partitioned hash equi-join — the large×large join the broadcast path
can't do.

The reference joins its dynamic table to static/aggregate tables inside one
SQL engine (/root/reference/aisdb/database/sql_query_strings.py and
sqlfcn.py crawl()); at warehouse scale the equivalent is a distributed hash
join.  The engine already has the broadcast form (pipelines/queries.py
q_seg_revenue: `ray.put` the small side, lookup in map_batches).  This
module adds the shuffle form for when BOTH sides are big:

1. normalize the right side's key column names to the left's,
2. pad each side to one unified schema (missing columns -> typed nulls),
   tag rows with a side bit, and append a key-hash partition id,
3. union the two datasets — ONE co-shuffle (`groupby(part)`) moves each
   row exactly once,
4. per partition, split by the side bit and run the vectorized Arrow
   (Acero) hash join on the pair of sub-tables.

Matching keys land in the same partition by construction, so per-partition
joins compose to the global join for every join type that is local under
key co-partitioning: inner, left/right/full outer, left semi, left anti.
Skew caveat (documented contract): a single key hotter than one partition's
memory needs salting on the build side — same remedy as the salted series
path (stages/salted.py).
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

from aisdb_ray.functions.codes import factorize_sorted

_SIDE = "_jside"
_PART = "_jpart"

JOIN_TYPES = (
    "inner",
    "left outer",
    "right outer",
    "full outer",
    "left semi",
    "left anti",
)


def _key_hash(tbl: pa.Table, keys: list[str], num_parts: int) -> np.ndarray:
    """Deterministic per-row partition id from the key column(s).

    Strings hash via crc32 over the batch's *unique* values (one Python
    call per distinct key, not per row); integers via a Fibonacci
    multiplicative hash, fully vectorized.  Null keys go to partition 0 —
    they never match anything, so placement is arbitrary.
    """
    import pyarrow.compute as pc

    acc = np.zeros(len(tbl), dtype=np.uint64)
    for key in keys:
        col = tbl[key]
        if pa.types.is_integer(col.type):
            v = pc.fill_null(col, 0).to_numpy(zero_copy_only=False)
            h = v.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        else:
            v = pc.fill_null(pc.cast(col, pa.string()), "").to_numpy(
                zero_copy_only=False
            )
            uniq, inv = factorize_sorted(v)
            lut = np.array(
                [zlib.crc32(s.encode()) for s in uniq], dtype=np.uint64
            )
            h = lut[inv]
        acc ^= h + np.uint64(0x9E3779B9) + (acc << np.uint64(6))
    return (acc % np.uint64(num_parts)).astype(np.int32)


def _arrow_schema(ds) -> pa.Schema:
    """The dataset's pyarrow schema.  Parquet-backed datasets report it
    from metadata; pandas-block datasets (from_pandas) report Python types,
    so fall back to converting one batch the same way map_batches will."""
    s = ds.schema()
    base = getattr(s, "base_schema", None)
    if isinstance(base, pa.Schema):
        return base
    if all(isinstance(t, pa.DataType) for t in s.types):
        return pa.schema(list(zip(s.names, s.types)))
    return ds.take_batch(1, batch_format="pyarrow").schema


def _pad_to(tbl: pa.Table, schema: pa.Schema, side: int, keys, num_parts):
    """Cast a one-side batch into the unified schema + side/part columns."""
    n = len(tbl)
    cols = {}
    for f in schema:
        if f.name in tbl.column_names:
            cols[f.name] = tbl[f.name]
        else:
            cols[f.name] = pa.nulls(n, f.type)
    out = pa.table(cols)
    out = out.append_column(_SIDE, pa.array(np.full(n, side, dtype=np.int8)))
    return out.append_column(_PART, pa.array(_key_hash(tbl, keys, num_parts)))


def hash_join(
    left,
    right,
    on,
    right_on=None,
    how: str = "inner",
    num_parts: int | None = None,
):
    """Distributed hash equi-join of two Datasets on ``on`` (str or list).

    ``right_on`` renames the right side's key column(s) to the left's
    before the exchange.  Non-key column names must be disjoint across
    sides (no silent suffixing — callers project first, which is also the
    right thing for shuffle width).  Output columns follow Arrow's join
    layout: left columns, then right non-key columns.
    """
    import ray
    import ray.data  # noqa: F401  (Dataset methods)

    if how not in JOIN_TYPES:
        raise ValueError(f"how={how!r}; expected one of {JOIN_TYPES}")
    keys = [on] if isinstance(on, str) else list(on)
    if right_on is not None:
        rkeys = [right_on] if isinstance(right_on, str) else list(right_on)
        right = right.map_batches(
            lambda b, m=dict(zip(rkeys, keys)): b.rename_columns(
                [m.get(c, c) for c in b.column_names]
            ),
            batch_format="pyarrow",
        )

    ls, rs = _arrow_schema(left), _arrow_schema(right)
    lcols, rcols = list(ls.names), list(rs.names)
    overlap = (set(lcols) - set(keys)) & (set(rcols) - set(keys))
    if overlap:
        raise ValueError(f"non-key columns collide: {sorted(overlap)}")
    unified = pa.schema(
        list(ls) + [f for f in rs if f.name not in set(lcols)]
    )
    if num_parts is None:
        num_parts = max(16, int(ray.cluster_resources().get("CPU", 8)) * 2)

    l2 = left.map_batches(
        lambda b: _pad_to(b, unified, 0, keys, num_parts), batch_format="pyarrow"
    )
    r2 = right.map_batches(
        lambda b: _pad_to(b, unified, 1, keys, num_parts), batch_format="pyarrow"
    )

    rnon = [c for c in rcols if c not in keys]

    def pad_left(lt: pa.Table) -> pa.Table:
        for c in rnon:
            lt = lt.append_column(c, pa.nulls(len(lt), unified.field(c).type))
        return lt

    def pad_right(rt: pa.Table) -> pa.Table:
        cols = {}
        for c in lcols:
            cols[c] = (
                rt[c] if c in keys
                else pa.nulls(len(rt), unified.field(c).type)
            )
        for c in rnon:
            cols[c] = rt[c]
        return pa.table(cols)

    def degenerate(lt: pa.Table, rt: pa.Table) -> pa.Table:
        """Either side empty: the join is a projection/pad — skip Acero
        (which also rejects null-typed columns on degenerate inputs)."""
        if how == "inner":
            return pad_left(lt.slice(0, 0))
        if how == "left semi":
            return lt.slice(0, 0)
        if how == "left anti":
            return lt  # nothing to subtract (rt empty) or nothing left (lt empty)
        if how == "left outer":
            return pad_left(lt)
        if how == "right outer":
            return pad_right(rt) if len(lt) == 0 else pad_left(lt.slice(0, 0))
        # full outer: the union of the two one-sided pads
        return pad_left(lt) if len(rt) == 0 else pad_right(rt)

    def join_part(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        side = group[_SIDE]
        lt = group.filter(pc.equal(side, 0)).select(lcols)
        rt = group.filter(pc.equal(side, 1)).select(rcols)
        if len(lt) == 0 or len(rt) == 0:
            return degenerate(lt, rt)
        return lt.join(rt, keys=keys, join_type=how)

    return (
        l2.union(r2)
        .groupby(_PART)
        .map_groups(join_part, batch_format="pyarrow")
    )


def _key_sig(b: pa.Table, keys: list[str]):
    """One string per row identifying the composite key (membership only —
    no ordering contract): components cast to string, joined with \\x00."""
    import pyarrow.compute as pc

    parts = [pc.cast(b[k], pa.string()) for k in keys]
    if len(parts) == 1:
        return parts[0]
    return pc.binary_join_element_wise(*parts, "\x00")


def hot_keys(left, keys: list[str], min_count: int) -> list:
    """Exact probe-side key frequencies ≥ ``min_count`` — the skew set.

    Partial counts per batch (one row per distinct key per batch), a
    hash-partitioned combine on the key, and the ≥-threshold filter runs
    INSIDE the combine task, so the driver only ever receives keys that
    are actually hot (≤ total_rows / min_count of them by construction).
    At warehouse scale you'd seed this from table statistics or a
    Misra-Gries sketch (stages/heavyhitters.py) instead of a scan; the
    join below stays correct for ANY hot set — the split affects only
    which path a key takes, never the output."""
    import pyarrow.compute as pc

    from aisdb_ray.stages._dist import funnel_combine

    def count_partial(b: pa.Table) -> pa.Table:
        t = pa.table({"k": _key_sig(b, keys)})
        g = t.group_by(["k"], use_threads=False).aggregate(
            [("k", "count", pc.CountOptions(mode="only_valid"))]
        )
        return g.rename_columns(["k", "c"])

    def merge(b: pa.Table) -> pa.Table:
        g = b.group_by(["k"], use_threads=False).aggregate([("c", "sum")])
        return g.rename_columns(["k", "c"])

    def keep_hot(b: pa.Table) -> pa.Table:
        return b.filter(pc.greater_equal(b["c"], pa.scalar(min_count)))

    partials = left.map_batches(count_partial, batch_format="pyarrow")
    hot = funnel_combine(partials, merge, key_col="k", hash_combine=True,
                         finalize_fn=keep_hot).take_all()
    return [r["k"] for r in hot]


def skew_join(
    left,
    right,
    on,
    hot_count_threshold: int,
    right_on=None,
    num_parts: int | None = None,
):
    """Skew-aware inner equi-join (the documented salting remedy of
    :func:`hash_join`, made automatic — the AQE/Pig "skewed join" shape,
    public knowledge):

    1. measure probe-side key frequencies (:func:`hot_keys`);
    2. HOT keys' build rows are collected once and broadcast
       (``ray.put``) — their probe rows join MAP-SIDE per batch and never
       enter the all-to-all, so no partition ever holds a hot key's full
       row set;
    3. COLD keys take the normal co-partitioned :func:`hash_join`.

    Output = hot ∪ cold paths, columns in Arrow join layout (left columns
    then right non-key columns).  Contract: the BUILD side's hot-key rows
    must fit in the object store (they are, by definition of a dimension
    or aggregate side, few per key); probe-side hot rows are unbounded —
    that is the point.  Inner join only: outer semantics across two
    disjoint key paths compose trivially but aren't needed yet."""
    import ray
    import pyarrow.compute as pc

    keys = [on] if isinstance(on, str) else list(on)
    if right_on is not None:
        rkeys = [right_on] if isinstance(right_on, str) else list(right_on)
        right = right.map_batches(
            lambda b, m=dict(zip(rkeys, keys)): b.rename_columns(
                [m.get(c, c) for c in b.column_names]
            ),
            batch_format="pyarrow",
        )

    lcols = list(_arrow_schema(left).names)
    rcols = list(_arrow_schema(right).names)
    out_cols = lcols + [c for c in rcols if c not in keys]

    hot = hot_keys(left, keys, hot_count_threshold)
    if not hot:
        return hash_join(left, right, keys, num_parts=num_parts)
    hot_arr = pa.array(hot, pa.string())

    def split(b: pa.Table, want_hot: bool) -> pa.Table:
        mask = pc.is_in(_key_sig(b, keys), value_set=hot_arr)
        return b.filter(mask if want_hot else pc.invert(mask))

    right_hot = pa.concat_tables(
        ray.get(
            right.map_batches(lambda b: split(b, True), batch_format="pyarrow")
            .to_arrow_refs()
        ),
        promote_options="default",
    )
    rh_ref = ray.put(right_hot)
    # capture only the (empty) schema in the closure — capturing right_hot
    # itself would ship the whole build slice inside the serialized
    # function, defeating the ray.put broadcast
    rh_empty = right_hot.schema.empty_table()
    del right_hot

    def join_hot(b: pa.Table) -> pa.Table:
        lt = split(b, True)
        if len(lt) == 0:
            return lt.join(rh_empty, keys=keys,
                           join_type="inner").select(out_cols)
        return lt.join(ray.get(rh_ref), keys=keys,
                       join_type="inner").select(out_cols)

    out_hot = left.map_batches(join_hot, batch_format="pyarrow")
    out_cold = hash_join(
        left.map_batches(lambda b: split(b, False), batch_format="pyarrow"),
        right.map_batches(lambda b: split(b, False), batch_format="pyarrow"),
        keys,
        num_parts=num_parts,
    ).map_batches(lambda b: b.select(out_cols), batch_format="pyarrow")
    return out_hot.union(out_cold)


# --------------------------------------------------------------------------
# Range (interval) join
# --------------------------------------------------------------------------

def _key_codes(pt: pa.Table, it: pa.Table, keys: list[str]):
    """Exact-equality integer codes for the key tuple, factorized jointly
    over both sides (so equal keys get equal codes).  Null keys -> -1
    (never match, SQL semantics).  Key columns are compared through a
    string cast, which is injective for ints and identity for strings."""
    import pyarrow.compute as pc

    n_p, n_i = len(pt), len(it)
    code = np.zeros(n_p + n_i, dtype=np.int64)
    null = np.zeros(n_p + n_i, dtype=bool)
    span = 1
    for k in keys:
        col = pa.chunked_array([pt[k].combine_chunks(), it[k].combine_chunks()])
        null |= pc.is_null(col).to_numpy(zero_copy_only=False)
        v = pc.fill_null(pc.cast(col, pa.string()), "").to_numpy(
            zero_copy_only=False
        )
        uniq, inv = factorize_sorted(v)
        span *= max(len(uniq), 1)
        if span >= (1 << 62):
            # the joint code would wrap int64 and alias distinct key
            # tuples into cross-key matches — refuse loudly (same posture
            # as coalesce_intervals' segmented-cummax budget)
            raise OverflowError(
                "interval join: per-partition key-cardinality product "
                "exceeds the int64 code budget — raise num_parts"
            )
        code = code * np.int64(len(uniq)) + inv.astype(np.int64)
    code[null] = -1
    return code[:n_p], code[n_p:]


def _numeric(col: pa.ChunkedArray) -> tuple[np.ndarray, np.ndarray]:
    """(comparison vector, null mask) for the time/bound columns: int64
    whenever the Arrow type is integral — exact at ANY magnitude, nulls
    masked out-of-band (the old float64 detour for nullable ints loses
    precision above 2^53, mis-classifying ns-epoch boundaries) — float64
    with NaN-as-null otherwise."""
    import pyarrow.compute as pc

    if pa.types.is_integer(col.type):
        isnull = pc.is_null(col).to_numpy(zero_copy_only=False)
        v = pc.fill_null(col, 0).to_numpy(zero_copy_only=False).astype(np.int64)
        return v, isnull
    v = pc.cast(col, pa.float64()).to_numpy(zero_copy_only=False)
    return v, np.isnan(v)


def interval_join(
    points,
    intervals,
    on,
    *,
    time_col: str,
    lo_col: str,
    hi_col: str,
    how: str = "inner",
    num_parts: int | None = None,
    salt: int = 1,
):
    """Distributed range join: each point row pairs with every interval row
    of the same key whose ``lo <= t <= hi`` (SQL ``p.t BETWEEN i.lo AND
    i.hi`` on top of key equality).  Intervals may overlap — a point can
    match many intervals.

    Reference analog: zone containment / ``fence_tracks``
    (/root/reference/aisdb/track_gen.py:266-284) where a "zone" is a time
    range rather than a polygon; the SQL shape is DuckDB's range join.

    Execution: the same single co-shuffle as :func:`hash_join` (key-hash
    partition id + side bit, union, one ``groupby``), then per partition a
    vectorized sweep — points sorted once by (key, t); the interval side
    (segments/sessions per key: small by construction) is walked once, each
    row resolving its match set with two binary searches into its key's
    point slice; the pair index arrays are then built without any per-pair
    Python work.  Cost per partition: O(P log P + I log P + output).
    Skew: ``salt=S > 1`` splits each key's POINT rows across S partitions
    (salted by a hash of the time value) and replicates each interval row
    to all S — the hot-source remedy of stages/salted.py applied to the
    join.  Each point exists in exactly one salted partition, so every
    match is emitted exactly once and results are salt-invariant; the cost
    is S× the (small) interval side through the exchange.

    how: 'inner' (matching pairs only) or 'left outer' (unmatched points
    kept once with null interval columns).
    """
    import ray
    import ray.data  # noqa: F401

    if how not in ("inner", "left outer"):
        raise ValueError(f"how={how!r}; expected 'inner' or 'left outer'")
    keys = [on] if isinstance(on, str) else list(on)

    ps, is_ = _arrow_schema(points), _arrow_schema(intervals)
    pcols, icols = list(ps.names), list(is_.names)
    for c in (time_col,):
        if c not in pcols:
            raise ValueError(f"points lack time column {c!r}")
    for c in (lo_col, hi_col):
        if c not in icols:
            raise ValueError(f"intervals lack bound column {c!r}")
    overlap = (set(pcols) - set(keys)) & (set(icols) - set(keys))
    if overlap:
        raise ValueError(f"non-key columns collide: {sorted(overlap)}")
    inon = [c for c in icols if c not in keys]
    unified = pa.schema(list(ps) + [is_.field(c) for c in inon])
    out_schema = unified  # output = point columns, then interval non-keys
    if num_parts is None:
        num_parts = max(16, int(ray.cluster_resources().get("CPU", 8)) * 2)

    S = max(int(salt), 1)
    # salts s and s + num_parts would land interval copies in the SAME
    # partition ((kh*S+s) % num_parts collides), and the sweep would see
    # that interval twice — duplicating every one of its matches.  More
    # salt than partitions cannot spread further anyway: clamp.
    S = min(S, num_parts)
    WIDE = (1 << 31) - 1
    NP64 = np.uint64(num_parts)

    def _reassign_part(padded: pa.Table, part: np.ndarray) -> pa.Table:
        i = padded.schema.get_field_index(_PART)
        return padded.set_column(i, _PART, pa.array(part.astype(np.int32)))

    def pad_pts(b: pa.Table) -> pa.Table:
        out = _pad_to(b, unified, 0, keys, num_parts)
        if S == 1:
            return out
        kh = _key_hash(b, keys, WIDE).astype(np.uint64)
        t, _tnull = _numeric(b[time_col])
        ti = np.nan_to_num(t.astype(np.float64, copy=False)).astype(np.int64)
        srow = (ti.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(S)
        return _reassign_part(out, (kh * np.uint64(S) + srow) % NP64)

    def pad_iv(b: pa.Table) -> pa.Table:
        out = _pad_to(b, unified, 1, keys, num_parts)
        if S == 1:
            return out
        kh = _key_hash(b, keys, WIDE).astype(np.uint64)
        copies = [
            _reassign_part(out, (kh * np.uint64(S) + np.uint64(s)) % NP64)
            for s in range(S)
        ]
        return pa.concat_tables(copies)

    p2 = points.map_batches(pad_pts, batch_format="pyarrow")
    i2 = intervals.map_batches(pad_iv, batch_format="pyarrow")

    def pad_points(pt: pa.Table) -> pa.Table:
        for c in inon:
            pt = pt.append_column(c, pa.nulls(len(pt), unified.field(c).type))
        return pt

    def join_part(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        side = group[_SIDE]
        pt = group.filter(pc.equal(side, 0)).select(pcols)
        it = group.filter(pc.equal(side, 1)).select(icols)
        if len(pt) == 0:
            return pa.table(
                {f.name: pa.nulls(0, f.type) for f in out_schema}
            )
        if len(it) == 0:
            return (
                pad_points(pt) if how == "left outer"
                else pa.table({f.name: pa.nulls(0, f.type) for f in out_schema})
            )

        cp, ci = _key_codes(pt, it, keys)
        t, tnull = _numeric(pt[time_col])
        lo, lonull = _numeric(it[lo_col])
        hi, hinull = _numeric(it[hi_col])
        # promote only when the SIDES disagree (int time vs float bounds);
        # int-int stays int64-exact end to end
        if not (t.dtype == lo.dtype == hi.dtype):
            t = t.astype(np.float64)
            lo = lo.astype(np.float64)
            hi = hi.astype(np.float64)
        # exclude never-matching rows from the sweep (null key/time/bounds)
        pvalid = (cp >= 0) & ~tnull
        ivalid = (ci >= 0) & ~lonull & ~hinull
        ppos = np.flatnonzero(pvalid)
        ipos = np.flatnonzero(ivalid)

        order = ppos[np.lexsort((t[ppos], cp[ppos]))]
        cs, ts = cp[order], t[order]
        a = np.searchsorted(cs, ci[ipos], side="left")
        b = np.searchsorted(cs, ci[ipos], side="right")
        starts = np.empty(len(ipos), dtype=np.int64)
        ends = np.empty(len(ipos), dtype=np.int64)
        for j in range(len(ipos)):  # loop over the SMALL side only
            lo_j, hi_j = lo[ipos[j]], hi[ipos[j]]
            seg = ts[a[j]:b[j]]
            starts[j] = a[j] + np.searchsorted(seg, lo_j, side="left")
            ends[j] = a[j] + np.searchsorted(seg, hi_j, side="right")
        counts = np.maximum(ends - starts, 0)
        total = int(counts.sum())
        iidx = np.repeat(np.arange(len(ipos)), counts)
        pidx = (
            np.arange(total)
            - np.repeat(np.cumsum(counts) - counts, counts)
            + np.repeat(starts, counts)
        )
        p_orig = order[pidx]
        i_orig = ipos[iidx]

        matched = pt.take(pa.array(p_orig, pa.int64()))
        cols = {c: matched[c] for c in pcols}
        itake = it.take(pa.array(i_orig, pa.int64()))
        for c in inon:
            cols[c] = itake[c]
        out = pa.table(cols)
        if how == "left outer":
            mask = np.zeros(len(pt), dtype=bool)
            mask[p_orig] = True
            out = pa.concat_tables(
                [out, pad_points(pt.filter(pa.array(~mask)))]
            )
        return out

    return (
        p2.union(i2)
        .groupby(_PART)
        .map_groups(join_part, batch_format="pyarrow")
    )


def interval_overlap_pairs(
    intervals,
    key: str = "source",
    start: str = "gap_start",
    end: str = "gap_end",
    window_s: int = 86400,
    num_parts: int | None = None,
):
    """Cross-key interval-overlap self-join: every pair of intervals from
    DIFFERENT keys whose spans intersect (strictly — touching endpoints do
    not overlap).  The correlated-failure query over outage intervals: two
    sources silent at the same time point to a shared upstream cause.

    Range joins have no equi-key, so the distributed shape is the classic
    spatial-join bin trick (the same coarse-bucket prune as the zone join,
    stages/zones.py): each interval replicates to the fixed ``window_s``
    time bins it touches, ONE bin-keyed co-shuffle co-locates everything
    that could overlap, and each bin runs a vectorized all-pair check over
    its (few) residents.  A pair whose spans cross a bin boundary would
    surface in every shared bin, so each pair is claimed exactly once by
    the bin containing the overlap's start (max of the two starts) —
    emitted iff that falls in the current bin.

    Partitioning assumption (documented contract): bin population is
    bounded — intervals per key are disjoint by construction (consecutive-
    point gaps), so a bin holds at most ``ceil(window_s / min_gap) + 1``
    intervals per key; the all-pair check is O(residents^2) per bin, never
    O(corpus^2).

    Output: (key_a, key_b, ov_start, ov_end, overlap_s), key_a < key_b."""
    from aisdb_ray.stages._dist import co_shuffle

    _BIN = "_ov_bin"

    def replicate(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b.append_column(_BIN, pa.array([], pa.int64()))
        s = b[start].to_numpy(zero_copy_only=False).astype(np.int64)
        e = b[end].to_numpy(zero_copy_only=False).astype(np.int64)
        lo = s // window_s
        hi = e // window_s  # end bin inclusive (strict overlap never
        # extends past it: points AT e don't overlap)
        reps = (hi - lo + 1).astype(np.int64)
        idx = np.repeat(np.arange(len(s)), reps)
        bins = lo.repeat(reps) + _ranges_within(reps)
        out = b.take(pa.array(idx))
        return out.append_column(_BIN, pa.array(bins * window_s))

    def per_bin(part: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "key_a": pa.array([], pa.string()),
                "key_b": pa.array([], pa.string()),
                "ov_start": pa.array([], pa.int64()),
                "ov_end": pa.array([], pa.int64()),
                "overlap_s": pa.array([], pa.int64()),
            }
        )
        # null-key intervals cannot meaningfully pair (and the canonical
        # ka > kb swap would TypeError comparing None with str)
        import pyarrow.compute as _pc

        if part.num_rows and part[key].null_count:
            part = part.filter(_pc.is_valid(part[key]))
        if part.num_rows < 2:
            return empty
        outs = []
        # a partition may hold several bins: split by bin id first
        bins = part[_BIN].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(bins, kind="stable")
        bs = bins[order]
        cuts = np.r_[0, np.flatnonzero(bs[1:] != bs[:-1]) + 1, len(bs)]
        keys = part[key]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        s_all = part[start].to_numpy(zero_copy_only=False).astype(np.int64)
        e_all = part[end].to_numpy(zero_copy_only=False).astype(np.int64)
        for a0, a1 in zip(cuts[:-1], cuts[1:]):
            rows = order[a0:a1]
            bin_lo = bs[a0]
            bin_hi = bin_lo + window_s
            s, e = s_all[rows], e_all[rows]
            i, j = np.triu_indices(len(rows), k=1)
            ov_s = np.maximum(s[i], s[j])
            ov_e = np.minimum(e[i], e[j])
            ka = keys.take(pa.array(rows[i])).to_numpy(zero_copy_only=False)
            kb = keys.take(pa.array(rows[j])).to_numpy(zero_copy_only=False)
            keep = (
                (ov_s < ov_e)                    # strict overlap
                & (ka != kb)                     # cross-key only
                & (ov_s >= bin_lo) & (ov_s < bin_hi)  # claimed once
            )
            if not keep.any():
                continue
            ka, kb = ka[keep], kb[keep]
            swap = ka > kb
            ka2 = np.where(swap, kb, ka)
            kb2 = np.where(swap, ka, kb)
            outs.append(pa.table({
                "key_a": pa.array(ka2.astype(object), pa.string()),
                "key_b": pa.array(kb2.astype(object), pa.string()),
                "ov_start": pa.array(ov_s[keep]),
                "ov_end": pa.array(ov_e[keep]),
                "overlap_s": pa.array(ov_e[keep] - ov_s[keep]),
            }))
        if not outs:
            return empty
        return pa.concat_tables(outs)

    binned = intervals.map_batches(replicate, batch_format="pyarrow")
    return co_shuffle(binned, [_BIN], per_bin, num_parts)


def _ranges_within(reps: np.ndarray) -> np.ndarray:
    """[0..reps[0]-1, 0..reps[1]-1, ...] without a Python loop."""
    total = int(reps.sum())
    if total == 0:
        return np.zeros(0, dtype=np.int64)
    starts = np.zeros(total, dtype=np.int64)
    starts[np.cumsum(reps)[:-1]] = reps[:-1]
    return np.arange(total, dtype=np.int64) - np.cumsum(starts)


def coalesce_intervals(intervals, key: str, start: str, end: str,
                       num_parts: int | None = None):
    """Merge transitively overlapping-or-touching intervals per key into
    maximal disjoint windows (the gaps-and-islands UNION — alert blanket
    windows, maintenance windows, validity-range compaction).  Output:
    (key, w_start, w_end, n_merged).

    One key-keyed co-shuffle; per partition fully vectorized: sort by
    (key, start, end), running max of end with per-key reset, a new
    island exactly where start exceeds the running max (touching merges),
    then one grouped min/max/count over island ids."""
    import pyarrow.compute as pc

    from aisdb_ray.stages._dist import co_shuffle

    def per_part(part: pa.Table) -> pa.Table:
        idx = pc.sort_indices(part, sort_keys=[
            (key, "ascending"), (start, "ascending"), (end, "ascending"),
        ])
        t = part.take(idx)
        k = t[key].to_numpy(zero_copy_only=False)
        s = t[start].to_numpy(zero_copy_only=False).astype(np.int64)
        e = t[end].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(k)
        if n == 0:
            return pa.table({key: t[key],
                             "w_start": pa.array([], pa.int64()),
                             "w_end": pa.array([], pa.int64()),
                             "n_merged": pa.array([], pa.int64())})
        new_key = np.r_[True, k[1:] != k[:-1]]
        # segmented cummax of end (reset per key), fully vectorized: add a
        # per-group base so np.maximum.accumulate can't leak across groups
        neg = np.iinfo(np.int64).min
        grp = np.cumsum(new_key) - 1
        if np.abs(e).max() >= (1 << 41) or grp[-1] >= (1 << 20):
            raise OverflowError(
                "coalesce_intervals: end magnitude (< 2^41) x distinct "
                "keys per partition (< 2^20) exceeds the segmented-cummax "
                "base budget — raise num_parts or rescale the axis")
        base = grp * (1 << 42)
        cmax = np.maximum.accumulate(e + base) - base
        prev_max = np.r_[neg, cmax[:-1]]
        prev_max[new_key] = neg  # a key's first interval always opens an island
        island = np.cumsum((s > prev_max) | new_key)
        out = pa.table({
            key: t[key], "_isl": pa.array(island),
            "w_start": pa.array(s), "w_end": pa.array(e),
        })
        g = out.group_by([key, "_isl"], use_threads=False).aggregate([
            ("w_start", "min"), ("w_end", "max"), ([], "count_all"),
        ])
        g = g.rename_columns([key, "_isl", "w_start", "w_end", "n_merged"])
        return pa.table({
            key: g[key],
            "w_start": g["w_start"],
            "w_end": g["w_end"],
            "n_merged": pc.cast(g["n_merged"], pa.int64()),
        })

    return co_shuffle(intervals, [key], per_part, num_parts)
