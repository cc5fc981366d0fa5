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
    for k in keys:
        col = pa.chunked_array([pt[k].combine_chunks(), it[k].combine_chunks()])
        null |= pc.is_null(col).to_numpy(zero_copy_only=False)
        v = pc.fill_null(pc.cast(col, pa.string()), "").to_numpy(
            zero_copy_only=False
        )
        uniq, inv = factorize_sorted(v)
        code = code * np.int64(len(uniq)) + inv.astype(np.int64)
    code[null] = -1
    return code[:n_p], code[n_p:]


def _numeric(col: pa.ChunkedArray) -> np.ndarray:
    """Comparison vector for the time/bound columns: int64 when integral
    (exact), float64 otherwise.  Nulls become NaN (never match)."""
    import pyarrow.compute as pc

    if pa.types.is_integer(col.type) and col.null_count == 0:
        return col.to_numpy(zero_copy_only=False).astype(np.int64)
    return pc.cast(col, pa.float64()).to_numpy(zero_copy_only=False)


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
        t = _numeric(b[time_col])
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
        t = _numeric(pt[time_col])
        lo = _numeric(it[lo_col])
        hi = _numeric(it[hi_col])
        # exclude never-matching rows from the sweep (null key/time/bounds)
        pvalid = (cp >= 0) & ~np.isnan(t.astype(np.float64, copy=False))
        ivalid = (
            (ci >= 0)
            & ~np.isnan(lo.astype(np.float64, copy=False))
            & ~np.isnan(hi.astype(np.float64, copy=False))
        )
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
