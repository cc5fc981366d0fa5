"""Per-group ranking operators: top-k rows and exact quantiles.

Top-k per group is the selection form of the reference's decimation
(keep the k most important rows per track — /root/reference/aisdb/
track_gen.py min_speed/decimate keep-subset semantics) and the everyday
training-data op ("3 best-scoring docs per domain").  Shape: a per-batch
vectorized partial top-k (each batch can contribute at most k rows per
group it contains) -> one ``groupby(group).map_groups`` final pass over
the surviving candidates — the shuffle moves O(k × groups × blocks) rows,
never the corpus.

Quantiles use the value-histogram decomposition: counts of (group, value)
are algebraic (per-batch ``pyarrow.Table.group_by().count`` partials, sum
to merge), and an exact discrete quantile is a cumulative-count walk over
the per-group histogram.  For bounded-cardinality value channels (token
counts, scores, durations) the histogram is tiny regardless of row count,
so this computes EXACT quantiles with one small shuffle — no sort of the
data, no sketch error.  Rank rule (both here and in the SQL oracles):
the q-th percentile is the smallest value whose cumulative count reaches
``ceil(q/100 * n)``, computed in integer arithmetic ``(q*n + 99) // 100``
so engine and oracle can never disagree on a float boundary.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from aisdb_ray.functions.codes import factorize_sorted


def _order_keys(col: pa.ChunkedArray, descending: bool) -> list[np.ndarray]:
    """numpy sort keys preserving the column's total order, nulls LAST
    regardless of direction (the DuckDB ORDER BY default the oracles
    assume).  Returns [null_flag, value] most-significant first: without
    the flag, an integer null round-trips through float NaN to INT64_MIN
    and ranks BEST in both directions, and a factorized string null (-1)
    sorts first ascending.

    Non-numeric columns are factorized (np.unique ordinals) — order-
    isomorphic within the table, which is all each selection stage
    compares across.
    """
    import pyarrow.compute as pc

    nulls = (pc.is_null(col).to_numpy(zero_copy_only=False)
             if col.null_count else None)
    if pa.types.is_integer(col.type):
        raw = col.to_numpy(zero_copy_only=False)
        v = (np.where(nulls, 0, raw) if nulls is not None else raw).astype(
            np.int64, copy=False)
    elif pa.types.is_floating(col.type):
        raw = col.to_numpy(zero_copy_only=False).astype(np.float64,
                                                        copy=False)
        v = np.where(nulls, 0.0, raw) if nulls is not None else raw
    else:
        arr = col.to_numpy(zero_copy_only=False)
        _, inv = factorize_sorted(arr)
        v = (np.where(nulls, 0, inv) if nulls is not None
             else inv).astype(np.int64)
    v = -v if descending else v
    return [v] if nulls is None else [nulls, v]


def _topk_table(
    tbl: pa.Table, group: str, order: list[str], k: int, descending: list[bool]
) -> pa.Table:
    """Keep the first k rows per group under (order, descending) — one
    lexsort + run-boundary arithmetic, no Python per row/group."""
    if len(tbl) == 0:
        return tbl
    _, ginv = factorize_sorted(tbl[group].to_numpy(zero_copy_only=False))
    keys = [k for c, d in zip(order, descending)
            for k in _order_keys(tbl[c], d)]
    # np.lexsort: last key is primary -> (group, order[0], order[1], ...)
    idx = np.lexsort(tuple(reversed(keys)) + (ginv,))
    gs = ginv[idx]
    starts = np.r_[0, np.flatnonzero(np.diff(gs)) + 1]
    lens = np.diff(np.r_[starts, len(gs)])
    rank = np.arange(len(gs)) - np.repeat(starts, lens)
    return tbl.take(pa.array(idx[rank < k]))


def topk_per_group(ds, group: str, order, k: int, descending=None):
    """k best rows per group; ``order`` must be a total order within each
    group (include a tiebreak column) or the selection is ambiguous."""
    order = [order] if isinstance(order, str) else list(order)
    if descending is None:
        descending = [False] * len(order)

    def partial(b: pa.Table) -> pa.Table:
        return _topk_table(b, group, order, k, descending)

    cand = ds.map_batches(partial, batch_format="pyarrow")
    return cand.groupby(group).map_groups(partial, batch_format="pyarrow")


def _quantile_partial(b: pa.Table, group: str, value: str) -> pa.Table:
    g = (
        pa.table({group: b[group], value: b[value]})
        .group_by([group, value], use_threads=False)
        .aggregate([([], "count_all")])
    )
    return g.rename_columns([group, value, "n"])


def group_quantiles(ds, group: str, value: str, ps=(50, 95)):
    """Exact per-group discrete quantiles of an integer channel.

    Returns one row per group: (group, n_rows, q{p}_{value}...).  Only
    (group, value, count) partials ever shuffle.  Single-group form of
    :func:`group_quantiles_multi` — one definition of the rank rule.
    """
    return group_quantiles_multi(ds, [group], value, ps)


def _quantile_cont_pick(tbl: pa.Table, group: str, value: str, ps) -> pa.Table:
    """One group's histogram rows -> interpolated (SQL percentile_cont /
    numpy 'linear') quantiles: h = (n-1)·p, lerp between the floor(h) and
    ceil(h) order statistics.  For dyadic p (25/50/75) over integer values
    the result is exactly representable, so every lerp formula (and
    DuckDB's quantile_cont) produces the identical double."""
    t = tbl.group_by([group, value], use_threads=False).aggregate([("n", "sum")])
    t = t.rename_columns([group, value, "n"])
    v = t[value].to_numpy(zero_copy_only=False)
    n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(v, kind="stable")
    vs = v[order]
    cum = np.cumsum(n[order])
    tot = int(cum[-1])
    out = {group: [t[group][0].as_py()], "n_rows": pa.array([tot], pa.int64())}
    for p in ps:
        h = (tot - 1) * (p / 100.0)
        k = int(np.floor(h))
        frac = h - k
        lo = float(vs[np.searchsorted(cum, k + 1, side="left")])
        if frac > 0.0:
            hi = float(vs[np.searchsorted(cum, k + 2, side="left")])
            q = lo + frac * (hi - lo)
        else:
            q = lo
        out[f"p{p}_{value}"] = pa.array([q], pa.float64())
    return pa.table(out)


def group_quantiles_cont(ds, group: str, value: str, ps=(25, 50, 75)):
    """Exact per-group INTERPOLATED quantiles (SQL percentile_cont /
    DuckDB quantile_cont semantics) via the same histogram decomposition
    as :func:`group_quantiles` — only (group, value, count) partials
    shuffle; no data sort, no sketch error."""
    partials = ds.map_batches(
        lambda b: _quantile_partial(b, group, value), batch_format="pyarrow"
    )
    return partials.groupby(group).map_groups(
        lambda t: _quantile_cont_pick(t, group, value, ps),
        batch_format="pyarrow",
    )


def _q_partial_multi(b: pa.Table, groups: list[str], value: str) -> pa.Table:
    cols = {g: b[g] for g in groups}
    cols[value] = b[value]
    g = (
        pa.table(cols)
        .group_by([*groups, value], use_threads=False)
        .aggregate([([], "count_all")])
    )
    return g.rename_columns([*groups, value, "n"])


def _q_pick_multi(tbl: pa.Table, groups: list[str], value: str, ps) -> pa.Table:
    t = tbl.group_by([*groups, value], use_threads=False).aggregate([("n", "sum")])
    t = t.rename_columns([*groups, value, "n"])
    v = t[value].to_numpy(zero_copy_only=False)
    n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(v, kind="stable")
    cum = np.cumsum(n[order])
    tot = int(cum[-1])
    out = {g: [t[g][0].as_py()] for g in groups}
    out["n_rows"] = pa.array([tot], pa.int64())
    for p in ps:
        rank = (p * tot + 99) // 100
        i = int(np.searchsorted(cum, rank, side="left"))
        out[f"q{p}_{value}"] = pa.array([int(v[order][i])], pa.int64())
    return pa.table(out)


def group_quantiles_multi(ds, groups: list[str], value: str, ps=(50, 95)):
    """Exact discrete quantiles per COMPOSITE group tuple — the same
    value-histogram decomposition and integer rank rule as
    :func:`group_quantiles`, shuffling only (groups, value, count)
    partials.  The per-window percentile form ("p95 per source per day")."""
    partials = ds.map_batches(
        lambda b: _q_partial_multi(b, groups, value), batch_format="pyarrow"
    )
    return partials.groupby(groups).map_groups(
        lambda t: _q_pick_multi(t, groups, value, ps), batch_format="pyarrow"
    )
