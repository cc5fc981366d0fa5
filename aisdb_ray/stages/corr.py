"""Pairwise series correlation via distributed Gram-matrix partials.

Cross-series analytics (which sources move together?) over a rollup tier:
for every source pair, the co-presence count and the sums needed for
Pearson r over buckets where BOTH sources have a row (inner-join
semantics).  The reference's nearest analog is its network-graph pass that
relates per-vessel series pairwise (/root/reference/aisdb/network_graph.py);
this states it as linear algebra so it distributes:

- co-shuffle tier rows by ``hash(bucket)`` so each bucket's rows land in
  one partition (the stages/join.py pattern);
- per partition, pivot to a dense (buckets × sources) value matrix ``M``
  and presence indicator ``A``; then ONE int64 matmul each gives
  ``n = AᵀA``, ``sxy = MᵀM``, ``sx = MᵀA``, ``sy = AᵀM``,
  ``sx2 = (M∘M)ᵀA``, ``sy2 = Aᵀ(M∘M)`` — all pair stats of the partition
  at once, exactly (integer matmul, no float accumulation);
- partials are plain sums per (src_a, src_b): an algebraic combine.

Pairwise output is quadratic in the number of sources — apply to a
bounded key set (a tier's source universe, or a top-k pre-filter), not an
unbounded id space.  Pearson r is finalized with the exact operand order
mirrored by the SQL oracle (int64 evidence → double cast → sqrt), so even
the float column hash-matches.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from aisdb_ray.schema import BUCKET, SOURCE, SUM_V

_STATS = ["n", "sx", "sy", "sxy", "sx2", "sy2"]


def gram_block(
    tbl: pa.Table,
    key_col: str = SOURCE,
    bucket_col: str = BUCKET,
    value_col: str = SUM_V,
) -> pa.Table:
    """One partition's pair partials: (src_a, src_b) with src_a < src_b."""
    empty = pa.table(
        {"src_a": pa.array([], pa.string()),
         "src_b": pa.array([], pa.string()),
         **{s: pa.array([], pa.int64()) for s in _STATS}}
    )
    import pyarrow.compute as pc

    # drop null key/bucket rows up front: null dictionary indices refuse
    # the zero-copy to_numpy (ArrowInvalid kills the job) and a null
    # bucket would NaN-cast into a fabricated int64 window
    tbl = tbl.filter(pc.and_(
        pc.is_valid(tbl[key_col]), pc.is_valid(tbl[bucket_col])
    ))
    if tbl.num_rows == 0:
        return empty

    kcol = tbl[key_col]
    if isinstance(kcol, pa.ChunkedArray):
        kcol = kcol.combine_chunks()
    enc = pc.dictionary_encode(kcol)
    src_names = enc.dictionary.to_pylist()
    s_idx = enc.indices.to_numpy().astype(np.int64)
    s = len(src_names)
    if s < 2:
        return empty

    bcol = tbl[bucket_col].to_numpy(zero_copy_only=False).astype(np.int64)
    _, b_idx = np.unique(bcol, return_inverse=True)
    nb = int(b_idx.max()) + 1
    v = tbl[value_col].to_numpy(zero_copy_only=False).astype(np.int64)

    # one-row-per-(bucket, key) input contract: a duplicate would silently
    # last-write-win in M while A marks presence once — wrong-but-plausible
    # sums with no error
    cell = b_idx * s + s_idx
    if len(np.unique(cell)) != len(cell):
        raise ValueError(
            "pairwise corr: duplicate (bucket, key) rows — input must be "
            "a rolled-up tier with one row per cell")
    M = np.zeros((nb, s), np.int64)
    A = np.zeros((nb, s), np.int64)
    M[b_idx, s_idx] = v
    A[b_idx, s_idx] = 1
    M2 = M * M

    # 4 matmuls, not 6: n and sxy are symmetric, and sy/sy2 are just the
    # transposes of sx/sx2 (sy[a,b] == sx[b,a]) — index instead of recompute
    n = A.T @ A
    sxy = M.T @ M
    sx = M.T @ A
    sx2 = M2.T @ A

    iu, ju = np.triu_indices(s, k=1)
    # canonical pair order is by NAME, not local index: swap where needed
    names = np.array(src_names, dtype=object)
    swap = names[iu] > names[ju]
    a_i = np.where(swap, ju, iu)
    b_i = np.where(swap, iu, ju)
    # never-co-occurring pairs (n == 0) contribute nothing to any sum and
    # _finalize drops them anyway — filtering here keeps the shipped
    # partials proportional to real co-occurrence, not s^2 per partition
    nz = n[a_i, b_i] > 0
    a_i, b_i = a_i[nz], b_i[nz]
    return pa.table(
        {
            "src_a": pa.array(names[a_i].tolist(), pa.string()),
            "src_b": pa.array(names[b_i].tolist(), pa.string()),
            "n": pa.array(n[a_i, b_i]),
            "sx": pa.array(sx[a_i, b_i]),
            "sy": pa.array(sx[b_i, a_i]),
            "sxy": pa.array(sxy[a_i, b_i]),
            "sx2": pa.array(sx2[a_i, b_i]),
            "sy2": pa.array(sx2[b_i, a_i]),
        }
    )


def _merge_b(b: pa.Table) -> pa.Table:
    g = b.group_by(["src_a", "src_b"], use_threads=False).aggregate(
        [(s, "sum") for s in _STATS]
    )
    return g.rename_columns(["src_a", "src_b", *_STATS])


def _finalize(b: pa.Table) -> pa.Table:
    """Append Pearson r (zero-variance pairs -> null), dropping pairs that
    never co-occur.  Operand order mirrors the SQL oracle exactly."""
    import pyarrow.compute as pc

    b = b.filter(pc.greater(b["n"], 0))
    n = b["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    sx = b["sx"].to_numpy(zero_copy_only=False).astype(np.int64)
    sy = b["sy"].to_numpy(zero_copy_only=False).astype(np.int64)
    sxy = b["sxy"].to_numpy(zero_copy_only=False).astype(np.int64)
    sx2 = b["sx2"].to_numpy(zero_copy_only=False).astype(np.int64)
    sy2 = b["sy2"].to_numpy(zero_copy_only=False).astype(np.int64)
    vx = n * sx2 - sx * sx
    vy = n * sy2 - sy * sy
    ok = (vx > 0) & (vy > 0)
    with np.errstate(divide="ignore", invalid="ignore"):
        r = (n * sxy - sx * sy).astype(np.float64) / np.sqrt(
            vx.astype(np.float64) * vy.astype(np.float64)
        )
    return b.append_column("r", pa.array(np.where(ok, r, np.nan), mask=~ok))


def pairwise_corr(
    tier_ds,
    key_col: str = SOURCE,
    bucket_col: str = BUCKET,
    value_col: str = SUM_V,
    num_parts: int | None = None,
):
    """Pearson correlation (+ integer evidence) for every co-occurring
    source pair of a rollup tier."""
    from aisdb_ray.stages._dist import co_shuffle, funnel_combine

    partials = co_shuffle(
        tier_ds, [bucket_col],
        lambda part: gram_block(part, key_col, bucket_col, value_col),
        num_parts,
    )
    return funnel_combine(partials, _merge_b, finalize_fn=_finalize)


def acf_block(
    tbl: pa.Table,
    key_col: str,
    order_cols: tuple,
    value_col: str,
    lags: tuple,
) -> pa.Table:
    """One partition's autocorrelation evidence: for every key group (the
    partition holds whole groups) and every lag L, the Pearson sums over
    the (x_i, x_{i+L}) pairs of the group's order_cols-sorted series.
    Multi-group vectorized: one lexsort, then per lag a same-key pair mask
    and ``np.add.reduceat`` int64 segment sums — no per-group Python."""
    empty = pa.table(
        {key_col: pa.array([], pa.string()),
         "lag": pa.array([], pa.int64()),
         **{s: pa.array([], pa.int64()) for s in _STATS}}
    )
    import pyarrow.compute as pc

    keep = pc.is_valid(tbl[key_col])
    for c in order_cols:
        keep = pc.and_(keep, pc.is_valid(tbl[c]))
    tbl = tbl.filter(keep)  # null keys/order cols: drop, don't NaN-cast
    if tbl.num_rows == 0:
        return empty

    kcol = tbl[key_col]
    if isinstance(kcol, pa.ChunkedArray):
        kcol = kcol.combine_chunks()
    enc = pc.dictionary_encode(kcol)
    names = np.array(enc.dictionary.to_pylist(), dtype=object)
    k_idx = enc.indices.to_numpy().astype(np.int64)
    order_keys = [
        tbl[c].to_numpy(zero_copy_only=False).astype(np.int64)
        for c in reversed(order_cols)
    ]
    order = np.lexsort((*order_keys, k_idx))
    k = k_idx[order]
    x = tbl[value_col].to_numpy(zero_copy_only=False).astype(np.int64)[order]

    outs = []
    for lag in lags:
        lag = int(lag)
        if lag <= 0 or lag >= len(x):
            continue
        same = k[:-lag] == k[lag:]
        xi, yi, ki = x[:-lag][same], x[lag:][same], k[:-lag][same]
        if len(ki) == 0:
            continue
        starts = np.flatnonzero(np.r_[True, ki[1:] != ki[:-1]])
        outs.append(pa.table({
            key_col: pa.array(names[ki[starts]].tolist(), pa.string()),
            "lag": pa.array(np.full(len(starts), lag, np.int64)),
            "n": pa.array(np.diff(np.r_[starts, len(ki)]).astype(np.int64)),
            "sx": pa.array(np.add.reduceat(xi, starts)),
            "sy": pa.array(np.add.reduceat(yi, starts)),
            "sxy": pa.array(np.add.reduceat(xi * yi, starts)),
            "sx2": pa.array(np.add.reduceat(xi * xi, starts)),
            "sy2": pa.array(np.add.reduceat(yi * yi, starts)),
        }))
    if not outs:
        return empty
    return pa.concat_tables(outs)


def group_acf(
    ds,
    key_col: str = SOURCE,
    order_cols: tuple = ("time", "seq"),
    value_col: str = "n_tok",
    lags: tuple = (1, 2, 3),
    num_parts: int | None = None,
):
    """Per-key autocorrelation function at the given lags over the
    order_cols-sorted value series (classic time-series diagnostics —
    which sources are bursty vs mean-reverting?).  ONE co-shuffle on the
    key places whole groups per partition, so block outputs are already
    final (no combine); r is finalized with the same exact operand order
    as :func:`pairwise_corr` so the float column hash-matches the SQL
    oracle.  Evidence columns stay int64-exact."""
    from aisdb_ray.stages._dist import co_shuffle

    out = co_shuffle(
        ds.select_columns([key_col, *order_cols, value_col]),
        [key_col],
        lambda part: acf_block(part, key_col, tuple(order_cols),
                               value_col, tuple(lags)),
        num_parts,
    )
    return out.map_batches(_finalize, batch_format="pyarrow")


def windowed_pairwise_corr(
    tier_ds,
    window_s: int,
    key_col: str = SOURCE,
    bucket_col: str = BUCKET,
    value_col: str = SUM_V,
    num_parts: int | None = None,
):
    """Per-window Pearson correlation for every co-occurring source pair:
    the relationship-DRIFT panel (a pair that decorrelates week over week
    signals a topology or upstream change the static matrix can't see).
    Gram partials are algebraic over buckets and each bucket belongs to
    exactly ONE tumbling window, so the same bucket-keyed co-shuffle
    works — each partition emits per-window pair partials (the gram_block
    matmul per window slice), tagged with ``wstart``; the combine sums
    per (pair, window)."""
    import pyarrow.compute as pc

    from aisdb_ray.stages._dist import co_shuffle, funnel_combine

    def block(part: pa.Table) -> pa.Table:
        empty = pa.table(
            {"src_a": pa.array([], pa.string()),
             "src_b": pa.array([], pa.string()),
             "wstart": pa.array([], pa.int64()),
             **{s: pa.array([], pa.int64()) for s in _STATS}}
        )
        if part.num_rows == 0:
            return empty
        # numpy floor division, NOT pc.divide: Arrow integer divide
        # truncates toward zero, so negative-epoch buckets would land in
        # the wrong tumbling window vs SQL's flooring // (same guard as
        # asof.asof_join_streams' l_tag)
        buck = part[bucket_col].to_numpy(zero_copy_only=False).astype(np.int64)
        w = (buck // window_s) * window_s
        outs = []
        for ws in np.unique(w):
            sub = part.filter(pa.array(w == ws))
            g = gram_block(sub, key_col, bucket_col, value_col)
            if g.num_rows:
                outs.append(g.append_column(
                    "wstart", pa.array(np.full(g.num_rows, ws, np.int64))))
        if not outs:
            return empty
        return pa.concat_tables(outs)

    def merge(b: pa.Table) -> pa.Table:
        g = b.group_by(["src_a", "src_b", "wstart"],
                       use_threads=False).aggregate(
            [(s, "sum") for s in _STATS]
        )
        return g.rename_columns(["src_a", "src_b", "wstart", *_STATS])

    partials = co_shuffle(tier_ds, [bucket_col], block, num_parts)
    return funnel_combine(partials, merge, finalize_fn=_finalize)
