"""Distribution-shape diagnostics: dispersion index and winsorized mean.

Two per-key robust statistics over the cleaned series, both built on the
same shape: a small keyed histogram/count table first (algebraic partials,
complete per key after one hash combine), then ONE co-shuffle on the key
with a vectorized multi-group kernel per partition.  Evidence columns stay
int64; each float output is one IEEE division on exact integer operands,
so a SQL restatement hash-matches bit for bit.

- :func:`fano_dispersion` — index of dispersion (Fano factor) of per-minute
  arrival counts, ZERO minutes inside the observed span included: a plain
  SQL GROUP BY can't see minutes with no rows, so the n_minutes term uses
  the span, and the missing minutes contribute 0 to sum and sum-of-squares
  exactly.  Fano >> 1 flags bursty ingestion; ~1 is Poisson-like.
- :func:`winsorized_mean` — per-key mean of the value channel after
  clamping to the [p_lo, p_hi] discrete quantiles (the engine's standard
  rank rule: smallest v with cum >= (p*tot+99)//100, stages/rank.py) —
  the robust rollup variant that survives fat-tailed token counts.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from aisdb_ray.schema import SOURCE, TIME


def _group_bounds(keys: np.ndarray):
    n = len(keys)
    gstart = np.r_[0, np.flatnonzero(keys[1:] != keys[:-1]) + 1]
    glen = np.diff(np.r_[gstart, n])
    return gstart, glen


def fano_dispersion(ds, key_col: str = SOURCE, time_col: str = TIME,
                    width: int = 60, num_parts: int | None = None):
    """(key, n_minutes, n_rows, sum_sq, fano) — one row per key.

    fano = (n·Σc² − S²) / (n·S) with n the minute-span length (zero
    minutes included), S total rows, Σc² over nonzero minutes only (zeros
    add nothing).  Exact int64 numerator/denominator, one division.
    """
    import pyarrow.compute as pc

    from aisdb_ray.functions.agg import grouped_sums
    from aisdb_ray.stages._dist import co_shuffle

    def add_minute(b: pa.Table) -> pa.Table:
        # drop null key/time rows up front (the skip-bad posture): a null
        # key is a None in the object lexsort (TypeError) and a null time
        # would NaN-float the minute column into undefined int64 garbage
        b = b.filter(pc.and_(pc.is_valid(b[key_col]), pc.is_valid(b[time_col])))
        m = pc.divide(b[time_col], width)
        return pa.table({key_col: b[key_col], "m": pc.cast(m, pa.int64())})

    cnt = grouped_sums(
        ds.map_batches(add_minute, batch_format="pyarrow"),
        [key_col, "m"], [], count_as="c", hash_combine=True,
    )

    def per_part(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return pa.table({
                key_col: pa.array([], pa.string()),
                "n_minutes": pa.array([], pa.int64()),
                "n_rows": pa.array([], pa.int64()),
                "sum_sq": pa.array([], pa.int64()),
                "fano": pa.array([], pa.float64()),
            })
        k = part[key_col].to_numpy(zero_copy_only=False)
        m = part["m"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = part["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((m, k))
        k, m, c = k[order], m[order], c[order]
        gstart, glen = _group_bounds(k)
        gend = gstart + glen - 1
        n_min = m[gend] - m[gstart] + 1
        s = np.add.reduceat(c, gstart)
        q = np.add.reduceat(c * c, gstart)
        # elementwise (per-key) bound: multiplying the MAXIMA across
        # different keys would spuriously reject datasets where one key
        # has a long span and a different key has large counts
        if len(s) and float(np.maximum(
            n_min.astype(np.float64) * q.astype(np.float64),
            s.astype(np.float64) ** 2,
        ).max()) >= float(1 << 62):
            raise OverflowError(
                "fano_dispersion: n·Σc² or S² would overflow int64")
        num = n_min * q - s * s
        den = n_min * s
        return pa.table({
            key_col: pa.array(k[gstart]),
            "n_minutes": pa.array(n_min),
            "n_rows": pa.array(s),
            "sum_sq": pa.array(q),
            "fano": pa.array(num.astype(np.float64) / den.astype(np.float64)),
        })

    return co_shuffle(cnt, [key_col], per_part, num_parts=num_parts)


def winsorized_mean(ds, key_col: str, value_col: str,
                    p_lo: int = 10, p_hi: int = 90,
                    num_parts: int | None = None):
    """(key, n, lo, hi, wsum, wmean) — per-key winsorized mean.

    Only (key, value, count) histogram partials ever shuffle; the clamp
    and the weighted sum run over histogram rows, not raw rows.
    """
    from aisdb_ray.stages._dist import co_shuffle

    def hist_partial(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # null key/value rows drop (skip-bad): None keys break the object
        # lexsort and a null value would NaN-float the histogram values
        b = b.filter(pc.and_(
            pc.is_valid(b[key_col]), pc.is_valid(b[value_col])
        ))
        t = pa.table({key_col: b[key_col], "v": b[value_col]})
        g = t.group_by([key_col, "v"], use_threads=False).aggregate(
            [([], "count_all")]
        )
        return g.rename_columns([key_col, "v", "c"])

    def hist_combine(b: pa.Table) -> pa.Table:
        g = b.group_by([key_col, "v"], use_threads=False).aggregate(
            [("c", "sum")]
        )
        return g.rename_columns([key_col, "v", "c"])

    partials = ds.map_batches(hist_partial, batch_format="pyarrow")
    local = partials.map_batches(
        hist_combine, batch_format="pyarrow", batch_size=None
    )

    def per_part(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return pa.table({
                key_col: pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "lo": pa.array([], pa.int64()),
                "hi": pa.array([], pa.int64()),
                "wsum": pa.array([], pa.int64()),
                "wmean": pa.array([], pa.float64()),
            })
        part = hist_combine(part)
        k = part[key_col].to_numpy(zero_copy_only=False)
        v = part["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = part["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((v, k))
        k, v, c = k[order], v[order], c[order]
        gstart, glen = _group_bounds(k)
        gid = np.repeat(np.arange(len(gstart)), glen)
        off = np.repeat(np.r_[0, np.cumsum(c)[gstart[1:] - 1]], glen)
        cum = np.cumsum(c) - off
        tot = np.repeat(np.add.reduceat(c, gstart), glen)

        def pick(p: int) -> np.ndarray:
            th = (p * tot + 99) // 100
            hit = np.flatnonzero(cum >= th)
            _, first = np.unique(gid[hit], return_index=True)
            return v[hit[first]]

        lo, hi = pick(p_lo), pick(p_hi)
        clipped = np.clip(v, np.repeat(lo, glen), np.repeat(hi, glen))
        # per-key overflow bound on sum(c·|clipped|), estimated in float64
        # (2^62 threshold leaves a 2x headroom over any rounding) — the
        # fano kernel's guard policy, applied to this file's other kernel
        est = np.add.reduceat(
            c.astype(np.float64) * np.abs(clipped).astype(np.float64), gstart
        )
        if len(est) and float(est.max()) >= float(1 << 62):
            raise OverflowError(
                "winsorized_mean: sum(c·|v|) would overflow int64; "
                "rescale the value channel first")
        wsum = np.add.reduceat(c * clipped, gstart)
        n = np.add.reduceat(c, gstart)
        return pa.table({
            key_col: pa.array(k[gstart]),
            "n": pa.array(n),
            "lo": pa.array(lo),
            "hi": pa.array(hi),
            "wsum": pa.array(wsum),
            "wmean": pa.array(wsum.astype(np.float64) / n.astype(np.float64)),
        })

    return co_shuffle(local, [key_col], per_part, num_parts=num_parts)
