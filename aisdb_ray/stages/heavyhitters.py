"""Exact frequent-item detection without shuffling the key universe.

The 100-TB problem: "which keys exceed 1/k of all traffic?" — a plain
groupby shuffles every distinct key (possibly billions).  Misra–Gries
gives the scale path: per-batch summaries of at most k counters whose
merge UNDERCOUNTS any key by at most n/(k+1), so every key with true
frequency > n/k is guaranteed to survive (the classic superset property;
Misra & Gries 1982, merge bound per Agarwal et al. 2013).  A second,
candidate-filtered pass computes exact counts for the (≤ k·batches,
typically ≪ distinct-keys) survivors, and the final strict filter
``count·k > n`` makes the OUTPUT exact and deterministic even though the
intermediate summaries depend on batch boundaries — the property a
correctness oracle needs (plain SQL: GROUP BY + HAVING count·k > n).

Only counter tables ever move; the key universe never shuffles.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _mg_compress(keys: np.ndarray, counts: np.ndarray, k: int):
    """Keep at most k counters: subtract the (k+1)-th largest count from
    all, drop the non-positive — the Misra–Gries decrement step done in
    bulk (deducts ≤ batch_n/(k+1) from any key)."""
    if len(keys) <= k:
        return keys, counts
    order = np.argsort(-counts, kind="stable")
    d = counts[order[k]]
    kept = counts - d
    m = kept > 0
    return keys[m], kept[m]


def frequent_keys(ds, key_col: str, k: int = 128):
    """Keys with exact count·k > total rows, as (key_col, n) — exact.

    Pass 1: per-batch exact counts compressed to ≤ k Misra–Gries counters,
    one bounded funnel merge (sum per key; no further compression, so the
    superset guarantee is immediate).  Pass 2: broadcast the candidate
    set, stream exact counts for candidates only, filter strictly.
    """
    import ray

    # the input is consumed three times (total, MG summaries, exact
    # candidate counts) — pin it once so an expensive upstream pipeline
    # is not re-executed per pass (the contamination-stage policy);
    # count() on the materialized dataset is then metadata-only
    ds = ds.materialize()
    total = ds.count()

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({key_col: b[key_col]})
        g = t.group_by([key_col], use_threads=False).aggregate(
            [([], "count_all")]
        )
        keys = g[key_col].to_numpy(zero_copy_only=False)
        counts = g.column(1).to_numpy(zero_copy_only=False).astype(np.int64)
        keys, counts = _mg_compress(keys, counts, k)
        return pa.table({key_col: pa.array(keys), "c": pa.array(counts)})

    def merge(b: pa.Table) -> pa.Table:
        g = b.group_by([key_col], use_threads=False).aggregate([("c", "sum")])
        return g.rename_columns([key_col, "c"])

    summaries = ds.map_batches(partial, batch_format="pyarrow")
    merged = (
        summaries.map_batches(merge, batch_format="pyarrow", batch_size=None)
        .repartition(1)
        .map_batches(merge, batch_format="pyarrow", batch_size=None)
    )
    cand = merged.take_all()  # ≤ k · map-tasks rows — counters, never keys
    cand_keys = [r[key_col] for r in cand]
    if not cand_keys:
        import ray.data as rd

        # empty result carries the INPUT's key dtype (hardcoding string
        # broke schema comparisons for int64 keys; near-uniform data hits
        # this branch whenever every MG partial compresses to zero)
        sch = ds.schema()
        key_t = dict(zip(sch.names, sch.types))[key_col]
        return rd.from_arrow(pa.table({
            key_col: pa.array([], key_t), "n": pa.array([], pa.int64()),
        }))
    cand_ref = ray.put(cand_keys)

    def exact_partial(b: pa.Table) -> pa.Table:
        vs = pa.array(ray.get(cand_ref))
        t = pa.table({key_col: b[key_col]}).filter(
            pc.is_in(b[key_col], value_set=vs)
        )
        g = t.group_by([key_col], use_threads=False).aggregate(
            [([], "count_all")]
        )
        return g.rename_columns([key_col, "n"])

    def exact_merge(b: pa.Table) -> pa.Table:
        g = b.group_by([key_col], use_threads=False).aggregate([("n", "sum")])
        return g.rename_columns([key_col, "n"])

    exact = (
        ds.map_batches(exact_partial, batch_format="pyarrow")
        .map_batches(exact_merge, batch_format="pyarrow", batch_size=None)
        .repartition(1)
        .map_batches(exact_merge, batch_format="pyarrow", batch_size=None)
    )

    def final(b: pa.Table) -> pa.Table:
        keep = pc.greater(pc.multiply(b["n"], pa.scalar(k, pa.int64())),
                          pa.scalar(total, pa.int64()))
        return b.filter(keep)

    return exact.map_batches(final, batch_format="pyarrow", batch_size=None)
