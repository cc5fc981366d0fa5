"""Mode (most-frequent-value) aggregate per key — deterministic tie-break.

The reference's static-aggregate table stores the most frequent non-null
value per column per mmsi via ``Counter(...).most_common(1)``
(/root/reference/aisdb/database/dbconn.py:110-197, Counter at :175).  That
tie-break is insertion order, which no distributed (or SQL) implementation
can reproduce; we pin ties to the *smallest value* so Ray, the NumPy oracle
and DuckDB agree (see oracle.mode_per_key).

Shape: mode is NOT algebraic over raw rows, but counts are — so:
per-batch vectorized count partial -> small groupby((key, value)).Sum ->
per-key argmax with the tie rule.  The final pick runs over one row per
distinct (key, value): tiny by construction.
"""

from __future__ import annotations

import pyarrow as pa

MODE_VALUE = "mode_value"
MODE_COUNT = "mode_count"


def _partial_counts(batch: pa.Table, key: str, col: str) -> pa.Table:
    import pyarrow.compute as pc

    # mode of the NON-null values (the documented semantics, and what
    # oracle.mode_per_key / SQL mode() compute): Arrow group_by would
    # otherwise keep a null-value group that can outvote real values, and
    # an all-null key would emit a row the oracle doesn't have
    t = pa.table({key: batch[key], MODE_VALUE: batch[col]})
    t = t.filter(pc.is_valid(t[MODE_VALUE]))
    g = t.group_by([key, MODE_VALUE], use_threads=False).aggregate(
        [([], "count_all")]
    )
    return g.rename_columns([key, MODE_VALUE, "n"])


def _combine_counts(batch: pa.Table) -> pa.Table:
    g = batch.group_by(
        [batch.column_names[0], MODE_VALUE], use_threads=False
    ).aggregate([("n", "sum")])
    return g.rename_columns([batch.column_names[0], MODE_VALUE, "n"])


def _pick_all(batch: pa.Table, key: str) -> pa.Table:
    """Vectorized per-key argmax over the (small) global counts table —
    pure Arrow: one sort, then keep the first row of each key run."""
    import numpy as np
    import pyarrow.compute as pc

    idx = pc.sort_indices(
        batch,
        sort_keys=[(key, "ascending"), ("n", "descending"),
                   (MODE_VALUE, "ascending")],
    )
    t = batch.take(idx)
    k = t[key].to_numpy(zero_copy_only=False)
    first = np.r_[True, k[1:] != k[:-1]] if len(k) else np.array([], bool)
    return t.filter(pa.array(first)).rename_columns(
        [key, MODE_VALUE, MODE_COUNT]
    )


def mode_per_key(ds, key: str, col: str, hash_combine: bool = False):
    """Dataset of (key, mode_value, mode_count), ties -> smallest value.

    Default: the same vectorized two-level combine as
    stages/rollup._combine — the global counts table (one row per distinct
    (key, value) — small by construction for metadata-mode use) lands in
    one block where the per-key pick is a single vectorized pass.

    ``hash_combine=True`` is the scale path when distinct (key, value)
    cardinality outgrows one block: a ``groupby(key)`` hash shuffle of the
    (already collapsed) partial counts, with the combine + argmax pick run
    per key group — no single task ever holds the whole counts table.
    Mirrors rollup._combine(hash_combine=True).
    """
    partials = ds.map_batches(
        lambda b: _partial_counts(b, key, col), batch_format="pyarrow"
    )
    local = partials.map_batches(
        _combine_counts, batch_format="pyarrow", batch_size=None
    )
    if hash_combine:
        return local.groupby(key).map_groups(
            lambda g: _pick_all(_combine_counts(g), key),
            batch_format="pyarrow",
        )
    merged = local.repartition(1).map_batches(
        _combine_counts, batch_format="pyarrow", batch_size=None
    )
    return merged.map_batches(
        lambda b: _pick_all(b, key), batch_format="pyarrow", batch_size=None
    )
