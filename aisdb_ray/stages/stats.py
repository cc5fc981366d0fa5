"""ANALYZE-style column statistics — the stats-collection primitive a
query planner (file pruning, join ordering, skew detection) feeds on.

The engine already CONSUMES per-file footer stats (state/catalog.py,
predicates.py row-group pruning); this operator PRODUCES table-level
stats as a first-class distributed pass: per column the row count, null
count, and typed min/max — algebraic partials per batch (one vectorized
``pc.min_max`` + ``null_count`` per column), a tiny funnel merge in the
ORIGINAL type (string-ified minima would mis-merge: "10" < "9"), and a
stringified finalize for a stable cross-type output schema.

Supported column types: integers and strings (floats excluded on
purpose — float formatting is not portable across engines, so a float
minimum cannot be hash-verified as text; route money through the
fixed-point adapters first, as every other operator does).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def _stats_partial(b: pa.Table, columns: list[str]) -> pa.Table:
    name, n, nn = [], [], []
    min_i, max_i, min_s, max_s = [], [], [], []
    for c in columns:
        col = b[c]
        name.append(c)
        n.append(b.num_rows)
        nn.append(col.null_count)
        is_int = pa.types.is_integer(col.type)
        if pa.types.is_uint64(col.type):
            # a uint64 value above int64 max would OverflowError deep in
            # the evidence build (min_i/max_i are int64); fail clearly
            raise TypeError(f"column_stats: uint64 column {c!r} can "
                            "exceed the int64 stats schema; cast first")
        if not is_int and not (pa.types.is_string(col.type)
                               or pa.types.is_large_string(col.type)):
            raise TypeError(f"column_stats: unsupported type {col.type} "
                            f"for {c!r} (int/string only)")
        if b.num_rows - col.null_count == 0:
            mn = mx = None
        else:
            mm = pc.min_max(col)
            mn, mx = mm["min"].as_py(), mm["max"].as_py()
        min_i.append(int(mn) if is_int and mn is not None else None)
        max_i.append(int(mx) if is_int and mx is not None else None)
        min_s.append(mn if not is_int else None)
        max_s.append(mx if not is_int else None)
    return pa.table({
        "col_name": pa.array(name, pa.string()),
        "n": pa.array(n, pa.int64()),
        "n_null": pa.array(nn, pa.int64()),
        "min_i": pa.array(min_i, pa.int64()),
        "max_i": pa.array(max_i, pa.int64()),
        "min_s": pa.array(min_s, pa.string()),
        "max_s": pa.array(max_s, pa.string()),
    })


def _stats_merge(b: pa.Table) -> pa.Table:
    g = b.group_by(["col_name"], use_threads=False).aggregate([
        ("n", "sum"), ("n_null", "sum"),
        ("min_i", "min"), ("max_i", "max"),
        ("min_s", "min"), ("max_s", "max"),
    ])
    return g.rename_columns(
        ["col_name", "n", "n_null", "min_i", "max_i", "min_s", "max_s"]
    )


def column_stats(ds, columns: list[str]):
    """Distributed ANALYZE: (col_name, n, n_null, min_v, max_v) per
    column, min/max stringified only AFTER the typed merge."""
    from aisdb_ray.stages._dist import funnel_combine

    def finalize(b: pa.Table) -> pa.Table:
        min_v = pc.coalesce(pc.cast(b["min_i"], pa.string()), b["min_s"])
        max_v = pc.coalesce(pc.cast(b["max_i"], pa.string()), b["max_s"])
        return pa.table({
            "col_name": b["col_name"],
            "n": b["n"],
            "n_null": b["n_null"],
            "min_v": min_v,
            "max_v": max_v,
        })

    return funnel_combine(
        ds.map_batches(lambda b: _stats_partial(b, columns),
                       batch_format="pyarrow"),
        _stats_merge, finalize_fn=finalize,
    )
