"""Generic partial+final grouped aggregation helper (non-time groupbys).

Same algebraic pattern as stages/rollup.py — vectorized per-batch
``pyarrow.Table.group_by`` partials, then a small Ray ``groupby`` combine —
for arbitrary key/metric column sets (the TPC-H-style summary queries).
Exactness policy: money/quantity columns are converted to int64 fixed-point
upstream so sums are order-independent (float sums are not).
"""

from __future__ import annotations

import pyarrow as pa


def grouped_sums(
    ds,
    keys: list[str],
    sum_cols: list[str],
    count_as: str = "n",
    hash_combine: bool = False,
):
    """SUM(each of sum_cols) + COUNT(*) per key tuple.

    Returns a Dataset with columns keys + sum_cols (same names, summed) +
    ``count_as``.  Combine is the same vectorized two-level pattern as
    stages/rollup._combine (per-block pyarrow group_by, then a one-block
    global combine) — no per-group Python.  ``hash_combine=True`` swaps the
    one-block funnel for a ``groupby(keys[0])`` hash shuffle of the partial
    rows (the scale path for high-cardinality key tuples; co-grouping on
    the first key is sufficient since it is a prefix of the group key).
    """

    # select aggregate outputs BY NAME, not positional rename: pyarrow's
    # keys-first column ordering is undocumented (older versions emitted
    # keys last), and a positional rename under the other ordering would
    # silently label sum columns as keys
    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {**{k: batch[k] for k in keys}, **{c: batch[c] for c in sum_cols}}
        )
        g = t.group_by(keys, use_threads=False).aggregate(
            [(c, "sum") for c in sum_cols] + [([], "count_all")]
        )
        return pa.table({
            **{k: g[k] for k in keys},
            **{c: g[f"{c}_sum"] for c in sum_cols},
            count_as: g["count_all"],
        })

    def combine(batch: pa.Table) -> pa.Table:
        g = batch.group_by(keys, use_threads=False).aggregate(
            [(c, "sum") for c in sum_cols + [count_as]]
        )
        return pa.table({
            **{k: g[k] for k in keys},
            **{c: g[f"{c}_sum"] for c in sum_cols},
            count_as: g[f"{count_as}_sum"],
        })

    partials = ds.map_batches(partial, batch_format="pyarrow")
    local = partials.map_batches(combine, batch_format="pyarrow", batch_size=None)
    if hash_combine:
        return local.groupby(keys[0]).map_groups(
            combine, batch_format="pyarrow"
        )
    return local.repartition(1).map_batches(
        combine, batch_format="pyarrow", batch_size=None
    )
