"""Generic partial+final grouped aggregation helper (non-time groupbys).

Same algebraic pattern as stages/rollup.py — vectorized per-batch
``pyarrow.Table.group_by`` partials, then a small Ray ``groupby`` combine —
for arbitrary key/metric column sets (the TPC-H-style summary queries).
Exactness policy: money/quantity columns are converted to int64 fixed-point
upstream so sums are order-independent (float sums are not).
"""

from __future__ import annotations

import pyarrow as pa
from ray.data.aggregate import Sum


def grouped_sums(ds, keys: list[str], sum_cols: list[str], count_as: str = "n"):
    """SUM(each of sum_cols) + COUNT(*) per key tuple.

    Returns a Dataset with columns keys + sum_cols (same names, summed) +
    ``count_as``.
    """

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {**{k: batch[k] for k in keys}, **{c: batch[c] for c in sum_cols}}
        )
        g = t.group_by(keys, use_threads=False).aggregate(
            [(c, "sum") for c in sum_cols] + [([], "count_all")]
        )
        return g.rename_columns(keys + sum_cols + [count_as])

    partials = ds.map_batches(partial, batch_format="pyarrow")
    aggs = [Sum(c, alias_name=c) for c in sum_cols] + [
        Sum(count_as, alias_name=count_as)
    ]
    return partials.groupby(keys).aggregate(*aggs)
