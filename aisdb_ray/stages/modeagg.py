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

import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Sum

MODE_VALUE = "mode_value"
MODE_COUNT = "mode_count"


def _partial_counts(batch: pa.Table, key: str, col: str) -> pa.Table:
    g = (
        pa.table({key: batch[key], MODE_VALUE: batch[col]})
        .group_by([key, MODE_VALUE], use_threads=False)
        .aggregate([([], "count_all")])
    )
    return g.rename_columns([key, MODE_VALUE, "n"])


def _pick_group(g: pd.DataFrame, key: str) -> pd.DataFrame:
    g = g.sort_values(["n", MODE_VALUE], ascending=[False, True], kind="stable")
    top = g.head(1)[[key, MODE_VALUE, "n"]].rename(columns={"n": MODE_COUNT})
    return top


def mode_per_key(ds, key: str, col: str):
    """Dataset of (key, mode_value, mode_count), ties -> smallest value."""
    partials = ds.map_batches(
        lambda b: _partial_counts(b, key, col), batch_format="pyarrow"
    )
    counts = partials.groupby([key, MODE_VALUE]).aggregate(Sum("n", alias_name="n"))
    return counts.groupby(key).map_groups(
        lambda g: _pick_group(g, key), batch_format="pandas"
    )
