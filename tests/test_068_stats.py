"""ANALYZE column statistics: typed merge correctness (the string-min
trap), nulls, unsupported types."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from aisdb_ray.stages import stats


def test_column_stats_typed_merge():
    # values chosen so a string-typed merge would be WRONG: min(9, 10)
    # stringified per partial then string-min'd gives "10"
    t = pa.table({
        "i": pa.array([9, 10, 1000, 2], pa.int64()),
        "s": pa.array(["b", None, "a", "zz"], pa.string()),
    })
    out = stats.column_stats(
        rd.from_arrow(t).repartition(4), ["i", "s"]
    ).to_pandas().set_index("col_name")
    assert out.loc["i", "min_v"] == "2" and out.loc["i", "max_v"] == "1000"
    assert out.loc["i", "n"] == 4 and out.loc["i", "n_null"] == 0
    assert out.loc["s", "min_v"] == "a" and out.loc["s", "max_v"] == "zz"
    assert out.loc["s", "n_null"] == 1


def test_column_stats_all_null_and_reject_float():
    t = pa.table({
        "i": pa.array([None, None], pa.int64()),
        "f": pa.array([1.5, 2.5], pa.float64()),
    })
    out = stats.column_stats(rd.from_arrow(t), ["i"]).to_pandas()
    row = out.set_index("col_name").loc["i"]
    assert row["n_null"] == 2 and pd.isna(row["min_v"])
    with pytest.raises(Exception):
        stats.column_stats(rd.from_arrow(t), ["f"]).to_pandas()
