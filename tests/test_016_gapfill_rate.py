"""T8c: derived rate recomputed AFTER gap-fill (geo_interp_time contract)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from aisdb_ray.stages.series import gapfill_rate_group


def _group(times, vals, source="s0"):
    n = len(times)
    return pa.table({
        "doc_id": pa.array([f"{source}:{t:010d}:{i:04d}" for i, t in enumerate(times)]),
        "n_tok": pa.array(np.asarray(vals, np.int32)),
        "source": pa.array([source] * n),
        "time": pa.array(np.asarray(times, np.int64)),
        "seq": pa.array(np.arange(n, dtype=np.int32)),
    })


def test_rate_recomputed_from_filled_grid():
    out = gapfill_rate_group(
        _group([0, 120, 180], [10, 40, 70]), step=60, max_gap=7200
    ).to_pandas()
    assert out["time"].tolist() == [0, 60, 120, 180]
    assert out["n_tok"].tolist() == [10.0, 25.0, 40.0, 70.0]
    # hops on the FILLED grid: 15/60, 15/60, 30/60; last point carries the
    # ORIGINAL final hop rate (70-40)/(180-120) = 0.5
    assert out["rate"].tolist() == [0.25, 0.25, 0.5, 0.5]


def test_rate_multi_segment_and_skipped_short():
    # seg 0 (2 pts), long gap, seg 1 single point (skipped by gap-fill)
    out = gapfill_rate_group(
        _group([0, 60, 100_000], [0, 60, 5]), step=60, max_gap=7200
    ).to_pandas()
    assert out["seg"].tolist() == [0, 0]
    assert out["rate"].tolist() == [1.0, 1.0]


def test_rate_same_timestamp_dedup_before_fill():
    # duplicate epoch keeps FIRST value (interp.py:275-277); rates derive
    # from the deduped series
    out = gapfill_rate_group(
        _group([0, 60, 60, 120], [0, 30, 99, 60]), step=60, max_gap=7200
    ).to_pandas()
    assert out["n_tok"].tolist() == [0.0, 30.0, 60.0]
    assert out["rate"].tolist() == [0.5, 0.5, 0.5]
