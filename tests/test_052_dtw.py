"""dtw_distance DP parity, elasticity, band, and the pairwise fan-out."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from aisdb_ray.stages.dtw import dtw_distance, pairwise_dtw


def _brute(a, b):
    n, m = len(a), len(b)
    INF = 1 << 62
    d = [[INF] * m for _ in range(n)]
    for i in range(n):
        for j in range(m):
            c = abs(int(a[i]) - int(b[j]))
            if i == 0 and j == 0:
                d[i][j] = c
                continue
            best = INF
            if i > 0:
                best = min(best, d[i - 1][j])
            if j > 0:
                best = min(best, d[i][j - 1])
            if i > 0 and j > 0:
                best = min(best, d[i - 1][j - 1])
            d[i][j] = c + best
    return d[n - 1][m - 1]


def test_dtw_matches_bruteforce_random():
    rng = np.random.default_rng(1)
    for _ in range(100):
        n, m = rng.integers(1, 14, 2)
        a = rng.integers(0, 60, n)
        b = rng.integers(0, 60, m)
        assert dtw_distance(a, b) == _brute(a, b)


def test_dtw_elasticity_and_identity():
    assert dtw_distance([1, 2, 3], [1, 2, 3]) == 0
    # time-stretched copy still aligns at zero cost — the point of DTW
    assert dtw_distance([1, 1, 2, 3, 3], [1, 2, 3]) == 0
    # lock-step distance would be 3 here; DTW collapses it
    assert dtw_distance([5], [5, 5, 5]) == 0


def test_dtw_band_restricts_warping():
    a = [0, 0, 0, 9]
    b = [9, 0, 0, 0]
    free = dtw_distance(a, b)
    banded = dtw_distance(a, b, band=0)  # diagonal only: lock-step
    assert banded == sum(abs(x - y) for x, y in zip(a, b))
    assert free <= banded


def test_pairwise_dtw_fanout():
    t = pa.table({
        "source": pa.array(["a", "b", "c"]),
        "vec": pa.array([[1, 2, 3], [1, 1, 2, 3, 3], [9, 9]],
                        pa.list_(pa.int64())),
    })
    got = (
        pairwise_dtw(rd.from_arrow(t), "source", "vec")
        .to_pandas().set_index(["a", "b"])["dtw"]
    )
    assert got.loc[("a", "b")] == 0
    assert got.loc[("a", "c")] == dtw_distance([1, 2, 3], [9, 9])
    assert len(got) == 3


def test_dtw_rejects_empty():
    with pytest.raises(ValueError):
        dtw_distance([], [1])


def test_components_local_fast_path_equals_distributed(monkeypatch):
    """The size-adaptive union-find produces byte-identical labels to the
    pointer-jumping rounds on a random graph."""
    import pandas as pd

    from aisdb_ray.stages import components as C

    rng = np.random.default_rng(31)
    a = rng.integers(0, 200, 400).astype(np.int64)
    b = rng.integers(0, 200, 400).astype(np.int64)
    edges = pa.table({"a": pa.array(a), "b": pa.array(b)})

    fast = (
        C.connected_components(rd.from_arrow(edges))
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    monkeypatch.setattr(C, "LOCAL_EDGE_LIMIT", 0)  # force distributed
    dist = (
        C.connected_components(rd.from_arrow(edges))
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(fast, dist)


def test_tok_source_drift_bounds_and_identity():
    """TV in [0,1]; a source whose tokens mirror the corpus mix sits near
    0, a disjoint-vocabulary source sits at 1 (checked on the formula)."""
    from aisdb_ray.pipelines.queries import q_tok_source_drift

    got = q_tok_source_drift("/root/testdata/sf0.001").to_pandas()
    assert len(got) > 0
    assert ((got["tv"] >= 0) & (got["tv"] <= 1)).all()
    # formula identity: tv == s_abs / (2 * t_s * (total - t_s))
    total = int(got["t_s"].sum())
    den = 2 * got["t_s"] * (total - got["t_s"])
    assert (got["tv"] == got["s_abs"] / den).all()


def test_missing_hours_detects_planted_gap():
    from aisdb_ray.pipelines.queries import q_ts_missing_hours

    got = q_ts_missing_hours("/root/testdata/sf0.001").to_pandas()
    assert len(got) > 0
    # every reported hour is aligned and strictly inside some span
    assert (got["missing_hour"] % 3600 == 0).all()
    assert got.duplicated(["source", "missing_hour"]).sum() == 0


def test_dsir_resample_prefers_high_weight_docs():
    """Resampling keeps high-weight docs at a higher rate and is
    deterministic across runs."""
    from aisdb_ray.pipelines.queries import (
        q_doc_dsir_resample,
        q_doc_dsir_weights,
    )

    w = q_doc_dsir_weights("/root/testdata/sf0.001").to_pandas()
    kept = q_doc_dsir_resample("/root/testdata/sf0.001").to_pandas()
    kept2 = q_doc_dsir_resample("/root/testdata/sf0.001").to_pandas()
    assert sorted(kept["doc_id"]) == sorted(kept2["doc_id"])
    assert 0 < len(kept) < len(w)
    med = w["dsir_fx"].median()
    hi = w[w.dsir_fx > med]["doc_id"]
    lo = w[w.dsir_fx < med]["doc_id"]
    rate_hi = kept["doc_id"].isin(hi).sum() / max(len(hi), 1)
    rate_lo = kept["doc_id"].isin(lo).sum() / max(len(lo), 1)
    assert rate_hi > rate_lo


def test_pii_report_counts_planted_matches(tmp_path):
    import pyarrow.parquet as pq_mod

    from aisdb_ray.stages.scrub import PII_PATTERNS

    # route a tiny synthetic documents table through the same kernel
    import pyarrow.compute as pc

    texts = pa.array([
        "mail me at a@b.co or c@d.org via https://x.io",
        "no pii here",
        "call +1 (555) 123-4567 from 10.0.0.1",
    ])
    got = {}
    for name, pat, _ in PII_PATTERNS:
        got[name] = pc.count_substring_regex(texts, pattern=pat).to_pylist()
    assert got["email"] == [2, 0, 0]
    assert got["url"] == [1, 0, 0]
    assert got["ipv4"] == [0, 0, 1]
    assert got["phone"][2] >= 1


def test_hll_merge_equals_direct_construction():
    """Register-wise max of per-part sketches == sketch of the union —
    the mergeability property ev_hll_rollup's oracle proves at scale."""
    from aisdb_ray.stages.sketch import hll_partial_batch, merge_registers

    rng = np.random.default_rng(41)
    vals = rng.integers(0, 10_000, 5_000).astype(np.int64)
    t_all = pa.table({"k": pa.array(["x"] * len(vals)),
                      "v": pa.array(vals)})
    half = len(vals) // 2
    s_all = merge_registers(hll_partial_batch(t_all, "k", "v", 10),
                            key_col="k")
    s_merged = merge_registers(
        hll_partial_batch(t_all.slice(0, half), "k", "v", 10),
        hll_partial_batch(t_all.slice(half), "k", "v", 10),
        key_col="k",
    )
    assert s_all.sort_by([("register", "ascending")]).equals(
        s_merged.sort_by([("register", "ascending")]))
