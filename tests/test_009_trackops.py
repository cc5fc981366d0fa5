"""Track-operator family: split/relink/decimate/resample semantics."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from aisdb_ray.stages import prepare, trackops

MAX_GAP = 7200


def _series_table(times, ntoks, src="s"):
    n = len(times)
    return pa.table(
        {
            "doc_id": pa.array(
                [f"{src}:{t:010d}:{i:04d}" for i, t in enumerate(times)], pa.string()
            ),
            "tokens": pa.array([[1]] * n, pa.list_(pa.int32())),
            "n_tok": pa.array([1] * n, pa.int32()),
            "source": pa.array([src] * n, pa.string()),
            "time": pa.array(times, pa.int64()),
            "seq": pa.array(list(range(n)), pa.int32()),
        }
    ).set_column(2, "n_tok", pa.array(ntoks, pa.int32()))


def test_split_multi_criteria_and_discard():
    # 6 steady points, then a rate jump, then 2 points (discarded: too short)
    times = [0, 60, 120, 180, 240, 300, 360, 30000, 30060]
    ntoks = [10, 11, 12, 13, 14, 15, 500, 20, 21]  # jump at idx 6
    out = trackops.split_multi_group(
        _series_table(times, ntoks), max_gap=MAX_GAP, max_rate=50,
        min_segment_length=3,
    ).to_pandas()
    # rate jump cuts before idx 6; gap cuts before idx 7; only the first
    # 6-row segment survives min_segment_length=3
    assert list(out["time"]) == times[:6]
    assert set(out["track"]) == {"s-0"}


def test_split_multi_value_bounds():
    times = [0, 60, 120, 180]
    ntoks = [10, -5, 11, 12]  # -5 filtered by bounds (not possible post-
    # validation, but the operator must enforce its own contract)
    out = trackops.split_multi_group(
        _series_table(times, ntoks), max_gap=MAX_GAP, value_lo=1,
        min_segment_length=3,
    ).to_pandas()
    assert list(out["n_tok"]) == [10, 11, 12]


def test_relink_rejoins_small_gap_segments():
    # two segments separated by just over max_gap: split by segmentation but
    # relinked into one pathway (d < 2*max_gap, similar value level)
    times = [0, 60, 120, 7500, 7560, 7620]
    ntoks = [100, 100, 100, 101, 101, 101]
    out = trackops.relink_group(
        _series_table(times, ntoks), max_gap=7200
    ).to_pandas()
    assert out["label"].nunique() == 1
    # far-apart or dissimilar segments start a new pathway
    times2 = [0, 60, 120, 100000, 100060, 100120]
    out2 = trackops.relink_group(
        _series_table(times2, ntoks), max_gap=7200
    ).to_pandas()
    assert out2["label"].nunique() == 2


def test_lttb_keeps_extremes():
    rng = np.random.default_rng(5)
    t = np.arange(0, 60000, 60, dtype=np.int64)
    v = np.sin(t / 5000) * 100 + 200
    spike = 500
    v[spike] = 4000  # a spike LTTB must keep
    idx = trackops.lttb_indices(t.astype(float), v, 50)
    assert 0 in idx and len(t) - 1 in idx
    assert spike in idx
    assert len(idx) <= 50


def test_resample_by_tokens_marks():
    times = [0, 60, 120, 180]
    ntoks = [100, 100, 100, 100]
    out = trackops.resample_by_tokens_group(
        _series_table(times, ntoks), every=150, max_gap=MAX_GAP
    ).to_pandas()
    # cum = [100,200,300,400]; marks at 150,300 -> interpolated epochs
    assert list(out["cum_tokens"]) == [150, 300]
    assert out["time"].iloc[0] == 30.0  # midway between 0 and 60
    assert out["time"].iloc[1] == 120.0  # exactly at the 3rd point


def test_cubic_spline_matches_linear_for_line():
    x = np.array([0.0, 60, 120, 180])
    y = np.array([0.0, 60, 120, 180])
    q = np.array([30.0, 90, 150])
    np.testing.assert_allclose(
        trackops.natural_cubic_spline(x, y, q), q, atol=1e-9
    )


def test_cubic_resample_roundtrips_knots():
    times = [0, 60, 150, 240]
    ntoks = [10, 30, 20, 40]
    out = trackops.resample_cubic_group(
        _series_table(times, ntoks), step=30, max_gap=MAX_GAP
    ).to_pandas()
    got = out.set_index("time")["n_tok"]
    for t, v in zip(times, ntoks):
        assert abs(got[t] - v) < 1e-9  # spline passes through the knots


def test_pipeline_level_split(micro_dir):
    ds = rd.read_parquet(micro_dir).map_batches(prepare.prepare, batch_format="pyarrow")
    out = trackops.split_multi(ds, max_gap=MAX_GAP).to_pandas()
    assert len(out) > 0
    assert out["track"].str.contains("-").all()
    dec = trackops.decimate(
        rd.read_parquet(micro_dir).map_batches(prepare.prepare, batch_format="pyarrow"),
        n_out=50,
    ).to_pandas()
    assert 0 < len(dec) <= 50 * dec["source"].nunique() + 1


def test_cubic_spline_matches_dense_solve_irregular_knots():
    """Thomas sweep vs a dense np.linalg.solve of the same natural-spline
    tridiagonal system on IRREGULAR knots (uniform spacing cannot see a
    wrong sub-diagonal index — the historical blind spot)."""
    from aisdb_ray.stages.trackops import natural_cubic_spline

    rng = np.random.default_rng(5)
    for _ in range(5):
        n = int(rng.integers(4, 15))
        x = np.sort(rng.choice(np.arange(1000), n, replace=False)).astype(float)
        y = rng.normal(0, 10, n)
        h = np.diff(x)
        k = n - 2
        A = np.zeros((k, k))
        for i in range(k):
            A[i, i] = 2 * (h[i] + h[i + 1])
            if i > 0:
                A[i, i - 1] = h[i]
            if i < k - 1:
                A[i, i + 1] = h[i + 1]
        d = 6 * (np.diff(y[1:]) / h[1:] - np.diff(y[:-1]) / h[:-1])
        M = np.r_[0.0, np.linalg.solve(A, d), 0.0]
        xq = np.linspace(x[0], x[-1], 57)
        idx = np.clip(np.searchsorted(x, xq) - 1, 0, n - 2)
        x0, x1 = x[idx], x[idx + 1]
        y0, y1 = y[idx], y[idx + 1]
        m0, m1 = M[idx], M[idx + 1]
        hs = x1 - x0
        Aq = (x1 - xq) / hs
        Bq = (xq - x0) / hs
        want = (Aq * y0 + Bq * y1
                + ((Aq ** 3 - Aq) * m0 + (Bq ** 3 - Bq) * m1) * hs ** 2 / 6)
        got = natural_cubic_spline(x, y, xq)
        np.testing.assert_allclose(got, want, atol=1e-9)


def test_sax_windows_floor_on_negative_epochs():
    """PAA window starts must FLOOR (SQL //): a -30s point belongs to the
    window starting at -W, never pooled into window 0."""
    import pyarrow as pa
    import ray.data as rd

    from aisdb_ray.stages import trackops

    step, p = 10, 3  # W = 30
    t = np.array([-30, -20, -10, 0, 10, 20], np.int64)
    tbl = pa.table({
        "source": ["s"] * 6,
        "seg": np.zeros(6, np.int64),
        "time": t,
        "n_tok": np.array([1, 2, 3, 10, 20, 30], np.int64),
    })
    out = trackops.sax_symbols(rd.from_arrow(tbl), step=step, p=p).to_pandas()
    got = out.set_index("wstart")["paa"].to_dict()
    assert got == {-30: 6, 0: 60}


def test_relink_on_already_segmented_input():
    """split -> relink composition: re-cleaning already-segmented input
    must recompute seg, not append a duplicate column (KeyError)."""
    import pyarrow as pa

    from aisdb_ray.stages import series

    t = pa.table({
        "source": pa.array(["s"] * 4),
        "doc_id": pa.array([f"s:{i}:0" for i in (10, 20, 8000, 8010)]),
        "time": pa.array([10, 20, 8000, 8010], pa.int64()),
        "seq": pa.array([0, 0, 0, 0], pa.int64()),
        "n_tok": pa.array([1, 2, 3, 4], pa.int64()),
    })
    once = series.clean_group(t, max_gap=3600)
    assert once.column_names.count("seg") == 1
    twice = series.clean_group(once, max_gap=3600)
    assert twice.column_names.count("seg") == 1
    assert twice["seg"].to_pylist() == once["seg"].to_pylist()
