"""LOCF grid sampling and MAD robust outliers."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from aisdb_ray.stages.series import locf_group, locf_series
from aisdb_ray.stages.window import mad_outliers


def _group(times, vals, source="s0"):
    n = len(times)
    return pa.table({
        "doc_id": pa.array([f"{source}:{t:010d}:{i:04d}" for i, t in enumerate(times)]),
        "n_tok": pa.array(np.asarray(vals, np.int32)),
        "source": pa.array([source] * n),
        "time": pa.array(np.asarray(times, np.int64)),
        "seq": pa.array(np.arange(n, dtype=np.int32)),
    })


def test_locf_carries_forward_and_grid_edges():
    out = locf_group(_group([0, 150], [10, 20]), step=60, max_gap=7200).to_pandas()
    # grid = arange(0, 150+60, 60) = [0, 60, 120, 180]; 180 carries v(150)
    assert out["time"].tolist() == [0, 60, 120, 180]
    assert out["n_tok"].tolist() == [10, 10, 10, 20]
    assert out["is_original"].tolist() == [True, False, False, False]
    assert out["n_tok"].dtype.kind == "i"  # LOCF never invents values


def test_locf_segments_and_short_segment_skipped():
    out = locf_group(
        _group([0, 60, 100_000], [1, 2, 9]), step=60, max_gap=7200
    ).to_pandas()
    # the single-point far segment is skipped (same contract as gapfill)
    assert out["seg"].tolist() == [0, 0]
    assert out["n_tok"].tolist() == [1, 2]


def test_locf_same_timestamp_keep_first():
    g = _group([0, 0, 60], [5, 99, 7])
    out = locf_group(g, step=60, max_gap=7200).to_pandas()
    assert out["n_tok"].tolist() == [5, 7]  # seq-0 row wins the tie


def test_mad_outliers_flags_only_far_points():
    tbl = _group([0, 60, 120, 180, 240], [10, 10, 10, 10, 100])
    ds = rd.from_arrow(tbl)
    got = mad_outliers(ds, k=3, num_parts=2).to_pandas()
    # median 10, MAD 0: only the 100 row deviates
    assert got["n_tok"].tolist() == [100]


def test_mad_outliers_integer_boundary():
    # v = [1..7, 13]: med2=9 (median 4.5), dev2=|2v-9| -> [7,5,3,1,1,3,5,17]
    # mad4=2*median(dev2)=8 (median 4) wait: sorted dev2 [1,1,3,3,5,5,7,17],
    # median = 4, mad4 = 8; flag 2*dev2 > 3*8=24 -> dev2 > 12: only 17 (v=13)
    tbl = _group(list(range(0, 480, 60)), [1, 2, 3, 4, 5, 6, 7, 13])
    got = mad_outliers(rd.from_arrow(tbl), k=3, num_parts=2).to_pandas()
    assert got["n_tok"].tolist() == [13]


def test_holt_block_matches_scalar_recurrence():
    from aisdb_ray.stages.window import holt_block

    times = [0, 60, 120, 180, 240]
    vals = [10, 14, 11, 20, 25]
    tbl = pa.table({
        "source": ["a"] * 5 + ["b"],
        "bucket": np.asarray(times + [0], np.int64),
        "sum_n_tok": np.asarray(vals + [7], np.int64),
    })
    out = holt_block(tbl, "source", "bucket", "sum_n_tok", 1, 4, 1, 8).to_pandas()
    # scalar reference with the same IEEE op order
    lev, trd = float(vals[0]), float(vals[1]) - float(vals[0])
    exp_l, exp_t = [lev], [trd]
    for v in vals[1:]:
        lp = lev + trd
        lev_new = lp + (float(v) - lp) * 0.25
        trd = trd + ((lev_new - lev) - trd) * 0.125
        lev = lev_new
        exp_l.append(lev)
        exp_t.append(trd)
    got = out[out.source == "a"].sort_values("bucket")
    assert got["holt_level"].tolist() == exp_l
    assert got["holt_trend"].tolist() == exp_t
    # single-row group: level = v, trend anchors at 0
    gb = out[out.source == "b"]
    assert gb["holt_level"].tolist() == [7.0] and gb["holt_trend"].tolist() == [0.0]


def test_top_movers_picks_largest_swing_with_ties_earliest():
    from aisdb_ray.stages.window import top_movers

    tbl = pa.table({
        "source": ["a"] * 4 + ["b"] * 2 + ["c"],
        "bucket": np.asarray([0, 86400, 172800, 259200, 0, 86400, 0], np.int64),
        # a: deltas +5, -9, +9 -> tie |9|: earliest (172800) wins
        "sum_n_tok": np.asarray([10, 15, 6, 15, 7, 7, 3], np.int64),
    })
    got = (
        top_movers(rd.from_arrow(tbl), num_parts=2)
        .to_pandas().sort_values("source").reset_index(drop=True)
    )
    # c has a single day: no row
    assert got["source"].tolist() == ["a", "b"]
    a = got[got.source == "a"].iloc[0]
    assert (a.bucket, a.prev_bucket, a.delta) == (172800, 86400, -9)
    b = got[got.source == "b"].iloc[0]
    assert (b.delta, b.prev_sum_n_tok, b.sum_n_tok) == (0, 7, 7)


def test_nearest_picks_closer_neighbor_and_backward_ties():
    from aisdb_ray.stages.series import nearest_group

    # grid 0/60/120 over points (0,10) (100,20):
    #   g=0 -> exact 10; g=60 -> forward point (40s) beats backward (60s);
    #   g=120 -> past the end, backward 20
    out = nearest_group(_group([0, 100], [10, 20]), step=60, max_gap=7200).to_pandas()
    assert out["time"].tolist() == [0, 60, 120]
    assert out["n_tok"].tolist() == [10, 20, 20]
    assert out["is_original"].tolist() == [True, False, False]

    # equidistant: points at 0 and 120, g=60 -> the EARLIER observation
    tie = nearest_group(_group([0, 120], [1, 9]), step=60, max_gap=7200).to_pandas()
    assert tie["n_tok"].tolist() == [1, 1, 9]


def test_nearest_same_timestamp_keep_first_and_short_segment():
    from aisdb_ray.stages.series import nearest_group

    g = _group([0, 0, 60], [5, 99, 7])
    out = nearest_group(g, step=60, max_gap=7200).to_pandas()
    assert out["n_tok"].tolist() == [5, 7]  # seq-0 wins the dup timestamp
    # single-point far segment skipped (same contract as gapfill/locf)
    out2 = nearest_group(
        _group([0, 60, 100_000], [1, 2, 9]), step=60, max_gap=7200
    ).to_pandas()
    assert out2["seg"].tolist() == [0, 0]
