"""Rolling median and Theil-Sen robust trend kernels."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from aisdb_ray.stages.window import rolling_median, theil_sen


def _group(times, vals, source="s0"):
    n = len(times)
    return pa.table({
        "doc_id": pa.array([f"{source}:{t:010d}:{i:04d}" for i, t in enumerate(times)]),
        "n_tok": pa.array(np.asarray(vals, np.int32)),
        "source": pa.array([source] * n),
        "time": pa.array(np.asarray(times, np.int64)),
        "seq": pa.array(np.arange(n, dtype=np.int32)),
    })


def test_rolling_median_warmup_and_full_windows():
    # w=3 over [5, 1, 9, 7, 3]:
    #   i0: med2(5)=10; i1: med2(1,5)=6; i2: med2(1,5,9)=10
    #   i3: med2(1,7,9)=14; i4: med2(3,7,9)=14
    tbl = _group([0, 60, 120, 180, 240], [5, 1, 9, 7, 3])
    got = (
        rolling_median(rd.from_arrow(tbl), w=3, num_parts=2)
        .to_pandas()
        .sort_values("time")
    )
    assert got["med2"].tolist() == [10, 6, 10, 14, 14]


def test_rolling_median_group_isolation_and_tie_order():
    # two sources; s1 has two rows at the same time, ordered by seq
    a = _group([0, 60], [10, 20], source="sa")
    b = _group([0, 0], [100, 4], source="sb")
    got = (
        rolling_median(rd.from_arrow(pa.concat_tables([a, b])), w=2, num_parts=2)
        .to_pandas()
        .sort_values(["source", "time", "seq"])
    )
    sa = got[got["source"] == "sa"]["med2"].tolist()
    sb = got[got["source"] == "sb"]["med2"].tolist()
    assert sa == [20, 30]          # [10], then [10, 20]
    assert sb == [200, 104]        # seq order: [100], then [100, 4]


def test_theil_sen_median_slope_and_truncation():
    # one day, points (t, v): (0,0), (100,-75), (200,10)
    # slopes*1e6 truncated toward zero:
    #   (0->100): -750000; (0->200): 50000; (100->200): 850000
    # median = 50000 -> slope2_fx = 100000; n_pairs = 3
    tbl = _group([0, 100, 200], [0, -75, 10])
    got = theil_sen(rd.from_arrow(tbl), num_parts=2).to_pandas()
    assert len(got) == 1
    assert int(got["n_pairs"].iloc[0]) == 3
    assert int(got["slope2_fx"].iloc[0]) == 100000


def test_theil_sen_negative_truncates_toward_zero():
    # dv=-1 over dt=3: -1000000//3 floor is -333334, trunc is -333333
    tbl = _group([0, 3], [1, 0])
    got = theil_sen(rd.from_arrow(tbl), num_parts=1).to_pandas()
    assert int(got["slope2_fx"].iloc[0]) == 2 * -333333


def test_theil_sen_equal_time_pairs_excluded_and_day_split():
    # two rows at t=0 (no valid pair) plus a second day's pair
    day = 86400
    t = _group([0, 0, day, day + 100], [1, 9, 0, 50])
    got = theil_sen(rd.from_arrow(t), num_parts=2).to_pandas().sort_values("day")
    # day 0: the only pair has dt=0 -> excluded entirely, but (0, day) pairs
    # are cross-day so they never form; day 1: one pair, slope 0.5/s
    assert got["day"].tolist() == [day]
    assert got["n_pairs"].tolist() == [1]
    assert got["slope2_fx"].tolist() == [2 * 500000]


def test_flatline_runs_and_min_len():
    from aisdb_ray.stages.window import flatline_runs

    # values: 5 5 5 2 7 7 -> runs: (5, len3), (2, len1), (7, len2)
    tbl = _group([0, 60, 120, 180, 240, 300], [5, 5, 5, 2, 7, 7])
    got = (
        flatline_runs(rd.from_arrow(tbl), min_len=2, num_parts=2)
        .to_pandas()
        .sort_values("start_time")
    )
    assert got["n_tok"].tolist() == [5, 7]
    assert got["n_points"].tolist() == [3, 2]
    assert got["start_time"].tolist() == [0, 240]
    assert got["end_time"].tolist() == [120, 300]


def test_flatline_does_not_bridge_groups():
    from aisdb_ray.stages.window import flatline_runs

    a = _group([0], [9], source="sa")
    b = _group([60], [9], source="sb")
    got = flatline_runs(
        rd.from_arrow(pa.concat_tables([a, b])), min_len=2, num_parts=2
    ).to_pandas()
    assert len(got) == 0  # same value across different sources is no run


def test_benford_digits_counts():
    from aisdb_ray.stages.window import benford_digits

    tbl = _group([0, 60, 120, 180], [123, 19, 2, 987])
    got = (
        benford_digits(rd.from_arrow(tbl))
        .to_pandas()
        .sort_values("digit")
    )
    assert got["digit"].tolist() == [1, 2, 9]
    assert got["n"].tolist() == [2, 1, 1]


def test_sax_symbols_paa_and_quartiles():
    from aisdb_ray.stages.trackops import sax_symbols

    # step=1, p=2 -> W=2; grid rows t=0..7 for one segment, values chosen
    # so the four window sums are 2, 6, 10, 14 (quartiles: 2, 6, 10)
    t = pa.table({
        "source": pa.array(["s"] * 8),
        "seg": pa.array([0] * 8, pa.int64()),
        "time": pa.array(list(range(8)), pa.int64()),
        "n_tok": pa.array([1, 1, 3, 3, 5, 5, 7, 7], pa.int64()),
    })
    got = (
        sax_symbols(rd.from_arrow(t), step=1, p=2)
        .to_pandas()
        .sort_values("wstart")
    )
    assert got["paa"].tolist() == [2, 6, 10, 14]
    # symbol = #(quartiles strictly below paa): [0, 1, 2, 3]
    assert got["symbol"].tolist() == [0, 1, 2, 3]


def test_sax_drops_partial_windows():
    from aisdb_ray.stages.trackops import sax_symbols

    # 5 grid points with W=2: windows [0,1], [2,3], [4] -> last dropped
    t = pa.table({
        "source": pa.array(["s"] * 5),
        "seg": pa.array([0] * 5, pa.int64()),
        "time": pa.array(list(range(5)), pa.int64()),
        "n_tok": pa.array([1, 2, 3, 4, 5], pa.int64()),
    })
    got = sax_symbols(rd.from_arrow(t), step=1, p=2).to_pandas()
    assert sorted(got["paa"].tolist()) == [3, 7]


def test_longest_rising_streak_picks_earliest_on_tie():
    from aisdb_ray.stages.window import longest_rising_streak

    # v: 1 2 3 | 1 2 3 -> two length-3 rising runs; earliest wins
    tbl = _group([0, 60, 120, 180, 240, 300], [1, 2, 3, 1, 2, 3])
    got = longest_rising_streak(rd.from_arrow(tbl), num_parts=2).to_pandas()
    assert len(got) == 1
    assert got["n_points"].iloc[0] == 3
    assert got["start_time"].iloc[0] == 0
    assert got["end_time"].iloc[0] == 120


def test_rising_streak_equal_values_break():
    from aisdb_ray.stages.window import longest_rising_streak

    # equal step breaks strictness: 1 2 2 3 -> best run is 2 points
    tbl = _group([0, 60, 120, 180], [1, 2, 2, 3])
    got = longest_rising_streak(rd.from_arrow(tbl), num_parts=1).to_pandas()
    assert got["n_points"].iloc[0] == 2
    assert got["start_time"].iloc[0] == 0  # tie with [2,3]: earliest wins
