"""Time-weighted average: brute-force parity, bucket splitting, gap clipping."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from aisdb_ray.stages import twa


def _brute(df, width):
    rows = {}
    for (src, _seg), grp in df.groupby(["source", "seg"], sort=False):
        grp = grp.sort_values(["time", "seq"])
        t = grp["time"].to_numpy(np.int64)
        v = grp["n_tok"].to_numpy(np.int64)
        for i in range(len(t) - 1):
            a, b = int(t[i]), int(t[i + 1])
            for s in range(a, b):  # second-by-second integral
                bk = (s // width) * width
                key = (src, bk)
                num, dur = rows.get(key, (0, 0))
                rows[key] = (num + int(v[i]), dur + 1)
    return {
        k: (num, dur, num / dur) for k, (num, dur) in rows.items()
    }


def _frame():
    rng = np.random.default_rng(31)
    n = 300
    df = pd.DataFrame(
        {
            "source": rng.choice(["a", "b"], n),
            "seg": rng.integers(0, 3, n).astype(np.int64),
            "time": rng.integers(0, 4 * 3600, n).astype(np.int64),
            "seq": np.arange(n, dtype=np.int64),
            "n_tok": rng.integers(1, 500, n).astype(np.int32),
        }
    ).drop_duplicates(["source", "seg", "time"]).reset_index(drop=True)
    return df


def test_twa_matches_second_by_second_integral():
    df = _frame()
    got = twa.twa_rollup(rd.from_pandas(df), 3600).to_pandas()
    want = _brute(df, 3600)
    assert len(got) == len(want) and len(got) > 0
    for _, r in got.iterrows():
        num, dur, mean = want[(r["source"], r["bucket"])]
        assert r["twa_num"] == num and r["dur_s"] == dur
        assert r["twa"] == mean


def test_twa_hold_clips_at_segment_end():
    # two segments far apart: the hold must NOT bridge the gap
    df = pd.DataFrame(
        {
            "source": ["s"] * 4,
            "seg": np.array([0, 0, 1, 1], np.int64),
            "time": np.array([0, 600, 90000, 90060], np.int64),
            "seq": np.arange(4, dtype=np.int64),
            "n_tok": np.array([10, 20, 30, 40], np.int32),
        }
    )
    got = (
        twa.twa_rollup(rd.from_pandas(df), 3600)
        .to_pandas().sort_values("bucket").reset_index(drop=True)
    )
    # seg 0: hold 10 for 600s in bucket 0; seg 1: hold 30 for 60s in bucket 25
    assert got["bucket"].tolist() == [0, 90000 // 3600 * 3600]
    assert got["twa_num"].tolist() == [10 * 600, 30 * 60]
    assert got["dur_s"].tolist() == [600, 60]


def test_twa_splits_across_buckets_exactly():
    # one hold spanning three hour buckets
    df = pd.DataFrame(
        {
            "source": ["s", "s"],
            "seg": np.array([0, 0], np.int64),
            "time": np.array([3000, 8200], np.int64),
            "seq": np.array([0, 1], np.int64),
            "n_tok": np.array([7, 9], np.int32),
        }
    )
    got = (
        twa.twa_rollup(rd.from_pandas(df), 3600)
        .to_pandas().sort_values("bucket").reset_index(drop=True)
    )
    assert got["bucket"].tolist() == [0, 3600, 7200]
    assert got["dur_s"].tolist() == [600, 3600, 1000]
    assert got["twa_num"].tolist() == [7 * 600, 7 * 3600, 7 * 1000]


def test_twa_property_random_series():
    """Hypothesis: for arbitrary (times, values, segs), the vectorized TWA
    equals the second-by-second integral."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        times=st.lists(st.integers(min_value=0, max_value=8000),
                       min_size=2, max_size=40, unique=True),
        width=st.sampled_from([60, 3600]),
        segsplit=st.integers(min_value=0, max_value=39),
    )
    def check(times, width, segsplit):
        import pyarrow as pa

        times = sorted(times)
        n = len(times)
        segs = [0 if i < segsplit else 1 for i in range(n)]
        vals = [(t % 13) + 1 for t in times]
        tbl = pa.table(
            {
                "source": pa.array(["s"] * n),
                "seg": pa.array(segs, pa.int64()),
                "time": pa.array(times, pa.int64()),
                "seq": pa.array(list(range(n)), pa.int64()),
                "n_tok": pa.array(vals, pa.int32()),
            }
        )
        got = {
            (r["source"], r["bucket"]): (r["twa_num"], r["dur_s"])
            for r in twa.twa_block(tbl, width).to_pylist()
        }
        want = {}
        for i in range(n - 1):
            if segs[i] != segs[i + 1]:
                continue
            for s in range(times[i], times[i + 1]):
                bk = (s // width) * width
                num, dur = want.get(("s", bk), (0, 0))
                want[("s", bk)] = (num + vals[i], dur + 1)
        assert got == want

    check()
