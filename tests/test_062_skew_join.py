"""Skew-aware inner join: hot-key split correctness vs a plain pandas
merge, hot-set detection, and the no-hot-keys fallback."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from aisdb_ray.stages import join as join_mod


def _zipf_frames(seed=3, n=20_000):
    rng = np.random.default_rng(seed)
    # ~half the probe rows land on 3 hot keys
    keys = np.where(
        rng.random(n) < 0.5,
        rng.choice([1, 2, 3], n),
        rng.integers(10, 500, n),
    ).astype(np.int64)
    left = pd.DataFrame({
        "k": keys,
        "lv": rng.integers(0, 1000, n).astype(np.int64),
    })
    rk = np.unique(np.r_[np.arange(1, 4), rng.integers(10, 600, 300)])
    right = pd.DataFrame({
        "k": rk.astype(np.int64),
        "rv": (rk * 7).astype(np.int64),
    })
    return left, right


def _expect(left, right):
    return (left.merge(right, on="k", how="inner")
            .sort_values(["k", "lv", "rv"]).reset_index(drop=True))


def test_skew_join_matches_pandas_merge():
    left, right = _zipf_frames()
    got = join_mod.skew_join(
        rd.from_pandas(left).repartition(9),
        rd.from_pandas(right).repartition(3),
        on="k", hot_count_threshold=1000,
    ).to_pandas().sort_values(["k", "lv", "rv"]).reset_index(drop=True)
    want = _expect(left, right)
    assert len(got) == len(want)
    for c in ["k", "lv", "rv"]:
        np.testing.assert_array_equal(
            got[c].to_numpy(np.int64), want[c].to_numpy(np.int64), err_msg=c
        )


def test_hot_keys_exact_threshold():
    left, _ = _zipf_frames()
    counts = left["k"].value_counts()
    want = {str(k) for k, c in counts.items() if c >= 1000}
    got = set(join_mod.hot_keys(rd.from_pandas(left), ["k"], 1000))
    assert got == want
    assert {"1", "2", "3"} <= got  # the planted hot keys


def test_skew_join_no_hot_keys_falls_back():
    left, right = _zipf_frames(seed=5, n=500)
    got = join_mod.skew_join(
        rd.from_pandas(left), rd.from_pandas(right),
        on="k", hot_count_threshold=10**9,
    ).to_pandas().sort_values(["k", "lv", "rv"]).reset_index(drop=True)
    want = _expect(left, right)
    assert len(got) == len(want)
    np.testing.assert_array_equal(
        got["rv"].to_numpy(np.int64), want["rv"].to_numpy(np.int64)
    )


def test_skew_join_all_keys_hot():
    left, right = _zipf_frames(seed=7, n=2_000)
    got = join_mod.skew_join(
        rd.from_pandas(left), rd.from_pandas(right),
        on="k", hot_count_threshold=1,
    ).to_pandas().sort_values(["k", "lv", "rv"]).reset_index(drop=True)
    want = _expect(left, right)
    assert len(got) == len(want)
    np.testing.assert_array_equal(
        got["rv"].to_numpy(np.int64), want["rv"].to_numpy(np.int64)
    )


def test_skew_join_multi_key():
    rng = np.random.default_rng(13)
    n = 5_000
    left = pd.DataFrame({
        "a": rng.choice(["x", "y", "z"], n),
        "b": rng.integers(0, 20, n).astype(np.int64),
        "lv": np.arange(n, dtype=np.int64),
    })
    right = pd.DataFrame({
        "a": ["x", "x", "y", "z"],
        "b": np.array([1, 2, 1, 19], np.int64),
        "rv": np.array([10, 20, 30, 40], np.int64),
    })
    got = join_mod.skew_join(
        rd.from_pandas(left), rd.from_pandas(right),
        on=["a", "b"], hot_count_threshold=100,
    ).to_pandas().sort_values(["a", "b", "lv"]).reset_index(drop=True)
    want = (left.merge(right, on=["a", "b"], how="inner")
            .sort_values(["a", "b", "lv"]).reset_index(drop=True))
    assert len(got) == len(want)
    np.testing.assert_array_equal(
        got["rv"].to_numpy(np.int64), want["rv"].to_numpy(np.int64)
    )


def test_coalesce_intervals_bruteforce():
    rng = np.random.default_rng(29)
    n = 3_000
    s = rng.integers(0, 10_000, n).astype(np.int64)
    length = rng.integers(0, 300, n).astype(np.int64)
    df = pd.DataFrame({
        "k": rng.choice(["a", "b", "c"], n),
        "s": s,
        "e": s + length,  # includes zero-length and nested intervals
    })
    got = join_mod.coalesce_intervals(
        rd.from_pandas(df).repartition(6), key="k", start="s", end="e"
    ).to_pandas().sort_values(["k", "w_start"]).reset_index(drop=True)

    want_rows = []
    for k, g in df.groupby("k"):
        ivs = sorted(zip(g["s"], g["e"]))
        cur_s, cur_e, cnt = None, None, 0
        for a, b in ivs:
            if cur_s is None:
                cur_s, cur_e, cnt = a, b, 1
            elif a <= cur_e:  # overlapping or touching merges
                cur_e = max(cur_e, b)
                cnt += 1
            else:
                want_rows.append((k, cur_s, cur_e, cnt))
                cur_s, cur_e, cnt = a, b, 1
        if cur_s is not None:
            want_rows.append((k, cur_s, cur_e, cnt))
    want = pd.DataFrame(want_rows, columns=["k", "w_start", "w_end", "n_merged"])
    want = want.sort_values(["k", "w_start"]).reset_index(drop=True)
    assert len(got) == len(want)
    for c in ["w_start", "w_end", "n_merged"]:
        np.testing.assert_array_equal(
            got[c].to_numpy(np.int64), want[c].to_numpy(np.int64), err_msg=c
        )
    # disjointness: within a key, next start strictly exceeds previous end
    for _, g in got.groupby("k"):
        g = g.sort_values("w_start")
        assert (g["w_start"].to_numpy()[1:] > g["w_end"].to_numpy()[:-1]).all()


def test_coalesce_intervals_touching_merge():
    df = pd.DataFrame({
        "k": ["x", "x", "x"],
        "s": np.array([0, 10, 25], np.int64),
        "e": np.array([10, 20, 30], np.int64),
    })
    got = join_mod.coalesce_intervals(
        rd.from_pandas(df), key="k", start="s", end="e"
    ).to_pandas().sort_values("w_start").reset_index(drop=True)
    assert got[["w_start", "w_end", "n_merged"]].values.tolist() == [
        [0, 20, 2], [25, 30, 1]
    ]
