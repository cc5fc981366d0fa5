"""Pairwise Gram-partial correlation: brute-force parity, partition invariance."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from aisdb_ray.stages import corr


def _tier(seed=9, n=800, srcs=6, buckets=50):
    rng = np.random.default_rng(seed)
    df = pd.DataFrame(
        {
            "source": rng.choice([f"s{i}" for i in range(srcs)], n),
            "bucket": (rng.integers(0, buckets, n) * 3600).astype(np.int64),
            "sum_n_tok": rng.integers(0, 10_000, n).astype(np.int64),
        }
    ).drop_duplicates(["source", "bucket"]).reset_index(drop=True)
    return df


def _brute(df):
    rows = []
    srcs = sorted(df["source"].unique())
    piv = df.pivot(index="bucket", columns="source", values="sum_n_tok")
    for i, a in enumerate(srcs):
        for b in srcs[i + 1:]:
            both = piv[[a, b]].dropna()
            if len(both) == 0:
                continue
            x = both[a].to_numpy(np.int64)
            y = both[b].to_numpy(np.int64)
            n = len(both)
            rows.append(
                dict(src_a=a, src_b=b, n=n, sx=x.sum(), sy=y.sum(),
                     sxy=(x * y).sum(), sx2=(x * x).sum(), sy2=(y * y).sum())
            )
    return pd.DataFrame(rows)


def test_pairwise_corr_matches_bruteforce():
    df = _tier()
    got = (
        corr.pairwise_corr(rd.from_pandas(df), value_col="sum_n_tok", num_parts=7)
        .to_pandas().sort_values(["src_a", "src_b"]).reset_index(drop=True)
    )
    want = _brute(df).sort_values(["src_a", "src_b"]).reset_index(drop=True)
    assert len(got) == len(want) and len(got) > 0
    for c in ["src_a", "src_b", "n", "sx", "sy", "sxy", "sx2", "sy2"]:
        np.testing.assert_array_equal(got[c].to_numpy(), want[c].to_numpy(), err_msg=c)
    # r equals numpy's pearson on the evidence wherever defined
    vx = want["n"] * want["sx2"] - want["sx"] ** 2
    vy = want["n"] * want["sy2"] - want["sy"] ** 2
    ok = (vx > 0) & (vy > 0)
    r_want = (want["n"] * want["sxy"] - want["sx"] * want["sy"]).astype(float) / np.sqrt(
        vx.astype(float) * vy.astype(float)
    )
    np.testing.assert_allclose(
        got.loc[ok, "r"].to_numpy(), r_want[ok].to_numpy(), rtol=0, atol=0
    )
    assert got.loc[~ok, "r"].isna().all()


def test_partition_invariance():
    df = _tier(seed=21)
    a = corr.pairwise_corr(rd.from_pandas(df), value_col="sum_n_tok", num_parts=3)
    b = corr.pairwise_corr(rd.from_pandas(df), value_col="sum_n_tok", num_parts=64)
    pa_ = a.to_pandas().sort_values(["src_a", "src_b"]).reset_index(drop=True)
    pb = b.to_pandas().sort_values(["src_a", "src_b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(pa_, pb, check_dtype=False)


def test_zero_variance_pair_is_null():
    df = pd.DataFrame(
        {
            "source": ["a", "a", "b", "b"],
            "bucket": np.array([0, 3600, 0, 3600], np.int64),
            "sum_n_tok": np.array([5, 5, 1, 9], np.int64),  # a is constant
        }
    )
    got = corr.pairwise_corr(rd.from_pandas(df), value_col="sum_n_tok").to_pandas()
    assert len(got) == 1 and got["r"].isna().all() and got["n"].iloc[0] == 2

def _series(seed=4, n=600, srcs=5):
    rng = np.random.default_rng(seed)
    df = pd.DataFrame(
        {
            "source": rng.choice([f"s{i}" for i in range(srcs)], n),
            "time": rng.integers(0, 100_000, n).astype(np.int64),
            "seq": np.arange(n, dtype=np.int64),
            "n_tok": rng.integers(1, 500, n).astype(np.int64),
        }
    )
    return df


def _acf_brute(df, lags=(1, 2, 3)):
    rows = []
    for s, g in df.sort_values(["time", "seq"]).groupby("source"):
        x = g["n_tok"].to_numpy(np.int64)
        for lag in lags:
            if lag >= len(x):
                continue
            a, b = x[:-lag], x[lag:]
            rows.append(dict(source=s, lag=lag, n=len(a), sx=a.sum(),
                             sy=b.sum(), sxy=(a * b).sum(),
                             sx2=(a * a).sum(), sy2=(b * b).sum()))
    return pd.DataFrame(rows)


def test_group_acf_matches_bruteforce():
    df = _series()
    got = (
        corr.group_acf(rd.from_pandas(df), num_parts=7)
        .to_pandas().sort_values(["source", "lag"]).reset_index(drop=True)
    )
    want = _acf_brute(df).sort_values(["source", "lag"]).reset_index(drop=True)
    assert len(got) == len(want) and len(got) > 0
    for c in ["source", "lag", "n", "sx", "sy", "sxy", "sx2", "sy2"]:
        np.testing.assert_array_equal(got[c].to_numpy(), want[c].to_numpy(), err_msg=c)
    vx = want["n"] * want["sx2"] - want["sx"] ** 2
    vy = want["n"] * want["sy2"] - want["sy"] ** 2
    ok = (vx > 0) & (vy > 0)
    r_want = (want["n"] * want["sxy"] - want["sx"] * want["sy"]).astype(float) / np.sqrt(
        vx.astype(float) * vy.astype(float)
    )
    np.testing.assert_allclose(
        got.loc[ok, "r"].to_numpy(), r_want[ok].to_numpy(), rtol=0, atol=0
    )


def test_group_acf_degenerate():
    # single-row group: no pairs at any lag; constant group: r is null
    df = pd.DataFrame(
        {
            "source": ["lone", "flat", "flat", "flat", "flat"],
            "time": np.array([0, 0, 1, 2, 3], np.int64),
            "seq": np.zeros(5, np.int64),
            "n_tok": np.array([7, 5, 5, 5, 5], np.int64),
        }
    )
    got = corr.group_acf(rd.from_pandas(df), lags=(1, 2)).to_pandas()
    assert set(got["source"]) == {"flat"}
    assert got["r"].isna().all()
    assert got.set_index("lag")["n"].to_dict() == {1: 3, 2: 2}


def test_windowed_pairwise_corr_matches_per_window_static():
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd
    from aisdb_ray.stages import corr

    rng = np.random.default_rng(79)
    n = 4_000
    tier = pd.DataFrame({
        "source": rng.choice(["a", "b", "c"], n),
        "bucket": (rng.integers(0, 20_000, n) // 100 * 100).astype(np.int64),
        "sum_n_tok": rng.integers(0, 500, n).astype(np.int64),
    }).drop_duplicates(subset=["source", "bucket"])
    W = 5_000
    got = corr.windowed_pairwise_corr(
        rd.from_pandas(tier).repartition(5), W, value_col="sum_n_tok"
    ).to_pandas().sort_values(["src_a", "src_b", "wstart"]).reset_index(drop=True)

    # reference: run the STATIC pairwise_corr window by window
    outs = []
    for ws, g in tier.groupby((tier["bucket"] // W) * W):
        r = corr.pairwise_corr(
            rd.from_pandas(g), value_col="sum_n_tok"
        ).to_pandas()
        r["wstart"] = np.int64(ws)
        outs.append(r)
    want = (pd.concat(outs)
            .sort_values(["src_a", "src_b", "wstart"]).reset_index(drop=True))
    assert len(got) == len(want)
    for c in ["n", "sx", "sy", "sxy", "sx2", "sy2"]:
        np.testing.assert_array_equal(got[c].to_numpy(np.int64),
                                      want[c].to_numpy(np.int64), err_msg=c)
    np.testing.assert_allclose(got["r"].to_numpy(), want["r"].to_numpy(),
                               rtol=0, atol=0)


def test_windowed_pairwise_corr_negative_buckets_floor():
    """Negative-epoch buckets must floor into their window like SQL's //
    (Arrow integer divide truncates toward zero — the ADVICE defect)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from aisdb_ray.stages import corr

    rng = np.random.default_rng(83)
    n = 600
    tier = pd.DataFrame({
        "source": rng.choice(["a", "b"], n),
        "bucket": (rng.integers(-50, 50, n) * 100).astype(np.int64),
        "sum_n_tok": rng.integers(0, 500, n).astype(np.int64),
    }).drop_duplicates(subset=["source", "bucket"])
    W = 3_000
    got = corr.windowed_pairwise_corr(
        rd.from_pandas(tier).repartition(3), W, value_col="sum_n_tok"
    ).to_pandas().sort_values(["src_a", "src_b", "wstart"]).reset_index(drop=True)
    outs = []
    for ws, g in tier.groupby((tier["bucket"] // W) * W):
        r = corr.pairwise_corr(
            rd.from_pandas(g), value_col="sum_n_tok"
        ).to_pandas()
        r["wstart"] = np.int64(ws)
        outs.append(r)
    want = (pd.concat(outs)
            .sort_values(["src_a", "src_b", "wstart"]).reset_index(drop=True))
    assert (got["wstart"] < 0).any()  # the truncation-vs-floor regime
    assert len(got) == len(want)
    for c in ["n", "sx", "sy", "sxy", "sx2", "sy2"]:
        np.testing.assert_array_equal(got[c].to_numpy(np.int64),
                                      want[c].to_numpy(np.int64), err_msg=c)


def test_corr_null_rows_dropped_and_duplicates_refused():
    """Null key/bucket rows drop (the old zero-copy to_numpy raised on
    null dictionary indices); duplicate (bucket, key) cells raise instead
    of last-write-winning into wrong sums."""
    import pyarrow as pa
    import pytest

    from aisdb_ray.stages import corr as corr_mod

    t = pa.table({
        "source": pa.array(["a", "b", None, "a"]),
        "bucket": pa.array([0, 0, 0, None], pa.int64()),
        "sum_n_tok": pa.array([1, 2, 3, 4], pa.int64()),
    })
    out = corr_mod.pairwise_corr(rd.from_arrow(t)).to_pandas()
    assert len(out) == 1  # the (a, b) pair from the two valid rows
    dup = pa.table({
        "source": pa.array(["a", "a", "b"]),
        "bucket": pa.array([0, 0, 0], pa.int64()),
        "sum_n_tok": pa.array([1, 5, 2], pa.int64()),
    })
    with pytest.raises(Exception, match="duplicate"):
        corr_mod.pairwise_corr(rd.from_arrow(dup)).take_all()
