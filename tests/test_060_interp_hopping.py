"""Interp-at-join-time (bracket interpolation against an arbitrary probe
stream) and hopping/sliding window rollups, both vs brute force."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from aisdb_ray.stages import asof, rollup


def _right():
    # two keys, sorted centers, int64 values
    return pa.table({
        "source": ["a"] * 4 + ["b"] * 2,
        "rt": pa.array([100, 200, 300, 400, 50, 150], pa.int64()),
        "val": pa.array([10, 30, 20, 80, 5, 45], pa.int64()),
    })


def test_interp_join_bracket_semantics():
    left = pd.DataFrame({
        "source": ["a", "a", "a", "a", "a", "b", "b", "c"],
        #          t0=100    exact   outside-lo outside-hi   mid
        "time": np.array([150, 200, 50, 450, 325, 100, 150, 77], np.int64),
    })
    out = asof.interp_join(
        rd.from_pandas(left), _right(), by="source", on="time",
        right_on="rt", value_col="val",
    ).to_pandas().sort_values(["source", "time"]).reset_index(drop=True)

    # inner: rows outside [first rt, last rt] and unknown keys drop
    assert out["time"].tolist() == [150, 200, 325, 100, 150]
    # a@150: between (100,10) and (200,30) -> 20.0
    # a@200: exact hit -> 30.0
    # a@325: between (300,20) and (400,80) -> 20 + 60*25/100 = 35.0
    # b@100: between (50,5) and (150,45) -> 25.0 ; b@150 exact -> 45.0
    assert out["v_interp"].tolist() == [20.0, 30.0, 35.0, 25.0, 45.0]
    exact = out[out["time"] == 200].iloc[0]
    assert exact["t0"] == exact["t1"] == 200 and exact["v0"] == exact["v1"] == 30


def test_interp_join_matches_numpy_bruteforce():
    rng = np.random.default_rng(17)
    left = pd.DataFrame({
        "source": rng.choice(["a", "b"], 500),
        "time": rng.integers(0, 500, 500).astype(np.int64),
    })
    right = _right()
    out = asof.interp_join(
        rd.from_pandas(left), right, by="source", on="time",
        right_on="rt", value_col="val",
    ).to_pandas()

    rdf = right.to_pandas()
    want = []
    for _, r in left.iterrows():
        cand = rdf[rdf["source"] == r["source"]]
        lo = cand[cand["rt"] <= r["time"]]
        hi = cand[cand["rt"] >= r["time"]]
        if len(lo) == 0 or len(hi) == 0:
            continue
        t0, v0 = lo.iloc[-1]["rt"], lo.iloc[-1]["val"]
        t1, v1 = hi.iloc[0]["rt"], hi.iloc[0]["val"]
        vi = float(v0) if t1 == t0 else float(v0) + float(
            (v1 - v0) * (r["time"] - t0)) / float(t1 - t0)
        want.append((r["source"], r["time"], vi))
    wdf = pd.DataFrame(want, columns=["source", "time", "v_interp"])
    assert len(out) == len(wdf)
    g = out.sort_values(["source", "time", "v_interp"]).reset_index(drop=True)
    w = wdf.sort_values(["source", "time", "v_interp"]).reset_index(drop=True)
    np.testing.assert_allclose(
        g["v_interp"].to_numpy(), w["v_interp"].to_numpy(), rtol=0, atol=0
    )


def test_interp_join_rejects_float_values():
    import pytest

    bad = pa.table({"source": ["a"], "rt": pa.array([1], pa.int64()),
                    "val": pa.array([1.5], pa.float64())})
    with pytest.raises(TypeError):
        asof.interp_join(
            rd.from_arrow(pa.table({"source": ["a"],
                                    "time": pa.array([1], pa.int64())})),
            bad, by="source", on="time", right_on="rt", value_col="val",
        )


def test_hopping_rollup_matches_bruteforce():
    rng = np.random.default_rng(23)
    n = 2000
    df = pd.DataFrame({
        "source": rng.choice(["s1", "s2", "s3"], n),
        "time": rng.integers(10_000, 40_000, n).astype(np.int64),
        "n_tok": rng.integers(1, 1000, n).astype(np.int32),
    })
    width, hop = 3600, 900
    got = rollup.hopping_rollup(
        rd.from_pandas(df), width, hop
    ).to_pandas().sort_values(["source", "bucket"]).reset_index(drop=True)

    # brute force: every point lands in width//hop overlapping windows
    k = width // hop
    rep = pd.concat(
        [df.assign(bucket=(df["time"] // hop) * hop - i * hop)
         for i in range(k)]
    )
    want = rep.groupby(["source", "bucket"], as_index=False).agg(
        min_n_tok=("n_tok", "min"), max_n_tok=("n_tok", "max"),
        sum_n_tok=("n_tok", "sum"), count_n_tok=("n_tok", "size"),
    ).sort_values(["source", "bucket"]).reset_index(drop=True)

    assert len(got) == len(want)
    for c in ["bucket", "min_n_tok", "max_n_tok", "sum_n_tok", "count_n_tok"]:
        np.testing.assert_array_equal(
            got[c].to_numpy(np.int64), want[c].to_numpy(np.int64), err_msg=c
        )
    np.testing.assert_allclose(
        got["mean_n_tok"].to_numpy(),
        want["sum_n_tok"].to_numpy() / want["count_n_tok"].to_numpy(),
    )
    np.testing.assert_array_equal(
        got["wend"].to_numpy(np.int64), got["bucket"].to_numpy(np.int64) + width
    )
    # every window covers exactly its k hop-slots: each point appears k times
    assert got["count_n_tok"].sum() == n * k


def test_hopping_rollup_validates_hop():
    import pytest

    with pytest.raises(ValueError):
        rollup.hopping_rollup(
            rd.from_items([{"source": "a", "time": 1, "n_tok": 1}]), 3600, 700
        )
