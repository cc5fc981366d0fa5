"""As-of / nearest-grid join semantics (J3/J4): kernel edge cases pinned to
the reference's own expectations, plus a pandas merge_asof cross-check."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from aisdb_ray.stages import asof


def test_binarysearch_vector_reference_edges():
    # /root/reference/aisdb/tests/test_013_proc_util.py:83-90
    arr = np.array([1.0, 2.0, 3.0])
    arr_desc = arr[::-1]
    assert asof.binarysearch_vector(arr, [2])[0] == 1
    assert asof.binarysearch_vector(arr, [5])[0] == 2
    assert asof.binarysearch_vector(arr, [-10])[0] == 0
    assert asof.binarysearch_vector(arr_desc, [10])[0] == 0
    assert asof.binarysearch_vector(arr_desc, [-5])[0] == 2
    assert asof.binarysearch_vector(arr_desc, [2])[0] == 1
    # empty grid -> -1 sentinel (src/lib.rs:517-519)
    assert asof.binarysearch_vector(np.array([]), [1, 2]).tolist() == [-1, -1]


def test_grid_lookup_2d():
    ax_x = np.array([0.0, 10.0, 20.0])
    ax_y = np.array([100.0, 200.0])
    vals = np.arange(6, dtype=np.float64).reshape(3, 2) * 7
    ds = rd.from_arrow(pa.table({
        "x": pa.array([0.0, 9.0, 25.0]),
        "y": pa.array([100.0, 150.0, 250.0]),
    }))
    out = asof.grid_lookup(ds, [ax_x, ax_y], vals, ["x", "y"], "v").to_pandas()
    # snap rule: exact -> index, miss -> ceil clamp
    assert out["v"].tolist() == [vals[0, 0], vals[1, 1], vals[2, 1]]


def test_asof_backward_join_matches_pandas():
    rng = np.random.default_rng(3)
    left = pd.DataFrame({
        "source": rng.choice(["a", "b", "c"], 300),
        "time": rng.integers(0, 1000, 300).astype(np.int64),
    })
    right = pd.DataFrame({
        "source": ["a"] * 5 + ["b"] * 3,
        "rt": np.r_[np.sort(rng.choice(1000, 5, replace=False)),
                    np.sort(rng.choice(1000, 3, replace=False))].astype(np.int64),
    })
    right["val"] = np.arange(len(right), dtype=np.int64) * 10

    got = asof.asof_backward_join(
        rd.from_pandas(left), pa.Table.from_pandas(right),
        by="source", on="time", right_on="rt", value_cols=["val"], how="inner",
    ).to_pandas()

    want = pd.merge_asof(
        left.sort_values("time", kind="stable"),
        right.rename(columns={"rt": "time"}).sort_values("time", kind="stable"),
        on="time", by="source", direction="backward",
    ).dropna(subset=["val"])
    assert len(got) == len(want)
    g = got.sort_values(["source", "time", "val"]).reset_index(drop=True)
    w = want.sort_values(["source", "time", "val"]).reset_index(drop=True)
    np.testing.assert_array_equal(g["val"].to_numpy(), w["val"].to_numpy(np.int64))


def test_asof_forward_and_nearest_match_bruteforce():
    rng = np.random.default_rng(11)
    left = pd.DataFrame({
        "source": rng.choice(["a", "b", "c"], 400),
        "time": rng.integers(0, 1000, 400).astype(np.int64),
    })
    right = pd.DataFrame({
        "source": ["a"] * 6 + ["b"] * 4,
        "rt": np.r_[np.sort(rng.choice(1000, 6, replace=False)),
                    np.sort(rng.choice(1000, 4, replace=False))].astype(np.int64),
    })
    right["val"] = np.arange(len(right), dtype=np.int64) * 10

    def brute(direction):
        rows = []
        for _, r in left.iterrows():
            cand = right[right["source"] == r["source"]]
            if direction == "forward":
                cand = cand[cand["rt"] >= r["time"]]
                if len(cand):
                    pick = cand.loc[cand["rt"].idxmin()]
                    rows.append((r["source"], r["time"], pick["val"]))
            else:  # nearest: min |dt|, tie -> earlier rt
                if len(cand):
                    d = (cand["rt"] - r["time"]).abs()
                    best = cand[d == d.min()].sort_values("rt").iloc[0]
                    rows.append((r["source"], r["time"], best["val"]))
        return pd.DataFrame(rows, columns=["source", "time", "val"])

    for direction in ("forward", "nearest"):
        got = asof.asof_join(
            rd.from_pandas(left), pa.Table.from_pandas(right),
            by="source", on="time", right_on="rt", value_cols=["val"],
            how="inner", direction=direction,
        ).to_pandas()
        want = brute(direction)
        assert len(got) == len(want), direction
        g = got.sort_values(["source", "time", "val"]).reset_index(drop=True)
        w = want.sort_values(["source", "time", "val"]).reset_index(drop=True)
        np.testing.assert_array_equal(
            g["val"].to_numpy(), w["val"].to_numpy(np.int64), err_msg=direction
        )


def test_asof_nearest_tie_prefers_earlier():
    left = pd.DataFrame({"source": ["a"], "time": [100]})
    right = pa.table({
        "source": ["a", "a"],
        "rt": pa.array([90, 110], pa.int64()),  # equidistant
        "val": pa.array([1, 2], pa.int64()),
    })
    out = asof.asof_join(
        rd.from_pandas(left), right, by="source", on="time", right_on="rt",
        value_cols=["val"], how="inner", direction="nearest",
    ).to_pandas()
    assert out["val"].tolist() == [1]  # backward (earlier) wins the tie


def test_asof_tolerance_and_left():
    left = pd.DataFrame({"source": ["a", "a", "a"], "time": [5, 50, 500]})
    right = pa.table({"source": ["a"], "rt": pa.array([0], pa.int64()),
                      "val": pa.array([7], pa.int64())})
    out = asof.asof_backward_join(
        rd.from_pandas(left), right, by="source", on="time", right_on="rt",
        value_cols=["val"], tolerance=60, how="left",
    ).to_pandas().sort_values("time")
    assert out["val"].tolist()[:2] == [7, 7]
    assert pd.isna(out["val"].tolist()[2])  # beyond tolerance -> null


def test_asof_join_streams_matches_merge_asof():
    rng = np.random.default_rng(41)
    n_l, n_r = 2_000, 700
    left = pd.DataFrame({
        "source": rng.choice(["a", "b", "c", "d"], n_l),
        "time": rng.integers(0, 100_000, n_l).astype(np.int64),
        "lv": np.arange(n_l, dtype=np.int64),
    })
    right = pd.DataFrame({
        "source": rng.choice(["a", "b", "c", "e"], n_r),
        "rt": rng.integers(0, 100_000, n_r).astype(np.int64),
    }).drop_duplicates(subset=["source", "rt"])
    right["val"] = np.arange(len(right), dtype=np.int64) * 3

    # tiny chunks: most lookbacks cross chunk boundaries (carry path)
    got = asof.asof_join_streams(
        rd.from_pandas(left).repartition(5),
        rd.from_pandas(right).repartition(3),
        by="source", on="time", right_on="rt",
        value_cols=["val"], chunk_s=1_000, how="inner",
    ).to_pandas()

    want = pd.merge_asof(
        left.sort_values("time", kind="stable"),
        right.rename(columns={"rt": "time"}).sort_values("time", kind="stable"),
        on="time", by="source", direction="backward",
    ).dropna(subset=["val"])
    assert len(got) == len(want)
    g = got.sort_values(["source", "time", "lv"]).reset_index(drop=True)
    w = want.sort_values(["source", "time", "lv"]).reset_index(drop=True)
    np.testing.assert_array_equal(g["val"].to_numpy(np.int64),
                                  w["val"].to_numpy(np.int64))
    # r_t really is the matched right timestamp
    assert (g["r_t"] <= g["time"]).all()


def test_asof_join_streams_tolerance_and_empty_right():
    left = pd.DataFrame({"source": ["a", "a"], "time": [100, 5000],
                         "lv": np.array([1, 2], np.int64)})
    right = pd.DataFrame({"source": ["a"], "rt": np.array([90], np.int64),
                          "val": np.array([7], np.int64)})
    got = asof.asof_join_streams(
        rd.from_pandas(left), rd.from_pandas(right),
        by="source", on="time", right_on="rt", value_cols=["val"],
        chunk_s=1_000, tolerance=60, how="inner",
    ).to_pandas()
    assert got["lv"].tolist() == [1]  # 5000 is beyond tolerance

    empty_r = rd.from_arrow(pa.table({
        "source": pa.array([], pa.string()),
        "rt": pa.array([], pa.int64()),
        "val": pa.array([], pa.int64()),
    }))
    got2 = asof.asof_join_streams(
        rd.from_pandas(left), empty_r, by="source", on="time",
        right_on="rt", value_cols=["val"], chunk_s=1_000, how="inner",
    )
    assert got2.count() == 0


def test_asof_join_streams_negative_timestamps():
    # floor-vs-truncate chunking regression: with negative times, a
    # truncating chunk id would let the carry table return a FORWARD
    # match (r_t > t). All chunk math must floor.
    left = pd.DataFrame({"source": ["a", "a", "a"],
                         "time": np.array([-600, -1500, 300], np.int64),
                         "lv": np.array([1, 2, 3], np.int64)})
    right = pd.DataFrame({"source": ["a", "a"],
                          "rt": np.array([-500, -2000], np.int64),
                          "val": np.array([7, 9], np.int64)})
    got = asof.asof_join_streams(
        rd.from_pandas(left), rd.from_pandas(right),
        by="source", on="time", right_on="rt", value_cols=["val"],
        chunk_s=1_000, how="inner",
    ).to_pandas().sort_values("time").reset_index(drop=True)
    # -1500 -> -2000(9); -600 -> -2000(9) (NOT the future -500); 300 -> -500(7)
    assert got["time"].tolist() == [-1500, -600, 300]
    assert got["val"].tolist() == [9, 9, 7]
    assert (got["r_t"] <= got["time"]).all()


def test_asof_join_streams_forward_matches_merge_asof():
    rng = np.random.default_rng(73)
    n_l, n_r = 1_500, 500
    left = pd.DataFrame({
        "source": rng.choice(["a", "b", "c"], n_l),
        "time": rng.integers(0, 80_000, n_l).astype(np.int64),
        "lv": np.arange(n_l, dtype=np.int64),
    })
    right = pd.DataFrame({
        "source": rng.choice(["a", "b"], n_r),
        "rt": rng.integers(0, 80_000, n_r).astype(np.int64),
    }).drop_duplicates(subset=["source", "rt"])
    right["val"] = np.arange(len(right), dtype=np.int64) * 5

    got = asof.asof_join_streams(
        rd.from_pandas(left).repartition(4),
        rd.from_pandas(right).repartition(3),
        by="source", on="time", right_on="rt", value_cols=["val"],
        chunk_s=1_000, how="inner", direction="forward",
    ).to_pandas()

    want = pd.merge_asof(
        left.sort_values("time", kind="stable"),
        right.rename(columns={"rt": "time"}).sort_values("time", kind="stable"),
        on="time", by="source", direction="forward",
    ).dropna(subset=["val"])
    assert len(got) == len(want)
    g = got.sort_values(["source", "time", "lv"]).reset_index(drop=True)
    w = want.sort_values(["source", "time", "lv"]).reset_index(drop=True)
    np.testing.assert_array_equal(g["val"].to_numpy(np.int64),
                                  w["val"].to_numpy(np.int64))
    assert (g["r_t"] >= g["time"]).all()


def test_asof_join_string_value_cols():
    """Non-numeric value_cols (dimension labels) must join and null-fill,
    not crash in the numpy dtype round-trip."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from aisdb_ray.stages import asof

    right = pa.table({
        "source": ["a", "a", "b"],
        "time": pa.array([0, 100, 50], pa.int64()),
        "label": ["lo", "hi", "mid"],
    })
    left = pa.table({
        "source": ["a", "a", "b", "c"],
        "time": pa.array([10, 150, 60, 5], pa.int64()),
    })
    out = asof.asof_join(
        rd.from_arrow(left), right, value_cols=["label"], how="left",
    ).to_pandas().sort_values(["source", "time"]).reset_index(drop=True)
    assert out["label"].tolist()[:3] == ["lo", "hi", "mid"]
    assert out["label"].isna().tolist() == [False, False, False, True]


def test_asof_join_streams_rejects_reserved_left_columns():
    import numpy as np
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from aisdb_ray.stages import asof

    left = pa.table({
        "source": ["a"], "time": pa.array([1], pa.int64()),
        "_chunk": pa.array([7], pa.int64()),  # cascade column name
    })
    right = pa.table({
        "source": ["a"], "time": pa.array([0], pa.int64()),
        "v": pa.array([1], pa.int64()),
    })
    with pytest.raises(ValueError, match="bookkeeping"):
        asof.asof_join_streams(
            rd.from_arrow(left), rd.from_arrow(right), value_cols=["v"],
        )


def test_asof_nullable_int_values_keep_type_and_exact_values():
    """A nullable int64 right value column must not take the float64/NaN
    detour: values past 2^53 stay exact, matched nulls surface as nulls,
    and the output column type stays int64."""
    import pyarrow as pa

    big = (1 << 53) + 1
    right = pa.table({
        "source": pa.array(["s", "s"]),
        "time": pa.array([10, 20], pa.int64()),
        "v": pa.array([big, None], pa.int64()),
    })
    left = pa.table({
        "source": pa.array(["s", "s"]),
        "time": pa.array([15, 25], pa.int64()),
    })
    out = asof.asof_join(rd.from_arrow(left), right, value_cols=["v"])
    rows = out.take_all()
    sch = out.schema()
    assert dict(zip(sch.names, sch.types))["v"] == pa.int64()
    got = {r["time"]: r["v"] for r in rows}
    assert got == {15: big, 25: None}


def test_asof_null_probe_time_matches_nothing():
    """NaN -> INT64_MIN used to 'forward'-match the key's first right
    row; SQL ASOF semantics match nothing for a null probe time."""
    import pyarrow as pa

    right = pa.table({
        "source": pa.array(["s"]),
        "time": pa.array([10], pa.int64()),
        "v": pa.array([7], pa.int64()),
    })
    left = pa.table({
        "source": pa.array(["s", "s"]),
        "time": pa.array([None, 15], pa.int64()),
    })
    for direction in ("backward", "forward", "nearest"):
        out = asof.asof_join(rd.from_arrow(left), right, value_cols=["v"],
                             direction=direction, how="left").to_pandas()
        null_row = out[out.time.isna()]
        assert null_row.v.isna().all(), direction


def test_asof_rejects_unknown_how():
    import pyarrow as pa
    import pytest

    right = pa.table({"source": pa.array(["s"]),
                      "time": pa.array([1], pa.int64()),
                      "v": pa.array([1], pa.int64())})
    with pytest.raises(ValueError, match="how"):
        asof.asof_join(rd.from_arrow(right), right, value_cols=["v"],
                       how="Inner")
