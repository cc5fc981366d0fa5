"""Co-partitioned hash join, deterministic sampling, top-k / quantiles."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from aisdb_ray.stages import join, rank, sample

# ------------------------------------------------------------------- join


def _sides():
    left = pd.DataFrame(
        {
            "k": ["a", "b", "b", "c", None, "z"],
            "x": [1, 2, 3, 4, 5, 6],
        }
    )
    right = pd.DataFrame(
        {
            "rk": ["b", "c", "c", "d"],
            "y": [10, 20, 21, 30],
        }
    )
    return left, right


def _run(how, num_parts=3):
    left, right = _sides()
    out = join.hash_join(
        rd.from_pandas(left),
        rd.from_pandas(right),
        on="k",
        right_on="rk",
        how=how,
        num_parts=num_parts,
    ).to_pandas()
    return out.sort_values(list(out.columns)).reset_index(drop=True)


def _expect(how):
    left, right = _sides()
    right = right.rename(columns={"rk": "k"})
    if how in ("inner", "left outer", "right outer", "full outer"):
        pd_how = {"left outer": "left", "right outer": "right",
                  "full outer": "outer", "inner": "inner"}[how]
        exp = left.merge(right, on="k", how=pd_how)
    elif how == "left semi":
        exp = left[left["k"].isin(right["k"])]
    else:  # left anti — SQL: null keys match nothing, so they survive
        exp = left[~left["k"].isin(right["k"])]
    exp = exp.sort_values(list(exp.columns)).reset_index(drop=True)
    return exp


def test_join_types_match_pandas():
    for how in ("inner", "left semi", "left anti"):
        got, exp = _run(how), _expect(how)
        pd.testing.assert_frame_equal(
            got.astype(str), exp[got.columns].astype(str), check_dtype=False
        ), how


def test_join_left_outer_many_to_one():
    got = _run("left outer")
    exp = _expect("left outer")
    # multiplicity: b (2 left rows × 1 right), c (1 left × 2 right),
    # a/None/z unmatched -> 4 matched + 3 null-padded rows
    assert len(got) == len(exp) == 7
    assert got["y"].notna().sum() == 4
    # null-key left row survives with null y (SQL LEFT JOIN semantics)
    assert got["k"].isna().sum() == 1


def test_join_int_keys_and_partition_invariance():
    left = pd.DataFrame({"k": np.arange(100, dtype=np.int64), "x": np.arange(100)})
    right = pd.DataFrame({"k": np.arange(0, 200, 2, dtype=np.int64),
                          "y": np.arange(100)})
    for parts in (1, 7):
        out = join.hash_join(
            rd.from_pandas(left), rd.from_pandas(right), on="k",
            how="inner", num_parts=parts,
        ).to_pandas().sort_values("k").reset_index(drop=True)
        assert (out["k"].to_numpy() == np.arange(0, 100, 2)).all()
        assert len(out) == 50


def test_join_one_sided_partitions_outer():
    # disjoint keys force partitions holding only one side — the degenerate
    # (no-Acero) path must pad correctly for every outer flavor
    left = pd.DataFrame({"k": ["a", "b"], "x": [1, 2]})
    right = pd.DataFrame({"rk": ["c", "d"], "y": [3, 4]})
    args = dict(on="k", right_on="rk", num_parts=8)
    l, r = rd.from_pandas(left), rd.from_pandas(right)
    full = join.hash_join(l, r, how="full outer", **args).to_pandas()
    assert len(full) == 4 and full["y"].notna().sum() == 2
    assert set(full["k"]) == {"a", "b", "c", "d"}
    ro = join.hash_join(l, r, how="right outer", **args).to_pandas()
    assert len(ro) == 2 and ro["x"].isna().all()
    assert join.hash_join(l, r, how="inner", **args).count() == 0
    anti = join.hash_join(l, r, how="left anti", **args).to_pandas()
    assert sorted(anti["k"]) == ["a", "b"]


def test_join_collision_and_bad_how_raise():
    left, right = _sides()
    right = right.rename(columns={"rk": "k", "y": "x"})
    import pytest

    with pytest.raises(ValueError):
        join.hash_join(rd.from_pandas(left), rd.from_pandas(right), on="k")
    with pytest.raises(ValueError):
        join.hash_join(rd.from_pandas(left), rd.from_pandas(right),
                       on="k", how="cross")


# ---------------------------------------------------------- interval join


def _interval_fixture(seed=7, n=500, m=40):
    rng = np.random.default_rng(seed)
    pts = pd.DataFrame(
        {
            "k": rng.integers(0, 8, n).astype(str),
            "pid": np.arange(n),
            "t": rng.integers(0, 1000, n).astype(float),
        }
    )
    iv = pd.DataFrame(
        {
            "k": rng.integers(0, 10, m).astype(str),
            "iid": np.arange(m),
            "lo": rng.integers(0, 900, m).astype(float),
        }
    )
    iv["hi"] = iv["lo"] + rng.integers(0, 300, m)  # overlapping intervals
    pts.loc[3, "t"] = None  # null time never matches
    iv.loc[5, "hi"] = None  # null bound never matches
    exp = pts.merge(iv, on="k")
    exp = exp[(exp["t"] >= exp["lo"]) & (exp["t"] <= exp["hi"])]
    return pts, iv, exp


def test_interval_join_matches_bruteforce_and_partition_invariant():
    pts, iv, exp = _interval_fixture()
    cols = ["k", "pid", "t", "iid", "lo", "hi"]
    b = exp[cols].sort_values(cols).reset_index(drop=True)
    for parts in (1, 7):
        got = join.interval_join(
            rd.from_pandas(pts),
            rd.from_pandas(iv),
            "k",
            time_col="t",
            lo_col="lo",
            hi_col="hi",
            num_parts=parts,
        ).to_pandas()
        assert len(got) > 0
        a = got[cols].sort_values(cols).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            a, b.astype(a.dtypes.to_dict()), check_dtype=False
        )


def test_interval_join_left_outer_pads_unmatched():
    pts, iv, exp = _interval_fixture()
    got = join.interval_join(
        rd.from_pandas(pts),
        rd.from_pandas(iv),
        "k",
        time_col="t",
        lo_col="lo",
        hi_col="hi",
        how="left outer",
        num_parts=5,
    ).to_pandas()
    # every point survives: matched pairs + one padded row per unmatched pt
    assert len(got) == len(exp) + len(pts) - exp["pid"].nunique()
    unmatched = got[got["iid"].isna()]
    assert set(unmatched["pid"]) == set(pts["pid"]) - set(exp["pid"])


def test_interval_join_inclusive_bounds_and_point_width():
    pts = pd.DataFrame({"k": ["a"] * 3, "pid": [0, 1, 2], "t": [9, 10, 11]})
    iv = pd.DataFrame(
        {"k": ["a", "a"], "iid": [0, 1], "lo": [10, 10], "hi": [10, 9]}
    )
    got = join.interval_join(
        rd.from_pandas(pts),
        rd.from_pandas(iv),
        "k",
        time_col="t",
        lo_col="lo",
        hi_col="hi",
        num_parts=2,
    ).to_pandas()
    # width-0 interval matches exactly t==10; inverted interval matches none
    assert got["pid"].tolist() == [1] and got["iid"].tolist() == [0]


def test_interval_join_salted_results_invariant():
    # hot key: 60% of points on one key — salting must not change results
    pts, iv, exp = _interval_fixture()
    pts.loc[: len(pts) * 3 // 5, "k"] = "0"
    exp = pts.merge(iv, on="k")
    exp = exp[(exp["t"] >= exp["lo"]) & (exp["t"] <= exp["hi"])]
    cols = ["k", "pid", "t", "iid", "lo", "hi"]
    b = exp[cols].sort_values(cols).reset_index(drop=True)
    for how in ("inner", "left outer"):
        outs = []
        for s in (1, 4):
            got = join.interval_join(
                rd.from_pandas(pts),
                rd.from_pandas(iv),
                "k",
                time_col="t",
                lo_col="lo",
                hi_col="hi",
                how=how,
                num_parts=8,
                salt=s,
            ).to_pandas()
            outs.append(
                got[cols].sort_values(cols).reset_index(drop=True)
            )
        pd.testing.assert_frame_equal(outs[0], outs[1], check_dtype=False)
        if how == "inner":
            pd.testing.assert_frame_equal(
                outs[0], b.astype(outs[0].dtypes.to_dict()), check_dtype=False
            )


def test_interval_join_multi_key():
    pts = pd.DataFrame(
        {
            "k1": ["a", "a", "b"],
            "k2": [1, 2, 1],
            "pid": [0, 1, 2],
            "t": [5, 5, 5],
        }
    )
    iv = pd.DataFrame(
        {"k1": ["a", "b"], "k2": [2, 1], "iid": [0, 1], "lo": [0, 6], "hi": [9, 9]}
    )
    got = join.interval_join(
        rd.from_pandas(pts),
        rd.from_pandas(iv),
        ["k1", "k2"],
        time_col="t",
        lo_col="lo",
        hi_col="hi",
        num_parts=3,
    ).to_pandas()
    # only (a,2) matches its interval; (b,1)'s interval starts after t=5
    assert got["pid"].tolist() == [1] and got["iid"].tolist() == [0]


# ----------------------------------------------------------------- sample


def _md5u32(s) -> int:
    return int.from_bytes(hashlib.md5(str(s).encode()).digest()[:4], "big")


def test_hash_sample_exact_and_deterministic():
    df = pd.DataFrame({"doc_id": np.arange(1000, dtype=np.int64)})
    out1 = sample.hash_sample(rd.from_pandas(df), "doc_id", 30).to_pandas()
    out2 = sample.hash_sample(rd.from_pandas(df), "doc_id", 30).to_pandas()
    exp = {i for i in range(1000) if _md5u32(i) % 100 < 30}
    assert set(out1["doc_id"]) == exp == set(out2["doc_id"])
    # rate lands near 30% (hash uniformity, not an assertion of exactness)
    assert 0.2 < len(out1) / 1000 < 0.4


def test_hash_sample_bounds():
    df = pd.DataFrame({"doc_id": ["a", "b"]})
    assert sample.hash_sample(rd.from_pandas(df), "doc_id", 0).count() == 0
    assert sample.hash_sample(rd.from_pandas(df), "doc_id", 100).count() == 2


def test_stratified_sample_quota_and_selection():
    rng = np.random.default_rng(7)
    df = pd.DataFrame(
        {
            "g": np.repeat(["g1", "g2", "g3"], [50, 5, 2]),
            "doc_id": np.arange(57, dtype=np.int64),
        }
    )
    df = df.sample(frac=1, random_state=3).reset_index(drop=True)  # shuffle
    out = sample.stratified_sample(rd.from_pandas(df), "g", "doc_id", 4)
    got = out.to_pandas().sort_values(["g", "doc_id"]).reset_index(drop=True)
    sizes = got.groupby("g").size().to_dict()
    assert sizes == {"g1": 4, "g2": 4, "g3": 2}  # min(k, |group|)
    for g, grp in df.groupby("g"):
        want = sorted(grp["doc_id"], key=lambda d: (_md5u32(d), d))[:4]
        assert sorted(got[got["g"] == g]["doc_id"]) == sorted(want)
    assert "_sample_h64" not in got.columns


# ------------------------------------------------------------------- rank


def test_topk_per_group_matches_pandas():
    rng = np.random.default_rng(11)
    df = pd.DataFrame(
        {
            "g": rng.choice(["a", "b", "c"], 500),
            "v": rng.integers(0, 50, 500).astype(np.int64),
            "t": np.arange(500, dtype=np.int64),  # unique tiebreak
        }
    )
    got = rank.topk_per_group(
        rd.from_pandas(df), "g", ["v", "t"], 5, descending=[True, False]
    ).to_pandas()
    exp = (
        df.sort_values(["g", "v", "t"], ascending=[True, False, True])
        .groupby("g")
        .head(5)
    )
    got = got.sort_values(["g", "v", "t"], ascending=[True, False, True])
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True)[["g", "v", "t"]],
        exp.reset_index(drop=True)[["g", "v", "t"]],
    )


def test_topk_k_larger_than_group():
    df = pd.DataFrame({"g": ["a", "a", "b"], "v": [1, 2, 3]})
    out = rank.topk_per_group(rd.from_pandas(df), "g", ["v"], 10).to_pandas()
    assert len(out) == 3


def test_group_quantiles_match_numpy_rule():
    rng = np.random.default_rng(23)
    df = pd.DataFrame(
        {
            "g": rng.choice(["a", "b"], 400),
            "v": rng.integers(0, 30, 400).astype(np.int64),
        }
    )
    out = (
        rank.group_quantiles(rd.from_pandas(df), "g", "v", ps=(50, 95))
        .to_pandas()
        .set_index("g")
        .sort_index()
    )
    for g, grp in df.groupby("g"):
        v = np.sort(grp["v"].to_numpy())
        n = len(v)
        assert out.loc[g, "n_rows"] == n
        for p in (50, 95):
            assert out.loc[g, f"q{p}_v"] == v[(p * n + 99) // 100 - 1]


def test_group_quantiles_cont_match_numpy_linear():
    rng = np.random.default_rng(19)
    df = pd.DataFrame({
        "g": rng.choice(["a", "b", "c"], 1000),
        "v": rng.integers(0, 500, 1000).astype(np.int32),
    })
    got = rank.group_quantiles_cont(
        rd.from_pandas(df), "g", "v", ps=(25, 50, 75, 95)
    ).to_pandas().set_index("g").sort_index()
    for g, sub in df.groupby("g"):
        for p in (25, 50, 75, 95):
            want = np.percentile(sub["v"].to_numpy(), p, method="linear")
            assert got.loc[g, f"p{p}_v"] == want, (g, p)
        assert got.loc[g, "n_rows"] == len(sub)


def test_group_quantiles_cont_single_value_group():
    df = pd.DataFrame({"g": ["x"], "v": [42]})
    out = rank.group_quantiles_cont(rd.from_pandas(df), "g", "v").to_pandas()
    assert out["p25_v"].tolist() == [42.0]
    assert out["p75_v"].tolist() == [42.0]


def test_group_quantiles_match_duckdb_quantile_disc():
    import duckdb

    rng = np.random.default_rng(5)
    df = pd.DataFrame(
        {
            "g": rng.choice(["x", "y", "z"], 300),
            "v": rng.integers(0, 100, 300).astype(np.int64),
        }
    )
    got = (
        rank.group_quantiles(rd.from_pandas(df), "g", "v", ps=(50,))
        .to_pandas()
        .set_index("g")["q50_v"]
        .sort_index()
    )
    want = duckdb.sql(
        "SELECT g, quantile_disc(v, 0.5) q FROM df GROUP BY g ORDER BY g"
    ).df().set_index("g")["q"]
    assert (got == want).all()


def test_group_quantiles_multi_matches_numpy():
    """Composite-group quantiles == numpy per-(g1,g2) rank rule."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from aisdb_ray.stages import rank

    rng = np.random.default_rng(41)
    df = pd.DataFrame(
        {
            "g1": rng.choice(["a", "b"], 500),
            "g2": rng.integers(0, 4, 500).astype(np.int64),
            "v": rng.integers(0, 40, 500).astype(np.int64),
        }
    )
    got = (
        rank.group_quantiles_multi(rd.from_pandas(df), ["g1", "g2"], "v",
                                   ps=(50, 95))
        .to_pandas().sort_values(["g1", "g2"]).reset_index(drop=True)
    )
    for _, r in got.iterrows():
        vals = np.sort(
            df[(df["g1"] == r["g1"]) & (df["g2"] == r["g2"])]["v"].to_numpy()
        )
        assert r["n_rows"] == len(vals)
        for p in (50, 95):
            rank_ = (p * len(vals) + 99) // 100
            assert r[f"q{p}_v"] == vals[rank_ - 1], (r["g1"], r["g2"], p)


def test_fk_integrity_detects_planted_orphans():
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd
    from aisdb_ray.stages import join as join_mod

    child = pd.DataFrame({"k": np.array([1, 2, 3, 99, 98], np.int64)})
    parent = pd.DataFrame({"pk": np.array([1, 2, 3, 4], np.int64)})
    orphans = join_mod.hash_join(
        rd.from_pandas(child), rd.from_pandas(parent),
        on="k", right_on="pk", how="left anti",
    ).to_pandas()
    assert sorted(orphans["k"].tolist()) == [98, 99]


def test_interval_join_salt_exceeding_partitions_no_duplicates():
    """salt > num_parts used to collide interval copies into the same
    partition and emit every match multiple times."""
    import pyarrow as pa
    import ray.data as rd

    from aisdb_ray.stages import join

    pts = rd.from_arrow(pa.table({
        "k": ["a", "a", "b"], "t": pa.array([5, 15, 5], pa.int64()),
    }))
    ivs = rd.from_arrow(pa.table({
        "k": ["a", "a", "b"],
        "lo": pa.array([0, 10, 0], pa.int64()),
        "hi": pa.array([9, 19, 9], pa.int64()),
    }))
    out = join.interval_join(
        pts, ivs, "k", time_col="t", lo_col="lo", hi_col="hi",
        num_parts=2, salt=3,
    ).to_pandas()
    assert len(out) == 3
    assert sorted(zip(out["k"], out["t"], out["lo"])) == [
        ("a", 5, 0), ("a", 15, 10), ("b", 5, 0)]


def test_interval_join_int64_boundaries_above_2_53():
    """Nullable-int bounds must compare in int64 — the float64 detour
    merged distinct ns-scale epochs at interval boundaries."""
    import pyarrow as pa
    import ray.data as rd

    from aisdb_ray.stages import join

    base = 1_700_000_000_000_000_000
    pts = rd.from_arrow(pa.table({
        "k": ["a", "a"],
        "t": pa.array([base + 3, base + 4], pa.int64()),
    }))
    ivs = rd.from_arrow(pa.table({
        "k": ["a", "x"],
        "lo": pa.array([base + 4, None], pa.int64()),  # null => int-with-null
        "hi": pa.array([base + 10, None], pa.int64()),
    }))
    out = join.interval_join(
        pts, ivs, "k", time_col="t", lo_col="lo", hi_col="hi",
    ).to_pandas()
    # only t = base+4 is inside [base+4, base+10]; base+3 rounds INTO the
    # interval under float64
    assert out["t"].tolist() == [base + 4]


def test_stratified_sample_rejects_reserved_column_and_bool_keys():
    """Guard parity with weighted_sample: a leaked _sample_h64 input
    column fails fast, and bool keys are rejected (Python str() 'True'
    vs DuckDB VARCHAR 'true' would silently sample different rows)."""
    import pyarrow as pa
    import pytest

    from aisdb_ray.stages import sample as S

    t = pa.table({
        "g": pa.array(["a", "b"]),
        "k": pa.array([1, 2], pa.int64()),
        "_sample_h64": pa.array([0, 0], pa.int64()),
    })
    with pytest.raises(ValueError, match="_sample_h64"):
        S.stratified_sample(rd.from_arrow(t), "g", "k", 1)
    with pytest.raises(TypeError):
        S.md5_u32(pa.array([True, False]))


def test_topk_null_order_values_rank_last_both_directions():
    """Null order values must sort LAST in both directions (the DuckDB
    ORDER BY default) — an int64 null used to round-trip through NaN to
    INT64_MIN and rank BEST."""
    import pyarrow as pa

    from aisdb_ray.stages import rank

    t = pa.table({
        "g": pa.array(["a"] * 3),
        "score": pa.array([5, None, 9], pa.int64()),
        "id": pa.array([1, 2, 3], pa.int64()),
    })
    lo = rank._topk_table(t, "g", ["score", "id"], 1, [False, False])
    hi = rank._topk_table(t, "g", ["score", "id"], 1, [True, False])
    assert lo["score"].to_pylist() == [5]
    assert hi["score"].to_pylist() == [9]
    # k=3 still returns the null row, ranked last
    all3 = rank._topk_table(t, "g", ["score", "id"], 3, [False, False])
    assert all3["score"].to_pylist() == [5, 9, None]
