"""Trailing RANGE-window aggregates: exactness vs DuckDB, tie semantics."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import ray.data as rd

from aisdb_ray.stages import window


def _frame(n=400, ties=True, seed=13):
    rng = np.random.default_rng(seed)
    t = np.sort(rng.integers(0, 2000, n))
    if ties:
        t[n // 3] = t[n // 3 + 1]  # forced same-timestamp burst
        t[10] = t[11] = t[12]
    return pd.DataFrame(
        {
            "g": rng.choice(["a", "b", "c"], n),
            "time": t.astype(np.int64),
            "v": rng.integers(-50, 500, n).astype(np.int64),
        }
    )


def _oracle(df, width):
    return duckdb.sql(
        f"""SELECT g, time, v,
       CAST(sum(v) OVER w AS BIGINT) AS w_sum,
       CAST(count(*) OVER w AS BIGINT) AS w_n,
       CAST(sum(v) OVER w AS DOUBLE) / count(*) OVER w AS w_mean,
       CAST(min(v) OVER w AS BIGINT) AS w_min,
       CAST(max(v) OVER w AS BIGINT) AS w_max
FROM df WINDOW w AS (
  PARTITION BY g ORDER BY time
  RANGE BETWEEN {width} PRECEDING AND CURRENT ROW)"""
    ).df()


def _compare(df, width):
    got = (
        window.rolling_time_aggregate(rd.from_pandas(df), "g", "time", "v", width)
        .to_pandas()
        .sort_values(["g", "time", "v"])
        .reset_index(drop=True)
    )
    want = _oracle(df, width).sort_values(["g", "time", "v"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[want.columns], want, check_dtype=False)


def test_rolling_matches_duckdb_with_ties():
    _compare(_frame(), 120)


def test_rolling_width_zero_is_peer_group():
    # width 0: the window is exactly the peer set (equal timestamps)
    _compare(_frame(), 0)


def test_rolling_wide_window_is_running_aggregate():
    _compare(_frame(), 10_000)


def test_running_unbounded_matches_duckdb():
    # width=None: RANGE UNBOUNDED PRECEDING (running aggregates with peers)
    df = _frame()
    got = (
        window.rolling_time_aggregate(rd.from_pandas(df), "g", "time", "v", None)
        .to_pandas()
        .sort_values(["g", "time", "v"])
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        """SELECT g, time, v,
       CAST(sum(v) OVER w AS BIGINT) AS w_sum,
       CAST(count(*) OVER w AS BIGINT) AS w_n,
       CAST(sum(v) OVER w AS DOUBLE) / count(*) OVER w AS w_mean,
       CAST(min(v) OVER w AS BIGINT) AS w_min,
       CAST(max(v) OVER w AS BIGINT) AS w_max
FROM df WINDOW w AS (
  PARTITION BY g ORDER BY time
  RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"""
    ).df().sort_values(["g", "time", "v"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[want.columns], want, check_dtype=False)


def test_rolling_single_row_groups():
    df = pd.DataFrame(
        {"g": ["a", "b"], "time": np.int64([5, 9]), "v": np.int64([7, -3])}
    )
    out = (
        window.rolling_time_aggregate(rd.from_pandas(df), "g", "time", "v", 60)
        .to_pandas()
        .sort_values("g")
    )
    assert out["w_n"].tolist() == [1, 1]
    assert out["w_min"].tolist() == [7, -3] == out["w_max"].tolist()


def test_zscore_anomalies_vs_duckdb():
    """Integer z-score flag == SQL window formulation, including a planted
    spike that must flag and a flat series that must not."""
    df = _frame(300, ties=True, seed=7)
    df["v"] = np.abs(df["v"])  # value channel contract: non-negative
    # plant an extreme spike late in group 'a' (plenty of prior rows)
    ga = df[df["g"] == "a"].index
    df.loc[ga[-1], "v"] = 500_000
    want = duckdb.sql(
        """WITH win AS (
      SELECT g, time, v,
             CAST(sum(v) OVER w AS BIGINT) AS w_sum,
             CAST(count(*) OVER w AS BIGINT) AS w_n,
             CAST(sum(v * v) OVER w AS BIGINT) AS w_sumsq
      FROM df WINDOW w AS (
        PARTITION BY g ORDER BY time
        RANGE BETWEEN 600 PRECEDING AND CURRENT ROW))
    SELECT * FROM win
    WHERE w_n >= 8
      AND (v * w_n - w_sum) * (v * w_n - w_sum)
          > 9 * (w_n * w_sumsq - w_sum * w_sum)
    ORDER BY g, time, v"""
    ).df()
    got = (
        window.zscore_anomalies(
            rd.from_pandas(df), "g", "time", "v", width=600, k2_num=9, min_n=8
        )
        .to_pandas()
        .sort_values(["g", "time", "v"], kind="stable")
        .reset_index(drop=True)
    )
    assert len(got) == len(want) and len(got) > 0
    assert (got["v"] == 500_000).any()  # the planted spike flags
    for c in ["g", "time", "v", "w_sum", "w_n", "w_sumsq"]:
        np.testing.assert_array_equal(
            got[c].to_numpy(), want[c].to_numpy(), err_msg=c
        )
    # a constant series never flags (variance 0, deviation 0: 0 > 0 false)
    flat = pd.DataFrame(
        {"g": ["z"] * 50, "time": np.arange(50, dtype=np.int64),
         "v": np.full(50, 7, dtype=np.int64)}
    )
    none = window.zscore_anomalies(
        rd.from_pandas(flat), "g", "time", "v", width=600
    ).to_pandas()
    assert len(none) == 0


def test_group_deltas_bruteforce():
    """Δt kernel == pandas diff per group; first rows and single-row groups
    are dropped."""
    df = _frame(250, ties=True, seed=17)
    df = pd.concat(
        [df, pd.DataFrame({"g": ["solo"], "time": [999], "v": [1]})],
        ignore_index=True,
    )
    df["seq"] = np.arange(len(df), dtype=np.int64)
    got = (
        window.group_deltas(rd.from_pandas(df), "g", "time", "seq")
        .to_pandas().sort_values(["g", "time", "seq"]).reset_index(drop=True)
    )
    w = df.sort_values(["g", "time", "seq"], kind="stable").copy()
    w["dt"] = w.groupby("g")["time"].diff()
    want = w.dropna(subset=["dt"]).astype({"dt": np.int64})
    want = want.sort_values(["g", "time", "seq"]).reset_index(drop=True)
    assert len(got) == len(want)
    assert "solo" not in set(got["g"])
    for c in ["g", "time", "seq", "dt"]:
        np.testing.assert_array_equal(got[c].to_numpy(), want[c].to_numpy(), err_msg=c)


def test_cusum_closed_form_matches_sequential():
    """Vectorized closed form == the literal max(0, s+x) recurrence, and
    a planted level shift is detected at/after the shift."""
    rng = np.random.default_rng(23)
    n = 400
    df = pd.DataFrame(
        {
            "g": ["a"] * n + ["b"] * n,
            "time": np.tile(np.arange(n, dtype=np.int64), 2),
            "seq": np.arange(2 * n, dtype=np.int64),
            "v": np.concatenate(
                [
                    rng.integers(90, 110, n),          # a: stationary
                    np.concatenate([rng.integers(90, 110, n // 2),
                                    rng.integers(150, 170, n - n // 2)]),  # b: shift
                ]
            ).astype(np.int64),
        }
    )
    H, K = 500, 32
    got = (
        window.cusum_changepoints(rd.from_pandas(df), "g", "time", "seq", "v",
                                  h=H, baseline_k=K)
        .to_pandas().sort_values(["g", "time"]).reset_index(drop=True)
    )

    # literal sequential reference
    rows = []
    for gname, grp in df.groupby("g", sort=False):
        grp = grp.sort_values(["time", "seq"])
        v = grp["v"].to_numpy(np.int64)
        target = v[:K].sum() // min(K, len(v))
        s = 0
        for _, row in zip(range(len(v)), grp.itertuples()):
            s = max(0, s + int(row.v) - int(target))
            if s > H:
                rows.append((gname, row.time, s))
    want = pd.DataFrame(rows, columns=["g", "time", "cusum"])
    assert len(got) == len(want) and len(got) > 0
    np.testing.assert_array_equal(got["cusum"].to_numpy(), want["cusum"].to_numpy())
    np.testing.assert_array_equal(got["time"].to_numpy(), want["time"].to_numpy())
    # the shifted series must flag, only after its shift, and its drift
    # dwarfs any floor-mean-baseline noise drift of the stationary series
    b = got[got["g"] == "b"]
    assert len(b) > 0 and b["time"].min() >= n // 2
    a_max = got.loc[got["g"] == "a", "cusum"].max() if (got["g"] == "a").any() else 0
    assert b["cusum"].max() > 10 * max(a_max, H)


def test_staged_exchange_equals_sort_shuffle(tmp_path):
    """co_shuffle_staged (disk-staged map-side exchange) produces exactly
    the object-store groupby's rows for the rolling kernel."""
    df = _frame(400, ties=True, seed=29)
    a = (
        window.rolling_time_aggregate(rd.from_pandas(df), "g", "time", "v", 300)
        .to_pandas()
    )
    b = (
        window.rolling_time_aggregate(
            rd.from_pandas(df), "g", "time", "v", 300,
            staging_dir=str(tmp_path / "stage"),
        )
        .to_pandas()
    )
    key = ["g", "time", "v", "w_sum", "w_n", "w_min", "w_max"]
    a2 = a.sort_values(key, kind="stable").reset_index(drop=True)
    b2 = b.sort_values(key, kind="stable").reset_index(drop=True)
    pd.testing.assert_frame_equal(a2[key], b2[key], check_dtype=False)


def test_ewma_block_matches_scalar_recurrence():
    """The rank-synchronous vectorized EWMA must be BIT-identical to the
    per-group scalar fold s_i = s_{i-1} + (v_i - s_{i-1})*alpha — same IEEE
    ops in the same order, just batched across groups per rank."""
    import pyarrow as pa

    rng = np.random.default_rng(7)
    n = 500
    df = pd.DataFrame(
        {
            "g": rng.choice(["a", "b", "c", "only1"], n, p=[0.5, 0.3, 0.198, 0.002]),
            "time": rng.permutation(n).astype(np.int64),  # unsorted input
            "v": rng.integers(0, 10_000, n).astype(np.int64),
        }
    ).drop_duplicates(["g", "time"])
    out = window.ewma_block(
        pa.Table.from_pandas(df, preserve_index=False), "g", "time", "v", 1, 4
    ).to_pandas()
    alpha = 1.0 / 4.0
    want = {}
    for g, sub in df.sort_values(["g", "time"]).groupby("g"):
        s = None
        for t, v in zip(sub["time"], sub["v"]):
            s = float(v) if s is None else s + (float(v) - s) * alpha
            want[(g, t)] = s
    got = {(r.g, r.time): r.ewma for r in out.itertuples()}
    assert got.keys() == want.keys()
    for k in want:
        assert got[k] == want[k], k  # exact equality, not approx


def test_ewma_distributed_equals_block():
    df = _frame(300, ties=False, seed=41).drop_duplicates(["g", "time"])
    import pyarrow as pa

    a = (
        window.ewma(rd.from_pandas(df), "g", "time", "v", 1, 4)
        .to_pandas()
        .sort_values(["g", "time"])
        .reset_index(drop=True)
    )
    b = (
        window.ewma_block(pa.Table.from_pandas(df, preserve_index=False),
                          "g", "time", "v", 1, 4)
        .to_pandas()
        .sort_values(["g", "time"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a[["g", "time", "v", "ewma"]],
                                  b[["g", "time", "v", "ewma"]])


def test_percent_rank_matches_duckdb():
    import duckdb
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from aisdb_ray.stages import window

    rng = np.random.default_rng(59)
    n = 8_000
    df = pd.DataFrame({
        "g": rng.choice(["a", "b", "c"], n),
        "v": rng.integers(0, 50, n).astype(np.int64),  # heavy ties
        "i": np.arange(n, dtype=np.int64),
    })
    got = window.percent_rank(
        rd.from_pandas(df).repartition(5), "g", "v"
    ).to_pandas().sort_values("i").reset_index(drop=True)
    want = duckdb.sql(
        "SELECT i, percent_rank() OVER (PARTITION BY g ORDER BY v) AS pct "
        "FROM df ORDER BY i"
    ).df()
    np.testing.assert_array_equal(got["pct"].to_numpy(),
                                  want["pct"].to_numpy())
    # single-row group -> 0.0
    one = pd.DataFrame({"g": ["z"], "v": np.array([5], np.int64),
                        "i": np.array([0], np.int64)})
    g1 = window.percent_rank(rd.from_pandas(one), "g", "v").to_pandas()
    assert g1["pct"].tolist() == [0.0]


def test_cume_dist_matches_duckdb():
    import duckdb
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from aisdb_ray.stages import window

    rng = np.random.default_rng(67)
    n = 6_000
    df = pd.DataFrame({
        "g": rng.choice(["a", "b"], n),
        "v": rng.integers(0, 40, n).astype(np.int64),
        "i": np.arange(n, dtype=np.int64),
    })
    got = window.cume_dist(
        rd.from_pandas(df).repartition(4), "g", "v"
    ).to_pandas().sort_values("i").reset_index(drop=True)
    want = duckdb.sql(
        "SELECT i, cume_dist() OVER (PARTITION BY g ORDER BY v) AS cd "
        "FROM df ORDER BY i"
    ).df()
    np.testing.assert_array_equal(got["cd"].to_numpy(), want["cd"].to_numpy())


def test_ewma_holt_deterministic_under_time_ties():
    """Rows sharing (group, time) must order by VALUE, not incoming block
    layout — the recurrence result is shuffle-order-invariant."""
    import pyarrow as pa

    from aisdb_ray.stages import window

    a = pa.table({"source": ["s"] * 3, "time": [0, 10, 10],
                  "v": [100, 0, 40]})
    b = pa.table({"source": ["s"] * 3, "time": [0, 10, 10],
                  "v": [100, 40, 0]})  # same rows, tied pair swapped
    ea = window.ewma_block(a, "source", "time", "v").to_pandas()
    eb = window.ewma_block(b, "source", "time", "v").to_pandas()
    assert sorted(ea["ewma"]) == sorted(eb["ewma"])
    assert list(ea.sort_values(["time", "v"])["ewma"]) == list(
        eb.sort_values(["time", "v"])["ewma"])
    ha = window.holt_block(a, "source", "time", "v").to_pandas()
    hb = window.holt_block(b, "source", "time", "v").to_pandas()
    assert list(ha.sort_values(["time", "v"])["holt_level"]) == list(
        hb.sort_values(["time", "v"])["holt_level"])


def test_benford_nonpositive_values_dropped():
    import pyarrow as pa
    import ray.data as rd

    from aisdb_ray.stages import window

    t = pa.table({"source": ["a"] * 4, "n_tok": [123, 0, -25, 9]})
    got = window.benford_digits(
        rd.from_arrow(t), value="n_tok"
    ).to_pandas().sort_values("digit")
    assert got["digit"].tolist() == [1, 9]
    assert got["n"].tolist() == [1, 1]


def test_zscore_skips_minmax_but_flags_identically():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from aisdb_ray.stages import window

    n = 64
    v = np.full(n, 100, np.int64)
    v[-1] = 5000  # unmistakable spike
    t = pa.table({"source": ["s"] * n,
                  "time": pa.array(np.arange(n, dtype=np.int64) * 10),
                  "n_tok": pa.array(v)})
    out = window.zscore_anomalies(
        rd.from_arrow(t), "source", "time", "n_tok", 600, min_n=4
    ).to_pandas()
    assert len(out) >= 1 and 5000 in out["n_tok"].tolist()
    assert "w_min" not in out.columns and "w_max" not in out.columns
    assert {"w_sum", "w_n", "w_sumsq"} <= set(out.columns)


def test_late_data_requires_total_arrival_order():
    """Duplicate (group, arrival) pairs make 'prior arrivals' ambiguous —
    the kernel must raise rather than emit a shuffle-order-dependent late
    set."""
    import pyarrow as pa
    import pytest

    t = pa.table({
        "g": pa.array(["a", "a", "a"]),
        "time": pa.array([100, 10, 50], pa.int64()),
        "arr": pa.array([5, 5, 6], pa.int64()),
    })
    with pytest.raises(ValueError, match="totally order"):
        window.late_data_block(t, "g", "time", "arr", 0)
    # unique arrivals: deterministic regardless of input row order
    t2 = pa.table({
        "g": pa.array(["a", "a", "a"]),
        "time": pa.array([100, 10, 50], pa.int64()),
        "arr": pa.array([5, 6, 7], pa.int64()),
    })
    out = window.late_data_block(t2, "g", "time", "arr", 0)
    perm = t2.take(pa.array([2, 0, 1]))
    out2 = window.late_data_block(perm, "g", "time", "arr", 0)
    assert out.to_pydict() == out2.to_pydict()


def test_empty_partition_group_dtype_follows_input():
    """Int64 group keys: empty partitions must emit int64-typed empties,
    not hardcoded string (schema unification would fail)."""
    import pyarrow as pa

    t = pa.table({
        "g": pa.array([7, 7], pa.int64()),
        "time": pa.array([0, 86400 * 3], pa.int64()),
        "v": pa.array([1, 9], pa.int64()),
    })
    ds = rd.from_arrow(t)
    out = window.top_movers(ds, group="g", time_col="time", value="v", num_parts=4).to_pandas()
    assert out.g.dtype.kind == "i"
