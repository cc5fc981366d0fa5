"""Rollup tiers vs the oracle + continuous-aggregate reaggregation parity."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from aisdb_ray import oracle
from aisdb_ray.stages import prepare, rollup, series

MAX_GAP = 7200


def _clean_ds(path):
    ds = rd.read_parquet(path).map_batches(prepare.prepare, batch_format="pyarrow")
    return series.clean_series(ds, MAX_GAP)


def _cmp(got: pd.DataFrame, want: pd.DataFrame):
    got = got.sort_values(["source", "bucket"], kind="stable").reset_index(drop=True)
    want = want.sort_values(["source", "bucket"], kind="stable").reset_index(drop=True)
    assert len(got) == len(want)
    for c in ["source", "bucket", "min_n_tok", "max_n_tok", "sum_n_tok", "count_n_tok"]:
        np.testing.assert_array_equal(got[c].to_numpy(), want[c].to_numpy(), err_msg=c)
    np.testing.assert_array_equal(
        got["mean_n_tok"].to_numpy(), want["mean_n_tok"].to_numpy(), err_msg="mean"
    )


def test_rollup_1m_matches_oracle(micro_dir, micro_df):
    got = rollup.rollup(_clean_ds(micro_dir), 60).to_pandas()
    want = oracle.rollup(oracle.clean(micro_df), 60)
    _cmp(got, want)


def test_rollup_1h_matches_oracle(micro_dir, micro_df):
    got = rollup.rollup(_clean_ds(micro_dir), 3600).to_pandas()
    want = oracle.rollup(oracle.clean(micro_df), 3600)
    _cmp(got, want)


def test_cascade_reaggregation_exact(micro_dir, micro_df):
    """1h computed from 1m partials == 1h computed from raw, exactly."""
    m1 = rollup.rollup(_clean_ds(micro_dir), 60)
    h_from_m = rollup.rollup_from_rollup(m1, 3600).to_pandas()
    h_direct = oracle.rollup(oracle.clean(micro_df), 3600)
    _cmp(h_from_m, h_direct)
    # and 1d from 1h
    d_from_h = rollup.rollup_from_rollup(
        rollup.rollup(_clean_ds(micro_dir), 3600), 86400
    ).to_pandas()
    d_direct = oracle.rollup(oracle.clean(micro_df), 86400)
    _cmp(d_from_h, d_direct)


def test_rollup_small_scale(small_dir, small_df):
    got = rollup.rollup(_clean_ds(small_dir), 3600).to_pandas()
    want = oracle.rollup(oracle.clean(small_df), 3600)
    _cmp(got, want)


def test_hash_combine_matches_single_funnel(micro_dir, micro_df):
    """The groupby hash-shuffle combine (scale path for results too big for
    one block) is exactly equal to the single-block funnel."""
    got = rollup.rollup(_clean_ds(micro_dir), 60, hash_combine=True).to_pandas()
    want = oracle.rollup(oracle.clean(micro_df), 60)
    _cmp(got, want)
    h1 = rollup.rollup_from_rollup(
        rollup.rollup(_clean_ds(micro_dir), 60, hash_combine=True),
        3600,
        hash_combine=True,
    ).to_pandas()
    _cmp(h1, oracle.rollup(oracle.clean(micro_df), 3600))


def test_sub_hour_default_takes_hash_combine_path(micro_dir):
    """Sub-hour tiers default to the hash combine: a minute-grain result has
    (key × bucket) cardinality that outgrows one block at scale, so the plan
    must NOT contain the repartition(1) single-block funnel.  Hour-and-
    coarser tiers keep the funnel (small results, cheaper)."""
    m1 = rollup.rollup(_clean_ds(micro_dir), 60).materialize()
    assert "Repartition" not in m1.stats()
    h1 = rollup.rollup(_clean_ds(micro_dir), 3600).materialize()
    assert "Repartition" in h1.stats()


def test_mode_and_grouped_sums_hash_combine_paths(micro_dir, micro_df):
    """modeagg.mode_per_key / functions.agg.grouped_sums hash_combine=True
    (groupby scale path) equals the default one-block funnel exactly."""
    from aisdb_ray.functions import agg
    from aisdb_ray.stages import modeagg

    ds = _clean_ds(micro_dir)

    def norm(df, cols):
        return df.sort_values(cols, kind="stable").reset_index(drop=True)

    a = norm(modeagg.mode_per_key(ds, "source", "n_tok").to_pandas(), ["source"])
    b = norm(
        modeagg.mode_per_key(ds, "source", "n_tok", hash_combine=True).to_pandas(),
        ["source"],
    )
    pd.testing.assert_frame_equal(a, b, check_dtype=False)

    c = norm(agg.grouped_sums(ds, ["source", "seg"], ["n_tok"]).to_pandas(),
             ["source", "seg"])
    d = norm(
        agg.grouped_sums(
            ds, ["source", "seg"], ["n_tok"], hash_combine=True
        ).to_pandas(),
        ["source", "seg"],
    )
    pd.testing.assert_frame_equal(c, d, check_dtype=False)


# ---------------------------------------------------------------------------
# OHLC candle tier + real-time continuous aggregate
# ---------------------------------------------------------------------------

def _ohlc_oracle(clean: pd.DataFrame, width: int) -> pd.DataFrame:
    df = clean.copy()
    df["bucket"] = (df["time"] // width) * width
    df = df.sort_values(["source", "bucket", "time", "seq"], kind="stable")
    g = df.groupby(["source", "bucket"], sort=False)
    return g.agg(
        open_n_tok=("n_tok", "first"),
        close_n_tok=("n_tok", "last"),
        min_n_tok=("n_tok", "min"),
        max_n_tok=("n_tok", "max"),
        sum_n_tok=("n_tok", "sum"),
        count_n_tok=("n_tok", "size"),
    ).reset_index()


def _cmp_ohlc(got: pd.DataFrame, want: pd.DataFrame):
    got = got.sort_values(["source", "bucket"], kind="stable").reset_index(drop=True)
    want = want.sort_values(["source", "bucket"], kind="stable").reset_index(drop=True)
    assert len(got) == len(want)
    for c in ["source", "bucket", "open_n_tok", "close_n_tok",
              "min_n_tok", "max_n_tok", "sum_n_tok", "count_n_tok"]:
        np.testing.assert_array_equal(got[c].to_numpy(), want[c].to_numpy(), err_msg=c)


def test_ohlc_matches_bruteforce(micro_dir, micro_df):
    got = rollup.ohlc(_clean_ds(micro_dir), 3600).to_pandas()
    want = _ohlc_oracle(oracle.clean(micro_df), 3600)
    _cmp_ohlc(got, want)


def test_ohlc_tier_from_tier_exact(micro_dir, micro_df):
    """1d candles reaggregated from the 1h PARTIAL tier == 1d from raw:
    the packed arg-extreme rebasing is exact across tier widths."""
    h1 = rollup.ohlc_partial_tier(_clean_ds(micro_dir), 3600)
    d_from_h = rollup.ohlc_from_ohlc(h1, 86400).to_pandas()
    _cmp_ohlc(d_from_h, _ohlc_oracle(oracle.clean(micro_df), 86400))
    # hash-shuffle combine path identical
    h1b = rollup.ohlc_partial_tier(_clean_ds(micro_dir), 3600, hash_combine=True)
    d2 = rollup.ohlc_from_ohlc(h1b, 86400, hash_combine=True).to_pandas()
    _cmp_ohlc(d2, _ohlc_oracle(oracle.clean(micro_df), 86400))


def test_ohlc_pack_bounds_rejected():
    """Values outside the packable range must raise, not silently corrupt."""
    import pyarrow as pa
    import pytest

    def tbl(n_tok, seq):
        return pa.table({
            "source": ["s"], "time": pa.array([1000], pa.int64()),
            "seq": pa.array([seq], pa.int32()),
            "n_tok": pa.array([n_tok], pa.int32()),
        })

    rollup.partial_ohlc_batch(tbl(1, 0), 3600)  # in range: fine
    with pytest.raises(ValueError):
        rollup.partial_ohlc_batch(tbl(1 << 20, 0), 3600)
    with pytest.raises(ValueError):
        rollup.partial_ohlc_batch(tbl(1, 1 << 14), 3600)


def test_realtime_rollup_matches_full(micro_dir, micro_df):
    """Frozen materialized tier (history only) ∪ fresh tail rollup == the
    full-data rollup, including watermark flooring to the bucket grid."""
    import pyarrow as pa
    import pyarrow.compute as pc

    clean = oracle.clean(micro_df)
    wm = int(clean["time"].quantile(0.6))  # deliberately NOT hour-aligned
    wm_floor = (wm // 3600) * 3600
    ds = _clean_ds(micro_dir)

    def hist_b(b):
        return b.filter(pc.less(pc.cast(b["time"], pa.int64()),
                                pa.scalar(wm_floor, pa.int64())))

    tier = rollup.rollup(ds.map_batches(hist_b, batch_format="pyarrow"), 3600)
    got = rollup.realtime_rollup(tier, _clean_ds(micro_dir), 3600, wm).to_pandas()
    _cmp(got, oracle.rollup(clean, 3600))
    # every bucket appears exactly once (no frozen/fresh overlap)
    assert not got.duplicated(["source", "bucket"]).any()


def test_calendar_month_rollup(micro_dir, micro_df):
    """Month buckets via floor_temporal == pandas month-start flooring."""
    got = rollup.rollup_calendar(_clean_ds(micro_dir), "month").to_pandas()
    clean = oracle.clean(micro_df)
    ts = pd.to_datetime(clean["time"], unit="s", utc=True)
    clean = clean.assign(
        bucket=(ts.dt.tz_localize(None).dt.to_period("M").dt.start_time
                .astype("int64") // 10**9)
    )
    want = (
        clean.groupby(["source", "bucket"])["n_tok"]
        .agg(min_n_tok="min", max_n_tok="max", sum_n_tok="sum",
             count_n_tok="size")
        .reset_index()
    )
    want["mean_n_tok"] = want["sum_n_tok"] / want["count_n_tok"]
    _cmp(got, want)


def test_first_per_bucket_reconstruction(micro_dir, micro_df):
    """Throttle rows carry the exact (time, seq, value) of the earliest
    point per (source, bucket)."""
    got = (
        rollup.first_per_bucket(_clean_ds(micro_dir), 300)
        .to_pandas().sort_values(["source", "bucket"]).reset_index(drop=True)
    )
    clean = oracle.clean(micro_df).copy()
    clean["bucket"] = (clean["time"] // 300) * 300
    want = (
        clean.sort_values(["source", "bucket", "time", "seq"], kind="stable")
        .groupby(["source", "bucket"], sort=False)
        .first()
        .reset_index()
        .sort_values(["source", "bucket"]).reset_index(drop=True)
    )
    assert len(got) == len(want)
    for c in ["source", "bucket", "time", "seq", "n_tok"]:
        np.testing.assert_array_equal(got[c].to_numpy(), want[c].to_numpy(), err_msg=c)


def test_hist_tier_quantiles_match_raw():
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd
    from aisdb_ray.stages import rollup

    rng = np.random.default_rng(41)
    n = 30_000
    df = pd.DataFrame({
        "source": rng.choice([f"s{i}" for i in range(6)], n),
        "time": rng.integers(0, 5 * 86400, n).astype(np.int64),
        "n_tok": rng.integers(1, 400, n).astype(np.int32),
    })
    ds = rd.from_pandas(df).repartition(8)
    h1 = rollup.hist_tier(ds, 3600)
    d1 = rollup.hist_retier(h1, 86400)
    got = rollup.tier_quantiles(d1, ps=(50, 95)).to_pandas()
    got = got.sort_values(["source", "bucket"]).reset_index(drop=True)

    def q(vals, p):
        v = np.sort(vals)
        tot = len(v)
        rank = (p * tot + 99) // 100
        return int(v[rank - 1])

    df["bucket"] = (df["time"] // 86400) * 86400
    want = (df.groupby(["source", "bucket"])
            .agg(p50=("n_tok", lambda s: q(s.to_numpy(), 50)),
                 p95=("n_tok", lambda s: q(s.to_numpy(), 95)))
            .reset_index().sort_values(["source", "bucket"])
            .reset_index(drop=True))
    assert len(got) == len(want)
    for c in ["p50", "p95"]:
        np.testing.assert_array_equal(
            got[c].to_numpy(np.int64), want[c].to_numpy(np.int64), err_msg=c
        )
    # tier-from-tier == tier-from-raw (associativity of count-per-value)
    direct = rollup.tier_quantiles(
        rollup.hist_tier(ds, 86400), ps=(50, 95)
    ).to_pandas().sort_values(["source", "bucket"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, direct)


def test_weighted_hist_tier_quantiles():
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from aisdb_ray.stages import rollup

    rng = np.random.default_rng(61)
    n = 5_000
    df = pd.DataFrame({
        "source": rng.choice(["a", "b"], n),
        "time": rng.integers(0, 2 * 86400, n).astype(np.int64),
        "n_tok": rng.integers(1, 60, n).astype(np.int32),
        "w": rng.integers(1, 100, n).astype(np.int64),
    })
    h = rollup.hist_tier(rd.from_pandas(df).repartition(4), 86400,
                         weight="w")
    got = rollup.tier_quantiles(h, ps=(50,)).to_pandas()
    got = got.sort_values(["source", "bucket"]).reset_index(drop=True)

    def wq(g, p):
        g = g.sort_values("n_tok")
        cum = g["w"].cumsum().to_numpy()
        tot = int(cum[-1])
        rank = (p * tot + 99) // 100
        return int(g["n_tok"].to_numpy()[np.searchsorted(cum, rank)])

    df["bucket"] = (df["time"] // 86400) * 86400
    want = (df.groupby(["source", "bucket"])
            .apply(lambda g: wq(g, 50), include_groups=False)
            .reset_index(name="p50")
            .sort_values(["source", "bucket"]).reset_index(drop=True))
    np.testing.assert_array_equal(got["p50"].to_numpy(np.int64),
                                  want["p50"].to_numpy(np.int64))


def test_mode_per_key_ignores_null_values():
    """Mode is over NON-null values (oracle.mode_per_key / SQL mode()):
    a null strict-majority must not win, and an all-null key emits no
    row."""
    import pyarrow as pa

    from aisdb_ray.stages import modeagg

    t = pa.table({
        "source": pa.array(["a", "a", "a", "b", "b"]),
        "v": pa.array([None, None, 7, None, None], pa.int64()),
    })
    got = modeagg.mode_per_key(rd.from_arrow(t), "source", "v").to_pandas()
    assert list(got.source) == ["a"]
    assert int(got.mode_value.iloc[0]) == 7 and int(got.mode_count.iloc[0]) == 1


def test_bucket_rejects_negative_epochs():
    """Truncating buckets disagree with the floor-based kernels on
    negative epochs — the bucket-domain contract refuses them loudly."""
    import pyarrow as pa
    import pytest

    t = pa.table({
        "source": pa.array(["s", "s"]),
        "time": pa.array([-61, 100], pa.int64()),
        "n_tok": pa.array([1, 2], pa.int64()),
    })
    with pytest.raises(Exception, match="negative epochs"):
        rollup.rollup(rd.from_arrow(t), 60).take_all()
