"""lag_backtest pairing rules and interval_overlap_pairs bin-dedup."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from aisdb_ray.stages.join import interval_overlap_pairs
from aisdb_ray.stages.window import lag_backtest


def _buckets(source, pairs):
    t, v = zip(*pairs)
    return pa.table({
        "source": pa.array([source] * len(t)),
        "bucket": pa.array(np.asarray(t, np.int64)),
        "sum_n_tok": pa.array(np.asarray(v, np.int64)),
    })


def test_lag_backtest_exact_match_only():
    # lag=100: (200,7) pairs with (100,4) -> err 3; (350,9) has no t=250
    # ancestor and must NOT pair with the nearest one
    tbl = _buckets("a", [(100, 4), (200, 7), (350, 9), (450, 1)])
    got = (
        lag_backtest(rd.from_arrow(tbl), "source", "bucket", "sum_n_tok",
                     lag=100, num_parts=2)
        .to_pandas()
    )
    assert len(got) == 1
    r = got.iloc[0]
    # pairs: (200|100) err 3, (450|350) err -8
    assert (r["n_pairs"], r["sae"], r["sse"]) == (2, 11, 73)


def test_lag_backtest_groups_isolated_and_empty_groups_dropped():
    a = _buckets("a", [(0, 5), (100, 6)])
    b = _buckets("b", [(0, 50), (300, 60)])  # no exact lag-100 ancestor
    got = (
        lag_backtest(rd.from_arrow(pa.concat_tables([a, b])),
                     "source", "bucket", "sum_n_tok", lag=100, num_parts=3)
        .to_pandas()
    )
    assert got["source"].tolist() == ["a"]
    assert got.iloc[0]["n_pairs"] == 1 and got.iloc[0]["sae"] == 1


def _intervals(rows):
    return pa.table({
        "source": pa.array([r[0] for r in rows]),
        "gap_start": pa.array(np.asarray([r[1] for r in rows], np.int64)),
        "gap_end": pa.array(np.asarray([r[2] for r in rows], np.int64)),
    })


def _pairs_df(tbl, window_s):
    return (
        interval_overlap_pairs(
            rd.from_arrow(tbl), key="source",
            start="gap_start", end="gap_end",
            window_s=window_s, num_parts=4,
        )
        .to_pandas()
        .sort_values(["key_a", "key_b", "ov_start"])
        .reset_index(drop=True)
    )


def test_overlap_pair_spanning_bins_emitted_once():
    # both intervals span several 100s-wide bins; the pair must appear once
    tbl = _intervals([("a", 50, 420), ("b", 130, 380)])
    got = _pairs_df(tbl, window_s=100)
    assert len(got) == 1
    r = got.iloc[0]
    assert (r["key_a"], r["key_b"]) == ("a", "b")
    assert (r["ov_start"], r["ov_end"], r["overlap_s"]) == (130, 380, 250)


def test_overlap_touching_endpoints_and_same_key_excluded():
    tbl = _intervals([
        ("a", 0, 100),      # touches b at 100 -> no overlap (strict)
        ("b", 100, 200),
        ("a", 300, 400),    # same-key intervals never pair
        ("a", 350, 450),
        ("c", 390, 410),    # overlaps BOTH a-intervals
    ])
    got = _pairs_df(tbl, window_s=1000)
    assert [tuple(r) for r in got[["key_a", "key_b", "ov_start", "ov_end"]]
            .itertuples(index=False)] == [
        ("a", "c", 390, 400),
        ("a", "c", 390, 410),
    ]


def test_overlap_matches_bruteforce_random():
    rng = np.random.default_rng(7)
    rows = []
    for k in range(6):
        t = 0
        for _ in range(20):
            t += int(rng.integers(50, 400))
            d = int(rng.integers(10, 500))
            rows.append((f"s{k}", t, t + d))
            t += d
    tbl = _intervals(rows)
    got = _pairs_df(tbl, window_s=256)
    want = []
    for i in range(len(rows)):
        for j in range(len(rows)):
            ka, sa, ea = rows[i]
            kb, sb, eb = rows[j]
            if ka >= kb:
                continue
            s, e = max(sa, sb), min(ea, eb)
            if s < e:
                want.append((ka, kb, s, e, e - s))
    want.sort()
    got_t = sorted(
        tuple(r) for r in got[
            ["key_a", "key_b", "ov_start", "ov_end", "overlap_s"]
        ].itertuples(index=False)
    )
    assert got_t == want
