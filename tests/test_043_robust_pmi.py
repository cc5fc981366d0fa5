"""fano_dispersion zero-minute rule, winsorized_mean clamp rule, pmi_topk."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from aisdb_ray.stages.robust import fano_dispersion, winsorized_mean
from aisdb_ray.stages.tokstats import pmi_topk


def _series(rows):
    src, t = zip(*rows)
    return pa.table({
        "source": pa.array(src, pa.string()),
        "time": pa.array(t, pa.int64()),
    })


def test_fano_counts_zero_minutes_in_span():
    # source a: rows in minutes 0 and 2 (minute 1 empty) -> n=3, counts
    # [2, 0, 1]: S=3, Q=5, fano = (3*5-9)/(3*3) = 6/9
    rows = [("a", 5), ("a", 20), ("a", 130)]
    got = fano_dispersion(rd.from_arrow(_series(rows))).to_pandas()
    assert got["n_minutes"].tolist() == [3]
    assert got["n_rows"].tolist() == [3]
    assert got["sum_sq"].tolist() == [5]
    assert got["fano"].iloc[0] == 6.0 / 9.0


def test_fano_poisson_like_vs_bursty():
    # uniform 1/minute -> fano 0 (no variance); all in one minute -> large
    uni = [("u", 60 * i) for i in range(50)]
    burst = [("b", 0)] * 50 + [("b", 60 * 49)]
    got = (
        fano_dispersion(rd.from_arrow(_series(uni + burst)))
        .to_pandas().set_index("source")
    )
    assert got.loc["u", "fano"] == 0.0
    assert got.loc["b", "fano"] > 10.0


def _valued(rows):
    src, v = zip(*rows)
    return pa.table({
        "source": pa.array(src, pa.string()),
        "n_tok": pa.array(v, pa.int64()),
    })


def test_winsorized_mean_matches_bruteforce():
    rng = np.random.default_rng(3)
    rows = []
    for s in ("a", "b", "c"):
        for v in rng.integers(0, 1000, size=int(rng.integers(5, 200))):
            rows.append((s, int(v)))
    got = (
        winsorized_mean(rd.from_arrow(_valued(rows)), "source", "n_tok",
                        p_lo=10, p_hi=90)
        .to_pandas().set_index("source")
    )

    def disc_q(vals, p):
        vals = sorted(vals)
        tot = len(vals)
        cum = 0
        seen = {}
        for v in vals:
            cum += 1
            if v not in seen:
                seen[v] = cum
        # smallest v whose cumulative count reaches the threshold
        th = (p * tot + 99) // 100
        cums = {}
        c = 0
        for v in vals:
            c += 1
            cums[v] = c
        for v in sorted(cums):
            if cums[v] >= th:
                return v
        return vals[-1]

    for s in ("a", "b", "c"):
        vals = [v for k, v in rows if k == s]
        lo, hi = disc_q(vals, 10), disc_q(vals, 90)
        ws = sum(min(max(v, lo), hi) for v in vals)
        assert int(got.loc[s, "lo"]) == lo
        assert int(got.loc[s, "hi"]) == hi
        assert int(got.loc[s, "wsum"]) == ws
        assert got.loc[s, "wmean"] == ws / len(vals)


def test_winsorize_constant_series_is_identity():
    rows = [("k", 7)] * 9
    got = winsorized_mean(
        rd.from_arrow(_valued(rows)), "source", "n_tok"
    ).to_pandas()
    assert got["lo"].tolist() == [7] and got["hi"].tolist() == [7]
    assert got["wmean"].tolist() == [7.0]


def _tok_table(docs):
    return pa.table({
        "doc_id": pa.array([f"d{i}" for i in range(len(docs))], pa.string()),
        "tokens": pa.array(docs, pa.list_(pa.int32())),
        "n_tok": pa.array([len(d) for d in docs], pa.int32()),
        "source": pa.array(["s"] * len(docs), pa.string()),
    })


def test_pmi_ranks_exclusive_pair_above_promiscuous():
    # (1,2) always co-occur and appear nowhere else; 3 is everywhere, so
    # (3,3) has high counts but low PMI
    docs = [[1, 2, 3, 3, 3] for _ in range(6)] + [[3, 3, 3, 3]] * 6
    got = pmi_topk(rd.from_arrow(_tok_table(docs)), k=10, min_count=3).to_pandas()
    assert (int(got["tok_a"].iloc[0]), int(got["tok_b"].iloc[0])) == (1, 2)
    # exact ratio: c_12=6, c_1=6, c_2=6, T = sum(n_tok)-rows = 54-12=42
    assert got["pmi_ratio"].iloc[0] == (6 * 42) / (6 * 6)
    top_pairs = set(zip(got["tok_a"].tolist(), got["tok_b"].tolist()))
    assert (3, 3) in top_pairs  # present, but ranked below
    r33 = got.set_index(["tok_a", "tok_b"]).loc[(3, 3), "pmi_ratio"]
    assert r33 < got["pmi_ratio"].iloc[0]


def test_pmi_min_count_filters_rare_pairs():
    docs = [[1, 2]] * 2 + [[5, 6]] * 4
    got = pmi_topk(rd.from_arrow(_tok_table(docs)), k=10, min_count=3).to_pandas()
    pairs = set(zip(got["tok_a"].tolist(), got["tok_b"].tolist()))
    assert (5, 6) in pairs and (1, 2) not in pairs


def test_fano_and_winsorized_drop_null_rows():
    """Null key/time/value rows drop (skip-bad) instead of crashing the
    object lexsort or NaN-casting into int64 garbage."""
    t = pa.table({
        "source": pa.array(["a", None, "a"]),
        "time": pa.array([0, 60, None], pa.int64()),
    })
    got = fano_dispersion(rd.from_arrow(t)).to_pandas()
    assert list(got.source) == ["a"] and int(got.n_rows.iloc[0]) == 1
    t2 = pa.table({
        "source": pa.array(["a", "a", None, "a"]),
        "v": pa.array([1, 5, 3, None], pa.int64()),
    })
    w = winsorized_mean(rd.from_arrow(t2), "source", "v",
                        p_lo=0, p_hi=100).to_pandas()
    assert list(w.source) == ["a"] and int(w.n.iloc[0]) == 2


def test_fano_guard_is_per_key_not_cross_key():
    """Key A: long span, tiny counts; key B: short span, big counts.
    No single key overflows — the old cross-key max product spuriously
    raised."""
    rows_a = [("a", int(m) * 60) for m in range(0, 3000)]
    big = 1 << 22
    t = pa.table({
        "source": pa.array(["b", "b"] + [r[0] for r in rows_a]),
        "time": pa.array([0, 60] + [r[1] for r in rows_a], pa.int64()),
    })
    # inflate b's counts via duplicate rows in the same minute
    import numpy as np
    dup = pa.table({
        "source": pa.array(["b"] * 4096),
        "time": pa.array(np.zeros(4096, np.int64)),
    })
    ds = rd.from_arrow(pa.concat_tables([t, dup]))
    got = fano_dispersion(ds).to_pandas()
    assert set(got.source) == {"a", "b"}


def test_winsorized_overflow_guard():
    import pytest

    t = pa.table({
        "source": pa.array(["a"] * 3),
        "v": pa.array([1 << 40] * 3, pa.int64()),
    })
    # 3 * 2^40 is fine; make the count big enough to cross 2^62
    big = pa.table({
        "source": pa.array(["a"] * 5000),
        "v": pa.array([1 << 50] * 5000, pa.int64()),
    })
    ok = winsorized_mean(rd.from_arrow(t), "source", "v").to_pandas()
    assert len(ok) == 1
    with pytest.raises(Exception, match="[Oo]verflow"):
        winsorized_mean(rd.from_arrow(big), "source", "v").take_all()
