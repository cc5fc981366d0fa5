"""pattern_search sliding-distance kernel and best_split argmax rule."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from aisdb_ray.stages.changepoint import best_split
from aisdb_ray.stages.subseq import pattern_search


def _series_table(rows):
    src, seg, t, seq, v = zip(*rows)
    return pa.table({
        "source": pa.array(src, pa.string()),
        "seg": pa.array(seg, pa.int64()),
        "time": pa.array(t, pa.int64()),
        "seq": pa.array(seq, pa.int64()),
        "n_tok": pa.array(v, pa.int64()),
    })


def _brute_pattern(rows, q, k):
    """Reference: enumerate every in-run window, sort, take k."""
    q = np.asarray(q, np.int64)
    m = len(q)
    rows = sorted(rows, key=lambda r: (r[0], r[1], r[2], r[3]))
    out = []
    for i in range(len(rows) - m + 1):
        win = rows[i:i + m]
        if any((w[0], w[1]) != (win[0][0], win[0][1]) for w in win):
            continue
        d = int(sum((int(w[4]) - int(qj)) ** 2 for w, qj in zip(win, q)))
        out.append((d, win[0][0], win[0][2], win[0][3]))
    out.sort()
    return out[:k]


def test_pattern_search_matches_bruteforce():
    rng = np.random.default_rng(7)
    rows = []
    for s in ("a", "b", "c"):
        t = 0
        for seg in range(3):
            for j in range(rng.integers(2, 15)):
                rows.append((s, seg, t, 0, int(rng.integers(0, 50))))
                t += 60
            t += 10_000
    q = [5, 10, 20, 10]
    got = (
        pattern_search(rd.from_arrow(_series_table(rows)), q, "n_tok", k=8)
        .to_pandas()
    )
    exp = _brute_pattern(rows, q, 8)
    assert [
        (int(r.dist), r.source, int(r.start_time), int(r.start_seq))
        for r in got.itertuples()
    ] == exp


def test_pattern_search_never_crosses_segment_or_source():
    # two perfect matches split across a seg boundary / a source boundary
    rows = [
        ("a", 0, 0, 0, 1), ("a", 0, 60, 0, 2),
        ("a", 1, 20000, 0, 1), ("a", 1, 20060, 0, 2),
        ("b", 0, 0, 0, 1), ("b", 0, 60, 0, 2),
    ]
    got = (
        pattern_search(rd.from_arrow(_series_table(rows)), [1, 2, 1, 2],
                       "n_tok", k=5)
        .to_pandas()
    )
    assert len(got) == 0  # no length-4 window fits inside any single run


def test_pattern_search_exact_hit_ranks_first():
    q = [3, 9, 27]
    rows = [("a", 0, 60 * i, 0, v)
            for i, v in enumerate([5, 3, 9, 27, 5, 3, 9, 28])]
    got = (
        pattern_search(rd.from_arrow(_series_table(rows)), q, "n_tok", k=2)
        .to_pandas()
    )
    assert got["dist"].tolist() == [0, 1]
    assert got["start_time"].tolist() == [60, 300]


def _bucket_table(groups):
    src, bkt, y = [], [], []
    for s, ys in groups.items():
        for i, v in enumerate(ys):
            src.append(s)
            bkt.append(300 * i)
            y.append(int(v))
    return pa.table({
        "source": pa.array(src, pa.string()),
        "bucket": pa.array(bkt, pa.int64()),
        "n_tok": pa.array(y, pa.int64()),
    })


def _brute_split(ys):
    n = len(ys)
    best = None
    for t in range(1, n):
        sl, sr = sum(ys[:t]), sum(ys[t:])
        gain = float(sl * sl) / t + float(sr * sr) / (n - t)
        key = (-gain, 300 * t)
        if best is None or key < best[0]:
            best = (key, (300 * t, t, n - t, sl, sr, gain))
    return best[1]


def test_best_split_matches_bruteforce():
    rng = np.random.default_rng(11)
    groups = {
        f"s{i}": rng.integers(0, 100, size=int(rng.integers(2, 40))).tolist()
        for i in range(6)
    }
    got = (
        best_split(rd.from_arrow(_bucket_table(groups)), "source", "bucket",
                   "n_tok")
        .to_pandas().sort_values("source").reset_index(drop=True)
    )
    assert len(got) == 6
    for r in got.itertuples():
        cp, nl, nr, sl, sr, g = _brute_split(groups[r.source])
        assert (int(r.cp_time), int(r.n_left), int(r.n_right),
                int(r.sum_left), int(r.sum_right)) == (cp, nl, nr, sl, sr)
        assert r.gain == g


def test_best_split_tie_breaks_earliest_and_skips_singletons():
    # constant series: every split ties on gain -> earliest split wins
    groups = {"flat": [7, 7, 7, 7], "one": [42]}
    got = best_split(
        rd.from_arrow(_bucket_table(groups)), "source", "bucket", "n_tok"
    ).to_pandas()
    assert got["source"].tolist() == ["flat"]  # singleton has no candidate
    assert int(got["cp_time"].iloc[0]) == 300


def test_best_split_overflow_guard():
    groups = {"big": [2_000_000_000, 2_000_000_000]}
    with pytest.raises(OverflowError):
        best_split(
            rd.from_arrow(_bucket_table(groups)), "source", "bucket", "n_tok"
        ).to_pandas()


def test_best_split_mixed_sign_prefix_overflow_raises():
    """tot = 0 but a 4e9 prefix: the square would wrap int64 and corrupt
    the argmax — the guard must bound PREFIX sums, not totals."""
    t = pa.table({
        "source": pa.array(["s"] * 3),
        "bucket": pa.array([1, 2, 3], pa.int64()),
        "v": pa.array([4_000_000_000, -4_000_000_000, 0], pa.int64()),
    })
    with pytest.raises(OverflowError, match="prefix"):
        best_split(rd.from_arrow(t), "source", "bucket", "v").take_all()


def test_best_split_int_keys_empty_partition_schema():
    """Int64 keys: empty partitions must not emit a string-typed source
    column (block schema unification would fail)."""
    t = pa.table({
        "k": pa.array([7, 7, 8], pa.int64()),
        "bucket": pa.array([1, 2, 1], pa.int64()),
        "v": pa.array([10, 20, 5], pa.int64()),
    })
    out = best_split(rd.from_arrow(t), "k", "bucket", "v", num_parts=4)
    df = out.to_pandas()
    assert set(df.source) == {7}  # key 8 has 1 bucket: no split
    assert df.source.dtype.kind == "i"


def test_pattern_search_overflow_guard():
    """|v| past the exact-int64 bound must raise, not silently rank the
    farthest window first."""
    q = [0, 0]
    t = pa.table({
        "source": pa.array(["s"] * 4),
        "seg": pa.array([0] * 4, pa.int64()),
        "time": pa.array([1, 2, 3, 4], pa.int64()),
        "seq": pa.array([1, 2, 3, 4], pa.int64()),
        "v": pa.array([4_000_000_000] * 4, pa.int64()),
    })
    with pytest.raises(Exception) as ei:
        pattern_search(rd.from_arrow(t), q, "v", k=2).take_all()
    assert "OverflowError" in str(ei.value) or isinstance(
        ei.value, OverflowError)
    with pytest.raises(OverflowError):
        pattern_search(rd.from_arrow(t), [5_000_000_000], "v", k=2)
