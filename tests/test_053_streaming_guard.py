"""Streaming-guard operators: late-data watermark flags, debounce TTL
dedup, and the kept-chain rate limiter (stages/window.py).

Reference analog: the receiver's buffer-flush / out-of-order handling
(/root/reference/receiver/src/receiver.rs) is the streaming intake these
batch-side guards mirror; the TTL dedup generalizes the reference's
keep-first timestamp dedup (aisdb/database/decoder.py) to a time window.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from aisdb_ray.stages import window


def _brute_late(rows, lateness):
    """rows: (g, t, arr); flag vs max-t of prior arrivals in the group."""
    out = []
    by_g = {}
    for g, t, arr in sorted(rows, key=lambda r: (r[0], r[2])):
        wm = by_g.get(g)
        if wm is not None and t < wm - lateness:
            out.append((g, t, arr, wm))
        by_g[g] = t if wm is None else max(wm, t)
    return sorted(out)


def test_late_data_matches_brute_force():
    rng = np.random.default_rng(7)
    n = 4000
    g = rng.integers(0, 5, n)
    t = rng.integers(0, 100_000, n)
    arr = rng.permutation(n)
    tbl = pa.table({
        "g": pa.array([f"s{x}" for x in g]),
        "time": pa.array(t, pa.int64()),
        "arr": pa.array(arr, pa.int64()),
    })
    got = window.late_data(
        rd.from_arrow(tbl), "g", "time", "arr", 5_000, num_parts=4
    ).to_pandas()
    want = _brute_late(
        list(zip([f"s{x}" for x in g], t.tolist(), arr.tolist())), 5_000
    )
    got_rows = sorted(
        zip(got["g"], got["time"], got["arr"], got["watermark"])
    )
    assert got_rows == want


def test_late_data_first_arrival_never_late():
    tbl = pa.table({
        "g": ["a", "a"], "time": pa.array([100, 99], pa.int64()),
        "arr": pa.array([1, 2], pa.int64()),
    })
    out = window.late_data_block(tbl, "g", "time", "arr", 0)
    # second row is 1s late only if lateness < 1; with 0 allowed it IS late
    assert out.num_rows == 1 and out["time"][0].as_py() == 99
    # a single first arrival can never be late
    one = window.late_data_block(tbl.slice(0, 1), "g", "time", "arr", 0)
    assert one.num_rows == 0


def test_debounce_vs_lag_rule():
    rng = np.random.default_rng(11)
    n = 3000
    k = rng.integers(0, 40, n)
    t = np.sort(rng.integers(0, 50_000, n))
    tbl = pa.table({
        "k": pa.array([f"u{x}" for x in k]),
        "time": pa.array(t, pa.int64()),
        "seq": pa.array(np.arange(n), pa.int64()),
    })
    got = window.debounce(
        rd.from_arrow(tbl), ["k"], "time", "seq", ttl=300, num_parts=4
    ).to_pandas()
    # brute: keep iff first in (k) chain by (t, seq) or gap >= ttl
    rows = sorted(zip(k.tolist(), t.tolist(), range(n)))
    keep = set()
    prev = {}
    for kk, tt, ss in rows:
        if kk not in prev or tt - prev[kk] >= 300:
            keep.add((kk, tt, ss))
        prev[kk] = tt
    got_set = {
        (int(r.k[1:]), int(r.time), int(r.seq))
        for r in got.itertuples()
    }
    assert got_set == keep
    assert len(got) < n  # the TTL actually bit


def test_rate_limit_chain_semantics():
    # burst under the TTL collapses to its opening edge + one per TTL
    tbl = pa.table({
        "g": ["x"] * 6 + ["y"],
        "time": pa.array([0, 4, 8, 12, 16, 40, 5], pa.int64()),
    })
    out = window.rate_limit_block(tbl, "g", "time", ttl=10)
    kept = sorted(zip(out["g"].to_pylist(), out["time"].to_pylist()))
    # x: 0 kept; 4,8 under ttl; 12 >= 0+10 kept; 16 < 12+10 dropped;
    # 40 >= 22 kept.  y: single point kept.
    assert kept == [("x", 0), ("x", 12), ("x", 40), ("y", 5)]


def test_rate_limit_distributed_matches_block():
    rng = np.random.default_rng(3)
    n = 5000
    g = rng.integers(0, 7, n)
    t = rng.integers(0, 200_000, n)
    tbl = pa.table({
        "g": pa.array([f"s{x}" for x in g]),
        "time": pa.array(t, pa.int64()),
    })
    whole = window.rate_limit_block(tbl, "g", "time", ttl=777)
    dist = window.rate_limit(
        rd.from_arrow(tbl), "g", "time", ttl=777, num_parts=4
    ).to_pandas()
    a = sorted(zip(whole["g"].to_pylist(), whole["time"].to_pylist()))
    b = sorted(zip(dist["g"], dist["time"]))
    assert a == b


def test_rate_limit_rejects_nonpositive_ttl():
    import pytest

    tbl = pa.table({"g": ["a"], "time": pa.array([1], pa.int64())})
    with pytest.raises(ValueError):
        window.rate_limit_block(tbl, "g", "time", ttl=0)


def test_path_trigrams_match_brute_force():
    from collections import Counter

    from aisdb_ray.stages import transits

    rng = np.random.default_rng(13)
    n = 2000
    u = rng.integers(0, 30, n)
    t = np.sort(rng.integers(0, 100_000, n))
    lab = rng.choice(["a", "b", "c"], n)
    tbl = pa.table({
        "user_id": pa.array(u, pa.int64()),
        "ts_us": pa.array(t, pa.int64()),
        "event_id": pa.array(np.arange(n), pa.int64()),
        "event_type": pa.array(lab),
    })
    got = transits.path_trigram_counts(
        rd.from_arrow(tbl), num_parts=4
    ).to_pandas()
    rows = sorted(zip(u.tolist(), t.tolist(), range(n), lab.tolist()))
    want = Counter()
    for i in range(len(rows) - 2):
        if rows[i][0] == rows[i + 1][0] == rows[i + 2][0]:
            want[(rows[i][3], rows[i + 1][3], rows[i + 2][3])] += 1
    got_map = {
        (r.l1, r.l2, r.l3): int(r.n) for r in got.itertuples()
    }
    assert got_map == dict(want)
