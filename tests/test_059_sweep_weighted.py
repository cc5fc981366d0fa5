"""Sweep-line peak concurrency (stages/sweep.py) + sequential Poisson
weighted sampling (stages/sample.weighted_sample).

Peak concurrency properties that matter: the closed-interval tie rule
(an interval ending at t overlaps one starting at t), the cross-bucket
carry (an interval silently spanning a bucket raises later peaks), and
parity with a brute-force point-wise count.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from aisdb_ray.stages import sweep
from aisdb_ray.stages.sample import md5_u32, weighted_sample

H = 3600


def _peaks(intervals, **kw):
    tbl = pa.table(
        {
            "t_start": pa.array([s for s, _ in intervals], pa.int64()),
            "t_end": pa.array([e for _, e in intervals], pa.int64()),
        }
    )
    ds = rd.from_arrow(tbl).repartition(3)
    out = sweep.peak_concurrency(ds, **kw).to_pandas()
    return dict(zip(out["bucket"], out["peak"]))


def test_tie_rule_closed_intervals():
    # one ends at 100, another starts at 100: both open at t=100 -> peak 2
    assert _peaks([(0, 100), (100, 200)]) == {0: 2}


def test_single_point_interval_counts():
    assert _peaks([(50, 50)]) == {0: 1}


def test_carry_across_buckets():
    # interval A spans hours 0..2 silently; hour 2's local sweep alone
    # would report 1 for B, the carry makes it 2.
    got = _peaks([(0, 2 * H + 600), (2 * H + 100, 2 * H + 200)])
    assert got[0] == 1            # A opens
    assert got[2 * H] == 2        # B overlaps the still-open A
    assert 1 * H not in got       # silent bucket: no boundary events


def test_brute_force_parity():
    rng = np.random.default_rng(11)
    s = rng.integers(0, 5 * H, 300)
    e = s + rng.integers(0, 3 * H, 300)
    got = _peaks(list(zip(s.tolist(), e.tolist())))
    # brute force, closed-interval semantics: the open count at ANY
    # instant t is P(t) = #(s<=t & e>=t) — a session ending at t is still
    # open at t; per-bucket peak = max over the bucket's event instants.
    for b in sorted(got):
        vals = []
        for t in np.unique(np.r_[s[(s >= b) & (s < b + H)],
                                 e[(e >= b) & (e < b + H)]]):
            vals.append(int(((s <= t) & (e >= t)).sum()))
        assert got[b] == max(vals), b


def test_weighted_sample_determinism_and_weights():
    n = 500
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n), pa.int64()),
            "w": pa.array(
                np.where(np.arange(n) % 7 == 0, 0, 1 + np.arange(n) % 50),
                pa.int64(),
            ),
        }
    )
    a = weighted_sample(rd.from_arrow(tbl).repartition(5), "doc_id", "w", 25)
    b = weighted_sample(rd.from_arrow(tbl).repartition(2), "doc_id", "w", 25)
    da, db = a.to_pandas(), b.to_pandas()
    assert sorted(da["doc_id"]) == sorted(db["doc_id"])  # partition-invariant
    assert len(da) == 25
    assert (da["w"] > 0).all()  # zero-weight rows never selected
    # exact selection rule: k smallest u/w over positive-weight rows
    u = md5_u32(tbl["doc_id"]).astype(np.float64)
    w = tbl["w"].to_numpy().astype(np.float64)
    r = np.where(w > 0, u / np.where(w > 0, w, 1), np.inf)
    want = set(np.argsort(r, kind="stable")[:25].tolist())
    assert set(da["doc_id"]) == want


def test_weighted_sample_k_exceeds_population():
    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "w": pa.array([1, 0, 5], pa.int64()),
        }
    )
    out = weighted_sample(rd.from_arrow(tbl), "doc_id", "w", 10).to_pandas()
    assert sorted(out["doc_id"]) == [1, 3]


def test_only_end_bucket_counts_closed_sessions():
    """Sessions ending in a bucket are still open AT their end instants:
    a bucket containing only end events peaks at the carry, not carry-1."""
    got = _peaks([(100, H + 200), (200, H + 300), (300, H + 400)])
    assert got[0] == 3
    assert got[H] == 3  # all three still open at their H+2xx end instants


def test_null_interval_bounds_raise():
    import pyarrow as pa
    import pytest

    ds = rd.from_arrow(pa.table({
        "t_start": pa.array([100, None], pa.int64()),
        "t_end": pa.array([200, 300], pa.int64()),
    }))
    with pytest.raises(Exception, match="null interval"):
        sweep.peak_concurrency(ds).take_all()
