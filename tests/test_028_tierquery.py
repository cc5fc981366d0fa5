"""Tier-stitching plan: disjoint, aligned, covering — for any range."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from aisdb_ray.pipelines.tierquery import RAW, tier_plan

WIDTHS = (60, 3600, 86400)


@settings(max_examples=300, deadline=None)
@given(
    t0=st.integers(min_value=0, max_value=40 * 86400),
    span=st.integers(min_value=0, max_value=40 * 86400),
)
def test_plan_partitions_any_range(t0, span):
    t1 = t0 + span
    pieces = tier_plan(t0, t1, WIDTHS)
    if span == 0:
        assert pieces == []
        return
    # pieces chain exactly from t0 to t1 (disjoint + covering)
    cur = t0
    for w, lo, hi in pieces:
        assert lo == cur and hi > lo
        if w != RAW:
            assert lo % w == 0 and hi % w == 0  # fully-covered tier buckets
        cur = hi
    assert cur == t1
    # each width appears at most twice (left climb + right descend)
    ws = [w for w, _, _ in pieces]
    for w in set(ws):
        assert ws.count(w) <= 2
    # widest possible middle: any full day inside the range is served by 1d
    import math
    first_day = math.ceil(t0 / 86400) * 86400
    last_day = (t1 // 86400) * 86400
    if last_day - first_day >= 86400:
        assert any(w == 86400 for w in ws)


def test_plan_examples():
    # exact decomposition of a known ragged range
    t0 = 37          # raw to :60, 1m to hour, 1h to day, days...
    t1 = 2 * 86400 + 3 * 3600 + 5 * 60 + 9
    pieces = tier_plan(t0, t1, WIDTHS)
    assert pieces == [
        (RAW, 37, 60),
        (60, 60, 3600),
        (3600, 3600, 86400),
        (86400, 86400, 2 * 86400),
        (3600, 2 * 86400, 2 * 86400 + 3 * 3600),
        (60, 2 * 86400 + 3 * 3600, 2 * 86400 + 3 * 3600 + 5 * 60),
        (RAW, 2 * 86400 + 3 * 3600 + 5 * 60, t1),
    ]
    # sub-minute range: raw only
    assert tier_plan(100, 130, WIDTHS) == [(RAW, 100, 130)]
    # exact single day: one 1d piece
    assert tier_plan(86400, 2 * 86400, WIDTHS) == [(86400, 86400, 2 * 86400)]
