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


def test_tier_quantiles_zero_weight_group_dropped():
    """A (key, bucket) whose histogram counts sum to 0 (weighted tier,
    all-zero weights) must be DROPPED, not report the previous group's
    value (searchsorted with rank 0 strayed left)."""
    import pyarrow as pa
    import ray.data as rd

    from aisdb_ray.stages import rollup

    tier = pa.table({
        "source": ["a", "a", "b", "b"],
        "bucket": [0, 0, 0, 0],
        "v": [7, 9, 5, 6],
        "c": [3, 1, 0, 0],  # b's weights all zero
    })
    got = rollup.tier_quantiles(
        rd.from_arrow(tier), ps=(50, 95)
    ).to_pandas()
    assert got["source"].tolist() == ["a"]
    assert got["p50"].iloc[0] == 7 and got["p95"].iloc[0] == 9


def test_tier_plan_rejects_non_nested_widths():
    import pytest

    from aisdb_ray.pipelines.tierquery import tier_plan

    with pytest.raises(ValueError, match="nest"):
        tier_plan(0, 500, (60, 90))


def test_range_aggregate_empty_range_and_value_guard(tmp_path):
    import pytest

    from aisdb_ray.pipelines import tierquery

    # both guards resolve before any file is touched
    out = tierquery.range_aggregate(str(tmp_path), 100, 100)
    assert out.count() == 0
    with pytest.raises(ValueError, match="n_tok"):
        tierquery.range_aggregate(str(tmp_path), 0, 100, value="other")
