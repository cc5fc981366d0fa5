"""Last-touch attribution over the events table."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory) -> str:
    d = tmp_path_factory.mktemp("evattr")
    us = pa.scalar(1_000_000)

    def ts(sec):
        return sec * 1_000_000

    t = pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "ts": pa.array(
            [ts(1), ts(2), ts(3), ts(1), ts(2), ts(2)], pa.timestamp("us")
        ),
        "user_id": pa.array(["A", "A", "A", "B", "B", "B"]),
        "event_type": pa.array(
            ["view", "purchase", "purchase", "purchase", "click", "purchase"]
        ),
        "value": pa.array([0.0, 1.0, 2.0, 9.0, 0.0, 3.5], pa.float64()),
        "props": pa.array(["{}"] * 6),
    })
    pq.write_table(t, os.path.join(d, "events.parquet"))
    return str(d)


def test_last_touch_attribution_hand_case(events_dir):
    from aisdb_ray.pipelines.queries import q_ev_attribution

    got = q_ev_attribution(events_dir).to_pandas().set_index("event_type")
    # user A: both purchases credit the t=1 view (100 + 200 cents)
    assert got.loc["view", "n_purchases"] == 2
    assert got.loc["view", "spend_cents"] == 300
    # user B: t=1 purchase has no predecessor (dropped); the t=2 purchase
    # (event_id 6) follows the t=2 click (event_id 5) in (t, id) order
    assert got.loc["click", "n_purchases"] == 1
    assert got.loc["click", "spend_cents"] == 350
    assert got["n_purchases"].sum() == 3
