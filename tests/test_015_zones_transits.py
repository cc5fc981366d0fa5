"""Zone containment (J6) + transit stats (A2 rich form) kernel semantics."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from aisdb_ray.stages import transits
from aisdb_ray.stages.zones import DEFAULT_ZONE, Domain, assign_zones


def test_domain_fallback_and_nearest():
    dom = Domain([
        ("B", 0.0, 0.0, 10.0, 10.0),
        ("A", 4.0, 0.0, 10.0, 10.0),
    ])
    x = np.array([0.0, 4.0, 100.0, 2.0])
    y = np.array([0.0, 0.0, 100.0, 0.0])
    z = dom.assign(x, y)
    assert z[0] == "B" and z[1] == "A"          # nearest center wins
    assert z[2] == DEFAULT_ZONE                 # fallback outside all zones
    assert z[3] == "A"                          # equidistant -> first name


def test_domain_tie_breaks_to_first_name():
    # identical zones, different names: strict < keeps the earlier name
    dom = Domain([("Z9", 0.0, 0.0, 5.0, 5.0), ("Z1", 0.0, 0.0, 5.0, 5.0)])
    z = dom.assign(np.array([1.0]), np.array([1.0]))
    assert z[0] == "Z1"


def test_prune_never_changes_result():
    # points exactly on the ellipse boundary survive the bbox prune
    dom = Domain([("E", 0.0, 0.0, 3.0, 2.0)])
    z = dom.assign(np.array([3.0, -3.0, 0.0, 3.01]),
                   np.array([0.0, 0.0, 2.0, 0.0]))
    assert list(z) == ["E", "E", "E", DEFAULT_ZONE]


def test_assign_zones_dataset():
    t = pa.table({"x": pa.array([0.0, 50.0]), "y": pa.array([0.0, 50.0])})
    dom = Domain([("Q", 0.0, 0.0, 1.0, 1.0)])
    out = assign_zones(rd.from_arrow(t), dom, "x", "y").to_pandas()
    assert list(out["zone"]) == ["Q", DEFAULT_ZONE]


def _mk_group(times, vals, segs, zones, source="s0"):
    n = len(times)
    return pa.table({
        "source": pa.array([source] * n),
        "doc_id": pa.array([f"{source}:{t:010d}:0000" for t in times]),
        "time": pa.array(np.asarray(times, np.int64)),
        "seq": pa.array(np.arange(n, dtype=np.int32)),
        "n_tok": pa.array(np.asarray(vals, np.int32)),
        "seg": pa.array(np.asarray(segs, np.int64)),
        "zone": pa.array(zones),
    })


def test_transit_stats_closed_form():
    # seg 0: 3 points, 60s apart, values 10 -> 40 -> 20
    # seg 1: single point (no hops -> null rates)
    g = _mk_group(
        times=[0, 60, 120, 10_000],
        vals=[10, 40, 20, 7],
        segs=[0, 0, 0, 1],
        zones=["A", "B", "C", "D"],
    )
    out = transits.transit_stats_group(g, band_lo=15, band_hi=50).to_pandas()
    out = out.sort_values("seg").reset_index(drop=True)
    s0 = out.iloc[0]
    assert (s0["src_zone"], s0["rcv_zone"], s0["transit_nodes"]) == ("A", "C", "A_C")
    assert s0["t_start"] == 0 and s0["t_end"] == 120 and s0["n_rows"] == 3
    assert s0["total_delta"] == abs(20 - 10) == 10
    assert s0["cum_delta"] == 30 + 20
    assert s0["n_hops"] == 2
    # rates: 30/60 = 0.5 -> 500000 ; 20/60 -> floor(333333.33) = 333333
    assert s0["rate_min_e6"] == 333333 and s0["rate_max_e6"] == 500000
    assert s0["rate_avg_e6"] == (500000 + 333333) / 2
    # band [15,50]: hop1 endpoints (10,40) -> 10 out of band; hop2 (40,20) in
    assert s0["sec_in_band"] == 60
    assert s0["minutes_in_seg"] == 2.0
    # epoch 0 = 1970-01-01
    assert (s0["year"], s0["month"], s0["day"]) == (1970, 1, 1)

    s1 = out.iloc[1]
    assert s1["n_rows"] == 1 and s1["n_hops"] == 0 and s1["cum_delta"] == 0
    assert pd.isna(s1["rate_min_e6"]) and pd.isna(s1["rate_avg_e6"])
    assert s1["transit_nodes"] == "D_D"


def test_transit_stats_zero_dt_hops_excluded_from_rate():
    # two rows at the same epoch (seq disambiguates): dv counts toward
    # cum_delta, but no rate and no band seconds
    g = _mk_group(
        times=[0, 0, 60],
        vals=[10, 30, 30],
        segs=[0, 0, 0],
        zones=["A", "A", "A"],
    )
    out = transits.transit_stats_group(g, 0, 100).to_pandas()
    assert out["cum_delta"][0] == 20
    assert out["n_hops"][0] == 1          # only the dt=60 hop is rated
    assert out["rate_min_e6"][0] == 0     # |30-30| / 60 -> 0
    assert out["sec_in_band"][0] == 60


def test_transit_stats_unsorted_input_resorted():
    g = _mk_group(
        times=[120, 0, 60],
        vals=[20, 10, 40],
        segs=[0, 0, 0],
        zones=["C", "A", "B"],
    )
    out = transits.transit_stats_group(g, 0, 10_000).to_pandas()
    assert out["src_zone"][0] == "A" and out["rcv_zone"][0] == "C"
    assert out["total_delta"][0] == 10


def test_transition_counts_ordering_and_boundaries():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from aisdb_ray.stages.transits import transition_counts

    t = pa.table({
        "user_id": pa.array([1, 1, 1, 2, 2, 3], pa.int64()),
        "ts_us": pa.array([10, 20, 20, 5, 1, 9], pa.int64()),
        "event_id": pa.array([100, 101, 102, 201, 200, 300], pa.int64()),
        "event_type": ["a", "b", "c", "x", "y", "z"],
    })
    got = (
        transition_counts(rd.from_arrow(t), num_parts=2)
        .to_pandas().sort_values(["from_label", "to_label"]).reset_index(drop=True)
    )
    # user 1 ordered by (ts, event_id): a->b->c; user 2: y(t=1)->x(t=5);
    # user 3 single event: nothing; no cross-user pairs
    assert got.values.tolist() == [["a", "b", 1], ["b", "c", 1], ["y", "x", 1]]


def test_domain_rejects_nan_radius():
    import pytest

    with pytest.raises(ValueError, match="radii"):
        Domain([("Z1", 0.0, 0.0, float("nan"), 5.0)])
    with pytest.raises(ValueError, match="radii"):
        Domain([("Z1", 0.0, 0.0, 1.0, 0.0)])


def test_transition_counts_null_label_matches_sql_lead_semantics():
    """A mid-sequence null label is indistinguishable from lead()'s
    partition-end null in the oracle (WHERE nxt IS NOT NULL), so pairs
    into a null label must drop; pairs FROM a null label group as NULL."""
    t = pa.table({
        "user_id": pa.array(["u"] * 4),
        "event_type": pa.array(["A", None, "B", "C"]),
        "ts_us": pa.array([1, 2, 3, 4], pa.int64()),
        "event_id": pa.array([1, 2, 3, 4], pa.int64()),
    })
    got = transits.transition_counts(
        rd.from_arrow(t), key="user_id", label="event_type",
        time_col="ts_us", seq_col="event_id",
    ).to_pandas()
    import duckdb

    want = duckdb.sql("""WITH s AS (
        SELECT event_type, lead(event_type) OVER (PARTITION BY user_id
            ORDER BY ts_us, event_id) AS nxt FROM t)
      SELECT event_type AS from_label, nxt AS to_label,
             CAST(count(*) AS BIGINT) AS n
      FROM s WHERE nxt IS NOT NULL GROUP BY event_type, nxt""").df()
    key = ["from_label", "to_label"]
    got = got.sort_values(key, na_position="first").reset_index(drop=True)
    want = want.sort_values(key, na_position="first").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[want.columns], want)


def test_trigram_counts_null_label_matches_sql_lead_semantics():
    t = pa.table({
        "user_id": pa.array(["u"] * 5),
        "event_type": pa.array(["A", "B", None, "C", "D"]),
        "ts_us": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
    })
    got = transits.path_trigram_counts(
        rd.from_arrow(t), key="user_id", label="event_type",
        time_col="ts_us", seq_col="event_id",
    ).to_pandas()
    import duckdb

    want = duckdb.sql("""WITH s AS (
        SELECT event_type AS l1, lead(event_type, 1) OVER w AS l2,
               lead(event_type, 2) OVER w AS l3
        FROM t WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id))
      SELECT l1, l2, l3, CAST(count(*) AS BIGINT) AS n
      FROM s WHERE l2 IS NOT NULL AND l3 IS NOT NULL
      GROUP BY l1, l2, l3""").df()
    key = ["l1", "l2", "l3"]
    got = got.sort_values(key, na_position="first").reset_index(drop=True)
    want = want.sort_values(key, na_position="first").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[want.columns], want)
