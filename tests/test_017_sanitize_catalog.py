"""M5/M6 normalizer + sanitizer and the A4 metadata catalog."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from aisdb_ray.functions.sanitize import sanitize_strings, wrap_value
from aisdb_ray.state import catalog


def test_wrap_value_reference_cases():
    # gis.py docstring: longitude 181 -> -179
    assert wrap_value([181.0])[0] == -179.0
    assert wrap_value([-181.0])[0] == 179.0
    assert wrap_value([540.0])[0] == 180.0 or wrap_value([540.0])[0] == -180.0
    # exact-boundary flip: ±rng -> ∓rng (gis.py:31-33)
    assert wrap_value([180.0])[0] == -180.0
    assert wrap_value([-180.0])[0] == 180.0
    # in-range values unchanged
    np.testing.assert_array_equal(wrap_value([0.0, 45.5, -90.0]), [0.0, 45.5, -90.0])
    # generalized ring
    assert wrap_value([91.0], rng=90.0)[0] == -89.0


def test_sanitize_strings_rules():
    t = pa.table({
        "k": ['a,b', 'x#y"z', "q'r\ns", "-", None, "ok"],
        "n": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
    })
    out = sanitize_strings(t)
    assert out["k"].to_pylist() == ["ab", "xyz", "qrs", "", "", "ok"]
    assert out["n"].to_pylist() == [1, 2, 3, 4, 5, 6]  # non-strings untouched
    # the chr(130) look-alike comma is stripped too (proc_util.py:15-17)
    t2 = pa.table({"k": ["a" + chr(130) + "b"]})
    assert sanitize_strings(t2)["k"].to_pylist() == ["ab"]


@pytest.fixture(scope="module")
def ranged_dir(tmp_path_factory) -> str:
    root = str(tmp_path_factory.mktemp("cat"))
    for i, (lo, hi) in enumerate([(0, 999), (1000, 1999), (5000, 5999)]):
        t = pa.table({"time": np.arange(lo, hi + 1, dtype=np.int64),
                      "v": np.ones(hi - lo + 1)})
        pq.write_table(t, os.path.join(root, f"p{i}.parquet"))
    return root


def test_dataset_range_from_footers(ranged_dir):
    assert catalog.dataset_range(ranged_dir, "time") == (0, 5999)
    rs = catalog.file_ranges(ranged_dir, "time")
    assert [r["min"] for r in rs] == [0, 1000, 5000]
    assert all(r["rows"] == 1000 for r in rs)


def test_validate_range_prunes_and_clamps(ranged_dir):
    r = catalog.validate_range(ranged_dir, "time", 1500, 1700)
    assert r["covered"] and len(r["files"]) == 1 and r["files_total"] == 3
    r2 = catalog.validate_range(ranged_dir, "time", 900, 5200)
    assert len(r2["files"]) == 3  # spans the gap: all overlapping candidates
    r3 = catalog.validate_range(ranged_dir, "time", 100000, 200000)
    assert not r3["covered"] and r3["files"] == []
    # clamped to the dataset's actual extent
    r4 = catalog.validate_range(ranged_dir, "time", -50, 100000)
    assert r4["clamped"] == (0, 5999)


def test_route_files_by_chunk(ranged_dir):
    # M7: footer-range file->chunk routing; the gap chunk gets no files
    routes = catalog.route_files(ranged_dir, "time", 1000)
    assert sorted(routes) == [0, 1000, 5000]
    assert all(len(v) == 1 for v in routes.values())
    # a file spanning two chunks routes to both
    import numpy as np
    import os
    import pyarrow as pa
    import pyarrow.parquet as pq
    wide = pa.table({"time": np.array([500, 1500], np.int64), "v": [1.0, 2.0]})
    pq.write_table(wide, os.path.join(ranged_dir, "wide.parquet"))
    routes2 = catalog.route_files(ranged_dir, "time", 1000)
    hits = [c for c, fs in routes2.items() if any("wide" in f for f in fs)]
    assert sorted(hits) == [0, 1000]


def test_route_files_all_stats_less_refuses_fabricated_chunk(tmp_path):
    """ADVICE r4: when NO file has footer statistics, route_files must not
    invent chunk 0 (a bounded planner would drop rows outside [0, chunk_s));
    without the stats_less out-param it raises, with it the files are
    reported for an unbounded scan and no chunk is fabricated."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    t = pa.table({"time": np.array([5000, 9000], np.int64), "v": [1.0, 2.0]})
    p = tmp_path / "nostats.parquet"
    pq.write_table(t, str(p), write_statistics=False)
    with pytest.raises(ValueError, match="stats_less"):
        catalog.route_files(str(tmp_path), "time", 1000)
    extra: list = []
    routes = catalog.route_files(str(tmp_path), "time", 1000, stats_less=extra)
    assert routes == {} and extra == [str(p)]


def test_wrap_column_passes_nulls_through():
    """One null in a coordinate batch must not crash the wrap (the old
    invariant assert saw NaN) — nulls come back as nulls."""
    import pyarrow as pa

    from aisdb_ray.functions.sanitize import wrap_column

    t = pa.table({"lon": pa.array([10.0, None, 190.0], pa.float64())})
    out = wrap_column(t, "lon")
    assert out["lon"].to_pylist() == [10.0, None, -170.0]


def test_sanitize_strings_covers_large_string():
    import pyarrow as pa

    from aisdb_ray.functions.sanitize import sanitize_strings

    t = pa.table({"s": pa.array(["a#b,c", "-", None], pa.large_string())})
    out = sanitize_strings(t)
    assert out["s"].to_pylist() == ["abc", "", ""]
