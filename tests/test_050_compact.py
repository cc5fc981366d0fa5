"""compact_dir rebinning, atomicity contract, and idempotence."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from aisdb_ray.stages.compact import compact_dir, plan_bins


def _write_small_files(d, n_files=40, rows_each=100):
    os.makedirs(d, exist_ok=True)
    for i in range(n_files):
        t = pa.table({
            "k": pa.array(np.arange(i * rows_each, (i + 1) * rows_each,
                                    dtype=np.int64)),
            "v": pa.array(np.full(rows_each, i, np.int64)),
        })
        pq.write_table(t, os.path.join(d, f"part-{i:05d}.parquet"))


def test_compact_preserves_rows_and_shrinks_files(tmp_path):
    d = str(tmp_path / "lake")
    _write_small_files(d)
    before = sorted(os.listdir(d))
    res = compact_dir(d, target_rows=1000)
    assert res == {"files_before": 40, "files_after": 4, "rows": 4000}
    files = [f for f in os.listdir(d) if f.endswith(".parquet")]
    assert len(files) == 4
    got = pq.read_table(d).to_pandas().sort_values("k").reset_index(drop=True)
    assert got["k"].tolist() == list(range(4000))
    assert before != sorted(os.listdir(d))


def test_compact_keeps_name_order_contiguous(tmp_path):
    d = str(tmp_path / "lake")
    _write_small_files(d, n_files=6, rows_each=10)
    bins = plan_bins(d, target_rows=25)
    # contiguous runs of the sorted names, never interleaved
    flat = [f for b in bins for f in b]
    assert flat == sorted(flat)
    assert [len(b) for b in bins] == [2, 2, 2]


def test_compact_noop_when_already_big(tmp_path):
    d = str(tmp_path / "lake")
    _write_small_files(d, n_files=3, rows_each=100)
    res = compact_dir(d, target_rows=100)  # every file already a full bin
    assert res["files_before"] == res["files_after"] == 3
    # untouched: original names survive a no-op
    assert sorted(os.listdir(d)) == [f"part-{i:05d}.parquet" for i in range(3)]


def test_compact_idempotent(tmp_path):
    d = str(tmp_path / "lake")
    _write_small_files(d)
    compact_dir(d, target_rows=1000)
    res2 = compact_dir(d, target_rows=1000)
    assert res2["files_before"] == res2["files_after"] == 4


def test_compact_recovers_from_mid_swap_crash(tmp_path):
    """Crash between the two swap renames leaves no dir at src — the next
    compact_dir call must roll the old layout back and proceed."""
    import shutil

    d = str(tmp_path / "lake")
    _write_small_files(d, n_files=3, rows_each=30)
    # simulate the crash window: src parked at .compact-old, src gone
    shutil.move(d, d + ".compact-old")
    res = compact_dir(d, target_rows=1000)
    assert res["rows"] == 90 and res["files_after"] == 1
    import os

    assert os.path.isdir(d) and not os.path.isdir(d + ".compact-old")


def test_compact_carries_sidecars_and_unplanned_files(tmp_path):
    """Non-parquet sidecars (and parquet appended after planning) must
    survive the swap — they used to be silently destroyed."""
    import os

    d = str(tmp_path / "lake")
    _write_small_files(d, n_files=2, rows_each=30)
    with open(os.path.join(d, "_SUCCESS"), "w") as f:
        f.write("ok")
    res = compact_dir(d, target_rows=1000)
    assert res["files_after"] == 1
    assert os.path.exists(os.path.join(d, "_SUCCESS"))
