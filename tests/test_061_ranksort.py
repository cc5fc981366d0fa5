"""Distributed total order / exact global row ranks (TeraSort shape):
parity vs a single-node sort, skew, encoding guards, empty input."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from aisdb_ray.stages import ranksort


def _check(df: pd.DataFrame, order_cols, staging):
    got = ranksort.global_rank(
        rd.from_pandas(df).repartition(7), order_cols, staging_dir=staging
    ).to_pandas().sort_values("rownum").reset_index(drop=True)
    want = df.sort_values(order_cols, kind="stable").reset_index(drop=True)
    assert len(got) == len(df)
    assert got["rownum"].tolist() == list(range(1, len(df) + 1))
    for c in order_cols:
        np.testing.assert_array_equal(
            got[c].to_numpy(), want[c].to_numpy(), err_msg=c
        )


def test_global_rank_matches_single_node_sort(tmp_path):
    rng = np.random.default_rng(7)
    n = 30_000
    df = pd.DataFrame({
        "time": rng.integers(0, 5_000, n).astype(np.int64),  # heavy ties
        "source": rng.choice([f"s{i}" for i in range(10)], n),
        "doc_id": [f"d{i:06d}" for i in rng.permutation(n)],
    })
    _check(df, ["time", "source", "doc_id"], str(tmp_path / "a"))


def test_global_rank_skewed_keys(tmp_path):
    # 90% of rows share one time value: many equal keys must still land in
    # ONE partition (searchsorted is deterministic per key) and rank
    # correctly via the doc_id tiebreak
    rng = np.random.default_rng(9)
    n = 20_000
    t = np.where(rng.random(n) < 0.9, 42, rng.integers(0, 1000, n)).astype(np.int64)
    df = pd.DataFrame({
        "time": t,
        "doc_id": [f"d{i:05d}" for i in rng.permutation(n)],
    })
    _check(df, ["time", "doc_id"], str(tmp_path / "b"))


def test_global_rank_string_leading_key(tmp_path):
    rng = np.random.default_rng(11)
    n = 5_000
    df = pd.DataFrame({
        "source": rng.choice(["alpha", "beta", "b", "gamma", ""], n),
        "time": rng.integers(0, 100, n).astype(np.int64),
        "doc_id": [f"x{i:05d}" for i in range(n)],
    })
    _check(df, ["source", "time", "doc_id"], str(tmp_path / "c"))


def test_global_rank_rejects_negative_ints(tmp_path):
    df = pd.DataFrame({"time": np.array([-5, 3], np.int64),
                       "doc_id": ["a", "b"]})
    with pytest.raises(Exception) as ei:
        ranksort.global_rank(
            rd.from_pandas(df), ["time", "doc_id"],
            staging_dir=str(tmp_path / "d"),
        ).to_pandas()
    assert "negative" in str(ei.value)


def test_global_rank_empty_input(tmp_path):
    empty = rd.from_arrow(pa.table({
        "time": pa.array([], pa.int64()),
        "doc_id": pa.array([], pa.string()),
    }))
    out = ranksort.global_rank(
        empty, ["time", "doc_id"], staging_dir=str(tmp_path / "e")
    )
    schema = out.schema()
    assert "rownum" in schema.names
    assert out.count() == 0


def test_ntile_matches_sql_semantics(tmp_path):
    import duckdb

    rng = np.random.default_rng(21)
    n = 10_007  # deliberately not divisible by k
    df = pd.DataFrame({
        "v": rng.integers(0, 500, n).astype(np.int64),
        "doc_id": [f"d{i:05d}" for i in rng.permutation(n)],
    })
    got = ranksort.global_rank(
        rd.from_pandas(df).repartition(5), ["v", "doc_id"],
        staging_dir=str(tmp_path / "n"), ntile=7,
    ).to_pandas().sort_values("rownum").reset_index(drop=True)
    want = duckdb.sql(
        "SELECT ntile(7) OVER (ORDER BY v, doc_id) AS t FROM df"
    ).df()
    np.testing.assert_array_equal(
        got["tile"].to_numpy(np.int64), want["t"].to_numpy(np.int64)
    )
    # fewer rows than tiles: tile == rank
    tiny = pd.DataFrame({"v": np.array([3, 1], np.int64), "doc_id": ["a", "b"]})
    got2 = ranksort.global_rank(
        rd.from_pandas(tiny), ["v", "doc_id"],
        staging_dir=str(tmp_path / "n2"), ntile=5,
    ).to_pandas().sort_values("rownum")
    assert got2["tile"].tolist() == [1, 2]


def test_encode_preserves_tuple_order():
    b = pa.table({
        "t": pa.array([0, 0, 1, 10, 2], pa.int64()),
        "s": pa.array(["b", "a", "z", "a", "a"]),
    })
    keys = ranksort._encode_order_keys(b, ["t", "s"])
    order = np.argsort(keys, kind="stable")
    want = sorted(range(5), key=lambda i: (b["t"][i].as_py(), b["s"][i].as_py()))
    assert order.tolist() == want


def test_global_rank_resume_skips_exchange(tmp_path):
    import os

    rng = np.random.default_rng(71)
    n = 8_000
    df = pd.DataFrame({
        "time": rng.integers(0, 3_000, n).astype(np.int64),
        "doc_id": [f"d{i:05d}" for i in rng.permutation(n)],
    })
    d = str(tmp_path / "ckpt")
    r1 = ranksort.global_rank(
        rd.from_pandas(df), ["time", "doc_id"], staging_dir=d, resume=True
    ).to_pandas().sort_values("rownum").reset_index(drop=True)
    assert os.path.exists(os.path.join(d, "_MANIFEST.json"))
    stage_files = sorted(f for f in os.listdir(d) if f.endswith(".parquet"))
    mtimes = {f: os.path.getmtime(os.path.join(d, f)) for f in stage_files}

    # rerun: phase A skipped — stage files untouched, output identical
    r2 = ranksort.global_rank(
        rd.from_pandas(df), ["time", "doc_id"], staging_dir=d, resume=True
    ).to_pandas().sort_values("rownum").reset_index(drop=True)
    assert sorted(os.listdir(d)) == sorted(stage_files + ["_MANIFEST.json"])
    for f in stage_files:
        assert os.path.getmtime(os.path.join(d, f)) == mtimes[f]
    pd.testing.assert_frame_equal(r1, r2)

    # corrupt checkpoint: rebuild from scratch, still correct
    with open(os.path.join(d, stage_files[0]), "wb") as o:
        o.write(b"ruined")
    r3 = ranksort.global_rank(
        rd.from_pandas(df), ["time", "doc_id"], staging_dir=d, resume=True
    ).to_pandas().sort_values("rownum").reset_index(drop=True)
    pd.testing.assert_frame_equal(r1, r3)


def test_global_rank_resume_skips_boundary_sampling(tmp_path, monkeypatch):
    """A valid checkpoint pins the sampled range boundaries, so a resumed
    run must not re-scan the input (ADVICE: _sample_boundaries ran — a
    full pass — even when the manifest made its result unused)."""
    import os

    rng = np.random.default_rng(73)
    n = 4_000
    df = pd.DataFrame({
        "time": rng.integers(0, 1_000, n).astype(np.int64),
        "doc_id": [f"d{i:05d}" for i in rng.permutation(n)],
    })
    d = str(tmp_path / "ckpt")
    r1 = ranksort.global_rank(
        rd.from_pandas(df), ["time", "doc_id"], staging_dir=d, resume=True
    ).to_pandas().sort_values("rownum").reset_index(drop=True)

    def boom(*a, **k):
        raise AssertionError("resumed run re-sampled boundaries")

    monkeypatch.setattr(ranksort, "_sample_boundaries", boom)
    r2 = ranksort.global_rank(
        rd.from_pandas(df), ["time", "doc_id"], staging_dir=d, resume=True
    ).to_pandas().sort_values("rownum").reset_index(drop=True)
    pd.testing.assert_frame_equal(r1, r2)
    monkeypatch.undo()

    # DIFFERENT order columns against the same staging dir: the manifest
    # fingerprint must force a rebuild, not serve the stale exchange
    r3 = ranksort.global_rank(
        rd.from_pandas(df), ["doc_id"], staging_dir=d, resume=True
    ).to_pandas()
    want_docs = sorted(df["doc_id"])
    got_docs = r3.sort_values("rownum")["doc_id"].tolist()
    assert got_docs == want_docs
    assert os.path.exists(os.path.join(d, "_MANIFEST.json"))


def test_global_rank_rejects_nul_bytes_in_order_strings():
    """A payload NUL would make the byte encoding's memcmp order disagree
    with Arrow's tuple sort — refuse, don't mis-rank."""
    import pyarrow as pa
    import pytest

    t = pa.table({
        "a": pa.array(["a", "a\x00"], pa.string()),
        "b": pa.array([1, 2], pa.int64()),
    })
    with pytest.raises(Exception, match="NUL"):  # RayTaskError wraps it
        ranksort.global_rank(rd.from_arrow(t), ["a", "b"]).take_all()


def test_global_rank_fingerprint_extra_invalidates_stale_resume(tmp_path):
    """resume=True with a changed fingerprint_extra must REBUILD the
    exchange, not serve the previous input's rows and ranks."""
    import pyarrow as pa

    d = str(tmp_path / "stage")
    t1 = pa.table({"k": pa.array([3, 1, 2], pa.int64())})
    r1 = ranksort.global_rank(rd.from_arrow(t1), ["k"], num_parts=2,
                              staging_dir=d, resume=True,
                              fingerprint_extra="v1").to_pandas()
    assert sorted(r1.k) == [1, 2, 3]
    t2 = pa.table({"k": pa.array([9, 8], pa.int64())})
    r2 = ranksort.global_rank(rd.from_arrow(t2), ["k"], num_parts=2,
                              staging_dir=d, resume=True,
                              fingerprint_extra="v2").to_pandas()
    assert sorted(r2.k) == [8, 9]  # not t1's rows
