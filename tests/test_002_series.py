"""Per-series operators vs the NumPy oracle (clean/segment/gap-fill).

Mirrors the reference's invariant-assertion style
(/root/reference/aisdb/tests/test_007_trackgen.py, test_008_interp.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from aisdb_ray import oracle
from aisdb_ray.stages import prepare, series

MAX_GAP = 7200
STEP = 60


def _prepared_ds(path):
    return rd.read_parquet(path).map_batches(prepare.prepare, batch_format="pyarrow")


def _sorted(df: pd.DataFrame, cols) -> pd.DataFrame:
    return df.sort_values(cols, kind="stable").reset_index(drop=True)


def test_prepare_matches_oracle(micro_dir, micro_df):
    got = _prepared_ds(micro_dir).to_pandas()
    d = oracle.derive_time(micro_df)
    want = d[oracle.valid_mask(d)]
    assert len(got) == len(want)
    g = _sorted(got, ["doc_id"])[["doc_id", "time", "seq"]].reset_index(drop=True)
    w = (
        _sorted(want, ["doc_id"])[["doc_id", "time", "seq"]]
        .astype({"time": np.int64, "seq": np.int32})
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(g.astype({"seq": np.int32}), w)


def test_clean_series_matches_oracle(micro_dir, micro_df):
    got = series.clean_series(_prepared_ds(micro_dir), MAX_GAP).to_pandas()
    want = oracle.add_segments(oracle.clean(micro_df), MAX_GAP)
    got = _sorted(got, ["source", "time", "seq"])
    want = _sorted(want, ["source", "time", "seq"])
    assert len(got) == len(want)
    for c in ["source", "time", "seg", "n_tok", "doc_id"]:
        np.testing.assert_array_equal(got[c].to_numpy(), want[c].to_numpy(), err_msg=c)
    # token-array equality invariant on every surviving row
    for a, b in zip(got["tokens"], want["tokens"]):
        np.testing.assert_array_equal(a, b)


def test_segment_table_matches_oracle(micro_dir, micro_df):
    got = series.segment_table(_prepared_ds(micro_dir), MAX_GAP).to_pandas()
    want = oracle.segment_table(oracle.clean(micro_df), MAX_GAP)
    got = _sorted(got, ["source", "seg"])
    want = _sorted(want, ["source", "seg"])
    pd.testing.assert_frame_equal(
        got[want.columns].astype(want.dtypes.to_dict()), want
    )


def test_gapfill_matches_oracle(micro_dir, micro_df):
    got = series.gapfill_series(_prepared_ds(micro_dir), STEP, MAX_GAP).to_pandas()
    want = oracle.gapfill(oracle.clean(micro_df), STEP, MAX_GAP)
    got = _sorted(got, ["source", "seg", "time"])
    want = _sorted(want, ["source", "seg", "time"])
    assert len(got) == len(want)
    for c in ["source", "seg", "time", "is_original"]:
        np.testing.assert_array_equal(got[c].to_numpy(), want[c].to_numpy(), err_msg=c)
    np.testing.assert_allclose(got["n_tok"].to_numpy(), want["n_tok"].to_numpy(), rtol=0, atol=0)


def test_gapfill_token_roundtrip(micro_dir, micro_df):
    """Original rows surviving onto the grid keep their exact tokens arrays."""
    got = series.gapfill_series(_prepared_ds(micro_dir), STEP, MAX_GAP).to_pandas()
    cleaned = oracle.clean(micro_df)
    by_doc = {d: t for d, t in zip(cleaned["doc_id"], cleaned["tokens"])}
    orig = got[got["is_original"]]
    assert len(orig) > 0
    for doc, toks in zip(orig["doc_id"], orig["tokens"]):
        np.testing.assert_array_equal(toks, by_doc[doc])
    filled = got[~got["is_original"]]
    assert filled["tokens"].isna().all()
    assert filled["doc_id"].str.endswith(":gapfill").all()


def test_gapfill_closed_form_midpoint():
    """2-point series: grid midpoint == arithmetic midpoint exactly
    (mirrors /root/reference/aisdb/tests/test_008_interp.py:66-121)."""
    g = pa.table(
        {
            "doc_id": ["s:0000000000:0000", "s:0000000120:0000"],
            "tokens": pa.array([[1], [2, 3]], pa.list_(pa.int32())),
            "n_tok": pa.array([100, 300], pa.int32()),
            "source": ["s", "s"],
            "time": pa.array([0, 120], pa.int64()),
            "seq": pa.array([0, 0], pa.int32()),
        }
    )
    out = series.gapfill_group(g, step=60, max_gap=7200).to_pandas()
    assert list(out["time"]) == [0, 60, 120]
    assert out["n_tok"].tolist() == [100.0, 200.0, 300.0]
    assert out["is_original"].tolist() == [True, False, True]


def test_series_group_kernels_accept_empty_tables():
    """Empty group tables (empty upstream, staged-exchange empty
    partitions) must flow through every per-group kernel, not crash."""
    import pyarrow as pa

    from aisdb_ray.stages import series as s

    empty = pa.table({
        "source": pa.array([], pa.string()),
        "doc_id": pa.array([], pa.string()),
        "time": pa.array([], pa.int64()),
        "seq": pa.array([], pa.int64()),
        "n_tok": pa.array([], pa.int64()),
    })
    assert s.clean_group(empty).num_rows == 0
    assert s.segment_summary_group(empty).num_rows == 0
    assert s.gapfill_group(empty).num_rows == 0
