"""Salted (time-chunked) per-series ops == unsalted results, hot source incl."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from aisdb_ray import oracle
from aisdb_ray.stages import prepare, salted, series

MAX_GAP = 7200
CHUNK_S = 86400  # 1-day chunks: many chunks per source at fixture cadence


def _prepared(path):
    return rd.read_parquet(path).map_batches(prepare.prepare, batch_format="pyarrow")


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    cols = ["source", "time", "seq", "doc_id", "n_tok", "seg"]
    return (
        df[cols]
        .sort_values(["source", "time", "seq"], kind="stable")
        .reset_index(drop=True)
    )


def test_salted_equals_unsalted(micro_dir):
    plain = _norm(series.clean_series(_prepared(micro_dir), MAX_GAP).to_pandas())
    salt = _norm(
        salted.clean_series_salted(_prepared(micro_dir), MAX_GAP, CHUNK_S).to_pandas()
    )
    pd.testing.assert_frame_equal(plain, salt)


def test_salted_equals_oracle_small(small_dir, small_df):
    want = oracle.add_segments(oracle.clean(small_df), MAX_GAP)
    got = _norm(
        salted.clean_series_salted(_prepared(small_dir), MAX_GAP, CHUNK_S).to_pandas()
    )
    np.testing.assert_array_equal(got["seg"].to_numpy(), want["seg"].to_numpy())
    np.testing.assert_array_equal(got["doc_id"].to_numpy(), want["doc_id"].to_numpy())


def test_salted_chunks_actually_split_hot_source(micro_dir):
    """The hot source must span multiple chunks (otherwise the test is
    vacuous and the salting exercises nothing)."""
    ds = _prepared(micro_dir).to_pandas()
    hot = ds["source"].value_counts().idxmax()
    spans = ds[ds["source"] == hot]["time"]
    assert (spans.max() // CHUNK_S) > (spans.min() // CHUNK_S) + 1


def test_gapfill_by_segment_equals_by_source(micro_dir, micro_df):
    cleaned = series.clean_series(_prepared(micro_dir), MAX_GAP)
    got = salted.gapfill_series_by_segment(cleaned, 60, MAX_GAP).to_pandas()
    want = oracle.gapfill(oracle.clean(micro_df), 60, MAX_GAP)
    got = got.sort_values(["source", "seg", "time"], kind="stable").reset_index(drop=True)
    want = want.sort_values(["source", "seg", "time"], kind="stable").reset_index(drop=True)
    assert len(got) == len(want)
    np.testing.assert_array_equal(got["time"].to_numpy(), want["time"].to_numpy())
    np.testing.assert_allclose(got["n_tok"].to_numpy(), want["n_tok"].to_numpy())
