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


def test_chunk_local_gapfill_equals_unsalted(micro_dir):
    """Halo-exact chunk-local gap-fill == whole-source gap-fill, at chunk
    sizes both above and BELOW max_gap (segments spanning many chunks)."""
    ref = series.gapfill_series(_prepared(micro_dir), 60, MAX_GAP).to_pandas()
    cols = ["source", "seg", "time", "n_tok", "is_original", "doc_id"]
    ref_n = ref[cols].sort_values(cols[:3], kind="stable").reset_index(drop=True)
    for chunk_s in (86400, 3600):
        mat, recon_ref = salted.clean_chunks_materialized(
            _prepared(micro_dir), MAX_GAP, chunk_s
        )
        got = salted.gapfill_blocks(mat, recon_ref, 60).to_pandas()
        got_n = got[cols].sort_values(cols[:3], kind="stable").reset_index(drop=True)
        pd.testing.assert_frame_equal(got_n, ref_n, check_dtype=False)


def test_staged_hash_shuffle_equals_sorted(micro_dir, tmp_path):
    """The disk-backed hash-shuffle clean (map-only staging write + one
    vectorized task per partition) must equal the sort-shuffle clean."""
    want = _norm(series.clean_series(_prepared(micro_dir), MAX_GAP).to_pandas())
    mat, recon_ref = salted.clean_chunks_staged(
        _prepared(micro_dir), MAX_GAP, CHUNK_S, str(tmp_path / "staging")
    )
    got = _norm(salted.relabel_blocks(mat, recon_ref).to_pandas())
    pd.testing.assert_frame_equal(got, want)


def test_chunk_local_pack_roundtrip(micro_dir):
    """Per-chunk Gorilla packing decodes to the exact cleaned point set,
    and a hot source splits into multiple bounded packed rows."""
    from aisdb_ray.stages import compress

    mat, recon_ref = salted.clean_chunks_materialized(
        _prepared(micro_dir), MAX_GAP, 86400
    )
    packed = salted.pack_blocks(mat, recon_ref, target_points=256)
    pk = packed.to_pandas()
    hot = pk.loc[pk["times"].map(len).idxmax(), "source"]
    assert (pk["source"] == hot).sum() > 1, "hot source must span packed rows"
    assert pk["times"].map(len).max() <= 256 + 3000  # target + at most 1 chunk
    dec = compress.decompress(
        packed.map_batches(
            lambda b: compress.GorillaEncodePassthrough()(b),
            batch_format="pyarrow", batch_size=16,
        )
    ).to_pandas()
    ref = series.clean_series(_prepared(micro_dir), MAX_GAP).to_pandas()
    pcols = ["source", "seg", "time", "n_tok"]
    a = dec[pcols].sort_values(pcols, kind="stable").reset_index(drop=True)
    b = ref.assign(n_tok=ref.n_tok.astype("int64"))[pcols].sort_values(
        pcols, kind="stable"
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_gapfill_by_segment_equals_by_source(micro_dir, micro_df):
    cleaned = series.clean_series(_prepared(micro_dir), MAX_GAP)
    got = salted.gapfill_series_by_segment(cleaned, 60, MAX_GAP).to_pandas()
    want = oracle.gapfill(oracle.clean(micro_df), 60, MAX_GAP)
    got = got.sort_values(["source", "seg", "time"], kind="stable").reset_index(drop=True)
    want = want.sort_values(["source", "seg", "time"], kind="stable").reset_index(drop=True)
    assert len(got) == len(want)
    np.testing.assert_array_equal(got["time"].to_numpy(), want["time"].to_numpy())
    np.testing.assert_allclose(got["n_tok"].to_numpy(), want["n_tok"].to_numpy())
