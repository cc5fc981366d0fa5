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


def test_distributed_reconcile_matches_reference_walk():
    """_reconcile_source_table (the groupby(source) task kernel) must equal
    the pandas reference walk _reconcile on randomized chunk summaries,
    including continuation chains, single-seg carries and gap breaks."""
    import pyarrow as pa

    rng = np.random.default_rng(42)
    rows = []
    for s in range(20):
        src = f"s{s:02d}"
        t = int(rng.integers(0, 1000))
        for ch in range(int(rng.integers(1, 12))):
            t_first = t + int(rng.integers(0, MAX_GAP * 2))  # may or may not continue
            n_segs = int(rng.integers(1, 4))
            span = int(rng.integers(1, 5000))
            t_last = t_first + span
            ls_start = t_first if n_segs == 1 else t_first + int(rng.integers(1, span + 1))
            rows.append(dict(source=src, chunk=ch, t_first=t_first,
                             t_last=t_last, n_segs=n_segs,
                             v_last=float(rng.integers(0, 100)),
                             t_lastseg_start=ls_start))
            t = t_last
    summary = pd.DataFrame(rows).sort_values(["source", "chunk"], kind="stable")
    want = salted._reconcile(summary, MAX_GAP)

    parts = []
    for _, g in summary.groupby("source", sort=False):
        parts.append(salted._reconcile_source_table(
            pa.Table.from_pandas(g.sample(frac=1.0, random_state=7)), MAX_GAP
        ))
    got = salted._recon_map_from_table(pa.concat_tables(parts))
    np.testing.assert_array_equal(got.keys, want.keys)
    for attr in ("off", "cont", "seg_t0", "t_prev", "v_prev", "closes"):
        np.testing.assert_array_equal(
            getattr(got, attr), getattr(want, attr), err_msg=attr
        )


def test_staged_reconcile_driver_holds_no_chunk_state(micro_dir, tmp_path):
    """The staged path's driver-side handle is a ReconStore of stage-file
    paths (O(#map tasks)), never the O(#chunks) map; consumers resolve only
    their partition's rows and outputs still equal the unsalted path."""
    ds = _prepared(micro_dir)
    mat, recon_ref = salted.clean_chunks_staged(
        ds, MAX_GAP, CHUNK_S, staging_dir=str(tmp_path / "stage")
    )
    assert isinstance(recon_ref, salted.ReconStore)
    # the handle itself carries only file names + a partition count
    assert all(isinstance(f, str) for f in recon_ref.files)
    got = _norm(salted.relabel_blocks(mat, recon_ref).to_pandas())
    want = _norm(series.clean_series(_prepared(micro_dir), MAX_GAP).to_pandas())
    pd.testing.assert_frame_equal(got, want)


def test_doc_id_sparse_dense_roundtrip_exact():
    """The exchange wire codec nulls only canonical ids and reconstructs
    them exactly; non-canonical ids (odd padding, colons in the source,
    wide epochs) ride through untouched."""
    import pyarrow as pa

    tbl = pa.table({
        "doc_id": [
            "src-1:0000000100:0007",      # canonical -> nulled + rebuilt
            "src-1:100:7",                # unpadded -> kept verbatim
            "a:b:0000000100:0007",        # colon in source (canonical)
            "src-2:99999999999:0012",     # 11-digit epoch (lpad no-op)
            "src-3:0000000200:12",        # seq unpadded -> kept verbatim
        ],
        "source": ["src-1", "src-1", "a:b", "src-2", "src-3"],
        "time": pa.array([100, 100, 100, 99999999999, 200], pa.int64()),
        "seq": pa.array([7, 7, 7, 12, 12], pa.int32()),
    })
    sparse = salted._doc_id_sparse(tbl)
    nulls = sparse["doc_id"].null_count
    assert nulls == 3  # rows 0, 2, 3 are canonical
    dense = salted._doc_id_dense(sparse)
    assert dense["doc_id"].to_pylist() == tbl["doc_id"].to_pylist()


def test_group_aligned_slices_respect_boundaries():
    """Output slices cut only at (source, chunk) boundaries; a single
    group over the budget raises instead of risking a mid-group split."""
    import pyarrow as pa
    import pytest

    n_groups, rows_per = 10, 50
    src = np.repeat([f"s{i}" for i in range(n_groups)], rows_per)
    ch = np.zeros(n_groups * rows_per, np.int64)
    tbl = pa.table({
        "source": pa.array(src),
        "_chunk": pa.array(ch),
        "time": pa.array(np.arange(n_groups * rows_per, dtype=np.int64)),
    })
    per_row = max(1, tbl.nbytes // tbl.num_rows)
    # budget ~ 3 groups per slice
    budget = per_row * rows_per * 3
    slices = list(salted._group_aligned_slices(tbl, budget))
    assert sum(s.num_rows for s in slices) == tbl.num_rows
    assert len(slices) >= 3
    for s in slices:
        # every slice starts AND ends on a group boundary
        assert s.num_rows % rows_per == 0
        srcs = s["source"].to_pylist()
        assert srcs[0] != "" and len(set(srcs)) == s.num_rows // rows_per
    # single group larger than the budget: refuse loudly
    with pytest.raises(RuntimeError, match="group-aligned"):
        list(salted._group_aligned_slices(tbl, per_row * 10))


def test_spart_null_source_deterministic():
    """A null source must route to the SAME staging partition regardless
    of which other sources share the batch (pd.factorize codes nulls -1,
    which used to wrap to the last unique's hash)."""
    ch = np.zeros(2, np.int64)
    a = salted._spart_of(np.array([None, "aaa"], dtype=object), ch, 64)
    b = salted._spart_of(np.array([None, "zzz"], dtype=object), ch, 64)
    c = salted._spart_of(np.array(["mm", None], dtype=object), ch, 64)
    assert a[0] == b[0] == c[1]


def test_staging_root_never_wiped(tmp_path, micro_dir):
    """The exchange owns only its namespaced subdirectory; other tenants'
    files in a shared staging root (e.g. /dev/shm) must survive."""
    root = tmp_path / "sharedshm"
    root.mkdir()
    sentinel = root / "plasma_like_file"
    sentinel.write_text("do not delete")
    mat, recon = salted.clean_chunks_staged(
        _prepared(micro_dir), MAX_GAP, CHUNK_S, str(root), num_staging_parts=4
    )
    assert mat.count() > 0
    assert sentinel.read_text() == "do not delete"
    assert (root / salted.EXCHANGE_LEAF).is_dir()


def test_cascade_rejects_misaligned_chunk_s(tmp_path, micro_dir):
    import pytest

    from aisdb_ray.pipelines import cascade

    cfg = cascade.CascadeConfig(
        input_path=micro_dir, out_root=str(tmp_path / "o"),
        heavy_mode="stage", chunk_s=3600, tiers=("1m", "1h", "1d"),
    )
    with pytest.raises(ValueError, match="multiple of every enabled tier"):
        cascade.run_cascade(cfg)


def test_salted_null_source_rows_match_unsalted():
    """prepare.validate admits null sources; the materialized salted path
    used to drop the group at the pandas reconcile (KeyError downstream).
    All three clean variants must agree."""
    import pyarrow as pa

    t = pa.table({
        "doc_id": pa.array([f"x:{100 + i}:0" for i in range(4)] * 2),
        "tokens": pa.array([[1]] * 8, pa.list_(pa.int32())),
        "n_tok": pa.array([1] * 8, pa.int32()),
        "source": pa.array(["s", "s", "s", "s", None, None, None, None]),
        "time": pa.array([100, 101, 102, 103] * 2, pa.int64()),
        "seq": pa.array([0, 0, 0, 0, 1, 1, 1, 1], pa.int32()),
    })
    ds = rd.from_arrow(t)
    plain = series.clean_series(ds, max_gap=3600).to_pandas()
    salted_df = salted.clean_series_salted(ds, max_gap=3600).to_pandas()
    key = ["source", "time", "seq"]
    a = plain.sort_values(key, na_position="first").reset_index(drop=True)
    b = salted_df.sort_values(key, na_position="first").reset_index(drop=True)
    assert len(a) == len(b) == 8
    pd.testing.assert_frame_equal(a[sorted(a.columns)], b[sorted(b.columns)])
