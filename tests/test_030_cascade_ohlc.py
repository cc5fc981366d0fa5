"""OHLC candle tiers inside the cascade: materialization, refresh, retention."""

from __future__ import annotations

import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from aisdb_ray.pipelines import cascade
from aisdb_ray.stages import prepare, rollup, series
from aisdb_ray.state.lineage import list_parquet_files

MAX_GAP = 7200


def _cfg(inp, out):
    return cascade.CascadeConfig(
        input_path=inp, out_root=out, num_parts=4, max_gap=MAX_GAP,
        max_concurrent_parts=2, ohlc=True,
    )


def _finalized_tier(out_root, stage) -> pd.DataFrame:
    files = list_parquet_files(os.path.join(out_root, stage))
    tbl = pa.concat_tables(
        [pq.read_table(f).drop_columns(
            [c for c in ("part",) if c in pq.read_schema(f).names]
        ) for f in files],
        promote_options="default",
    )
    return (
        rollup._finalize_ohlc(tbl)
        .to_pandas()
        .sort_values(["source", "bucket"], kind="stable")
        .reset_index(drop=True)
    )


def _direct_ohlc(micro_dir, width) -> pd.DataFrame:
    ds = rd.read_parquet(micro_dir).map_batches(prepare.prepare, batch_format="pyarrow")
    cleaned = series.clean_series(ds, MAX_GAP)
    return (
        rollup.ohlc(cleaned, width)
        .to_pandas()
        .sort_values(["source", "bucket"], kind="stable")
        .reset_index(drop=True)
    )


@pytest.fixture(scope="module")
def built(micro_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("casc_ohlc")
    inp = os.path.join(base, "input")
    os.makedirs(inp)
    for f in os.listdir(micro_dir):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(micro_dir, f), os.path.join(inp, f))
    out = os.path.join(base, "run")
    cascade.run_cascade(_cfg(inp, out))
    return inp, out


def test_cascade_ohlc_tiers_match_direct(built, micro_dir):
    _, out = built
    for stage, width in [("ohlc_1m", 60), ("ohlc_1h", 3600), ("ohlc_1d", 86400)]:
        got = _finalized_tier(out, stage)
        want = _direct_ohlc(micro_dir, width)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_cascade_ohlc_refresh(built, micro_dir):
    """Appending a file refreshes the candle tiers of the touched parts."""
    inp, out = built
    src = "src-00"
    t0 = 1700000000 + 40 * 86400
    times = [t0 + i * 30 for i in range(50)]
    n_tok = np.array([(t % 97) + 3 for t in times], np.int32)
    inc = pa.table(
        {
            "doc_id": pa.array([f"{src}:{t:010d}:0000" for t in times]),
            "tokens": pa.array([list(range(int(k))) for k in n_tok],
                               pa.list_(pa.int32())),
            "n_tok": pa.array(n_tok),
            "source": pa.array([src] * len(times)),
        }
    )
    pq.write_table(inc, os.path.join(inp, "zz_increment.parquet"))
    summary = cascade.run_cascade(_cfg(inp, out))
    assert summary["refresh"]["new_files"] == 1
    # combined data == scratch rebuild over the union
    combined = _finalized_tier(out, "ohlc_1h")
    want = _direct_ohlc(inp, 3600)
    pd.testing.assert_frame_equal(combined, want, check_dtype=False)


def test_ohlc_requires_part_mode(tmp_path):
    cfg = cascade.CascadeConfig(
        input_path=str(tmp_path), out_root=str(tmp_path / "o"),
        ohlc=True, heavy_mode="stage",
    )
    with pytest.raises(ValueError):
        cascade.run_cascade(cfg)


def test_ohlc_retention_prunes_candle_tiers(built, tmp_path_factory):
    """Retention keyed 'ohlc_1m' prunes candle partitions by bucket."""
    inp, out = built
    import pyarrow.parquet as pq2

    from aisdb_ray.state.lineage import Manifest, list_parquet_files

    files = list_parquet_files(os.path.join(out, "ohlc_1m"))
    t = pa.concat_tables([pq2.read_table(f) for f in files],
                         promote_options="default")
    cutoff = int(pd.Series(t["bucket"].to_pylist()).quantile(0.5))
    cutoff = (cutoff // 60) * 60
    cfg = _cfg(inp, out)
    cfg.retention = {"ohlc_1m": cutoff}
    manifest = Manifest.open(out, cfg.fingerprint())
    pruned = cascade.apply_retention(cfg, manifest)
    assert pruned.get("ohlc_1m", 0) > 0
    left = pa.concat_tables(
        [pq2.read_table(f) for f in
         list_parquet_files(os.path.join(out, "ohlc_1m"))],
        promote_options="default",
    )
    assert min(left["bucket"].to_pylist()) >= cutoff
