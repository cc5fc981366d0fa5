"""CSV export layout + retention pruning + watermarks."""

from __future__ import annotations

import glob
import json
import os

import pandas as pd
import pyarrow.parquet as pq
import ray.data as rd

from aisdb_ray import oracle
from aisdb_ray.functions import export
from aisdb_ray.pipelines import cascade
from aisdb_ray.stages import prepare, series

MAX_GAP = 7200


def test_export_csv_layout(micro_dir, tmp_path):
    ds = rd.read_parquet(micro_dir).map_batches(prepare.prepare, batch_format="pyarrow")
    cleaned = series.clean_series(ds, MAX_GAP)
    out = str(tmp_path / "csv")
    export.write_series_csv(cleaned, out)
    files = glob.glob(os.path.join(out, "*.csv"))
    assert files
    df = pd.concat([pd.read_csv(f) for f in files], ignore_index=True)
    assert list(df.columns) == export.EXPORT_COLUMNS
    assert df["Track_ID"].str.contains("#").all()
    assert len(df) == len(oracle.clean(pq.read_table(micro_dir).to_pandas()))


def test_retention_prunes_old_buckets(micro_dir, micro_df, tmp_path):
    out = str(tmp_path / "run")
    cleaned = oracle.clean(micro_df)
    # cutoff = the median DISTINCT 1d bucket, so pruning provably drops some
    buckets = sorted(oracle.rollup(cleaned, 86400)["bucket"].unique())
    cutoff = int(buckets[len(buckets) // 2])
    assert buckets[0] < cutoff
    cfg = cascade.CascadeConfig(
        input_path=micro_dir, out_root=out, num_parts=4, max_gap=MAX_GAP,
        retention={"1d": cutoff}, max_concurrent_parts=2,
    )
    cascade.run_cascade(cfg)
    got = pq.read_table(os.path.join(out, "tier_1d")).to_pandas()
    assert (got["bucket"] >= cutoff).all()
    want = oracle.rollup(cleaned, 86400)
    want = want[want["bucket"] >= cutoff]
    assert len(got) == len(want)
    # lineage recorded the pruning
    recs = [json.loads(l) for l in open(os.path.join(out, "manifest.jsonl")) if l.strip()]
    assert any(r.get("stage") == "retention_1d" for r in recs)
    # 1m/1h tiers untouched
    m1 = pq.read_table(os.path.join(out, "tier_1m")).to_pandas()
    assert len(m1) == len(oracle.rollup(cleaned, 60))


def test_retention_prunes_in_stage_mode(micro_dir, micro_df, tmp_path):
    """Same pruning contract under heavy_mode='stage', whose tiers land in
    hive 'part=K' dirs — retention must prune THAT layout too (the layout
    mismatch was a silent no-op once)."""
    out = str(tmp_path / "run_stage")
    cleaned = oracle.clean(micro_df)
    buckets = sorted(oracle.rollup(cleaned, 86400)["bucket"].unique())
    cutoff = int(buckets[len(buckets) // 2])
    cfg = cascade.CascadeConfig(
        input_path=micro_dir, out_root=out, num_parts=4, max_gap=MAX_GAP,
        retention={"1d": cutoff}, max_concurrent_parts=2, heavy_mode="stage",
    )
    cascade.run_cascade(cfg)
    got = pq.read_table(os.path.join(out, "tier_1d")).to_pandas()
    assert (got["bucket"] >= cutoff).all()
    want = oracle.rollup(cleaned, 86400)
    assert len(got) == len(want[want["bucket"] >= cutoff])
    recs = [json.loads(l) for l in open(os.path.join(out, "manifest.jsonl")) if l.strip()]
    assert any(r.get("stage") == "retention_1d" for r in recs)
