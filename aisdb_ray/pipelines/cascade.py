"""The flagship pipeline: raw -> series -> 1m -> 1h -> 1d retention cascade.

Layout of a run directory (all writes atomic, see state/lineage.py):

    <out_root>/
      manifest.jsonl            lineage ledger + metrics
      series/part=K/*.parquet   cleaned, deduped, segmented points,
                                hash-partitioned by source (K = crc32 % P)
      tier_1m/part=K/*.parquet  per-(source, minute bucket) stats
      tier_1h/part=K/*.parquet  reaggregated from 1m  (exact, algebraic)
      tier_1d/part=K/*.parquet  reaggregated from 1h
      gapfill/part=K/*.parquet  optional gap-filled grid tier
      compressed/part=K/*.parquet  optional Gorilla-encoded segments

Partitioning: ONE key — ``part = crc32(source) % num_parts`` — chosen at the
series stage and reused by every downstream tier (SURVEY.md §7.3): the tier
cascade is co-partitioned, so 1h-from-1m needs no shuffle at all, and a
partition is a self-contained resume unit.  This mirrors the reference's
TimescaleDB layout (hash partitions on mmsi × time chunks,
/root/reference/aisdb/aisdb_sql/timescale_createtable_dynamic.sql:17-23)
with the monthly-table crawl replaced by partition pruning.

Resume: the manifest records each completed (stage, partition); a rerun
recomputes only missing partitions (file-checksum-ledger spirit,
/root/reference/aisdb/database/decoder.py:207-231).  Partition jobs run
concurrently on a small thread pool — each job is itself a parallel Ray
Data pipeline, so this nests cleanly under the streaming executor.
"""

from __future__ import annotations

import os
import time
import zlib
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd

from aisdb_ray.schema import N_TOK, SOURCE, SUM_V, TIME
from aisdb_ray.stages import compress as compress_stage
from aisdb_ray.stages import prepare, rollup, series
from aisdb_ray.state import lineage

TIER_WIDTHS = {"1m": 60, "1h": 3600, "1d": 86400}
TIER_CHAIN = ["1m", "1h", "1d"]


@dataclass
class CascadeConfig:
    input_path: str
    out_root: str
    num_parts: int = 16
    max_gap: int = series.DEFAULT_MAX_GAP
    step: int = series.DEFAULT_STEP
    tiers: tuple = ("1m", "1h", "1d")
    gapfill: bool = False
    compress: bool = False
    max_concurrent_parts: int = 4
    retention: dict = field(default_factory=dict)  # tier -> keep-after epoch
    # how the heavy gapfill/compress tiers are scheduled:
    #   "part"  — one Ray job per hash partition (finest resume granularity;
    #             right when partitions are large, i.e. real-scale runs)
    #   "stage" — one Ray job per stage over all partitions, written with
    #             partition_cols (one actor pool / one shuffle total; right
    #             when partitions are small and per-job overhead dominates)
    heavy_mode: str = "part"

    def fingerprint(self) -> str:
        files = lineage.list_parquet_files(self.input_path)
        extra = {
            "num_parts": self.num_parts,
            "max_gap": self.max_gap,
            "step": self.step,
            "tiers": list(self.tiers),
            "gapfill": self.gapfill,
            "compress": self.compress,
        }
        return lineage.fingerprint_paths(files, extra)


def part_of(source: str, num_parts: int) -> int:
    return zlib.crc32(source.encode()) % num_parts


def _clean_with_part(group: pa.Table, max_gap: int, num_parts: int) -> pa.Table:
    g = series.clean_group(group, max_gap)
    if g.num_rows == 0:
        return g
    p = part_of(g[SOURCE][0].as_py(), num_parts)
    return g.append_column("part", pa.array(np.full(g.num_rows, p, dtype=np.int32)))


def _dataset_rows(path: str) -> int:
    return sum(pq.ParquetFile(f).metadata.num_rows for f in lineage.list_parquet_files(path))


def _part_dir(root: str, stage: str, part: int) -> str:
    # series is written by Ray's partition_cols (hive "part=K"); directly
    # written stages use "part-K" — Ray's write-path URI sniffing cannot
    # handle '=' in target paths (fsspec HTTP fallback import error)
    if stage == "series":
        return os.path.join(root, stage, f"part={part}")
    return os.path.join(root, stage, f"part-{part}")


def _run_series_stage(cfg: CascadeConfig, manifest: lineage.Manifest) -> None:
    """One distributed job: prepare + per-source clean + partitioned write."""
    if manifest.done("series", "all"):
        return
    t0 = time.time()
    ds = rd.read_parquet(cfg.input_path)
    ds = ds.map_batches(prepare.prepare, batch_format="pyarrow")
    cleaned = ds.groupby(SOURCE).map_groups(
        lambda g: _clean_with_part(g, cfg.max_gap, cfg.num_parts),
        batch_format="pyarrow",
    )
    out = os.path.join(cfg.out_root, "series")
    with lineage.atomic_write(out) as tmp:
        # merge per-source blocks into sizeable files: hundreds of tiny files
        # turn every downstream shuffle into an O(blocks^2) tiny-object storm
        cleaned.write_parquet(tmp, partition_cols=["part"], min_rows_per_file=250_000)
    rows = _dataset_rows(out)
    manifest.record("series", "all", rows=rows, wall_s=round(time.time() - t0, 3))


def _coalesced(ds):
    """Merge many tiny input blocks before a shuffle: a sort over B blocks
    creates O(B^2) shuffle objects, which dominates wall time when B is
    hundreds of per-source files (measured 50s -> 9s on an 8M-row pack)."""
    import ray

    ncpu = int(ray.cluster_resources().get("CPU", 8))
    return ds.repartition(max(8, ncpu * 2))


def _read_part(cfg: CascadeConfig, stage: str, part: int, columns=None):
    d = _part_dir(cfg.out_root, stage, part)
    files = lineage.list_parquet_files(d)
    if not files:
        return None
    return rd.read_parquet(files, columns=columns)


def _write_tier(ds_or_table, out_dir: str) -> int:
    """Atomic partition write; returns row count. Accepts Dataset or Table."""
    with lineage.atomic_write(out_dir) as tmp:
        if isinstance(ds_or_table, pa.Table):
            pq.write_table(ds_or_table, os.path.join(tmp, "part-00000.parquet"))
        else:
            ds_or_table.write_parquet(tmp)
    return _dataset_rows(out_dir)


def _run_part(cfg: CascadeConfig, manifest: lineage.Manifest, part: int) -> None:
    """All tier work for one hash partition (the resume unit).

    The tier chain runs as ONE pruned Ray map job producing per-batch
    algebraic partials, combined vectorized (pyarrow group_by) on the
    part's worker thread — per-batch partials are bounded by the number of
    distinct (source, minute) pairs per batch, so no Ray shuffle is needed
    inside a partition (the hash partitioning already co-located the keys).
    1h/1d reaggregate from the in-memory 1m table: min of mins / max of
    maxes / sums — exact, same math as the distributed path.
    """
    import ray

    tiers = [t for t in TIER_CHAIN if t in cfg.tiers]
    if tiers and not all(manifest.done(f"tier_{t}", part) for t in tiers):
        t0 = time.time()
        src = _read_part(cfg, "series", part, columns=[SOURCE, TIME, N_TOK])
        if src is None:
            for t in tiers:
                if not manifest.done(f"tier_{t}", part):
                    os.makedirs(_part_dir(cfg.out_root, f"tier_{t}", part), exist_ok=True)
                    manifest.record(f"tier_{t}", part, rows=0, tokens=0, wall_s=0.0)
        else:
            # first tier: distributed partials -> one-block combine, all in
            # Ray workers (the driver only orchestrates — a driver-side
            # concat would be GIL-bound and identical at every cluster size)
            w0 = TIER_WIDTHS[tiers[0]]
            first = rollup.rollup(src, w0)
            stage0 = f"tier_{tiers[0]}"
            out0 = _part_dir(cfg.out_root, stage0, part)
            if not manifest.done(stage0, part):
                rows = _write_tier(first, out0)
                tbl0 = pq.read_table(out0, columns=[SUM_V])
                tokens = int(pa.compute.sum(tbl0[SUM_V]).as_py() or 0)
                manifest.record(
                    stage0, part, rows=rows, tokens=tokens,
                    wall_s=round(time.time() - t0, 3),
                )
                t0 = time.time()
            # higher tiers reaggregate from the (small) materialized tier
            tier_tbl = pq.read_table(out0)
            for tier in tiers[1:]:
                stage = f"tier_{tier}"
                tier_tbl = rollup._finalize(
                    rollup.repartial_batch(tier_tbl, TIER_WIDTHS[tier])
                )
                if manifest.done(stage, part):
                    continue
                rows = _write_tier(tier_tbl, _part_dir(cfg.out_root, stage, part))
                manifest.record(
                    stage, part, rows=rows, tokens=0,
                    wall_s=round(time.time() - t0, 3),
                )
                t0 = time.time()

    if cfg.heavy_mode == "stage":
        return  # gapfill/compress handled by the per-stage jobs

    # ---- optional gap-fill tier (grid points, float n_tok)
    if cfg.gapfill and not manifest.done("gapfill", part):
        t0 = time.time()
        src = _read_part(cfg, "series", part)
        if src is None:
            os.makedirs(_part_dir(cfg.out_root, "gapfill", part), exist_ok=True)
            manifest.record("gapfill", part, rows=0, wall_s=0.0)
        else:
            gf = src.groupby(SOURCE).map_groups(
                lambda g: series.gapfill_group(
                    g, cfg.step, cfg.max_gap, cleaned=True
                ),
                batch_format="pyarrow",
            )
            rows = _write_tier(gf, _part_dir(cfg.out_root, "gapfill", part))
            manifest.record(
                "gapfill", part, rows=rows, wall_s=round(time.time() - t0, 3)
            )

    # ---- optional Gorilla-compressed tier (payload-pruned read)
    if cfg.compress and not manifest.done("compressed", part):
        t0 = time.time()
        src = _read_part(cfg, "series", part, columns=[SOURCE, TIME, "seq", N_TOK, "seg"])
        if src is None:
            os.makedirs(_part_dir(cfg.out_root, "compressed", part), exist_ok=True)
            manifest.record("compressed", part, rows=0, wall_s=0.0)
        else:
            enc = compress_stage.compress(src, cfg.max_gap, cleaned=True)
            rows = _write_tier(enc, _part_dir(cfg.out_root, "compressed", part))
            manifest.record(
                "compressed", part, rows=rows, wall_s=round(time.time() - t0, 3)
            )


def _add_part_batch(b: pa.Table, num_parts: int) -> pa.Table:
    """Vectorized-ish hash-partition column: crc32 per *unique* source."""
    src = b[SOURCE].to_numpy(zero_copy_only=False)
    uniq, inv = np.unique(src, return_inverse=True)
    lut = np.array([part_of(s, num_parts) for s in uniq], dtype=np.int32)
    return b.append_column("part", pa.array(lut[inv]))


def _run_tiers_global(cfg: CascadeConfig, manifest: lineage.Manifest) -> None:
    """'stage'-mode tier chain: one Ray job per tier over all partitions,
    written with partition_cols (resume unit = tier)."""
    tiers = [t for t in TIER_CHAIN if t in cfg.tiers]
    prev_dir = None
    for i, tier in enumerate(tiers):
        stage = f"tier_{tier}"
        out_dir = os.path.join(cfg.out_root, stage)
        if manifest.done(stage, "all"):
            prev_dir = out_dir
            continue
        t0 = time.time()
        if i == 0:
            files = lineage.list_parquet_files(os.path.join(cfg.out_root, "series"))
            if not files:
                os.makedirs(out_dir, exist_ok=True)
                manifest.record(stage, "all", rows=0, tokens=0, wall_s=0.0)
                prev_dir = out_dir
                continue
            src = _coalesced(rd.read_parquet(files, columns=[SOURCE, TIME, N_TOK]))
            dsr = rollup.rollup(src, TIER_WIDTHS[tier])
        else:
            files = lineage.list_parquet_files(prev_dir)
            src = rd.read_parquet(files)
            dsr = rollup.rollup_from_rollup(src, TIER_WIDTHS[tier])
        out = dsr.map_batches(
            lambda b: _add_part_batch(b, cfg.num_parts), batch_format="pyarrow"
        )
        with lineage.atomic_write(out_dir) as tmp:
            out.write_parquet(tmp, partition_cols=["part"])
        rows = _dataset_rows(out_dir)
        tokens = 0
        if tier == "1m":
            tbl = pq.read_table(out_dir, columns=[SUM_V])
            tokens = int(pa.compute.sum(tbl[SUM_V]).as_py() or 0)
        manifest.record(
            stage, "all", rows=rows, tokens=tokens, wall_s=round(time.time() - t0, 3)
        )
        prev_dir = out_dir


def _with_part(tbl: pa.Table, num_parts: int) -> pa.Table:
    """Append the hash-partition column to a single-source group output."""
    if tbl.num_rows == 0:
        return tbl.append_column("part", pa.array([], pa.int32()))
    p = part_of(tbl[SOURCE][0].as_py(), num_parts)
    return tbl.append_column("part", pa.array(np.full(tbl.num_rows, p, np.int32)))


def _run_heavy_stage(cfg: CascadeConfig, manifest: lineage.Manifest, kind: str) -> None:
    """'stage'-mode gapfill/compress: one job over all partitions.

    One shuffle and (for compress) one actor pool total, written with
    ``partition_cols`` so the on-disk layout matches 'part' mode.
    """
    if manifest.done(kind, "all"):
        return
    t0 = time.time()
    files = lineage.list_parquet_files(os.path.join(cfg.out_root, "series"))
    out_dir = os.path.join(cfg.out_root, kind)
    if not files:
        os.makedirs(out_dir, exist_ok=True)
        manifest.record(kind, "all", rows=0, wall_s=0.0)
        return
    # compress never touches the token payload: prune it at the read so the
    # groupby shuffle moves only the skinny columns
    cols = None if kind == "gapfill" else [SOURCE, TIME, "seq", N_TOK, "seg"]
    ds = _coalesced(rd.read_parquet(files, columns=cols))
    if kind == "gapfill":
        out = ds.groupby(SOURCE).map_groups(
            lambda g: _with_part(
                series.gapfill_group(g, cfg.step, cfg.max_gap, cleaned=True),
                cfg.num_parts,
            ),
            batch_format="pyarrow",
        )
    else:
        packed = ds.groupby(SOURCE).map_groups(
            lambda g: _with_part(
                compress_stage.pack_series_group(g, cfg.max_gap, cleaned=True),
                cfg.num_parts,
            ),
            batch_format="pyarrow",
        )
        out = packed.map_batches(
            compress_stage.GorillaEncodePassthrough,
            batch_format="pyarrow",
            concurrency=(1, 16),
            batch_size=4,  # one row per source: small batches fan out the pool
        )
    with lineage.atomic_write(out_dir) as tmp:
        out.write_parquet(tmp, partition_cols=["part"])
    manifest.record(
        kind, "all", rows=_dataset_rows(out_dir), wall_s=round(time.time() - t0, 3)
    )


def _per_source_slices(batch: pa.Table):
    """Iterate whole-source slices of a block.

    Valid because map_groups emits one table per group and blocks are
    concatenations of whole group tables (each source appears as one
    contiguous run).  Tier-parity tests vs the oracle guard this invariant.
    """
    src = batch[SOURCE].to_numpy(zero_copy_only=False)
    if len(src) == 0:
        return
    first = np.flatnonzero(np.r_[True, src[1:] != src[:-1]])
    bounds = np.r_[first, len(src)]
    for a, b in zip(bounds[:-1], bounds[1:]):
        yield batch.slice(a, b - a)


def _gapfill_multi(batch: pa.Table, cfg: CascadeConfig) -> pa.Table:
    outs = [
        _with_part(
            series.gapfill_group(s, cfg.step, cfg.max_gap, cleaned=True),
            cfg.num_parts,
        )
        for s in _per_source_slices(batch)
    ]
    outs = [o for o in outs if o.num_rows]
    if not outs:
        sch = series.gapfill_group(batch.slice(0, 0), cfg.step, cfg.max_gap).schema
        return sch.empty_table().append_column("part", pa.array([], pa.int32()))
    return pa.concat_tables(outs)


def _pack_multi(batch: pa.Table, cfg: CascadeConfig) -> pa.Table:
    outs = [
        _with_part(
            compress_stage.pack_series_group(s, cfg.max_gap, cleaned=True),
            cfg.num_parts,
        )
        for s in _per_source_slices(batch)
    ]
    outs = [o for o in outs if o.num_rows]
    if not outs:
        return compress_stage.PACKED_SCHEMA.empty_table().append_column(
            "part", pa.array([], pa.int32())
        )
    return pa.concat_tables(outs)


def _run_fused_stage_mode(cfg: CascadeConfig, manifest: lineage.Manifest) -> None:
    """'stage'-mode fast path: ONE key shuffle for the whole cascade.

    The per-source clean stage is materialized once (pinned in the object
    store); series write, tier rollups, gap-fill and Gorilla compression all
    consume the pinned blocks with shuffle-free ``map_batches`` — possible
    because those blocks hold whole, time-sorted source groups.  This is the
    small-partition regime by definition; the 'part' mode path streams
    per-partition without pinning for real-scale runs.
    """
    stages_needed = ["series"] + [f"tier_{t}" for t in TIER_CHAIN if t in cfg.tiers]
    if cfg.gapfill:
        stages_needed.append("gapfill")
    if cfg.compress:
        stages_needed.append("compressed")
    if all(manifest.done(s, "all") for s in stages_needed):
        return
    if manifest.done("series", "all"):
        # resumed run: series already on disk; use the per-stage jobs that
        # re-read it rather than recomputing the shuffle
        _run_tiers_global(cfg, manifest)
        if cfg.gapfill:
            _run_heavy_stage(cfg, manifest, "gapfill")
        if cfg.compress:
            _run_heavy_stage(cfg, manifest, "compressed")
        return

    t0 = time.time()
    ds = rd.read_parquet(cfg.input_path)
    ds = ds.map_batches(prepare.prepare, batch_format="pyarrow")
    cleaned = ds.groupby(SOURCE).map_groups(
        lambda g: _clean_with_part(g, cfg.max_gap, cfg.num_parts),
        batch_format="pyarrow",
    )
    mat = cleaned.materialize()

    out = os.path.join(cfg.out_root, "series")
    with lineage.atomic_write(out) as tmp:
        mat.write_parquet(tmp, partition_cols=["part"], min_rows_per_file=250_000)
    manifest.record(
        "series", "all", rows=_dataset_rows(out), wall_s=round(time.time() - t0, 3)
    )

    # tier chain from the pinned blocks: blocks hold whole sources, so the
    # rollups are shuffle-free maps (partials are globally unique per key)
    t0 = time.time()
    tiers = [t for t in TIER_CHAIN if t in cfg.tiers]
    prev = None
    for i, tier in enumerate(tiers):
        stage = f"tier_{tier}"
        out_dir = os.path.join(cfg.out_root, stage)
        if i == 0:
            dsr = rollup.rollup_grouped(mat, TIER_WIDTHS[tier])
        else:
            dsr = rollup.rollup_from_rollup_grouped(prev, TIER_WIDTHS[tier])
        cur = dsr.map_batches(
            lambda b: _add_part_batch(b, cfg.num_parts), batch_format="pyarrow"
        ).materialize()
        with lineage.atomic_write(out_dir) as tmp:
            cur.write_parquet(tmp, partition_cols=["part"])
        rows = _dataset_rows(out_dir)
        tokens = 0
        if tier == "1m":
            tbl = pq.read_table(out_dir, columns=[SUM_V])
            tokens = int(pa.compute.sum(tbl[SUM_V]).as_py() or 0)
        manifest.record(
            stage, "all", rows=rows, tokens=tokens, wall_s=round(time.time() - t0, 3)
        )
        t0 = time.time()
        prev = cur

    if cfg.gapfill:
        t0 = time.time()
        gf = mat.map_batches(
            lambda b: _gapfill_multi(b, cfg), batch_format="pyarrow", batch_size=None
        )
        out_dir = os.path.join(cfg.out_root, "gapfill")
        with lineage.atomic_write(out_dir) as tmp:
            gf.write_parquet(tmp, partition_cols=["part"])
        manifest.record(
            "gapfill", "all", rows=_dataset_rows(out_dir),
            wall_s=round(time.time() - t0, 3),
        )

    if cfg.compress:
        t0 = time.time()
        packed = mat.map_batches(
            lambda b: _pack_multi(b, cfg), batch_format="pyarrow", batch_size=None
        )
        # task-based encode: the codec carries no per-actor state, and an
        # actor pool's spin-up is a fixed serial cost the fused path avoids
        # (the standalone compress stage keeps the actor-pool form)
        enc = packed.map_batches(
            lambda b: compress_stage.GorillaEncodePassthrough()(b),
            batch_format="pyarrow",
            batch_size=4,
        )
        out_dir = os.path.join(cfg.out_root, "compressed")
        with lineage.atomic_write(out_dir) as tmp:
            enc.write_parquet(tmp, partition_cols=["part"])
        manifest.record(
            "compressed", "all", rows=_dataset_rows(out_dir),
            wall_s=round(time.time() - t0, 3),
        )


def apply_retention(cfg: CascadeConfig, manifest: lineage.Manifest) -> dict:
    """Retention pruning = partition drop by bucket watermark.

    ``cfg.retention[tier] = cutoff_epoch`` rewrites each tier partition
    keeping only buckets >= cutoff (the reference's monthly-table drop,
    generalized).  Records a lineage entry per pruned partition.
    """
    import pyarrow.compute as pc

    pruned = {}
    for tier, cutoff in cfg.retention.items():
        stage = f"tier_{tier}"
        for part in range(cfg.num_parts):
            d = _part_dir(cfg.out_root, stage, part)
            files = lineage.list_parquet_files(d)
            if not files:
                continue
            t = pq.read_table(d)
            kept = t.filter(pc.greater_equal(t["bucket"], pa.scalar(cutoff, pa.int64())))
            if kept.num_rows == t.num_rows:
                continue
            with lineage.atomic_write(d) as tmp:
                pq.write_table(kept, os.path.join(tmp, "part-00000.parquet"))
            manifest.record(
                f"retention_{tier}", part, rows=kept.num_rows, dropped=t.num_rows - kept.num_rows
            )
            pruned[tier] = pruned.get(tier, 0) + (t.num_rows - kept.num_rows)
    return pruned


def run_cascade(cfg: CascadeConfig) -> dict:
    """Execute (or resume) the full cascade; returns a metrics summary."""
    t0 = time.time()
    manifest = lineage.Manifest.open(cfg.out_root, cfg.fingerprint())

    parts = list(range(cfg.num_parts))
    if cfg.heavy_mode == "stage":
        # fused fast path: one key shuffle feeds every stage (see
        # _run_fused_stage_mode); right when partitions are small
        _run_fused_stage_mode(cfg, manifest)
    else:
        _run_series_stage(cfg, manifest)
        pending = [p for p in parts if not _part_done(cfg, manifest, p)]
        if pending:
            with ThreadPoolExecutor(max_workers=cfg.max_concurrent_parts) as ex:
                list(ex.map(lambda p: _run_part(cfg, manifest, p), pending))
    if cfg.retention:
        apply_retention(cfg, manifest)

    tokens = sum(r.get("tokens", 0) for r in manifest.completed("tier_1m"))
    rows = next((r["rows"] for r in manifest.completed("series")), 0)
    wall = time.time() - t0
    return {
        "rows": rows,
        "tokens": tokens,
        "wall_s": round(wall, 3),
        "watermarks": {
            s: manifest.watermark(s, parts if cfg.heavy_mode == "part" else ["all"])
            for s in [f"tier_{t}" for t in cfg.tiers]
            + (["gapfill"] if cfg.gapfill else [])
            + (["compressed"] if cfg.compress else [])
        },
    }


def _part_done(cfg: CascadeConfig, manifest: lineage.Manifest, part: int) -> bool:
    stages = [f"tier_{t}" for t in cfg.tiers]
    if cfg.heavy_mode == "part":
        if cfg.gapfill:
            stages.append("gapfill")
        if cfg.compress:
            stages.append("compressed")
    return all(manifest.done(s, part) for s in stages)


def main(argv=None):
    """CLI entry: ``python -m aisdb_ray.pipelines.cascade --input ... --out ...``"""
    import argparse

    import ray

    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--num-parts", type=int, default=16)
    ap.add_argument("--max-gap", type=int, default=series.DEFAULT_MAX_GAP)
    ap.add_argument("--step", type=int, default=series.DEFAULT_STEP)
    ap.add_argument("--gapfill", action="store_true")
    ap.add_argument("--compress", action="store_true")
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args(argv)

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.enable_tensor_extension_casting = False

    cfg = CascadeConfig(
        input_path=args.input,
        out_root=args.out,
        num_parts=args.num_parts,
        max_gap=args.max_gap,
        step=args.step,
        gapfill=args.gapfill,
        compress=args.compress,
    )
    summary = run_cascade(cfg)
    import json

    print(json.dumps(summary))
    ray.shutdown()


if __name__ == "__main__":
    main()
