"""The flagship pipeline: raw -> series -> 1m -> 1h -> 1d retention cascade.

Layout of a run directory (all writes atomic, see state/lineage.py):

    <out_root>/
      manifest.jsonl            lineage ledger + metrics
      series/part=K/*.parquet   cleaned, deduped, segmented POINTS
                                (doc_id, source, time, seq, n_tok, seg),
                                hash-partitioned by source (K = crc32 % P)
      tier_1m/part=K/*.parquet  per-(source, minute bucket) stats
      tier_1h/part=K/*.parquet  reaggregated from 1m  (exact, algebraic)
      tier_1d/part=K/*.parquet  reaggregated from 1h
      gapfill/part=K/*.parquet  optional gap-filled grid tier (skinny:
                                source, time, n_tok, seg, is_original)
      compressed/part=K/*.parquet  optional Gorilla-encoded chunk rows

Payload policy (SURVEY.md §7.4.5): the ``tokens`` list column is validated at
the read (len == n_tok) and then NEVER moves again — it is dropped before the
shuffle and is not copied into any tier.  The input lake remains the payload
store; ``doc_id`` in the series tier is the provenance key that joins payload
back on demand (functions/export.rehydrate).  At 100 TB this is the
difference between shuffling ~50 B/row and shuffling the whole corpus.

Skew policy: the primary shuffle groups by ``(source, chunk = time//chunk_s)``
— the salted-key layout the north rule requires (stages/salted.py).  A hot
source holding 30% of all rows becomes thousands of bounded chunk tasks
instead of one giant task, for cleaning, gap-fill AND compression packing.
``chunk_s`` (default 1 day) must be a multiple of every tier width so chunk
boundaries never split a rollup bucket — which keeps the tier cascade
co-partitioned and shuffle-free (the reference's TimescaleDB layout: hash
partitions on mmsi x 7-day time chunks,
/root/reference/aisdb/aisdb_sql/timescale_createtable_dynamic.sql:17-23).

Resume: the manifest records each completed (stage, partition); a rerun
recomputes only missing partitions (file-checksum-ledger spirit,
/root/reference/aisdb/database/decoder.py:207-231).
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

from aisdb_ray.schema import IS_ORIGINAL, N_TOK, SEG, SEQ, SOURCE, SUM_V, TIME, TOKENS
from aisdb_ray.stages import compress as compress_stage
from aisdb_ray.stages import prepare, rollup, salted, series
from aisdb_ray.state import lineage

from aisdb_ray.functions.codes import factorize_sorted

TIER_WIDTHS = {"1m": 60, "1h": 3600, "1d": 86400}
TIER_CHAIN = ["1m", "1h", "1d"]

# the gap-fill tier is analytical: provenance (doc_id/seq) lives in the
# series tier, payload in the input lake — neither is duplicated here
GAPFILL_TIER_COLS = [SOURCE, TIME, N_TOK, SEG, IS_ORIGINAL]

# zstd: ~2-3x smaller tiers than snappy at modest CPU cost — trades
# non-scaling shared-disk bandwidth for per-task compute that does scale
WRITE_ARGS = dict(compression="zstd")


@dataclass
class CascadeConfig:
    input_path: str
    out_root: str
    num_parts: int = 16
    max_gap: int = series.DEFAULT_MAX_GAP
    step: int = series.DEFAULT_STEP
    chunk_s: int = salted.DEFAULT_CHUNK_S  # salt granularity; multiple of 1d
    tiers: tuple = ("1m", "1h", "1d")
    gapfill: bool = False
    compress: bool = False
    # materialize OHLC candle tiers (ohlc_1m/1h/1d) alongside the stats
    # tiers, in PARTIAL (packed arg-extreme) form so higher tiers and
    # refreshes reaggregate exactly; finalize with rollup._finalize_ohlc
    # when serving.  Part mode only (the resume unit is the partition).
    ohlc: bool = False
    max_concurrent_parts: int = 4
    retention: dict = field(default_factory=dict)  # tier -> keep-after epoch
    # how the heavy gapfill/compress tiers are scheduled:
    #   "part"  — one Ray job per hash partition (finest resume granularity;
    #             right when partitions are large, i.e. real-scale runs)
    #   "stage" — one pinned-shuffle job feeding every stage (right when
    #             partitions are small and per-job overhead dominates)
    heavy_mode: str = "part"
    # where the disk-backed hash exchange stages its partitions.  Default:
    # <out_root>/_shuffle.  On a multi-node cluster exchange bandwidth
    # scales with nodes; on one box a shared disk does not — pointing this
    # at tmpfs (/dev/shm) reproduces the cluster's scaling behavior.  The
    # exchange only ever creates/wipes its own namespaced SUBDIRECTORY of
    # this path (salted.exchange_dir), so sharing a root like /dev/shm is
    # safe.  Not part of the fingerprint: staging is transient, never an
    # output.
    staging_dir: str | None = None

    def fingerprint(self) -> str:
        """Config-only fingerprint: a changed CONFIG restarts the run clean.
        Input files are tracked separately (the ``_inputs`` manifest record)
        so that appended files trigger an incremental refresh of only the
        affected partitions — the continuous-aggregate semantics — instead
        of invalidating the whole manifest; modified or deleted inputs still
        force a clean restart (see run_cascade)."""
        extra = {
            "num_parts": self.num_parts,
            "max_gap": self.max_gap,
            "step": self.step,
            "chunk_s": self.chunk_s,
            "tiers": list(self.tiers),
            "gapfill": self.gapfill,
            "compress": self.compress,
            "ohlc": self.ohlc,
            "heavy_mode": self.heavy_mode,
            "retention": {k: int(v) for k, v in sorted(self.retention.items())},
        }
        return lineage.fingerprint_paths([], extra)


def _input_sigs(input_path: str) -> dict:
    """{file: "size:mtime"} for every input parquet — the generation map."""
    out = {}
    for p in lineage.list_parquet_files(input_path):
        st = os.stat(p)
        out[p] = f"{st.st_size}:{int(st.st_mtime)}"
    return out


def part_of(source: str, num_parts: int) -> int:
    return zlib.crc32(source.encode()) % num_parts


def _dataset_rows(path: str) -> int:
    """Row count from parquet footers — thread-pooled (I/O-bound, GIL-free);
    a serial footer walk is a fixed driver-side cost that caps scaling."""
    files = lineage.list_parquet_files(path)
    if len(files) <= 4:
        return sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    with ThreadPoolExecutor(min(16, len(files))) as ex:
        return sum(ex.map(lambda f: pq.ParquetFile(f).metadata.num_rows, files))


def _part_dir(root: str, stage: str, part: int) -> str:
    """On-disk partition dir.  Ray's partition_cols writes hive 'part=K';
    directly-written per-part stages use 'part-K' (Ray's write-path URI
    sniffing cannot handle '=' in target paths).  Readers glob both."""
    hive = os.path.join(root, stage, f"part={part}")
    if os.path.isdir(hive):
        return hive
    return os.path.join(root, stage, f"part-{part}")


def _add_part_batch(b: pa.Table, num_parts: int) -> pa.Table:
    """Vectorized hash-partition column: crc32 per *unique* source.

    Null sources route to part 0 (the _key_hash convention): factorize
    codes them -1, and lut[-1] would alias them to whichever source sorts
    LAST in that batch — a different part per batch, breaking the
    one-part-per-key invariant the tiers and refresh depend on."""
    src = b[SOURCE].to_numpy(zero_copy_only=False)
    uniq, inv = factorize_sorted(src)
    lut = np.array([part_of(s, num_parts) for s in uniq], dtype=np.int32)
    part = lut[inv] if len(lut) else np.zeros(len(inv), np.int32)
    if (inv < 0).any():
        part = np.where(inv < 0, np.int32(0), part)
    return b.append_column("part", pa.array(part))


def _drop_payload(b: pa.Table) -> pa.Table:
    return b.drop_columns([c for c in (TOKENS,) if c in b.column_names])


def _coalesced(ds):
    """Merge many tiny input blocks before a shuffle: a sort over B blocks
    creates O(B^2) shuffle objects, which dominates wall time when B is
    hundreds of per-source files (measured 50s -> 9s on an 8M-row pack)."""
    import ray

    ncpu = int(ray.cluster_resources().get("CPU", 8))
    return ds.repartition(max(8, ncpu * 2))


def _clean_pinned(cfg: CascadeConfig):
    """read -> prepare -> drop payload -> ONE salted hash exchange -> pinned.

    The exchange is the disk-backed hash shuffle (salted.clean_chunks_staged):
    a map-only compressed staging write partitioned by hash(source, chunk),
    then one vectorized clean task per staging partition — no global sort
    barrier, task memory bounded by partition size.  Everything downstream
    (series write, tiers, gap-fill, packing) consumes the pinned chunk
    blocks plus the O(#chunks) broadcast reconciliation map.
    """
    ds = rd.read_parquet(cfg.input_path)
    ds = ds.map_batches(prepare.prepare, batch_format="pyarrow")
    ds = ds.map_batches(_drop_payload, batch_format="pyarrow")
    staging = cfg.staging_dir or os.path.join(cfg.out_root, "_shuffle")
    mat, recon_ref = salted.clean_chunks_staged(
        ds, cfg.max_gap, cfg.chunk_s, staging,
        num_staging_parts=max(16, cfg.num_parts * 4),
    )
    # The exchange's stage files must outlive every consumer of `mat`:
    # although mat is pinned, on a multi-node cluster a lost node makes
    # Ray reconstruct the missing blocks by RE-RUNNING the phase-B tasks,
    # which re-read the stage files — deleting them here would turn a
    # recoverable object loss into a fatal FileNotFoundError inside
    # lineage reconstruction.  Cleanup happens in _cleanup_exchange once
    # no consumer can reference the pinned blocks.
    return mat, recon_ref


def _cleanup_exchange(cfg: CascadeConfig) -> None:
    """Delete the exchange's namespaced staging subdirectory (stage data,
    summaries, recon files).  Only safe after every consumer of the
    pinned exchange blocks has completed — see _clean_pinned."""
    import shutil

    root = cfg.staging_dir or os.path.join(cfg.out_root, "_shuffle")
    shutil.rmtree(salted.exchange_dir(root), ignore_errors=True)


def _write_series(cfg: CascadeConfig, manifest: lineage.Manifest, mat, recon_ref) -> None:
    if manifest.done("series", "all"):
        return
    t0 = time.time()
    rel = salted.relabel_blocks(mat, recon_ref).map_batches(
        lambda b: _add_part_batch(b, cfg.num_parts), batch_format="pyarrow",
        batch_size=None,
    )
    out = os.path.join(cfg.out_root, "series")
    with lineage.atomic_write(out) as tmp:
        # merge per-chunk blocks into sizeable files: hundreds of tiny files
        # turn every downstream scan into a tiny-object storm
        rel.write_parquet(
            tmp, partition_cols=["part"], min_rows_per_file=250_000, **WRITE_ARGS
        )
    manifest.record(
        "series", "all", rows=_dataset_rows(out), wall_s=round(time.time() - t0, 3)
    )


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
            pq.write_table(
                ds_or_table, os.path.join(tmp, "part-00000.parquet"),
                compression="zstd",
            )
        else:
            ds_or_table.write_parquet(tmp, **WRITE_ARGS)
    return _dataset_rows(out_dir)


# ---------------------------------------------------------------- part mode

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

    # ---- optional OHLC candle tiers, partial (packed) form — same chain
    # shape as the stats tiers: distributed first tier, in-memory exact
    # reaggregation for the higher ones
    if cfg.ohlc and tiers and not all(
        manifest.done(f"ohlc_{t}", part) for t in tiers
    ):
        t0 = time.time()
        src = _read_part(cfg, "series", part, columns=[SOURCE, TIME, SEQ, N_TOK])
        if src is None:
            for t in tiers:
                if not manifest.done(f"ohlc_{t}", part):
                    os.makedirs(_part_dir(cfg.out_root, f"ohlc_{t}", part), exist_ok=True)
                    manifest.record(f"ohlc_{t}", part, rows=0, wall_s=0.0)
        else:
            stage0 = f"ohlc_{tiers[0]}"
            out0 = _part_dir(cfg.out_root, stage0, part)
            if not manifest.done(stage0, part):
                first = rollup.ohlc_partial_tier(src, TIER_WIDTHS[tiers[0]])
                rows = _write_tier(first, out0)
                manifest.record(
                    stage0, part, rows=rows, wall_s=round(time.time() - t0, 3)
                )
                t0 = time.time()
            tier_tbl = pq.read_table(out0)
            for tier in tiers[1:]:
                stage = f"ohlc_{tier}"
                tier_tbl = rollup.reohlc_batch(tier_tbl, TIER_WIDTHS[tier])
                if manifest.done(stage, part):
                    continue
                rows = _write_tier(tier_tbl, _part_dir(cfg.out_root, stage, part))
                manifest.record(
                    stage, part, rows=rows, wall_s=round(time.time() - t0, 3)
                )
                t0 = time.time()

    if cfg.heavy_mode == "stage":
        return  # gapfill/compress handled by the per-stage jobs

    # ---- optional gap-fill tier: grouped by (source, seg) — segments never
    # span a >= max_gap gap, so grids are independent and a hot source's
    # work spreads across its segments (the skew-safe layout)
    if cfg.gapfill and not manifest.done("gapfill", part):
        t0 = time.time()
        src = _read_part(cfg, "series", part)
        if src is None:
            os.makedirs(_part_dir(cfg.out_root, "gapfill", part), exist_ok=True)
            manifest.record("gapfill", part, rows=0, wall_s=0.0)
        else:
            gf = salted.gapfill_series_by_segment(
                src, cfg.step, cfg.max_gap
            ).select_columns(GAPFILL_TIER_COLS)
            rows = _write_tier(gf, _part_dir(cfg.out_root, "gapfill", part))
            manifest.record(
                "gapfill", part, rows=rows, wall_s=round(time.time() - t0, 3)
            )

    # ---- optional Gorilla-compressed tier: packed per (source, time chunk)
    if cfg.compress and not manifest.done("compressed", part):
        t0 = time.time()
        src = _read_part(cfg, "series", part, columns=[SOURCE, TIME, SEQ, N_TOK, SEG])
        if src is None:
            os.makedirs(_part_dir(cfg.out_root, "compressed", part), exist_ok=True)
            manifest.record("compressed", part, rows=0, wall_s=0.0)
        else:
            # packing window = 32 chunks: bounded (skew-safe) but big enough
            # to amortize the codec's fixed per-stream cost
            chunked = src.map_batches(
                lambda b: salted._add_chunk(b, cfg.chunk_s * 32),
                batch_format="pyarrow",
            )
            packed = chunked.groupby([SOURCE, salted.CHUNK_COL]).map_groups(
                lambda g: compress_stage.pack_chunk_group(g, salted.CHUNK_COL),
                batch_format="pyarrow",
            )
            enc = packed.map_batches(
                compress_stage.GorillaEncodePassthrough,
                batch_format="pyarrow",
                concurrency=(1, 8),
                batch_size=32,
            )
            rows = _write_tier(enc, _part_dir(cfg.out_root, "compressed", part))
            manifest.record(
                "compressed", part, rows=rows, wall_s=round(time.time() - t0, 3)
            )


# --------------------------------------------------------------- stage mode

def _run_tiers_global(cfg: CascadeConfig, manifest: lineage.Manifest) -> None:
    """Resume-path tier chain: one Ray job per tier over all partitions,
    reading the on-disk series tier (resume unit = tier)."""
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
            out.write_parquet(tmp, partition_cols=["part"], **WRITE_ARGS)
        rows = _dataset_rows(out_dir)
        tokens = 0
        if tier == "1m":
            tbl = pq.read_table(out_dir, columns=[SUM_V])
            tokens = int(pa.compute.sum(tbl[SUM_V]).as_py() or 0)
        manifest.record(
            stage, "all", rows=rows, tokens=tokens, wall_s=round(time.time() - t0, 3)
        )
        prev_dir = out_dir


def _run_heavy_stage(cfg: CascadeConfig, manifest: lineage.Manifest, kind: str) -> None:
    """Resume-path gapfill/compress: one job over all partitions, reading
    the on-disk series tier; written with ``partition_cols`` so the layout
    matches the pinned-path output."""
    if manifest.done(kind, "all"):
        return
    t0 = time.time()
    files = lineage.list_parquet_files(os.path.join(cfg.out_root, "series"))
    out_dir = os.path.join(cfg.out_root, kind)
    if not files:
        os.makedirs(out_dir, exist_ok=True)
        manifest.record(kind, "all", rows=0, wall_s=0.0)
        return
    cols = None if kind == "gapfill" else [SOURCE, TIME, SEQ, N_TOK, SEG]
    ds = _coalesced(rd.read_parquet(files, columns=cols))
    if kind == "gapfill":
        out = salted.gapfill_series_by_segment(ds, cfg.step, cfg.max_gap)
        out = out.select_columns(GAPFILL_TIER_COLS).map_batches(
            lambda b: _add_part_batch(b, cfg.num_parts), batch_format="pyarrow"
        )
    else:
        chunked = ds.map_batches(
            lambda b: salted._add_chunk(b, cfg.chunk_s * 32), batch_format="pyarrow"
        )
        packed = chunked.groupby([SOURCE, salted.CHUNK_COL]).map_groups(
            lambda g: compress_stage.pack_chunk_group(g, salted.CHUNK_COL),
            batch_format="pyarrow",
        ).map_batches(
            lambda b: _add_part_batch(b, cfg.num_parts), batch_format="pyarrow"
        )
        out = packed.map_batches(
            compress_stage.GorillaEncodePassthrough,
            batch_format="pyarrow",
            concurrency=(1, 16),
            batch_size=32,
        )
    with lineage.atomic_write(out_dir) as tmp:
        out.write_parquet(tmp, partition_cols=["part"], **WRITE_ARGS)
    manifest.record(
        kind, "all", rows=_dataset_rows(out_dir), wall_s=round(time.time() - t0, 3)
    )


def _run_fused_stage_mode(cfg: CascadeConfig, manifest: lineage.Manifest) -> None:
    """'stage'-mode fast path: ONE salted key shuffle for the whole cascade.

    The per-chunk clean stage is materialized once (pinned in the object
    store; skinny — the payload never entered the shuffle); series write,
    tier rollups, gap-fill and Gorilla packing all consume the pinned
    blocks with shuffle-free ``map_batches`` — possible because those
    blocks hold whole, time-sorted (source, chunk) groups and chunk
    boundaries align with every tier bucket.
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
    mat, recon_ref = _clean_pinned(cfg)
    manifest.record("exchange", "all", wall_s=round(time.time() - t0, 3))

    # Every remaining stage reads the SAME pinned blocks and writes its own
    # output — independent dataflows, so they run as CONCURRENT Ray
    # executions: the streaming executor interleaves their tasks, filling
    # the scheduling gaps (stage startup, stragglers, write tails) that
    # would otherwise idle most of a large cluster between stages.
    def do_tiers():
        # tier chain from the pinned blocks: blocks hold whole
        # (source, chunk) groups and chunk_s is a multiple of every tier
        # width, so per-block partials are already globally unique per
        # (source, bucket) — the rollups are shuffle-free maps
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
                cur.write_parquet(
                    tmp, partition_cols=["part"], min_rows_per_file=100_000,
                    **WRITE_ARGS,
                )
            rows = cur.count()  # metadata-cheap on a materialized dataset
            tokens = 0
            if tier == "1m":
                tokens = int(cur.sum(SUM_V) or 0)  # distributed sum
            manifest.record(
                stage, "all", rows=rows, tokens=tokens,
                wall_s=round(time.time() - t0, 3),
            )
            t0 = time.time()
            prev = cur

    def do_gapfill():
        if not (cfg.gapfill and not manifest.done("gapfill", "all")):
            return
        t0 = time.time()
        gf = salted.gapfill_blocks(
            mat, recon_ref, cfg.step, with_provenance=False
        ).map_batches(
            lambda b: _add_part_batch(b.select(GAPFILL_TIER_COLS), cfg.num_parts),
            batch_format="pyarrow",
            batch_size=None,
        )
        out_dir = os.path.join(cfg.out_root, "gapfill")
        with lineage.atomic_write(out_dir) as tmp:
            gf.write_parquet(
                tmp, partition_cols=["part"], min_rows_per_file=100_000, **WRITE_ARGS
            )
        manifest.record(
            "gapfill", "all", rows=_dataset_rows(out_dir),
            wall_s=round(time.time() - t0, 3),
        )

    def do_compressed():
        if not (cfg.compress and not manifest.done("compressed", "all")):
            return
        t0 = time.time()
        packed = salted.pack_blocks(mat, recon_ref).map_batches(
            lambda b: _add_part_batch(b, cfg.num_parts),
            batch_format="pyarrow",
            batch_size=None,
        )
        # task-based encode: the codec carries no per-actor state, and an
        # actor pool's spin-up is a fixed serial cost the fused path avoids
        # (the standalone compress stage keeps the actor-pool form); small
        # batches of ~32k-point packed rows keep every core fed
        enc = packed.map_batches(
            lambda b: compress_stage.GorillaEncodePassthrough()(b),
            batch_format="pyarrow",
            batch_size=8,
        )
        out_dir = os.path.join(cfg.out_root, "compressed")
        with lineage.atomic_write(out_dir) as tmp:
            enc.write_parquet(tmp, partition_cols=["part"], **WRITE_ARGS)
        manifest.record(
            "compressed", "all", rows=_dataset_rows(out_dir),
            wall_s=round(time.time() - t0, 3),
        )

    jobs = [lambda: _write_series(cfg, manifest, mat, recon_ref), do_tiers,
            do_gapfill, do_compressed]
    with ThreadPoolExecutor(max_workers=len(jobs)) as ex:
        futs = [ex.submit(j) for j in jobs]
        for f in futs:
            f.result()  # propagate the first failure
    # all consumers done: stage data, summaries and recon files can go
    del mat, recon_ref
    _cleanup_exchange(cfg)


def _tier_part_dirs(root: str, stage: str) -> list[tuple[str, str]]:
    """(partition_label, dir) for every on-disk partition of a tier stage,
    covering both layouts: hive 'part=K' (partition_cols writes) and
    'part-K' (direct per-part writes)."""
    base = os.path.join(root, stage)
    if not os.path.isdir(base):
        return []
    out = []
    for d in sorted(os.listdir(base)):
        full = os.path.join(base, d)
        if os.path.isdir(full) and (d.startswith("part=") or d.startswith("part-")):
            out.append((d[5:], full))
    return out


def apply_retention(cfg: CascadeConfig, manifest: lineage.Manifest) -> dict:
    """Retention pruning = partition drop by bucket watermark.

    ``cfg.retention[tier] = cutoff_epoch`` rewrites each tier partition
    keeping only buckets >= cutoff (the reference's monthly-table drop,
    generalized).  Records a lineage entry per pruned partition.  Handles
    both on-disk partition layouts (hive and direct).
    """
    import pyarrow.compute as pc

    pruned = {}
    for tier, cutoff in cfg.retention.items():
        # plain names prune the stats tiers; 'ohlc_*' / 'tier_*' keys
        # address a stage directly (candle tiers carry 'bucket' too)
        stage = tier if tier.startswith(("tier_", "ohlc_")) else f"tier_{tier}"
        for label, d in _tier_part_dirs(cfg.out_root, stage):
            files = lineage.list_parquet_files(d)
            if not files:
                continue
            t = pa.concat_tables([pq.read_table(f) for f in files], promote_options="default")
            kept = t.filter(pc.greater_equal(t["bucket"], pa.scalar(cutoff, pa.int64())))
            if kept.num_rows == t.num_rows:
                continue
            with lineage.atomic_write(d) as tmp:
                pq.write_table(
                    kept, os.path.join(tmp, "part-00000.parquet"), compression="zstd"
                )
            manifest.record(
                f"retention_{tier}", label, rows=kept.num_rows,
                dropped=t.num_rows - kept.num_rows,
            )
            pruned[tier] = pruned.get(tier, 0) + (t.num_rows - kept.num_rows)
    return pruned


# ---------------------------------------------------- incremental refresh

# series-tier identity columns: what a re-clean needs (seg is recomputed)
_SERIES_ID_COLS = ["doc_id", SOURCE, TIME, SEQ, N_TOK]


def _refresh_parts(cfg: CascadeConfig, manifest: lineage.Manifest,
                   new_files: list[str]) -> dict:
    """Incremental continuous-aggregate refresh: fold newly-appended input
    files into an already-built cascade, recomputing ONLY the hash
    partitions their sources touch (TimescaleDB's continuous-aggregate
    invalidation, expressed as partition-granular recompute; the reference's
    per-month rebuild in /root/reference/aisdb/database/dbconn.py:110-197 is
    the coarse ancestor).

    Soundness: clean = keep-first dedup on (time, seq) + sort + re-segment
    is a pure function of a source's ROW SET, so re-cleaning
    (old series rows ∪ new prepared rows) equals a full recompute over all
    input — duplicates collapse deterministically (exact-copy duplicates,
    the O4 PK contract) and segments that a new row bridges merge exactly.
    The same property makes refresh IDEMPOTENT: re-running it after a
    mid-refresh kill re-unions rows that are already in the series tier and
    dedup removes them, so tombstoned tier partitions are simply rebuilt.
    """
    import shutil

    t0 = time.time()
    # crash recovery from a prior refresh killed mid-swap: a '<dir>.old'
    # sibling is the displaced durable copy — restore it if the live dir
    # vanished (killed between the two renames), else it is stale debris
    series_root = os.path.join(cfg.out_root, "series")
    if os.path.isdir(series_root):
        for d in os.listdir(series_root):
            if not d.endswith(".old"):
                continue
            old = os.path.join(series_root, d)
            live = old[: -len(".old")]
            if os.path.isdir(live):
                shutil.rmtree(old)
            else:
                os.replace(old, live)

    new = rd.read_parquet(new_files)
    new = new.map_batches(prepare.prepare, batch_format="pyarrow")
    new = new.map_batches(_drop_payload, batch_format="pyarrow")
    new = new.map_batches(
        lambda b: _add_part_batch(b, cfg.num_parts), batch_format="pyarrow"
    ).materialize()  # the increment: small vs the corpus, pinned once
    affected = sorted(int(p) for p in new.unique("part"))
    if not affected:
        return {"new_files": len(new_files), "affected_parts": []}

    # one job re-cleans every affected part: union(old series rows, new rows)
    # -> the engine's standard key shuffle -> hive part dirs swapped in place
    old_files = [
        f
        for part in affected
        for f in lineage.list_parquet_files(_part_dir(cfg.out_root, "series", part))
    ]
    un = new.select_columns(_SERIES_ID_COLS)
    if old_files:
        un = un.union(
            rd.read_parquet(old_files, columns=_SERIES_ID_COLS)
            .select_columns(_SERIES_ID_COLS)
        )
    cleaned = series.clean_series(un, cfg.max_gap).map_batches(
        lambda b: _add_part_batch(b, cfg.num_parts), batch_format="pyarrow",
        batch_size=None,
    )
    tmp = os.path.join(cfg.out_root, "_refresh_tmp")
    shutil.rmtree(tmp, ignore_errors=True)
    cleaned.write_parquet(
        tmp, partition_cols=["part"], min_rows_per_file=250_000, **WRITE_ARGS
    )
    for part in affected:
        src = os.path.join(tmp, f"part={part}")
        if not os.path.isdir(src):
            continue  # part had rows before dedup only; nothing new survives
        dst = _part_dir(cfg.out_root, "series", part)
        # two-phase swap: the durable old copy is DISPLACED (rename), never
        # deleted, until the new dir is in place — a kill in the window
        # leaves '<dst>.old', which the recovery sweep above restores; only
        # then is the stale copy removed
        old = dst + ".old"
        if os.path.isdir(old):
            shutil.rmtree(old)
        if os.path.isdir(dst):
            os.replace(dst, old)
        os.replace(src, dst)  # the atomic commit point per partition
        shutil.rmtree(old, ignore_errors=True)
    shutil.rmtree(tmp, ignore_errors=True)

    # retract + rebuild the derived tiers for the affected partitions only
    stages = [f"tier_{t}" for t in cfg.tiers]
    if cfg.ohlc:
        stages += [f"ohlc_{t}" for t in cfg.tiers]
    if cfg.gapfill:
        stages.append("gapfill")
    if cfg.compress:
        stages.append("compressed")
    for part in affected:
        for s in stages:
            manifest.invalidate(s, part)
    part_cfg = cfg if cfg.heavy_mode == "part" else CascadeConfig(
        **{**cfg.__dict__, "heavy_mode": "part"}
    )
    with ThreadPoolExecutor(max_workers=cfg.max_concurrent_parts) as ex:
        list(ex.map(lambda p: _run_part(part_cfg, manifest, p), affected))

    # stage-mode manifests carry ("all") totals — re-derive them from disk
    # so the summary metrics stay truthful after a partial rebuild
    manifest.record(
        "series", "all", rows=_dataset_rows(os.path.join(cfg.out_root, "series")),
        refreshed_parts=affected,
    )
    for s in stages:  # every stage-mode ("all") total the rebuild changed
        if manifest.get(s, "all") is None:
            continue
        extra = {}
        if s == "tier_1m":
            files = lineage.list_parquet_files(os.path.join(cfg.out_root, s))

            def _tok(f: str) -> int:
                col = pq.read_table(f, columns=[SUM_V])[SUM_V]
                return int(pa.compute.sum(col).as_py() or 0)

            # thread-pooled like _dataset_rows: a serial per-file read is
            # a fixed driver-side cost that grows with partition count
            if len(files) <= 4:
                extra["tokens"] = sum(_tok(f) for f in files)
            else:
                with ThreadPoolExecutor(min(16, len(files))) as ex:
                    extra["tokens"] = sum(ex.map(_tok, files))
        manifest.record(
            s, "all", rows=_dataset_rows(os.path.join(cfg.out_root, s)),
            refreshed_parts=affected, **extra,
        )
    return {
        "new_files": len(new_files),
        "affected_parts": affected,
        "refresh_wall_s": round(time.time() - t0, 3),
    }


def run_cascade(cfg: CascadeConfig) -> dict:
    """Execute (or resume) the full cascade; returns a metrics summary.

    Continuous-aggregate behavior: re-running over an input directory that
    has GROWN since the recorded generation finishes any pending work, then
    incrementally refreshes only the partitions the new files touch
    (_refresh_parts).  Modified or deleted input files force a clean restart
    (mixing generations of a mutated file is unsound)."""
    t0 = time.time()
    if cfg.ohlc and cfg.heavy_mode != "part":
        raise ValueError("ohlc tiers require heavy_mode='part'")
    if cfg.heavy_mode == "stage":
        # fused stage mode's tiers are shuffle-free ONLY because every
        # (source, tier-bucket) lives inside one (source, chunk) group —
        # which requires chunk_s to be a multiple of every enabled tier
        # width.  A violation would silently emit duplicate bucket rows
        # with partial stats, so reject it up front (part mode is
        # bucket-correct regardless: partitions are hash(source)).
        for t in cfg.tiers:
            w = TIER_WIDTHS[t]
            if cfg.chunk_s % w != 0:
                raise ValueError(
                    f"heavy_mode='stage' requires chunk_s ({cfg.chunk_s}) "
                    f"to be a multiple of every enabled tier width; tier "
                    f"{t!r} has width {w}"
                )
    manifest = lineage.Manifest.open(cfg.out_root, cfg.fingerprint())
    if manifest.was_stale:
        # a CONFIG change (e.g. fewer num_parts) leaves part dirs the new
        # run never rewrites — tier reads glob every part dir, so stale
        # partitions would silently mix into served results
        import shutil as _sh

        for d in sorted(os.listdir(cfg.out_root)):
            if d.startswith(("series", "tier_", "ohlc_", "gapfill",
                             "compressed")):
                _sh.rmtree(os.path.join(cfg.out_root, d), ignore_errors=True)

    cur_sigs = _input_sigs(cfg.input_path)
    gen = manifest.get("_inputs", "all")
    new_files: list[str] = []
    if gen is not None:
        rec_sigs = gen["files"]
        unchanged = all(cur_sigs.get(p) == s for p, s in rec_sigs.items())
        if unchanged and set(rec_sigs) == set(cur_sigs):
            pass  # same generation: plain resume
        elif unchanged:
            new_files = sorted(set(cur_sigs) - set(rec_sigs))
        else:
            # a recorded file changed or vanished: restart clean — and
            # clear the OUTPUT dirs like the config-stale path does, or a
            # partition that is empty in the new generation keeps serving
            # the previous generation's tier/gapfill/compressed files to
            # every glob-all-parts reader
            import shutil as _sh2

            os.remove(manifest.path)
            for d in sorted(os.listdir(cfg.out_root)):
                if d.startswith(("series", "tier_", "ohlc_", "gapfill",
                                 "compressed")):
                    _sh2.rmtree(os.path.join(cfg.out_root, d),
                                ignore_errors=True)
            manifest = lineage.Manifest.open(cfg.out_root, cfg.fingerprint())
            gen = None
    if gen is None:
        manifest.record("_inputs", "all", files=cur_sigs)

    parts = list(range(cfg.num_parts))
    if cfg.heavy_mode == "stage":
        # fused fast path: one salted shuffle feeds every stage (see
        # _run_fused_stage_mode); right when partitions are small
        _run_fused_stage_mode(cfg, manifest)
    else:
        if not manifest.done("series", "all"):
            t0x = time.time()
            mat, recon_ref = _clean_pinned(cfg)
            manifest.record("exchange", "all", wall_s=round(time.time() - t0x, 3))
            _write_series(cfg, manifest, mat, recon_ref)
            del mat, recon_ref  # release pinned blocks before per-part jobs
            _cleanup_exchange(cfg)  # per-part stages re-read series from disk
        pending = [p for p in parts if not _part_done(cfg, manifest, p)]
        if pending:
            with ThreadPoolExecutor(max_workers=cfg.max_concurrent_parts) as ex:
                list(ex.map(lambda p: _run_part(cfg, manifest, p), pending))

    refresh_info = {}
    if new_files:
        refresh_info = _refresh_parts(cfg, manifest, new_files)
        manifest.record("_inputs", "all", files=cur_sigs)  # commit generation

    if cfg.retention:
        apply_retention(cfg, manifest)

    recs_1m = manifest.completed("tier_1m")
    all_1m = next((r for r in recs_1m if r["partition"] == "all"), None)
    tokens = (
        all_1m.get("tokens", 0)
        if all_1m is not None
        else sum(r.get("tokens", 0) for r in recs_1m)
    )
    rows = (manifest.get("series", "all") or {}).get("rows", 0)
    wall = time.time() - t0
    return {
        "rows": rows,
        "tokens": tokens,
        "wall_s": round(wall, 3),
        **({"refresh": refresh_info} if refresh_info else {}),
        "watermarks": {
            s: manifest.watermark(s, parts if cfg.heavy_mode == "part" else ["all"])
            for s in [f"tier_{t}" for t in cfg.tiers]
            + ([f"ohlc_{t}" for t in cfg.tiers] if cfg.ohlc else [])
            + (["gapfill"] if cfg.gapfill else [])
            + (["compressed"] if cfg.compress else [])
        },
    }


def _part_done(cfg: CascadeConfig, manifest: lineage.Manifest, part: int) -> bool:
    stages = [f"tier_{t}" for t in cfg.tiers]
    if cfg.heavy_mode == "part":
        if cfg.ohlc:
            stages += [f"ohlc_{t}" for t in cfg.tiers]
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
    ap.add_argument("--chunk-s", type=int, default=salted.DEFAULT_CHUNK_S)
    ap.add_argument("--gapfill", action="store_true")
    ap.add_argument("--compress", action="store_true")
    ap.add_argument("--ohlc", action="store_true")
    ap.add_argument("--num-cpus", type=int, default=None)
    # 'local' = single-node session; 'auto' = join the running cluster —
    # what a `ray job submit` entrypoint uses (the job server exports
    # RAY_ADDRESS, which wins over this default)
    ap.add_argument(
        "--address", default=os.environ.get("RAY_ADDRESS", "local")
    )
    args = ap.parse_args(argv)

    if not ray.is_initialized():
        ray.init(
            address=args.address,
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
        chunk_s=args.chunk_s,
        gapfill=args.gapfill,
        compress=args.compress,
        ohlc=args.ohlc,
    )
    summary = run_cascade(cfg)
    import json

    print(json.dumps(summary))
    ray.shutdown()


if __name__ == "__main__":
    main()
