"""Skew handling for per-series sequence operators: salted (time-chunked)
groups with exact boundary reconciliation.

The north rule calls out salted keys for skewed sources explicitly
(SURVEY.md §4 'skew'): one source holding 30% of all rows turns a naive
``groupby(source)`` into a single giant task.  Rollups don't care (algebraic
partials), but *sequence* semantics (sort, dedup, gap segmentation,
gap-fill, compression packing) need whole-series views.  This module splits
each source into time chunks — mirroring TimescaleDB's 7-day chunk layout
the reference configures (/root/reference/aisdb/aisdb_sql/
timescale_createtable_dynamic.sql:17-23):

1. group by ``(source, chunk = time // chunk_s)`` — per-chunk sort + dedup +
   LOCAL gap segmentation (parallel across chunks of the same source);
2. a tiny per-chunk summary (first/last epoch, local segment count, last
   value, last-segment start) is collected and walked per source in chunk
   order on the driver — state is O(#chunks), never rows.  The walk yields,
   per chunk, the exact global segment-id offset PLUS the halo state the
   downstream chunk-local operators need:
     - ``cont``    does the chunk's first local segment merge with the
                   previous chunk (inter-chunk gap < max_gap)?
     - ``seg_t0``  global start epoch of the segment containing the chunk's
                   first row (the gap-fill grid *phase*);
     - ``t_prev``/``v_prev``  the previous chunk's last (time, value) — the
                   one-row halo linear interpolation needs at the boundary;
     - ``closes``  does the segment containing the chunk's last row end
                   here (drives the grid-extends-past-last-point rule)?
3. a broadcast reconciliation map (``ray.put`` once) lets every chunk-local
   task relabel local seg ids to global ones, gap-fill its own grid span,
   or pack its own Gorilla input — with NO further shuffle and no task ever
   holding more than one time chunk of one source.

Exactness: duplicates share (time, seq) and therefore a chunk, so keep-first
dedup is chunk-local; segment ids, gap-fill grids and packed streams after
reconciliation equal the unsalted per-source results bit-for-bit (asserted
against series.clean_series / series.gapfill_series in tests, hot source
included).  Grid ownership at a chunk boundary: a chunk emits grid points
``g`` with ``t_prev < g <= last local point`` (plus the past-the-end points
when its segment closes here), so consecutive chunks of one segment tile the
global ``np.arange(seg_t0, t_end + step, step)`` grid exactly.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from aisdb_ray.functions.codes import factorize_sorted
from aisdb_ray.schema import DOC_ID, IS_ORIGINAL, N_TOK, SEG, SEQ, SOURCE, TIME, TOKENS
from aisdb_ray.stages.compress import PACKED_CHUNK_SCHEMA
from aisdb_ray.stages.series import (
    DEFAULT_MAX_GAP,
    DEFAULT_STEP,
    _sorted_dedup_indices,
    gapfill_group,
)

CHUNK_COL = "_chunk"
DEFAULT_CHUNK_S = 86400  # 1 day; must be a multiple of every rollup width


@dataclass(frozen=True)
class ChunkRec:
    """Reconciliation record for one (source, chunk) — see module docstring."""

    off: int          # global seg id of the chunk's local seg 0
    cont: bool        # first local seg continues the previous chunk's last seg
    seg_t0: int       # global start epoch of the seg containing the first row
    t_prev: int       # previous chunk's last epoch (valid iff cont)
    v_prev: float     # previous chunk's last value (valid iff cont)
    closes: bool      # the seg containing the last row ends in this chunk


class ReconMap:
    """Column-oriented {(source, chunk) -> ChunkRec} map.

    Stored as sorted parallel numpy arrays so ``ray.put``/``ray.get`` are
    (near) zero-copy — a dict of 10^5 per-chunk records would be re-unpickled
    by EVERY consumer task, a hidden fixed cost that caps scaling.
    Lookup is a binary search on the composite key.
    """

    __slots__ = ("keys", "off", "cont", "seg_t0", "t_prev", "v_prev", "closes")

    def __init__(self, keys, off, cont, seg_t0, t_prev, v_prev, closes):
        self.keys = keys
        self.off = off
        self.cont = cont
        self.seg_t0 = seg_t0
        self.t_prev = t_prev
        self.v_prev = v_prev
        self.closes = closes

    @staticmethod
    def key_of(source, chunk: int) -> str:
        # null sources key as a lone \x00 prefix — the f-string 'None'
        # rendering collided with a real source literally named 'None';
        # sources containing \x00 are rejected at summary build, so the
        # sentinel cannot alias a real key
        src = "\x00" if source is None else source
        return f"{src}\x00{chunk:016d}"

    def __getitem__(self, src_chunk) -> ChunkRec:
        src, chunk = src_chunk
        k = self.key_of(src, int(chunk))
        i = int(np.searchsorted(self.keys, k))
        if i >= len(self.keys) or self.keys[i] != k:
            raise KeyError(src_chunk)
        return ChunkRec(
            int(self.off[i]), bool(self.cont[i]), int(self.seg_t0[i]),
            int(self.t_prev[i]), float(self.v_prev[i]), bool(self.closes[i]),
        )

    def __len__(self):
        return len(self.keys)


def _add_chunk(batch: pa.Table, chunk_s: int) -> pa.Table:
    c = pc.divide(pc.cast(batch[TIME], pa.int64()), pa.scalar(chunk_s, pa.int64()))
    return batch.append_column(CHUNK_COL, c)


def _doc_id_canon(batch: pa.Table) -> pa.Array:
    """Canonical id reconstruction: ``{source}:{time:010d}:{seq:04d}``
    (the format prepare.derive_epoch parses; lpad never truncates, so
    wider epochs/seqs reconstruct as their plain digits)."""
    t = pc.utf8_lpad(
        pc.cast(pc.cast(batch[TIME], pa.int64()), pa.string()), 10, "0"
    )
    s = pc.utf8_lpad(
        pc.cast(pc.cast(batch[SEQ], pa.int64()), pa.string()), 4, "0"
    )
    return pc.binary_join_element_wise(batch[SOURCE], t, s, ":")


def _doc_id_sparse(batch: pa.Table) -> pa.Table:
    """Null out ``doc_id`` where it equals the canonical reconstruction —
    ~28 B/row of exchange traffic becomes a validity bitmap (parquet stores
    nothing for null slots).  Rows whose id is NOT canonical (odd padding,
    colons in the source) keep the string, so the
    :func:`_doc_id_dense` round trip is exact for arbitrary input.
    Assumes post-``prepare.validate`` rows (doc_id non-null)."""
    if DOC_ID not in batch.column_names:
        return batch
    doc = batch[DOC_ID]
    sparse = pc.if_else(
        pc.equal(doc, _doc_id_canon(batch)), pa.scalar(None, pa.string()), doc
    )
    return batch.set_column(
        batch.column_names.index(DOC_ID), DOC_ID, sparse
    )


def _doc_id_dense(batch: pa.Table) -> pa.Table:
    """Inverse of :func:`_doc_id_sparse`: rebuild nulled canonical ids."""
    if DOC_ID not in batch.column_names:
        return batch
    doc = batch[DOC_ID]
    if doc.null_count == 0:
        return batch
    dense = pc.coalesce(doc, _doc_id_canon(batch))
    return batch.set_column(
        batch.column_names.index(DOC_ID), DOC_ID, dense
    )


def _clean_chunk_group(group: pa.Table, max_gap: int) -> pa.Table:
    """Sort+dedup one (source, chunk); append LOCAL seg ids."""
    t = group[TIME].to_numpy(zero_copy_only=False)
    s = group[SEQ].to_numpy(zero_copy_only=False)
    idx = _sorted_dedup_indices(t, s)
    g = group.take(pa.array(idx))
    ts = t[idx]
    seg = np.zeros(len(ts), dtype=np.int64)
    if len(ts) > 1:
        np.cumsum(np.diff(ts) >= max_gap, out=seg[1:])
    return g.append_column(SEG, pa.array(seg))


def _chunk_slices(batch: pa.Table):
    """Yield (start, end) bounds of whole (source, chunk) runs in a block.

    Valid because map_groups emits one table per group and blocks are
    concatenations of whole group tables; parity tests vs the unsalted path
    guard the invariant.
    """
    src = batch[SOURCE].to_numpy(zero_copy_only=False)
    ch = batch[CHUNK_COL].to_numpy(zero_copy_only=False)
    n = len(src)
    if n == 0:
        return
    change = np.r_[True, (src[1:] != src[:-1]) | (ch[1:] != ch[:-1])]
    starts = np.flatnonzero(change)
    bounds = np.r_[starts, n]
    for a, b in zip(bounds[:-1], bounds[1:]):
        yield int(a), int(b)


def _chunk_summary(batch: pa.Table) -> pa.Table:
    """Per-(source, chunk) metadata rows from cleaned-chunk blocks."""
    t = batch[TIME].to_numpy(zero_copy_only=False)
    v = batch[N_TOK].to_numpy(zero_copy_only=False)
    seg = batch[SEG].to_numpy(zero_copy_only=False)
    src = batch[SOURCE].to_numpy(zero_copy_only=False)
    ch = batch[CHUNK_COL].to_numpy(zero_copy_only=False)
    rows = {k: [] for k in (
        "source", "chunk", "t_first", "t_last", "n_segs", "v_last",
        "t_lastseg_start",
    )}
    for a, b in _chunk_slices(batch):
        rows["source"].append(src[a])
        rows["chunk"].append(int(ch[a]))
        rows["t_first"].append(int(t[a]))
        rows["t_last"].append(int(t[b - 1]))
        rows["n_segs"].append(int(seg[b - 1]) + 1)
        # value at the FIRST row of the last unique-timestamp run: the
        # same-timestamp keep-first dedup (interp.py:275-277) makes that row
        # the interpolation endpoint, not the physical last row
        v_idx = a + int(np.searchsorted(t[a:b], t[b - 1], side="left"))
        rows["v_last"].append(float(v[v_idx]))
        # first row of the LAST local segment (gap-fill grid phase carry)
        ls_start = a + int(np.searchsorted(seg[a:b], seg[b - 1], side="left"))
        rows["t_lastseg_start"].append(int(t[ls_start]))
    return pa.table(
        {
            "source": pa.array(rows["source"], pa.string()),
            "chunk": pa.array(rows["chunk"], pa.int64()),
            "t_first": pa.array(rows["t_first"], pa.int64()),
            "t_last": pa.array(rows["t_last"], pa.int64()),
            "n_segs": pa.array(rows["n_segs"], pa.int64()),
            "v_last": pa.array(rows["v_last"], pa.float64()),
            "t_lastseg_start": pa.array(rows["t_lastseg_start"], pa.int64()),
        }
    )


def _reconcile_sorted_multi(g: pa.Table, max_gap: int) -> pa.Table:
    """Vectorized reconcile over a (source, chunk)-SORTED summary table
    holding ANY number of sources — per-source resets are segment
    boundaries, so one pass covers the whole table: cumsum offsets with a
    subtract-at-source-start rebase, forward-fill for the open-segment
    carry.  The pandas walk in :func:`_reconcile` is the reference
    implementation; a randomized-summary parity test pins them equal."""
    t_first = g["t_first"].to_numpy(zero_copy_only=False)
    t_last = g["t_last"].to_numpy(zero_copy_only=False)
    n_segs = g["n_segs"].to_numpy(zero_copy_only=False)
    v_last = g["v_last"].to_numpy(zero_copy_only=False)
    ls_start = g["t_lastseg_start"].to_numpy(zero_copy_only=False)
    src = g["source"].to_numpy(zero_copy_only=False)
    n = len(t_first)
    if n == 0:
        return pa.table(
            {
                "source": g["source"], "chunk": g["chunk"],
                "off": pa.array([], pa.int64()),
                "cont": pa.array([], pa.bool_()),
                "seg_t0": pa.array([], pa.int64()),
                "t_prev": pa.array([], pa.int64()),
                "v_prev": pa.array([], pa.float64()),
                "closes": pa.array([], pa.bool_()),
            }
        )
    new_src = np.r_[True, src[1:] != src[:-1]]
    cont = np.zeros(n, dtype=bool)
    if n > 1:
        cont[1:] = (t_first[1:] - t_last[:-1]) < max_gap
    cont[new_src] = False
    # off: global prefix sums rebased to zero at each source start
    # (cont[start] == 0, so the rebased cont sum is exact per source)
    base = np.cumsum(np.r_[0, n_segs[:-1]]) - np.cumsum(cont.astype(np.int64))
    start_idx = np.maximum.accumulate(np.where(new_src, np.arange(n), -1))
    off = base - base[start_idx]
    # open_t0 recurrence (the epoch the still-open segment started at):
    #   open_t0[i] = ls_start[i]          if the chunk has >1 local segs
    #              = open_t0[i-1]         elif it continues the previous one
    #              = t_first[i]           otherwise (incl. source starts)
    # -> forward-fill of the reset values over the carry positions
    is_reset = (n_segs > 1) | ~cont
    reset_val = np.where(n_segs > 1, ls_start, t_first)
    last_reset = np.maximum.accumulate(np.where(is_reset, np.arange(n), -1))
    open_t0 = reset_val[last_reset]
    seg_t0 = t_first.copy()
    if n > 1:
        seg_t0[1:] = np.where(cont[1:], open_t0[:-1], t_first[1:])
    t_prev = np.r_[np.int64(0), t_last[:-1]]
    v_prev = np.r_[np.float64(0.0), v_last[:-1]]
    t_prev[new_src] = 0
    v_prev[new_src] = 0.0
    closes = np.r_[~cont[1:], True]
    return pa.table(
        {
            "source": g["source"],
            "chunk": g["chunk"],
            "off": pa.array(off, pa.int64()),
            "cont": pa.array(cont, pa.bool_()),
            "seg_t0": pa.array(seg_t0, pa.int64()),
            "t_prev": pa.array(t_prev, pa.int64()),
            "v_prev": pa.array(v_prev, pa.float64()),
            "closes": pa.array(closes, pa.bool_()),
        }
    )


def _reconcile_source_table(g: pa.Table, max_gap: int) -> pa.Table:
    """One groupby(source) group -> reconciliation rows (sorts by chunk and
    delegates to the multi-source kernel)."""
    order = pc.sort_indices(g, sort_keys=[("chunk", "ascending")])
    return _reconcile_sorted_multi(g.take(order), max_gap)


def _recon_map_from_table(tbl: pa.Table) -> ReconMap:
    keys = np.array(
        [
            ReconMap.key_of(s, int(c))
            for s, c in zip(tbl["source"].to_pylist(), tbl["chunk"].to_pylist())
        ]
    )
    order = np.argsort(keys)
    return ReconMap(
        keys=keys[order],
        off=tbl["off"].to_numpy(zero_copy_only=False)[order],
        cont=tbl["cont"].to_numpy(zero_copy_only=False)[order],
        seg_t0=tbl["seg_t0"].to_numpy(zero_copy_only=False)[order],
        t_prev=tbl["t_prev"].to_numpy(zero_copy_only=False)[order],
        v_prev=tbl["v_prev"].to_numpy(zero_copy_only=False)[order],
        closes=tbl["closes"].to_numpy(zero_copy_only=False)[order],
    )


class ReconStore:
    """Partition-local reconciliation lookup for the STAGED path.

    The driver holds only the staged recon-file list (O(#map tasks)) —
    never the O(#chunks) map.  Each consumer task resolves ONLY the
    reconciliation rows of the staging partitions its batch touches
    (usually exactly one: phase-B blocks are per-partition), via
    row-group-pruned parquet reads of the `_recon` stage files — the same
    layout the data exchange itself uses.
    """

    def __init__(self, files: list, num_parts: int):
        self.files = sorted(files)
        self.num_parts = num_parts
        self._cache: dict = {}

    def for_batch(self, batch: pa.Table) -> ReconMap:
        src = batch[SOURCE].to_numpy(zero_copy_only=False)
        ch = batch[CHUNK_COL].to_numpy(zero_copy_only=False).astype(np.int64)
        need = sorted({int(k) for k in _spart_of(src, ch, self.num_parts)})
        parts = [self._load(k) for k in need]
        if not parts:
            # zero-row batch: an empty map, not np.concatenate([]) raising
            e = np.array([], dtype=np.int64)
            return ReconMap(keys=np.array([], dtype=object), off=e,
                            cont=e.astype(bool), seg_t0=e, t_prev=e,
                            v_prev=e.astype(np.float64), closes=e.astype(bool))
        if len(parts) == 1:
            return parts[0]
        keys = np.concatenate([p.keys for p in parts])
        order = np.argsort(keys)

        def cat(attr):
            return np.concatenate([getattr(p, attr) for p in parts])[order]

        return ReconMap(
            keys=keys[order], off=cat("off"), cont=cat("cont"),
            seg_t0=cat("seg_t0"), t_prev=cat("t_prev"), v_prev=cat("v_prev"),
            closes=cat("closes"),
        )

    def _load(self, spart: int) -> ReconMap:
        rm = self._cache.get(spart)
        if rm is None:
            import pyarrow.parquet as pq

            tbl = pq.read_table(
                self.files, filters=[(SPART_COL, "==", int(spart))],
                use_threads=False,
            ).drop_columns([SPART_COL])
            rm = self._cache[spart] = _recon_map_from_table(tbl)
        return rm


def _resolve_recon(recon_ref, batch: pa.Table):
    """Consumer-side: ObjectRef -> object; ReconStore -> batch-local map."""
    obj = ray.get(recon_ref) if isinstance(recon_ref, ray.ObjectRef) else recon_ref
    if isinstance(obj, ReconStore):
        return obj.for_batch(batch)
    return obj


def _reconcile(summary, max_gap: int) -> ReconMap:
    """Driver walk of the O(#chunks) summary -> :class:`ReconMap`."""
    recon: dict[tuple[str, int], list] = {}
    bad = [s_ for s_ in summary["source"].dropna().unique() if "\x00" in s_]
    if bad:
        raise ValueError(
            "clean_series_salted: source values containing NUL bytes "
            f"({bad[:3]!r}...) would corrupt the reconciliation keys")
    # dropna=False: prepare.validate admits null sources, the unsalted and
    # staged paths both process them, and silently dropping the group here
    # made relabel crash with KeyError((None, chunk))
    for src, g in summary.groupby("source", sort=False, dropna=False):
        if src != src:  # pandas groups null keys as NaN: normalize
            src = None
        next_seg = 0
        prev_t = prev_v = None
        prev_key = None
        open_t0 = None
        for r in g.itertuples(index=False):
            cont = prev_t is not None and (r.t_first - prev_t) < max_gap
            off = next_seg - 1 if cont else next_seg
            seg_t0 = int(open_t0) if cont else int(r.t_first)
            key = (src, int(r.chunk))
            # closes=True provisionally; flipped if the next chunk continues
            recon[key] = [off, cont, seg_t0, int(prev_t or 0), float(prev_v or 0.0), True]
            if cont and prev_key is not None:
                recon[prev_key][5] = False
            next_seg = off + int(r.n_segs)
            open_t0 = seg_t0 if r.n_segs == 1 else int(r.t_lastseg_start)
            prev_t, prev_v = int(r.t_last), float(r.v_last)
            prev_key = key
    items = sorted(
        (ReconMap.key_of(s, c), v) for (s, c), v in recon.items()
    )
    return ReconMap(
        keys=np.array([k for k, _ in items]),
        off=np.array([v[0] for _, v in items], dtype=np.int64),
        cont=np.array([v[1] for _, v in items], dtype=bool),
        seg_t0=np.array([v[2] for _, v in items], dtype=np.int64),
        t_prev=np.array([v[3] for _, v in items], dtype=np.int64),
        v_prev=np.array([v[4] for _, v in items], dtype=np.float64),
        closes=np.array([v[5] for _, v in items], dtype=bool),
    )


def clean_chunks_materialized(
    ds,
    max_gap: int = DEFAULT_MAX_GAP,
    chunk_s: int = DEFAULT_CHUNK_S,
):
    """ONE (source, chunk) shuffle -> pinned cleaned blocks + reconciliation.

    Returns ``(mat, recon_ref)``: ``mat`` is the materialized dataset of
    per-chunk cleaned rows (LOCAL seg ids + ``_chunk`` column, blocks hold
    whole chunk groups) and ``recon_ref`` is a ``ray.put`` handle to the
    {(source, chunk): ChunkRec} map.  Every downstream chunk-local operator
    (relabel / gap-fill / pack) consumes these without further shuffles.
    """
    chunked = ds.map_batches(lambda b: _add_chunk(b, chunk_s), batch_format="pyarrow")
    local = chunked.groupby([SOURCE, CHUNK_COL]).map_groups(
        lambda g: _clean_chunk_group(g, max_gap), batch_format="pyarrow"
    )
    mat = local.materialize()
    summary = (
        mat.map_batches(_chunk_summary, batch_format="pyarrow", batch_size=None)
        .to_pandas()
        .sort_values(["source", "chunk"], kind="stable")
    )
    recon = _reconcile(summary, max_gap)
    return mat, ray.put(recon)


SPART_COL = "_spart"


def _spart_of(src: np.ndarray, ch: np.ndarray, num_parts: int) -> np.ndarray:
    """Staging partition id = hash(source, chunk) — spreads a hot source's
    chunks across partitions (hash(source) alone would re-concentrate it)."""
    import zlib

    uniq, inv = factorize_sorted(src)
    # pd.factorize codes nulls as -1; raw fancy-indexing would wrap -1 to
    # the LAST unique's hash, which varies per batch — a (null, chunk)
    # group would split across partitions nondeterministically.  Appending
    # a fixed null hash makes -1 resolve to it in every batch.
    src_h = np.r_[
        np.array([zlib.crc32(s.encode()) for s in uniq], dtype=np.int64),
        np.int64(zlib.crc32(b"")),
    ][inv]
    part = ((src_h ^ (ch * np.int64(2654435761))) % num_parts).astype(np.int32)
    return np.abs(part)


def _add_spart(batch: pa.Table, num_parts: int) -> pa.Table:
    src = batch[SOURCE].to_numpy(zero_copy_only=False)
    ch = batch[CHUNK_COL].to_numpy(zero_copy_only=False).astype(np.int64)
    return batch.append_column(
        SPART_COL, pa.array(_spart_of(src, ch, num_parts))
    )


def _clean_part_table(tbl: pa.Table, max_gap: int) -> pa.Table:
    """Vectorized clean of one staging partition (many (source, chunk)
    groups at once): one lexsort, key-change dedup, reset-at-group-start
    segment ids — zero per-group Python in the hot path."""
    n = tbl.num_rows
    if n == 0:
        return tbl.append_column(SEG, pa.array([], pa.int64()))
    t = tbl[TIME].to_numpy(zero_copy_only=False)
    s = tbl[SEQ].to_numpy(zero_copy_only=False)
    src = tbl[SOURCE].to_numpy(zero_copy_only=False)
    ch = tbl[CHUNK_COL].to_numpy(zero_copy_only=False)
    _, src_code = factorize_sorted(src)
    order = np.lexsort((s, t, ch, src_code))
    t2, s2, sc2, ch2 = t[order], s[order], src_code[order], ch[order]
    # keep-first dedup on (source, time, seq) — duplicates are adjacent
    keep = np.r_[True, (sc2[1:] != sc2[:-1]) | (t2[1:] != t2[:-1]) | (s2[1:] != s2[:-1])]
    ki = np.flatnonzero(keep)
    t3, sc3, ch3 = t2[ki], sc2[ki], ch2[ki]
    g = tbl.take(pa.array(order[ki]))
    # local seg ids with resets at each (source, chunk) start
    newgrp = np.r_[True, (sc3[1:] != sc3[:-1]) | (ch3[1:] != ch3[:-1])]
    flag = np.zeros(len(t3), dtype=np.int64)
    flag[1:] = (np.diff(t3) >= max_gap) & ~newgrp[1:]
    raw = np.cumsum(flag)
    starts = np.flatnonzero(newgrp)
    counts = np.diff(np.r_[starts, len(t3)])
    seg = raw - np.repeat(raw[starts], counts)
    return g.append_column(SEG, pa.array(seg))


EXCHANGE_LEAF = "_aisdb_exchange"


def exchange_dir(staging_root: str) -> str:
    """The directory the staged exchange actually owns (and is allowed to
    wipe): a namespaced subdirectory of the caller's staging root.  The
    root itself is NEVER deleted — pointing staging at a shared location
    like /dev/shm must not destroy other tenants' files (Ray's plasma
    segments live there)."""
    import os

    return os.path.join(staging_root, EXCHANGE_LEAF)


def _group_aligned_slices(tbl: pa.Table, max_bytes: int):
    """Yield ``tbl`` in slices cut ONLY at (source, chunk) group
    boundaries, each at most ``max_bytes``.

    Why: downstream consumers of the pinned exchange (gapfill_blocks,
    pack_blocks, _chunk_summary, the fused tier rollups) rely on every
    block holding WHOLE (source, chunk) groups.  Ray's output buffer
    slices any built block ≥ 1.5× ``target_max_block_size`` with no
    regard for content, so a task that emits one huge table would have
    groups silently split across blocks at exactly the scale this module
    targets.  Emitting group-aligned tables each < 0.5× the target keeps
    every buffer flush below the 1.5× slice threshold, so block
    boundaries always coincide with yield boundaries (coalescing whole
    groups into one block is fine; splitting is what breaks consumers).
    A single group larger than the budget cannot be cut safely — raise
    rather than corrupt, with the actionable knobs."""
    n = tbl.num_rows
    if n == 0:
        yield tbl
        return
    per_row = max(1, tbl.nbytes // n)
    max_rows = max(1, max_bytes // per_row)
    src = tbl[SOURCE].to_numpy(zero_copy_only=False)
    ch = tbl[CHUNK_COL].to_numpy(zero_copy_only=False)
    newg = np.r_[True, (src[1:] != src[:-1]) | (ch[1:] != ch[:-1])]
    gstarts = np.flatnonzero(newg)
    gends = np.r_[gstarts[1:], n]
    cur = 0
    for s, e in zip(gstarts, gends):
        if e - s > max_rows:
            raise RuntimeError(
                f"salted exchange: one (source, chunk) group has {e - s} "
                f"rows (~{((e - s) * per_row) >> 20} MiB), above the "
                "group-aligned output-block budget — Ray would split it "
                "mid-group and break the whole-group-per-block contract. "
                "Reduce chunk_s (finer salt granularity) or raise "
                "DataContext.target_max_block_size."
            )
        if e - cur > max_rows and s > cur:
            yield tbl.slice(cur, s - cur)
            cur = s
    if cur < n:
        yield tbl.slice(cur, n - cur)


def _block_budget_bytes() -> int:
    from ray.data.context import DataContext

    target = DataContext.get_current().target_max_block_size or (128 << 20)
    return max(1 << 20, int(target * 0.45))


def clean_chunks_staged(
    ds,
    max_gap: int,
    chunk_s: int,
    staging_dir: str,
    num_staging_parts: int | None = None,
):
    """Disk-backed hash-shuffle variant of :func:`clean_chunks_materialized`.

    Phase A (map-only, scales linearly): append chunk + staging-partition
    columns and write compressed parquet partitioned by ``_spart`` — an
    explicit hash exchange through the filesystem instead of an
    object-store global sort (no sampling pass, no sort barrier, and at
    real scale the staging write is the spill a sort would do anyway,
    except sequential and compressed).

    Phase B (one task per staging partition, fully vectorized): read the
    partition, single lexsort over all its (source, chunk) groups,
    key-change dedup, reset-at-boundary local seg ids.  Task memory is
    bounded by the partition size — size ``num_parts`` to the cluster, not
    the data.

    Returns the same ``(mat, recon_ref)`` contract as
    :func:`clean_chunks_materialized`; outputs are bit-identical.

    Block contract: the pinned output's blocks hold WHOLE (source, chunk)
    groups — phase B emits group-aligned tables sized under the output
    buffer's slice threshold (:func:`_group_aligned_slices`), which is
    what makes the downstream shuffle-free consumers correct.  (The
    materialized variant inherits the same property from groupby
    semantics only while single groups stay under ~half the target block
    size; at scale use THIS variant.)
    """
    import os
    import shutil
    import uuid

    import pyarrow.parquet as pq

    import ray
    import ray.data as rd

    # partition count from config (not cluster size) keeps the exchange's
    # work layout identical across cluster sizes — cluster-size-invariant
    # partitioning is also what makes resume plans stable.  The fallback is
    # therefore a FIXED constant, not a cluster-CPU readout (which would
    # make the same input produce different layouts on different — or
    # autoscaling — clusters, exactly the instability this note forbids).
    num_parts = num_staging_parts or 64

    # wipe ONLY the namespaced subdirectory this exchange owns — never the
    # caller's staging root (which may be a shared tmpfs like /dev/shm)
    staging_dir = exchange_dir(staging_dir)
    assert os.path.basename(staging_dir) == EXCHANGE_LEAF
    shutil.rmtree(staging_dir, ignore_errors=True)
    os.makedirs(staging_dir, exist_ok=True)

    chunked = ds.map_batches(
        lambda b: _doc_id_sparse(_add_spart(_add_chunk(b, chunk_s), num_parts)),
        batch_format="pyarrow",
    )

    def write_stage(b: pa.Table) -> pa.Table:
        # one shuffle file per map task, ONE ROW GROUP PER PARTITION —
        # file-creation cost stays O(map tasks).  The manifest row per row
        # group (file, part, rg) lets phase B read EXACT row groups, so the
        # partition column itself never hits the file and readers skip
        # filter evaluation entirely (the map-side shuffle-file layout of
        # MapReduce/Spark, in parquet).  lz4: staging is transient and
        # usually on tmpfs — cheap CPU beats ratio there (durable tiers
        # stay zstd).
        if b.num_rows == 0:
            # the _dist.write_stage guard, ported: Ray 2.49 happens to
            # skip empty blocks in map_batches (verified, undocumented) —
            # if that changes, row_group_size=0 raises and sps[[0]]
            # IndexErrors; return an empty manifest table instead
            return pa.table({
                "file": pa.array([], pa.string()),
                "part": pa.array([], pa.int64()),
                "rg": pa.array([], pa.int64()),
            })
        sp = b[SPART_COL].to_numpy(zero_copy_only=False)
        order = np.argsort(sp, kind="stable")
        # _chunk is time // chunk_s — derivable, so it never hits the wire;
        # phase B recomputes it (8 B/row off the exchange)
        b2 = b.take(pa.array(order)).drop_columns([SPART_COL, CHUNK_COL])
        sps = sp[order]
        bounds = np.r_[np.flatnonzero(np.r_[True, sps[1:] != sps[:-1]]), len(sps)]
        name = f"stage-{uuid.uuid4().hex[:12]}.parquet"
        path = os.path.join(staging_dir, name)
        tmp = path + ".tmp"
        with pq.ParquetWriter(tmp, b2.schema, compression="lz4") as w:
            for a, e in zip(bounds[:-1], bounds[1:]):
                w.write_table(b2.slice(a, e - a), row_group_size=e - a)
        os.replace(tmp, path)  # atomic: a manifest name is always complete
        rgs = np.arange(len(bounds) - 1, dtype=np.int64)
        return pa.table({
            "file": pa.array([name] * len(rgs), pa.string()),
            "part": pa.array(sps[bounds[:-1]].astype(np.int64), pa.int64()),
            "rg": pa.array(rgs, pa.int64()),
        })

    # Exchange barrier: every shuffle file durable before any read.  Phase B
    # reads ONLY (file, row group) pairs named in the task results (Ray
    # delivers exactly one result per logical task, however many retry
    # attempts ran), so orphan files from killed/duplicated attempts can't
    # duplicate rows.  Manifest size: one row per (map task, partition).
    import sys
    import time as _time

    _trace = os.environ.get("GRAFT_EXCHANGE_TIMING") == "1"
    _t0 = _time.time()
    manifest = chunked.map_batches(write_stage, batch_format="pyarrow").take_all()
    if _trace:
        print(f"[exchange] phase A (stage write): {_time.time() - _t0:.2f}s",
              file=sys.stderr)
        _t0 = _time.time()
    assign: dict[int, list] = {k: [] for k in range(num_parts)}
    for r in manifest:
        assign[int(r["part"])].append((r["file"], int(r["rg"])))

    sum_dir = os.path.join(staging_dir, "_summary")
    os.makedirs(sum_dir, exist_ok=True)

    # schema for empty staging partitions: a stage-file footer when any
    # exist, else derived ONCE here on the driver.  Never capture the
    # upstream Dataset in the phase-B closure — that serializes the whole
    # read+prepare plan into every task and runs a nested execution (a
    # re-read of the input lake) inside a worker per empty partition.
    if manifest:
        empty_schema = pq.read_schema(
            os.path.join(staging_dir, manifest[0]["file"])
        )
    else:
        base = chunked.schema().base_schema
        empty_schema = pa.schema(
            [f for f in base if f.name not in (SPART_COL, CHUNK_COL)]
        )

    def clean_part(batch: pa.Table):
        budget = _block_budget_bytes()
        for k, fs, rgs in zip(batch["part"].to_pylist(),
                              batch["files"].to_pylist(),
                              batch["rgs"].to_pylist()):
            open_files: dict[str, pq.ParquetFile] = {}
            pieces = []
            for f, rg in zip(fs, rgs):
                pf = open_files.get(f)
                if pf is None:
                    pf = open_files[f] = pq.ParquetFile(
                        os.path.join(staging_dir, f)
                    )
                pieces.append(pf.read_row_group(int(rg)))
            for pf in open_files.values():
                pf.close()
            if pieces:
                tbl = pa.concat_tables(pieces, promote_options="default")
            else:
                tbl = empty_schema.empty_table()
            tbl = _add_chunk(tbl, chunk_s)  # derivable: recomputed, not shipped
            cleaned = _doc_id_dense(_clean_part_table(tbl, max_gap))
            # per-part chunk summary written alongside — saves a full extra
            # pass (and executor run) over the materialized dataset.  Temp
            # name is unique per ATTEMPT: a zombie attempt and its retry
            # writing the same deterministic temp path on a shared
            # filesystem could interleave bytes and atomically install a
            # corrupt file; distinct temps make whichever os.replace runs
            # last install a complete file.
            sum_path = os.path.join(sum_dir, f"sum-{int(k)}.parquet")
            tmp = f"{sum_path}.{uuid.uuid4().hex[:8]}.tmp"
            pq.write_table(_chunk_summary(cleaned), tmp)
            os.replace(tmp, sum_path)  # idempotent under retry
            # group-aligned output blocks (see _group_aligned_slices)
            yield from _group_aligned_slices(cleaned, budget)

    items = rd.from_items(
        [
            {"part": k, "files": [f for f, _ in assign[k]],
             "rgs": [rg for _, rg in assign[k]]}
            for k in range(num_parts)
        ],
        override_num_blocks=num_parts,
    )
    mat = items.map_batches(
        clean_part, batch_format="pyarrow", batch_size=None
    ).materialize()
    if _trace:
        print(f"[exchange] phase B (clean+pin): {_time.time() - _t0:.2f}s",
              file=sys.stderr)
        _t0 = _time.time()
    sum_files = sorted(
        os.path.join(sum_dir, f)
        for f in os.listdir(sum_dir)
        if f.endswith(".parquet")  # skip .tmp leftovers from killed attempts
    )
    # DISTRIBUTED reconcile: the per-source sequential walk runs inside
    # Ray tasks over the O(#chunks) summary rows (never on the driver).
    # Small summaries (the common case: one row per (source, day)) take a
    # SINGLE-task fast path — one sort + one vectorized multi-source pass —
    # because a groupby shuffle's fixed latency dwarfs the work; summaries
    # past the threshold run the groupby(source) path, whose task memory is
    # bounded by the largest source's chunk count.
    n_summary = sum(pq.read_metadata(f).num_rows for f in sum_files)
    recon_dir = os.path.join(staging_dir, "_recon")
    os.makedirs(recon_dir, exist_ok=True)
    if n_summary <= 5_000_000:
        rfiles = ray.get(
            _reconcile_small_task.remote(sum_files, recon_dir, max_gap, num_parts)
        )
        if _trace:
            print(f"[exchange] reconcile (single task, {n_summary} rows): "
                  f"{_time.time() - _t0:.2f}s", file=sys.stderr)
        return mat, ReconStore(
            [os.path.join(recon_dir, f) for f in rfiles], num_parts
        )
    recon_rows = (
        rd.read_parquet(sum_files)
        .groupby("source")
        .map_groups(
            lambda g: _reconcile_source_table(g, max_gap),
            batch_format="pyarrow",
        )
    )

    def write_recon(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"file": pa.array([], pa.string())})
        name = _write_recon_table(b, recon_dir, num_parts)
        return pa.table({"file": pa.array([name], pa.string())})

    rmanifest = recon_rows.map_batches(
        write_recon, batch_format="pyarrow"
    ).take_all()  # O(#groupby output blocks) rows — the manifest, not the map
    rfiles = [os.path.join(recon_dir, r["file"]) for r in rmanifest]
    return mat, ReconStore(rfiles, num_parts)


def _write_recon_table(b: pa.Table, recon_dir: str, num_parts: int) -> str:
    """Write reconciliation rows as one stage file with a row group per
    partition (atomic rename); returns the file name."""
    import os
    import uuid

    import pyarrow.parquet as pq

    sp = _spart_of(
        b["source"].to_numpy(zero_copy_only=False),
        b["chunk"].to_numpy(zero_copy_only=False).astype(np.int64),
        num_parts,
    )
    order = np.argsort(sp, kind="stable")
    b2 = b.append_column(SPART_COL, pa.array(sp)).take(pa.array(order))
    sps = sp[order]
    bounds = np.r_[np.flatnonzero(np.r_[True, sps[1:] != sps[:-1]]), len(sps)]
    name = f"recon-{uuid.uuid4().hex[:12]}.parquet"
    path = os.path.join(recon_dir, name)
    with pq.ParquetWriter(path + ".tmp", b2.schema, compression="zstd") as w:
        for a, e in zip(bounds[:-1], bounds[1:]):
            w.write_table(b2.slice(a, e - a), row_group_size=e - a)
    os.replace(path + ".tmp", path)
    return name


def _reconcile_small(sum_files: list, recon_dir: str, max_gap: int,
                     num_parts: int) -> list:
    """One-task reconcile for small summaries: read, one sort, one
    vectorized multi-source pass, one staged write."""
    import pyarrow.parquet as pq

    tbl = pq.read_table(sum_files)
    if tbl.num_rows == 0:
        return []
    idx = pc.sort_indices(
        tbl, sort_keys=[("source", "ascending"), ("chunk", "ascending")]
    )
    rows = _reconcile_sorted_multi(tbl.take(idx), max_gap)
    return [_write_recon_table(rows, recon_dir, num_parts)]


_reconcile_small_task = ray.remote(num_cpus=1)(_reconcile_small)


def relabel_blocks(mat, recon_ref):
    """Rewrite local seg ids to global ones; drop the chunk column."""

    def relabel(b: pa.Table) -> pa.Table:
        rm = _resolve_recon(recon_ref, b)
        seg = b[SEG].to_numpy(zero_copy_only=False).copy()
        src = b[SOURCE].to_numpy(zero_copy_only=False)
        ch = b[CHUNK_COL].to_numpy(zero_copy_only=False)
        for a, bb in _chunk_slices(b):
            seg[a:bb] += rm[(src[a], int(ch[a]))].off
        out = b.drop_columns([SEG, CHUNK_COL])
        return out.append_column(SEG, pa.array(seg))

    return mat.map_batches(relabel, batch_format="pyarrow", batch_size=None)


def clean_series_salted(
    ds,
    max_gap: int = DEFAULT_MAX_GAP,
    chunk_s: int = DEFAULT_CHUNK_S,
):
    """Salted equivalent of series.clean_series: identical output, but no
    single task ever sees more than one time chunk of a source."""
    mat, recon_ref = clean_chunks_materialized(ds, max_gap, chunk_s)
    return relabel_blocks(mat, recon_ref)


# --------------------------------------------------------- chunk-local gap-fill

_GAPFILL_BASE = [
    (DOC_ID, pa.string()),
    (N_TOK, pa.float64()),
    (SOURCE, pa.string()),
    (TIME, pa.int64()),
    (SEQ, pa.int32()),
    (SEG, pa.int64()),
    (IS_ORIGINAL, pa.bool_()),
]


def _gapfill_empty(with_tokens: bool, with_provenance: bool) -> pa.Table:
    fields = list(_GAPFILL_BASE)
    if with_tokens:
        fields.insert(1, (TOKENS, pa.list_(pa.int32())))
    if not with_provenance:
        drop = {DOC_ID, SEQ}
        fields = [f for f in fields if f[0] not in drop]
    return pa.schema(fields).empty_table()


def gapfill_chunk_block(
    batch: pa.Table,
    recon: dict,
    step: int = DEFAULT_STEP,
    with_provenance: bool = True,
) -> pa.Table:
    """Gap-fill every (source, chunk) slice of a cleaned block, halo-exact.

    Emits the same rows the unsalted ``series.gapfill_group`` would for the
    grid span this chunk owns (see module docstring for the ownership rule).
    ``with_provenance=False`` skips doc_id/seq reconstruction — the skinny
    analytical tier the cascade materializes.
    """
    t_all = batch[TIME].to_numpy(zero_copy_only=False)
    v_all = batch[N_TOK].to_numpy(zero_copy_only=False).astype(np.float64)
    ls_all = batch[SEG].to_numpy(zero_copy_only=False)
    src_all = batch[SOURCE].to_numpy(zero_copy_only=False)
    ch_all = batch[CHUNK_COL].to_numpy(zero_copy_only=False)
    with_tokens = TOKENS in batch.column_names

    acc_t, acc_v, acc_seg, acc_oidx, acc_sidx = [], [], [], [], []
    slice_srcs: list = []
    for a, b in _chunk_slices(batch):
        rec: ChunkRec = recon[(src_all[a], int(ch_all[a]))]
        t = t_all[a:b]
        ls = ls_all[a:b]
        seg_first = np.flatnonzero(np.r_[True, ls[1:] != ls[:-1]])
        seg_bounds = np.r_[seg_first, b - a]
        nseg = len(seg_first)
        sidx = len(slice_srcs)
        slice_srcs.append(src_all[a])
        for si in range(nseg):
            sa, sb = int(seg_bounds[si]), int(seg_bounds[si + 1])
            ts = t[sa:sb]
            # same-timestamp dedup keep-first before interpolation
            # (/root/reference/aisdb/interp.py:275-277)
            ui = np.flatnonzero(np.r_[True, ts[1:] != ts[:-1]]) + sa
            ts_u = t[ui]
            halo = (si == 0) and rec.cont
            closes_here = (si < nseg - 1) or rec.closes
            if halo:
                t0 = rec.seg_t0
                k_min = (rec.t_prev - t0) // step + 1
                xp = np.r_[rec.t_prev, ts_u]
                fp = np.r_[rec.v_prev, v_all[a:b][ui]]
            else:
                if closes_here and len(ts_u) < 2:
                    continue  # <2 unique timestamps -> skip (interp.py:98-100)
                t0 = int(ts_u[0])
                k_min = 0
                xp = ts_u
                fp = v_all[a:b][ui]
            t_end = int(ts_u[-1])
            if closes_here:
                k_max = (t_end - t0 + step - 1) // step
            else:
                k_max = (t_end - t0) // step
            if k_max < k_min:
                continue
            grid = t0 + step * np.arange(k_min, k_max + 1, dtype=np.int64)
            gv = np.interp(grid, xp, fp)
            pos = np.clip(np.searchsorted(ts_u, grid), 0, len(ts_u) - 1)
            orig = ts_u[pos] == grid
            acc_t.append(grid)
            acc_v.append(gv)
            acc_seg.append(np.full(len(grid), rec.off + ls[sa], np.int64))
            acc_oidx.append(np.where(orig, a + ui[pos], -1))
            acc_sidx.append(np.full(len(grid), sidx, np.int32))

    if not acc_t:
        return _gapfill_empty(with_tokens, with_provenance)

    grid_t = np.concatenate(acc_t)
    grid_v = np.concatenate(acc_v)
    grid_seg = np.concatenate(acc_seg)
    oidx = np.concatenate(acc_oidx)
    sidx = np.concatenate(acc_sidx)
    orig_mask = oidx >= 0
    src_arr = pa.array(np.asarray(slice_srcs, dtype=object)[sidx], pa.string())

    cols: dict[str, pa.Array] = {}
    if with_provenance:
        take_idx = pc.if_else(
            pa.array(orig_mask), pa.array(oidx, type=pa.int64()), pa.scalar(None, pa.int64())
        )
        doc_orig = batch[DOC_ID].combine_chunks().take(take_idx)
        seq_col = batch[SEQ].combine_chunks().take(take_idx)
        ep_str = pc.utf8_lpad(pc.cast(pa.array(grid_t), pa.string()), 10, "0")
        doc_fill = pc.binary_join_element_wise(
            src_arr, ep_str, pa.scalar("gapfill"), ":"
        )
        cols[DOC_ID] = pc.if_else(pa.array(orig_mask), doc_orig, doc_fill)
        if with_tokens:
            cols[TOKENS] = batch[TOKENS].combine_chunks().take(take_idx)
        cols[N_TOK] = pa.array(grid_v)
        cols[SOURCE] = src_arr
        cols[TIME] = pa.array(grid_t)
        cols[SEQ] = seq_col
    else:
        if with_tokens:
            take_idx = pc.if_else(
                pa.array(orig_mask), pa.array(oidx, type=pa.int64()),
                pa.scalar(None, pa.int64()),
            )
            cols[TOKENS] = batch[TOKENS].combine_chunks().take(take_idx)
        cols[N_TOK] = pa.array(grid_v)
        cols[SOURCE] = src_arr
        cols[TIME] = pa.array(grid_t)
    cols[SEG] = pa.array(grid_seg)
    cols[IS_ORIGINAL] = pa.array(orig_mask)
    return pa.table(cols)


def gapfill_blocks(mat, recon_ref, step: int = DEFAULT_STEP, with_provenance: bool = True):
    """Dataset-level chunk-local gap-fill over pinned cleaned blocks."""

    def fn(b: pa.Table) -> pa.Table:
        return gapfill_chunk_block(b, _resolve_recon(recon_ref, b), step, with_provenance)

    return mat.map_batches(fn, batch_format="pyarrow", batch_size=None)


# ------------------------------------------------------ chunk-local packing

DEFAULT_PACK_POINTS = 32_768


def pack_chunk_block(
    batch: pa.Table, recon: dict, target_points: int = DEFAULT_PACK_POINTS
) -> pa.Table:
    """Pack (source, chunk) slices into bounded Gorilla-input rows.

    The fix for whole-source packing skew (one hot source previously became
    ONE giant encoder task): a packed row never exceeds ~target_points +
    one chunk.  Consecutive chunks of the same source (adjacent under the
    (source, chunk) sort, so concatenation stays time-sorted) are coalesced
    up to the target — the codec's fixed per-stream cost (bit-plane passes)
    amortizes over tens of thousands of points, not one chunk's worth.
    Global seg ids ride along so segment identity survives the round-trip.
    """
    t_all = batch[TIME].to_numpy(zero_copy_only=False).astype(np.int64)
    v_all = batch[N_TOK].to_numpy(zero_copy_only=False).astype(np.int64)
    ls_all = batch[SEG].to_numpy(zero_copy_only=False)
    src_all = batch[SOURCE].to_numpy(zero_copy_only=False)
    ch_all = batch[CHUNK_COL].to_numpy(zero_copy_only=False)

    gseg = ls_all.astype(np.int64).copy()
    # coalesce consecutive same-source slices up to target_points
    runs: list[tuple[str, int, int, int]] = []  # (source, chunk0, start, end)
    for a, b in _chunk_slices(batch):
        src, ch = src_all[a], int(ch_all[a])
        gseg[a:b] += recon[(src, ch)].off
        if runs and runs[-1][0] == src and runs[-1][3] == a and (
            runs[-1][3] - runs[-1][2]
        ) < target_points:
            runs[-1] = (src, runs[-1][1], runs[-1][2], b)
        else:
            runs.append((src, ch, a, b))
    if not runs:
        return PACKED_CHUNK_SCHEMA.empty_table()
    # runs tile the block in order, so the flat arrays are reused as-is
    lens = [0] + [e - s for _, _, s, e in runs]
    off = pa.array(np.cumsum(lens).astype(np.int32))
    return pa.table(
        {
            SOURCE: pa.array(
                np.asarray([r[0] for r in runs], dtype=object), pa.string()
            ),
            "chunk": pa.array([r[1] for r in runs], pa.int64()),
            "times": pa.ListArray.from_arrays(off, pa.array(t_all)),
            "values": pa.ListArray.from_arrays(off, pa.array(v_all)),
            "segs": pa.ListArray.from_arrays(off, pa.array(gseg)),
        },
        schema=PACKED_CHUNK_SCHEMA,
    )


def pack_blocks(mat, recon_ref, target_points: int = DEFAULT_PACK_POINTS):
    def fn(b: pa.Table) -> pa.Table:
        return pack_chunk_block(b, _resolve_recon(recon_ref, b), target_points)

    return mat.map_batches(fn, batch_format="pyarrow", batch_size=None)


def gapfill_series_by_segment(
    ds_cleaned,
    step: int = DEFAULT_STEP,
    max_gap: int = DEFAULT_MAX_GAP,
):
    """Gap-fill grouped by (source, seg): the skew-safe layout — a hot
    source's segments fill in parallel.  Input must be cleaned+segmented
    (e.g. clean_series or clean_series_salted output)."""
    return ds_cleaned.groupby([SOURCE, SEG]).map_groups(
        lambda g: gapfill_group(g, step, max_gap, cleaned=True),
        batch_format="pyarrow",
    )
