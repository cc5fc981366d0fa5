"""Skew handling for per-series sequence operators: salted (time-chunked)
groups with exact boundary reconciliation.

The north rule calls out salted keys for skewed sources explicitly
(SURVEY.md §4 'skew'): one source holding 30% of all rows turns a naive
``groupby(source)`` into a single giant task.  Rollups don't care (algebraic
partials), but *sequence* semantics (sort, dedup, gap segmentation) need
whole-series views.  This module splits each source into time chunks:

1. group by ``(source, chunk = time // chunk_s)`` — per-chunk sort + dedup +
   LOCAL gap segmentation (parallel across chunks of the same source);
2. a tiny per-chunk summary (first/last epoch, local segment count) is
   collected and walked per source in chunk order — a boundary between
   consecutive chunks merges iff the inter-chunk gap < max_gap, giving every
   chunk an exact global segment-id offset (state is O(#chunks), never rows);
3. a broadcast offset map rewrites local seg ids to global ones.

Exactness: duplicates share (time, seq) and therefore a chunk, so keep-first
dedup is chunk-local; segment ids after reconciliation equal the unsalted
result (asserted against clean_series in tests, hot source included).

Gap-fill after salted segmentation groups by ``(source, seg)`` instead of
``source`` — segments never span a >= max_gap gap, so per-segment grids are
independent and the hot source's work spreads across its segments.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from aisdb_ray.schema import SEG, SEQ, SOURCE, TIME
from aisdb_ray.stages.series import (
    DEFAULT_MAX_GAP,
    DEFAULT_STEP,
    _sorted_dedup_indices,
    gapfill_group,
)

CHUNK_COL = "_chunk"
DEFAULT_CHUNK_S = 7 * 86400  # one week, mirroring TimescaleDB's 7-day chunks


def _add_chunk(batch: pa.Table, chunk_s: int) -> pa.Table:
    import pyarrow.compute as pc

    c = pc.multiply(
        pc.divide(pc.cast(batch[TIME], pa.int64()), pa.scalar(chunk_s, pa.int64())),
        pa.scalar(1, pa.int64()),
    )
    return batch.append_column(CHUNK_COL, c)


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


def _chunk_summary(batch: pa.Table) -> pa.Table:
    """Per-(source, chunk) metadata rows from cleaned-chunk blocks."""
    src = batch[SOURCE].to_numpy(zero_copy_only=False)
    ch = batch[CHUNK_COL].to_numpy(zero_copy_only=False)
    t = batch[TIME].to_numpy(zero_copy_only=False)
    seg = batch[SEG].to_numpy(zero_copy_only=False)
    key = np.char.add(src.astype(str), np.char.mod(":%d", ch))
    first = np.flatnonzero(np.r_[True, key[1:] != key[:-1]])
    bounds = np.r_[first, len(key)]
    rows = {
        "source": [], "chunk": [], "t_first": [], "t_last": [], "n_segs": [],
    }
    for a, b in zip(bounds[:-1], bounds[1:]):
        rows["source"].append(src[a])
        rows["chunk"].append(int(ch[a]))
        rows["t_first"].append(int(t[a]))
        rows["t_last"].append(int(t[b - 1]))
        rows["n_segs"].append(int(seg[b - 1]) + 1)
    return pa.table(
        {
            "source": pa.array(rows["source"], pa.string()),
            "chunk": pa.array(rows["chunk"], pa.int64()),
            "t_first": pa.array(rows["t_first"], pa.int64()),
            "t_last": pa.array(rows["t_last"], pa.int64()),
            "n_segs": pa.array(rows["n_segs"], pa.int64()),
        }
    )


def clean_series_salted(
    ds,
    max_gap: int = DEFAULT_MAX_GAP,
    chunk_s: int = DEFAULT_CHUNK_S,
):
    """Salted equivalent of series.clean_series: identical output, but no
    single task ever sees more than one time chunk of a source."""
    chunked = ds.map_batches(
        lambda b: _add_chunk(b, chunk_s), batch_format="pyarrow"
    )
    local = chunked.groupby([SOURCE, CHUNK_COL]).map_groups(
        lambda g: _clean_chunk_group(g, max_gap), batch_format="pyarrow"
    )
    mat = local.materialize()

    # tiny metadata pass -> exact per-chunk seg offsets on the driver
    summary = (
        mat.map_batches(_chunk_summary, batch_format="pyarrow", batch_size=None)
        .to_pandas()
        .sort_values(["source", "chunk"], kind="stable")
    )
    offsets: dict[tuple[str, int], int] = {}
    for src, g in summary.groupby("source", sort=False):
        next_seg = 0
        prev_last_t = None
        for _, r in g.iterrows():
            if prev_last_t is None or (r["t_first"] - prev_last_t) >= max_gap:
                off = next_seg          # boundary between chunks -> new seg
            else:
                off = next_seg - 1      # first local seg merges with previous
            offsets[(src, int(r["chunk"]))] = off
            next_seg = off + int(r["n_segs"])
            prev_last_t = r["t_last"]
    off_ref = ray.put(offsets)

    def relabel(b: pa.Table) -> pa.Table:
        om = ray.get(off_ref)
        src = b[SOURCE].to_numpy(zero_copy_only=False)
        ch = b[CHUNK_COL].to_numpy(zero_copy_only=False)
        seg = b[SEG].to_numpy(zero_copy_only=False).copy()
        # vectorized per (source, chunk) run (blocks hold whole groups)
        key_change = np.r_[True, (src[1:] != src[:-1]) | (ch[1:] != ch[:-1])]
        starts = np.flatnonzero(key_change)
        bounds = np.r_[starts, len(src)]
        for a, bb in zip(bounds[:-1], bounds[1:]):
            seg[a:bb] += om[(src[a], int(ch[a]))]
        out = b.drop_columns([SEG, CHUNK_COL])
        return out.append_column(SEG, pa.array(seg))

    return mat.map_batches(relabel, batch_format="pyarrow", batch_size=None)


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
