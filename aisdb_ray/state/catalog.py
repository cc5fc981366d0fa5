"""Dataset time-range catalog (A4): metadata-only min/max scans.

The reference derives the database's queryable date range from its monthly
table names and exposes it for query validation
(/root/reference/aisdb/database/dbconn.py:82-108; ``dbqry`` checks requested
ranges against it).  Here the storage is partitioned Parquet, so the catalog
comes from ROW-GROUP STATISTICS in the file footers — O(#files) footer
reads on the driver, zero data bytes moved.  Uses:

- ``dataset_range``: the (min, max) of a column over a parquet directory;
- ``file_ranges``: per-file ranges — the pruning map a planner (or a
  human validating a predicate-pushdown scan) reads;
- ``validate_range``: clamp a requested window against the catalog and
  list the files that can possibly contain it (the S5/A4 "which months do
  I even open" step, done against footers instead of table names).
"""

from __future__ import annotations

import pyarrow.parquet as pq

from aisdb_ray.state.lineage import list_parquet_files


def _col_range(md, col: str):
    lo = hi = None
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            c = g.column(ci)
            # path_in_schema covers nested names; exact match for flat cols
            if c.path_in_schema != col or c.statistics is None:
                continue
            st = c.statistics
            if not st.has_min_max:
                continue
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
    return lo, hi


def file_ranges(path: str, col: str) -> list[dict]:
    """Per-file (file, rows, min, max) from footer statistics only."""
    out = []
    for f in sorted(list_parquet_files(path)):
        md = pq.read_metadata(f)
        lo, hi = _col_range(md, col)
        out.append({"file": f, "rows": md.num_rows, "min": lo, "max": hi})
    return out


def dataset_range(path: str, col: str):
    """(min, max) of ``col`` across the dataset — the db_daterange analog."""
    lo = hi = None
    for r in file_ranges(path, col):
        if r["min"] is None:
            continue
        lo = r["min"] if lo is None else min(lo, r["min"])
        hi = r["max"] if hi is None else max(hi, r["max"])
    return lo, hi


def route_files(path: str, col: str, chunk_s: int,
                stats_less: list[str] | None = None) -> dict[int, list[str]]:
    """M7 (file-date sniffing → partition routing): map each input file to
    the time chunk(s) it can contain, from footer statistics alone — the
    analog of the reference sniffing dates out of raw filenames to route
    them to monthly tables (/root/reference/aisdb/database/decoder.py,
    proc_util.getfiledate usage).  A planner feeds each chunk's file list
    to its partition's tasks; files never open until their chunk runs."""
    out: dict[int, list[str]] = {}
    no_stats: list[str] = []
    for r in file_ranges(path, col):
        if r["min"] is None:
            # a file without footer statistics could hold ANY chunk —
            # dropping it would silently lose its rows from the plan;
            # report it so the planner adds it to every chunk it runs
            no_stats.append(r["file"])
            continue
        for c in range(int(r["min"]) // chunk_s, int(r["max"]) // chunk_s + 1):
            out.setdefault(c * chunk_s, []).append(r["file"])
    if no_stats:
        if stats_less is not None:
            stats_less.extend(no_stats)
        else:
            for files in out.values():
                files.extend(no_stats)
            if not out:
                # EVERY file lacks footer stats: there is no real chunk to
                # attach them to, and fabricating a chunk key (e.g. 0)
                # would make a planner that bounds each chunk's scan to
                # [chunk, chunk + chunk_s) silently drop all rows outside
                # that window.  Refuse; the caller must pass ``stats_less``
                # and scan those files unbounded.
                raise ValueError(
                    "route_files: no input file has footer statistics for "
                    f"column {col!r}; pass stats_less=[] and scan those "
                    "files unbounded instead of routing them to a chunk"
                )
    return out


def validate_range(path: str, col: str, lo, hi) -> dict:
    """Clamp a requested [lo, hi] window to the catalog and list candidate
    files.  ``covered`` is False when the window misses the dataset
    entirely (the reference warns and returns no months)."""
    ranges = file_ranges(path, col)
    cand = [
        r["file"]
        for r in ranges
        # stats-less files are conservative candidates: excluding them
        # would silently miss their rows
        if r["min"] is None or not (r["max"] < lo or r["min"] > hi)
    ]
    d_lo = d_hi = None
    for r in ranges:  # derive from the ranges already read — no 2nd pass
        if r["min"] is None:
            continue
        d_lo = r["min"] if d_lo is None else min(d_lo, r["min"])
        d_hi = r["max"] if d_hi is None else max(d_hi, r["max"])
    covered = bool(cand) and d_lo is not None
    return {
        "covered": covered,
        "clamped": (max(lo, d_lo), min(hi, d_hi)) if covered else None,
        "files": cand,
        "files_total": len(ranges),
    }
