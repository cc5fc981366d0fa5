"""Small-file compaction for parquet partitions.

Incremental refresh and per-chunk atomic writes (pipelines/cascade.py)
trade file size for resumability: a long-lived lake accumulates many
small files, and at 100 TB the file-open cost starts to dominate scans.
This operator re-bins a directory's files into ~target-row outputs:

- the PLAN is metadata-only (footer row counts — no data read);
- each output bin is ONE Ray task that reads its input files and writes
  one file to a temp name, atomically renamed (a killed run leaves only
  whole outputs and the untouched source dir);
- the swap into place happens only after EVERY bin is durable and the
  total row count is revalidated against the plan, so a crash at any
  point leaves either the old layout or the new one — never a mix.

Bins are contiguous runs of the name-sorted file list, so any ordering
contract encoded in file names (e.g. a Z-ordered or time-ordered layout)
survives compaction.
"""

from __future__ import annotations

import os
import shutil

import pyarrow.parquet as pq


def plan_bins(src_dir: str, target_rows: int,
              counts_out: dict | None = None) -> list[list[str]]:
    """Greedy contiguous binning of name-sorted files by footer counts.

    ``counts_out`` (optional dict) receives {file_name: rows} so callers
    can revalidate totals without re-reading every footer."""
    files = sorted(
        f for f in os.listdir(src_dir) if f.endswith(".parquet")
    )
    bins: list[list[str]] = []
    cur: list[str] = []
    cur_rows = 0
    for f in files:
        n = pq.read_metadata(os.path.join(src_dir, f)).num_rows
        if counts_out is not None:
            counts_out[f] = n
        if cur and cur_rows + n > target_rows:
            bins.append(cur)
            cur, cur_rows = [], 0
        cur.append(f)
        cur_rows += n
    if cur:
        bins.append(cur)
    return bins


def compact_dir(src_dir: str, target_rows: int = 1 << 20,
                row_group_size: int | None = None) -> dict:
    """Compact ``src_dir`` in place; returns {files_before, files_after,
    rows}.  No-op (and no write amplification) if nothing would shrink."""
    import ray

    stage = src_dir.rstrip("/") + ".compact-stage"
    old = src_dir.rstrip("/") + ".compact-old"
    # recovery: a crash between the two swap renames leaves NO dir at
    # src_dir (data parked at .compact-old) — roll the old layout back so
    # readers and this rerun see a complete directory again
    if not os.path.isdir(src_dir) and os.path.isdir(old):
        os.replace(old, src_dir)

    counts: dict = {}
    bins = plan_bins(src_dir, target_rows, counts_out=counts)
    n_before = sum(len(b) for b in bins)
    if all(len(b) == 1 for b in bins):
        rows = sum(counts[f] for b in bins for f in b)
        return {"files_before": n_before, "files_after": n_before,
                "rows": rows}

    shutil.rmtree(stage, ignore_errors=True)
    os.makedirs(stage)

    @ray.remote
    def write_bin(i: int, names: list[str]) -> int:
        import pyarrow as pa

        tbl = pa.concat_tables(
            [pq.read_table(os.path.join(src_dir, f)) for f in names],
            promote_options="default",
        )
        tmp = os.path.join(stage, f"compact-{i:05d}.parquet.tmp")
        pq.write_table(tbl, tmp, row_group_size=row_group_size)
        os.replace(tmp, tmp[:-4])  # atomic: stage holds only whole files
        return tbl.num_rows

    rows = sum(ray.get([write_bin.remote(i, b) for i, b in enumerate(bins)]))
    expect = sum(counts[f] for b in bins for f in b)  # from the plan pass
    if rows != expect:
        shutil.rmtree(stage, ignore_errors=True)
        raise RuntimeError(
            f"compact_dir: staged rows {rows} != source rows {expect}")

    # carry everything the plan didn't cover into the new layout: parquet
    # chunks appended by a concurrent refresh since planning, and
    # non-parquet sidecars (_SUCCESS, manifests) — the old swap silently
    # destroyed both with the row validation still green
    planned = {f for b in bins for f in b}
    for f in sorted(os.listdir(src_dir)):
        if f not in planned:
            os.link(os.path.join(src_dir, f), os.path.join(stage, f))

    shutil.rmtree(old, ignore_errors=True)
    os.replace(src_dir, old)
    os.replace(stage, src_dir)
    shutil.rmtree(old, ignore_errors=True)
    return {"files_before": n_before, "files_after": len(bins), "rows": rows}
