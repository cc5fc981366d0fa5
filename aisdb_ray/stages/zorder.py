"""Z-order (Morton) layout: 2-D row-group locality for range scans.

A time-sorted layout prunes row groups on time but touches EVERY group
for a value predicate; a value-sorted layout has the converse problem.
Interleaving the bits of both quantized dimensions (the Morton curve —
the technique behind Delta/Iceberg ``OPTIMIZE ZORDER BY``) makes row
groups square-ish tiles in (a, b) space, so a conjunctive range query
prunes on BOTH columns from ordinary parquet min/max footer statistics —
no index structure, just row order.

Shape: quantize each dimension to 16 bits against broadcast global
bounds (one cheap min/max aggregate), interleave to an int64 key, ONE
sort on the key (Ray's native distributed sort — this is a layout BUILD,
run once and cached), write with small row groups.  Readers use plain
``pq.read_table(filters=...)`` — pyarrow prunes row groups from the
footer stats; :func:`scan_stats` reports touched vs total groups so the
locality claim is testable, not asserted.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _spread16(x: np.ndarray) -> np.ndarray:
    """Spread the low 16 bits of x so bit i lands at position 2i."""
    x = x.astype(np.uint64) & np.uint64(0xFFFF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x00FF00FF)
    x = (x | (x << np.uint64(4))) & np.uint64(0x0F0F0F0F)
    x = (x | (x << np.uint64(2))) & np.uint64(0x33333333)
    x = (x | (x << np.uint64(1))) & np.uint64(0x55555555)
    return x


def morton_key(a: np.ndarray, b: np.ndarray,
               a_min: int, a_max: int, b_min: int, b_max: int) -> np.ndarray:
    """int64 Morton key of two int64 columns quantized to 16 bits each
    against fixed global bounds (inclusive)."""
    def quant(x, lo, hi):
        span = max(hi - lo, 1)
        xi = x.astype(np.int64) - lo
        if span < (1 << 46):
            q = xi * 65535 // span  # exact: 65535 * span < 2^63
        else:
            # nanosecond-scale spans overflow the int64 product (it
            # silently wrapped negative and clipped the whole layout to
            # bucket 0); float64 quantization loses only sub-bucket
            # precision, which is irrelevant to layout locality, and
            # IEEE ops keep it deterministic
            q = np.floor(xi.astype(np.float64) * (65535.0 / span)).astype(
                np.int64)
        return np.clip(q, 0, 65535)

    qa = quant(a, a_min, a_max)
    qb = quant(b, b_min, b_max)
    return (
        (_spread16(qa) << np.uint64(1)) | _spread16(qb)
    ).astype(np.int64)


def write_zordered(ds, col_a: str, col_b: str, out_dir: str,
                   rows_per_group: int = 2048):
    """Sort ``ds`` by the Morton key of (col_a, col_b) and write parquet
    with small row groups; returns (out_dir, bounds).  The key column is
    dropped from the files — the layout IS the row order."""
    import pyarrow.compute as pc

    import ray

    def batch_stats(b: pa.Table) -> pa.Table:
        if b.num_rows and (b[col_a].null_count or b[col_b].null_count):
            # a null layout value would NaN-cast into an INT64_MIN Morton
            # key (silently breaking placement) and None-poison the
            # global bounds reduction — layout columns must be non-null
            raise ValueError(
                f"write_zordered: null values in {col_a!r}/{col_b!r}")
        if b.num_rows == 0:
            return pa.table({
                "a_min": pa.array([], pa.int64()),
                "a_max": pa.array([], pa.int64()),
                "b_min": pa.array([], pa.int64()),
                "b_max": pa.array([], pa.int64()),
            })
        return pa.table({
            "a_min": pa.array([pc.min(b[col_a]).as_py()], pa.int64()),
            "a_max": pa.array([pc.max(b[col_a]).as_py()], pa.int64()),
            "b_min": pa.array([pc.min(b[col_b]).as_py()], pa.int64()),
            "b_max": pa.array([pc.max(b[col_b]).as_py()], pa.int64()),
        })

    stats = ds.map_batches(batch_stats, batch_format="pyarrow").take_all()
    if not stats:
        raise ValueError("write_zordered: empty input")
    bounds = (
        min(r["a_min"] for r in stats), max(r["a_max"] for r in stats),
        min(r["b_min"] for r in stats), max(r["b_max"] for r in stats),
    )
    a0, a1, b0, b1 = bounds

    def add_key(b: pa.Table) -> pa.Table:
        k = morton_key(
            b[col_a].to_numpy(zero_copy_only=False),
            b[col_b].to_numpy(zero_copy_only=False),
            a0, a1, b0, b1,
        )
        return b.append_column("_z", pa.array(k))

    os.makedirs(out_dir, exist_ok=True)
    zsorted = ds.map_batches(add_key, batch_format="pyarrow").sort("_z")
    zsorted.map_batches(
        lambda b: b.drop_columns(["_z"]), batch_format="pyarrow"
    ).write_parquet(out_dir, row_group_size=rows_per_group)
    return out_dir, bounds


def scan_stats(path_dir: str, col_a: str, col_b: str,
               a_lo: int, a_hi: int, b_lo: int, b_hi: int) -> dict:
    """(touched, total) row-group counts for the conjunctive box query,
    decided from footer min/max only — the pruning evidence."""
    touched = total = 0
    for f in sorted(os.listdir(path_dir)):
        if not f.endswith(".parquet"):
            continue
        md = pq.read_metadata(os.path.join(path_dir, f))
        idx_a = md.schema.names.index(col_a)
        idx_b = md.schema.names.index(col_b)
        for g in range(md.num_row_groups):
            total += 1
            sa = md.row_group(g).column(idx_a).statistics
            sb = md.row_group(g).column(idx_b).statistics
            if (sa is None or sb is None
                    or not sa.has_min_max or not sb.has_min_max):
                # an all-null column chunk writes statistics WITHOUT
                # min/max (has_min_max=False, min=max=None) — comparing
                # None would TypeError; treat as unprunable
                touched += 1
                continue
            if sa.min > a_hi or sa.max < a_lo or sb.min > b_hi or sb.max < b_lo:
                continue
            touched += 1
    return {"touched": touched, "total": total}


def box_scan(path_dir: str, col_a: str, col_b: str,
             a_lo: int, a_hi: int, b_lo: int, b_hi: int,
             columns: list[str] | None = None):
    """Row-group-pruned conjunctive range read as a Ray Dataset."""
    import pyarrow.dataset as pads

    import ray.data as rd

    expr = (
        (pads.field(col_a) >= a_lo) & (pads.field(col_a) <= a_hi)
        & (pads.field(col_b) >= b_lo) & (pads.field(col_b) <= b_hi)
    )
    return rd.read_parquet(path_dir, columns=columns, filter=expr)
