"""Columnar compression tier: pack per series -> Gorilla-encode in an actor pool.

Mirrors TimescaleDB's compressed-chunk layout the reference configures —
one compressed row per segment with ``segmentby = mmsi`` (here ``source``)
and ``orderby = time ASC``
(/root/reference/aisdb/aisdb_sql/timescale_createtable_dynamic.sql:25-29).

Two stages:

1. ``pack_series`` — ``groupby(source).map_groups``: sort one series, split
   by ``seg``, emit ONE row per (source, seg) holding the raw time/value
   vectors as Arrow list columns.  This is the same key-shuffle the series
   stage already uses (SURVEY.md §7.3 — one partitioning key, reused).
2. ``GorillaEncode`` — a callable class run via
   ``map_batches(GorillaEncode, concurrency=N, batch_format="pyarrow")``:
   the stateful actor-pool stage (bit tables and scratch buffers amortized
   per actor, AISdb's InlandDenoising actor-state precedent,
   /root/reference/aisdb/denoising_encoder.py:262-337).  Each packed row
   is encoded independently with the vectorized codec.

``GorillaDecode`` reverses losslessly: round-trip equality of every
timestamp and value is asserted in tests (the compression-parity check).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from aisdb_ray.functions import gorilla
from aisdb_ray.schema import N_TOK, SEG, SEQ, SOURCE, TIME
from aisdb_ray.stages.series import DEFAULT_MAX_GAP, clean_group

PACKED_SCHEMA = pa.schema(
    [
        (SOURCE, pa.string()),
        (SEG, pa.int64()),
        ("times", pa.list_(pa.int64())),
        ("values", pa.list_(pa.int64())),
    ]
)

ENCODED_SCHEMA = pa.schema(
    [
        (SOURCE, pa.string()),
        (SEG, pa.int64()),
        ("n_points", pa.int64()),
        ("ts_blob", pa.binary()),
        ("ts_nbits", pa.int64()),
        ("val_blob", pa.binary()),
        ("val_nbits", pa.int64()),
    ]
)


def pack_series_group(
    group: pa.Table, max_gap: int = DEFAULT_MAX_GAP, cleaned: bool = False
) -> pa.Table:
    """One source -> one packed row per segment (times/values list columns)."""
    g = group if cleaned else clean_group(group, max_gap)
    t = g[TIME].to_numpy(zero_copy_only=False).astype(np.int64)
    v = g[N_TOK].to_numpy(zero_copy_only=False).astype(np.int64)
    seg = g[SEG].to_numpy(zero_copy_only=False)
    n = len(t)
    if n == 0:
        return PACKED_SCHEMA.empty_table()
    first = np.flatnonzero(np.r_[True, seg[1:] != seg[:-1]])
    offsets = np.r_[first, n].astype(np.int64)
    src = g[SOURCE][0].as_py()
    return pa.table(
        {
            SOURCE: pa.array([src] * len(first)),
            SEG: pa.array(seg[first]),
            "times": pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), pa.array(t)),
            "values": pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), pa.array(v)),
        },
        schema=PACKED_SCHEMA,
    )


class GorillaEncode:
    """Actor-pool encoder: packed series rows -> compressed binary rows."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        # zero-copy slicing of the list columns: offsets + flat values
        tl = batch["times"].combine_chunks()
        vl = batch["values"].combine_chunks()
        t_off = tl.offsets.to_numpy()
        t_flat = tl.values.to_numpy()
        v_off = vl.offsets.to_numpy()
        v_flat = vl.values.to_numpy()
        n = batch.num_rows
        ts_blob, ts_nbits, val_blob, val_nbits, npts = [], [], [], [], []
        for i in range(n):
            t = t_flat[t_off[i] : t_off[i + 1]]
            v = v_flat[v_off[i] : v_off[i + 1]]
            tb, tn, cnt = gorilla.encode_timestamps(t)
            vb, vn, _ = gorilla.encode_values(v)
            ts_blob.append(tb)
            ts_nbits.append(tn)
            val_blob.append(vb)
            val_nbits.append(vn)
            npts.append(cnt)
        return pa.table(
            {
                SOURCE: batch[SOURCE],
                SEG: batch[SEG],
                "n_points": pa.array(npts, pa.int64()),
                "ts_blob": pa.array(ts_blob, pa.binary()),
                "ts_nbits": pa.array(ts_nbits, pa.int64()),
                "val_blob": pa.array(val_blob, pa.binary()),
                "val_nbits": pa.array(val_nbits, pa.int64()),
            },
            schema=ENCODED_SCHEMA,
        )


class GorillaEncodePassthrough(GorillaEncode):
    """GorillaEncode that forwards bookkeeping columns (e.g. the hash
    partition id) through the encoder unchanged."""

    keep = ("part",)

    def __call__(self, batch: pa.Table) -> pa.Table:
        extra = {c: batch[c] for c in batch.column_names if c in self.keep}
        out = super().__call__(batch.drop_columns(list(extra)))
        for c, col in extra.items():
            out = out.append_column(c, col)
        return out


class GorillaDecode:
    """Actor-pool decoder: compressed rows -> exploded point rows."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        srcs, segs, ts, vs = [], [], [], []
        for i in range(batch.num_rows):
            n = batch["n_points"][i].as_py()
            t = gorilla.decode_timestamps(
                batch["ts_blob"][i].as_py(), batch["ts_nbits"][i].as_py(), n
            )
            v = gorilla.decode_values(
                batch["val_blob"][i].as_py(), batch["val_nbits"][i].as_py(), n
            )
            ts.append(t)
            vs.append(v)
            srcs.append(np.full(n, batch[SOURCE][i].as_py(), dtype=object))
            segs.append(np.full(n, batch[SEG][i].as_py(), dtype=np.int64))
        if not ts:
            return pa.table(
                {
                    SOURCE: pa.array([], pa.string()),
                    SEG: pa.array([], pa.int64()),
                    TIME: pa.array([], pa.int64()),
                    N_TOK: pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                SOURCE: pa.array(np.concatenate(srcs), pa.string()),
                SEG: pa.array(np.concatenate(segs)),
                TIME: pa.array(np.concatenate(ts)),
                N_TOK: pa.array(np.concatenate(vs)),
            }
        )


# ------------------------------------------------------------ dataset-level

def pack_series(ds, max_gap: int = DEFAULT_MAX_GAP, cleaned: bool = False):
    return ds.groupby(SOURCE).map_groups(
        lambda g: pack_series_group(g, max_gap, cleaned=cleaned),
        batch_format="pyarrow",
    )


def compress(ds, max_gap: int = DEFAULT_MAX_GAP, concurrency: int = 4, cleaned: bool = False):
    """series points -> compressed segment rows (stateful actor pool)."""
    packed = pack_series(ds, max_gap, cleaned=cleaned)
    # autoscaling pool (min 1): a fixed-size pool can reserve every CPU and
    # starve the upstream shuffle tasks into a deadlock on small hosts
    return packed.map_batches(
        GorillaEncode,
        batch_format="pyarrow",
        concurrency=(1, concurrency),
        batch_size=256,
    )


def decompress(ds, concurrency: int = 4):
    """compressed segment rows -> (source, seg, time, n_tok) point rows."""
    return ds.map_batches(
        GorillaDecode,
        batch_format="pyarrow",
        concurrency=(1, concurrency),
        batch_size=256,
    )
