"""Columnar compression tier: pack per series -> Gorilla-encode in an actor pool.

Mirrors TimescaleDB's compressed-chunk layout the reference configures —
one compressed row per segment key with ``segmentby = mmsi`` (here
``source``) and ``orderby = time ASC``
(/root/reference/aisdb/aisdb_sql/timescale_createtable_dynamic.sql:25-29).

Two stages:

1. ``pack_series`` — ``groupby(source).map_groups``: sort one series and
   emit ONE row per source holding the raw time / value / segment-id
   vectors as Arrow list columns.  Packing per source (not per gap segment)
   amortizes the codec's fixed vectorization cost over thousands of points;
   the ``seg`` vector rides along as a third Gorilla stream (monotone ints —
   near-free), so segment identity survives the round-trip exactly.
2. ``GorillaEncode`` — a callable class run via
   ``map_batches(GorillaEncode, concurrency=(1, N), batch_format="pyarrow")``:
   the stateful actor-pool stage (AISdb's heavyweight-state actor precedent,
   /root/reference/aisdb/denoising_encoder.py:262-337).

``GorillaDecode`` reverses losslessly: round-trip equality of every
timestamp, value and segment id is asserted in tests (compression parity).
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
        ("times", pa.list_(pa.int64())),
        ("values", pa.list_(pa.int64())),
        ("segs", pa.list_(pa.int64())),
    ]
)

PACKED_CHUNK_SCHEMA = pa.schema(
    [
        (SOURCE, pa.string()),
        ("chunk", pa.int64()),
        ("times", pa.list_(pa.int64())),
        ("values", pa.list_(pa.int64())),
        ("segs", pa.list_(pa.int64())),
    ]
)

ENCODED_SCHEMA = pa.schema(
    [
        (SOURCE, pa.string()),
        ("n_points", pa.int64()),
        ("ts_blob", pa.binary()),
        ("ts_nbits", pa.int64()),
        ("val_blob", pa.binary()),
        ("val_nbits", pa.int64()),
        ("seg_blob", pa.binary()),
        ("seg_nbits", pa.int64()),
    ]
)


def pack_series_group(
    group: pa.Table, max_gap: int = DEFAULT_MAX_GAP, cleaned: bool = False
) -> pa.Table:
    """One source -> one packed row (times/values/segs list columns)."""
    if cleaned:
        # defensive within-source re-sort: the key shuffle need not preserve
        # within-key order (reference is equally defensive, interp.py:334-338)
        t0 = group[TIME].to_numpy(zero_copy_only=False)
        s0 = (
            group[SEQ].to_numpy(zero_copy_only=False)
            if SEQ in group.column_names
            else np.zeros(len(t0), np.int64)
        )
        g = group.take(pa.array(np.lexsort((s0, t0))))
    else:
        g = clean_group(group, max_gap)
    n = g.num_rows
    if n == 0:
        return PACKED_SCHEMA.empty_table()
    t = g[TIME].to_numpy(zero_copy_only=False).astype(np.int64)
    v = g[N_TOK].to_numpy(zero_copy_only=False).astype(np.int64)
    seg = g[SEG].to_numpy(zero_copy_only=False).astype(np.int64)
    off = pa.array(np.array([0, n], dtype=np.int32))
    return pa.table(
        {
            SOURCE: pa.array([g[SOURCE][0].as_py()]),
            "times": pa.ListArray.from_arrays(off, pa.array(t)),
            "values": pa.ListArray.from_arrays(off, pa.array(v)),
            "segs": pa.ListArray.from_arrays(off, pa.array(seg)),
        },
        schema=PACKED_SCHEMA,
    )


def pack_chunk_group(group: pa.Table, chunk_col: str = "_chunk") -> pa.Table:
    """One (source, time-chunk) group -> one packed row (segs already global).

    The bounded-size packing unit: a hot source's encoder work spreads
    across its time chunks instead of becoming one giant task (the
    whole-source-packing skew fix; TimescaleDB's chunked compressed layout,
    timescale_createtable_dynamic.sql:17-29).
    """
    n = group.num_rows
    if n == 0:
        return PACKED_CHUNK_SCHEMA.empty_table()
    t0 = group[TIME].to_numpy(zero_copy_only=False)
    s0 = (
        group[SEQ].to_numpy(zero_copy_only=False)
        if SEQ in group.column_names
        else np.zeros(n, np.int64)
    )
    g = group.take(pa.array(np.lexsort((s0, t0))))
    off = pa.array(np.array([0, n], dtype=np.int32))
    return pa.table(
        {
            SOURCE: pa.array([g[SOURCE][0].as_py()]),
            "chunk": pa.array([g[chunk_col][0].as_py()], pa.int64()),
            "times": pa.ListArray.from_arrays(
                off, pa.array(g[TIME].to_numpy(zero_copy_only=False).astype(np.int64))
            ),
            "values": pa.ListArray.from_arrays(
                off, pa.array(g[N_TOK].to_numpy(zero_copy_only=False).astype(np.int64))
            ),
            "segs": pa.ListArray.from_arrays(
                off, pa.array(g[SEG].to_numpy(zero_copy_only=False).astype(np.int64))
            ),
        },
        schema=PACKED_CHUNK_SCHEMA,
    )


class GorillaEncode:
    """Actor-pool encoder: packed series rows -> compressed binary rows."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols = {}
        for name in ("times", "values", "segs"):
            la = batch[name].combine_chunks()
            cols[name] = (la.offsets.to_numpy(), la.values.to_numpy())
        n = batch.num_rows
        out = {
            "n_points": [], "ts_blob": [], "ts_nbits": [],
            "val_blob": [], "val_nbits": [], "seg_blob": [], "seg_nbits": [],
        }
        for i in range(n):
            to, tf = cols["times"]
            vo, vf = cols["values"]
            so, sf = cols["segs"]
            t = tf[to[i] : to[i + 1]]
            v = vf[vo[i] : vo[i + 1]]
            s = sf[so[i] : so[i + 1]]
            tb, tn, cnt = gorilla.encode_timestamps(t)
            vb, vn, _ = gorilla.encode_values(v)
            sb, sn, _ = gorilla.encode_timestamps(s)  # monotone ints: dod codec
            out["n_points"].append(cnt)
            out["ts_blob"].append(tb)
            out["ts_nbits"].append(tn)
            out["val_blob"].append(vb)
            out["val_nbits"].append(vn)
            out["seg_blob"].append(sb)
            out["seg_nbits"].append(sn)
        return pa.table(
            {
                SOURCE: batch[SOURCE],
                "n_points": pa.array(out["n_points"], pa.int64()),
                "ts_blob": pa.array(out["ts_blob"], pa.binary()),
                "ts_nbits": pa.array(out["ts_nbits"], pa.int64()),
                "val_blob": pa.array(out["val_blob"], pa.binary()),
                "val_nbits": pa.array(out["val_nbits"], pa.int64()),
                "seg_blob": pa.array(out["seg_blob"], pa.binary()),
                "seg_nbits": pa.array(out["seg_nbits"], pa.int64()),
            },
            schema=ENCODED_SCHEMA,
        )


class GorillaEncodePassthrough(GorillaEncode):
    """GorillaEncode that forwards bookkeeping columns (e.g. the hash
    partition id) through the encoder unchanged."""

    keep = ("part", "chunk")

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
            s = gorilla.decode_timestamps(
                batch["seg_blob"][i].as_py(), batch["seg_nbits"][i].as_py(), n
            )
            ts.append(t)
            vs.append(v)
            segs.append(s)
            srcs.append(np.full(n, batch[SOURCE][i].as_py(), dtype=object))
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
    """series points -> compressed per-source rows (stateful actor pool).

    Autoscaling pool (min 1): a fixed-size pool can reserve every CPU and
    starve the upstream shuffle tasks into a deadlock on small hosts.
    """
    packed = pack_series(ds, max_gap, cleaned=cleaned)
    # packed rows are one-per-source: keep batches SMALL so the encode work
    # fans out across the pool (256-row batches would serialize the stage)
    return packed.map_batches(
        GorillaEncode,
        batch_format="pyarrow",
        concurrency=(1, concurrency),
        batch_size=4,
    )


def decompress(ds, concurrency: int = 4):
    """compressed rows -> (source, seg, time, n_tok) point rows."""
    return ds.map_batches(
        GorillaDecode,
        batch_format="pyarrow",
        concurrency=(1, concurrency),
        batch_size=4,
    )
