"""Tier-stitching range queries over a materialized cascade.

A retention cascade (raw → 1m → 1h → 1d) exists so that an arbitrary
time-range aggregate never rescans raw history: full days are answered
from the 1d tier, the ragged edges from 1h, then 1m, then raw points for
the sub-minute remainder.  This module plans that decomposition and
assembles the answer from the cascade's on-disk tiers — the query-routing
half of the continuous-aggregate design (the reference's deployment
target keeps per-tier hypertables for exactly this,
/root/reference/aisdb/aisdb_sql/timescale_createtable_dynamic.sql).

The plan is exact: pieces are disjoint, w-aligned at both ends, and cover
``[t0, t1)`` — so the stitched partials reaggregate to the same answer as
a raw scan (the rollup partials are algebraic).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc

from aisdb_ray.schema import (BUCKET, CNT_V, MAX_V, MEAN_V, MIN_V, N_TOK,
                              SOURCE, SUM_V, TIME)
from aisdb_ray.stages import rollup as rollup_mod

RAW = 1  # plan marker: read raw points, not a tier


def _ceil(t: int, w: int) -> int:
    return ((t + w - 1) // w) * w


def _floor(t: int, w: int) -> int:
    return (t // w) * w


def tier_plan(t0: int, t1: int, widths: tuple[int, ...] = (60, 3600, 86400)):
    """Decompose [t0, t1) into (width, lo, hi) pieces: climb raw→…→top on
    the left edge, the top tier across the middle, descend on the right.
    Every piece is width-aligned on both ends; pieces are disjoint and
    cover the range exactly (asserted)."""
    if t1 <= t0:
        return []
    ws = [RAW, *sorted(widths)]
    # each tier width must divide the next: non-nested widths (60, 90)
    # produce misaligned pieces that drop sub-ranges from the stitched
    # aggregate under -O (the alignment asserts vanish) — refuse upfront
    for w, nxt in zip(ws[1:], ws[2:]):
        if nxt % w != 0:
            raise ValueError(
                f"tier_plan: width {nxt} is not a multiple of {w} — tier "
                "widths must nest")
    pieces: list[tuple[int, int, int]] = []
    cur = t0
    for w, nxt in zip(ws, ws[1:]):
        hi = min(_ceil(cur, nxt), _floor(t1, max(w, 1)) if w != RAW else t1)
        if hi > cur:
            pieces.append((w, cur, hi))
            cur = hi
        if cur >= t1 or cur % nxt != 0:
            break
    if cur < t1:
        top = ws[-1]
        hi = _floor(t1, top)
        if hi > cur:
            pieces.append((top, cur, hi))
            cur = hi
        for w in reversed(ws[:-1]):
            hi = t1 if w == RAW else _floor(t1, w)
            if hi > cur:
                pieces.append((w, cur, hi))
                cur = hi
    assert cur == t1, (cur, t1, pieces)
    # coalesce adjacent same-width pieces (a range inside one minute climbs
    # then descends in raw — that's one scan, not two)
    merged: list[tuple[int, int, int]] = []
    for p in pieces:
        if merged and merged[-1][0] == p[0] and merged[-1][2] == p[1]:
            merged[-1] = (p[0], merged[-1][1], p[2])
        else:
            merged.append(p)
    prev = t0
    for w, lo, hi in merged:
        assert lo == prev and hi > lo, merged
        if w != RAW:
            assert lo % w == 0 and hi % w == 0, merged
        prev = hi
    return merged


def _filter_range(col, lo: int, hi: int):
    c = pc.cast(col, pa.int64())
    return pc.and_(
        pc.greater_equal(c, pa.scalar(lo, pa.int64())),
        pc.less(c, pa.scalar(hi, pa.int64())),
    )


def range_aggregate(
    out_root: str,
    t0: int,
    t1: int,
    tiers: dict[int, str] | None = None,
    value: str = N_TOK,
):
    """Per-source min/max/sum/count/mean of ``value`` over [t0, t1),
    assembled from a cascade's materialized tiers + raw series points.

    Each plan piece becomes a pruned parquet scan (bucket-range or
    time-range filter) emitting partial rows; one algebraic combine
    finishes — identical shape to a rollup, but the raw rows touched are
    only the sub-minute edges of the range."""
    import ray.data as rd

    from aisdb_ray.state.lineage import list_parquet_files

    if tiers is None:
        tiers = {60: "tier_1m", 3600: "tier_1h", 86400: "tier_1d"}
    if value != N_TOK:
        # tier pieces serve the materialized n_tok statistics; a different
        # value channel would silently mix two channels (raw edges over
        # `value`, tier middles over n_tok) under one column name
        raise ValueError(
            "range_aggregate: tiers materialize n_tok only; pass "
            f"value={N_TOK!r} or aggregate the raw series directly")
    import pyarrow.dataset as pads

    def _empty_result():
        import ray.data as rd2

        return rd2.from_arrow(pa.table({
            SOURCE: pa.array([], pa.string()),
            BUCKET: pa.array([], pa.int64()),
            MIN_V: pa.array([], pa.int64()),
            MAX_V: pa.array([], pa.int64()),
            SUM_V: pa.array([], pa.int64()),
            CNT_V: pa.array([], pa.int64()),
            MEAN_V: pa.array([], pa.float64()),
        }))

    pieces = tier_plan(t0, t1, tuple(sorted(tiers)))
    if not pieces:  # empty/inverted range: empty result, not an assert
        return _empty_result()
    parts = []
    for w, lo, hi in pieces:
        # predicate PUSHED into the scan: parquet row-group statistics prune
        # everything outside [lo, hi) before bytes leave storage — the raw
        # tier is only ever read around the sub-minute edges, never rescanned
        if w == RAW:
            files = sorted(list_parquet_files(os.path.join(out_root, "series")))
            if not files:  # rows=0 partitions leave dirs with no parquet
                continue
            ds = rd.read_parquet(
                files, columns=[SOURCE, TIME, value],
                filter=(pads.field(TIME) >= lo) & (pads.field(TIME) < hi),
            )

            def raw_partial(b: pa.Table, lo=lo, hi=hi) -> pa.Table:
                b = b.filter(_filter_range(b[TIME], lo, hi))
                # width 1: one partial row per (source, time) — collapsed
                # further by the shared combine
                return rollup_mod.partial_rollup_batch(b, 1, value)

            parts.append(ds.map_batches(raw_partial, batch_format="pyarrow"))
        else:
            files = sorted(list_parquet_files(os.path.join(out_root, tiers[w])))
            if not files:
                continue
            ds = rd.read_parquet(
                files, columns=[SOURCE, BUCKET, MIN_V, MAX_V, SUM_V, CNT_V],
                filter=(pads.field(BUCKET) >= lo) & (pads.field(BUCKET) < hi),
            )

            def tier_partial(b: pa.Table, lo=lo, hi=hi) -> pa.Table:
                return b.filter(_filter_range(b[BUCKET], lo, hi))

            parts.append(ds.map_batches(tier_partial, batch_format="pyarrow"))

    if not parts:  # every touched tier was empty
        return _empty_result()
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.union(p)

    def collapse(b: pa.Table) -> pa.Table:
        # fold every partial into a single bucket: the whole range
        t = pa.table(
            {
                SOURCE: b[SOURCE],
                BUCKET: pa.array([t0] * b.num_rows, pa.int64()),
                MIN_V: b[MIN_V],
                MAX_V: b[MAX_V],
                SUM_V: b[SUM_V],
                CNT_V: b[CNT_V],
            }
        )
        g = t.group_by([SOURCE, BUCKET], use_threads=False).aggregate(
            [(MIN_V, "min"), (MAX_V, "max"), (SUM_V, "sum"), (CNT_V, "sum")]
        )
        return g.rename_columns([SOURCE, BUCKET, MIN_V, MAX_V, SUM_V, CNT_V])

    collapsed = merged.map_batches(collapse, batch_format="pyarrow")
    return rollup_mod._combine(collapsed)
