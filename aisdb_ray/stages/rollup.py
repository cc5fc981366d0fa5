"""Time-bucketed rollups and the continuous-aggregate tier cascade.

Semantics: min/max/mean/count (+sum, for reaggregation) of the value channel
``n_tok`` per (source, time bucket) — the reference's per-window stats kernel
(/root/reference/aisdb/network_graph.py:84-210) generalized into TimescaleDB
continuous-aggregate tiers raw → 1m → 1h → 1d
(/root/reference/aisdb/aisdb_sql/timescale_createtable_dynamic.sql:17-29
configures the hypertable layout this mirrors).

Scale design (SURVEY.md §4 skew row): the aggregate is algebraic, so each
``map_batches`` task pre-aggregates its batch with a vectorized
``pyarrow.Table.group_by`` — the all-to-all ``groupby`` combine then moves
only one partial row per (source, bucket) per batch, not raw rows.  Hot
sources are therefore spread across many buckets and many batch-partials; no
explicit salt column is needed for the rollup path (the partial IS the salt:
batch-id acts as the salt that the algebraic combine folds out).

Tier-from-tier reaggregation is exact: min of mins, max of maxes, sum of
sums, sum of counts; mean is finalized as sum/count at every tier (float64),
so 1h-from-1m equals 1h-from-raw bit-for-bit on integer channels.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from aisdb_ray.schema import (
    BUCKET,
    CLOSE_V,
    CNT_V,
    MAX_V,
    MEAN_V,
    MIN_V,
    N_TOK,
    OPEN_V,
    SOURCE,
    SUM_V,
    TIME,
)


def _bucket(t: pa.ChunkedArray | pa.Array, width_s: int) -> pa.ChunkedArray:
    # integer divide truncates; on NON-NEGATIVE epochs truncate == floor,
    # which is also what the DuckDB oracles' (t // W) * W computes.  A
    # negative epoch would bucket differently here (truncate) than in the
    # floor-based kernels (twa, packing) AND corrupt OHLC's rel = t -
    # bucket packing — refuse loudly instead of diverging silently.
    t64 = pc.cast(t, pa.int64())
    if len(t64) and pc.min(t64).as_py() < 0:
        raise ValueError(
            "rollup bucket: negative epochs are outside the bucket-domain "
            "contract (truncating SQL restatement); shift the channel first")
    w = pa.scalar(width_s, pa.int64())
    return pc.multiply(pc.divide(t64, w), w)


def partial_rollup_batch(
    batch: pa.Table,
    width_s: int,
    value: str = N_TOK,
    time_col: str = TIME,
    key_col: str = SOURCE,
) -> pa.Table:
    """Vectorized per-batch partial: one row per (key, bucket) in the batch."""
    t = pa.table(
        {
            key_col: batch[key_col],
            BUCKET: _bucket(batch[time_col], width_s),
            value: pc.cast(batch[value], pa.int64()),
        }
    )
    g = t.group_by([key_col, BUCKET], use_threads=False).aggregate(
        [
            (value, "min"),
            (value, "max"),
            (value, "sum"),
            # count(*) semantics (CountOptions mode="all"), matching the SQL
            # oracles regardless of nulls in the value channel
            (value, "count", pc.CountOptions(mode="all")),
        ]
    )
    return g.rename_columns([key_col, BUCKET, MIN_V, MAX_V, SUM_V, CNT_V])


def repartial_batch(batch: pa.Table, width_s: int, key_col: str = SOURCE) -> pa.Table:
    """Partial combine of an existing rollup tier into wider buckets."""
    t = pa.table(
        {
            key_col: batch[key_col],
            BUCKET: _bucket(batch[BUCKET], width_s),
            MIN_V: batch[MIN_V],
            MAX_V: batch[MAX_V],
            SUM_V: batch[SUM_V],
            CNT_V: batch[CNT_V],
        }
    )
    g = t.group_by([key_col, BUCKET], use_threads=False).aggregate(
        [(MIN_V, "min"), (MAX_V, "max"), (SUM_V, "sum"), (CNT_V, "sum")]
    )
    return g.rename_columns([key_col, BUCKET, MIN_V, MAX_V, SUM_V, CNT_V])


def _finalize(batch: pa.Table, key_col: str = SOURCE) -> pa.Table:
    mean = pc.divide(
        pc.cast(batch[SUM_V], pa.float64()), pc.cast(batch[CNT_V], pa.float64())
    )
    cols = [BUCKET, MIN_V, MAX_V, SUM_V, CNT_V]
    out = pa.table({c: pc.cast(batch[c], pa.int64()) for c in cols})
    return pa.table(
        {
            key_col: batch[key_col],
            BUCKET: out[BUCKET],
            MIN_V: out[MIN_V],
            MAX_V: out[MAX_V],
            SUM_V: out[SUM_V],
            CNT_V: out[CNT_V],
            MEAN_V: mean,
        }
    )


def _combine(partials, key_col: str = SOURCE, hash_combine: bool = False):
    """Combine partial rows into final (key, bucket) stats — fully vectorized.

    Ray's built-in ``groupby().aggregate`` walks group boundaries in Python
    (~40µs per group per aggregate — measured), which is pathological for
    high-cardinality keys like (source, minute).  Instead: a per-block
    vectorized ``pyarrow.Table.group_by`` combine, then one of two global
    merges:

    - default (``hash_combine=False``): funnel the (already collapsed)
      partials into ONE block.  Right when the result set is small —
      top-k, mode, per-source daily tiers at moderate cardinality.
    - ``hash_combine=True``: a ``groupby(key)`` hash shuffle of the
      partials with a vectorized per-group combine.  Only partial rows
      move (one per (key, bucket) per upstream block), and no single task
      ever holds the whole result — the scale path when (key × bucket)
      cardinality outgrows one block (e.g. per-minute tiers over many
      sources).  The cascade pipeline's per-part path
      (pipelines/cascade.py) remains the zero-extra-shuffle variant when
      data is already hash-partitioned on disk.
    """

    from aisdb_ray.stages._dist import funnel_combine

    def combine_b(b: pa.Table) -> pa.Table:
        # width=1 keeps existing buckets: a pure (key, bucket) combine
        return repartial_batch(b, 1, key_col)

    return funnel_combine(
        partials, combine_b, key_col=key_col, hash_combine=hash_combine,
        finalize_fn=lambda b: _finalize(b, key_col),
    )


def _auto_hash_combine(hash_combine, width_s: int) -> bool:
    """Default combine policy: sub-hour buckets imply a high-cardinality
    (key × bucket) result, so they take the hash path; hour-and-coarser
    tiers are small by construction and keep the cheaper single funnel.
    An explicit True/False always wins."""
    if hash_combine is None:
        return width_s < 3600
    return hash_combine


def rollup(
    ds,
    width_s: int,
    value: str = N_TOK,
    time_col: str = TIME,
    key_col: str = SOURCE,
    hash_combine: bool | None = None,
):
    """Full rollup of a point dataset: partial per batch -> combine -> finalize."""
    partials = ds.map_batches(
        lambda b: partial_rollup_batch(b, width_s, value, time_col, key_col),
        batch_format="pyarrow",
    )
    return _combine(
        partials, key_col, hash_combine=_auto_hash_combine(hash_combine, width_s)
    )


def hopping_rollup(
    ds,
    width_s: int,
    hop_s: int,
    value: str = N_TOK,
    time_col: str = TIME,
    key_col: str = SOURCE,
):
    """Hopping (sliding) window aggregate: min/max/sum/count/mean of the
    value channel per (key, window) for overlapping windows of length
    ``width_s`` advancing every ``hop_s`` (``width_s % hop_s == 0``) — the
    streaming-SQL HOP/sliding window the reference's fixed tiers can't
    express.

    Scale shape: points are first collapsed to hop-grid partials inside
    each ``map_batches`` task (the algebraic pre-aggregation of
    :func:`partial_rollup_batch`), and only those partial rows are
    REPLICATED ``width_s // hop_s`` times — one copy per overlapping
    window, a vectorized concat of shifted tables.  The shuffle therefore
    moves O(key × hop-bucket × overlap) partial rows, never raw points;
    the combine is the same hash-partitioned merge as any tier.  Window
    start is aligned to the hop grid; windows with zero points don't
    exist (no dense window grid is materialized).
    """
    if width_s % hop_s != 0:
        raise ValueError("width_s must be a multiple of hop_s")
    k = width_s // hop_s

    def replicate(b: pa.Table) -> pa.Table:
        part = partial_rollup_batch(b, hop_s, value, time_col, key_col)
        shifted = []
        for i in range(k):
            off = pa.scalar(i * hop_s, pa.int64())
            shifted.append(
                part.set_column(
                    part.schema.get_field_index(BUCKET),
                    BUCKET,
                    pc.subtract(part[BUCKET], off),
                )
            )
        return pa.concat_tables(shifted)

    partials = ds.map_batches(replicate, batch_format="pyarrow")
    tier = _combine(partials, key_col, hash_combine=True)

    def add_end(b: pa.Table) -> pa.Table:
        return b.append_column(
            "wend", pc.add(b[BUCKET], pa.scalar(width_s, pa.int64()))
        )

    return tier.map_batches(add_end, batch_format="pyarrow")


def rollup_grouped(
    ds,
    width_s: int,
    value: str = N_TOK,
    time_col: str = TIME,
    key_col: str = SOURCE,
):
    """Shuffle-free rollup for datasets whose blocks hold WHOLE key groups
    (the output of ``groupby(key).map_groups``): per-block partials are then
    already globally unique per (key, bucket), so no combine is needed —
    the entire rollup is one vectorized map over pinned blocks."""
    return ds.map_batches(
        lambda b: _finalize(
            partial_rollup_batch(b, width_s, value, time_col, key_col), key_col
        ),
        batch_format="pyarrow",
        batch_size=None,
    )


def rollup_from_rollup_grouped(ds, width_s: int, key_col: str = SOURCE):
    """Tier-from-tier reaggregation under the same whole-group-blocks
    precondition (map over a grouped tier keeps blocks grouped)."""
    return ds.map_batches(
        lambda b: _finalize(repartial_batch(b, width_s, key_col), key_col),
        batch_format="pyarrow",
        batch_size=None,
    )


def rollup_from_rollup(
    ds, width_s: int, key_col: str = SOURCE, hash_combine: bool | None = None
):
    """Continuous-aggregate reaggregation: next tier from the previous tier."""
    partials = ds.map_batches(
        lambda b: repartial_batch(b, width_s, key_col), batch_format="pyarrow"
    )
    return _combine(
        partials, key_col, hash_combine=_auto_hash_combine(hash_combine, width_s)
    )


def calendar_bucket(time_col, unit: str = "month"):
    """Calendar-aware bucket start (epoch seconds): month/quarter/year/week
    boundaries are NOT fixed-width, so they floor via temporal kernels
    instead of integer division.  Arrow's floor_temporal and DuckDB's
    date_trunc agree bucket-for-bucket (both proleptic-Gregorian UTC)."""
    ts = pc.cast(pc.cast(time_col, pa.int64()), pa.timestamp("s"))
    return pc.cast(pc.floor_temporal(ts, unit=unit), pa.int64())


def rollup_calendar(
    ds,
    unit: str = "month",
    value: str = N_TOK,
    time_col: str = TIME,
    key_col: str = SOURCE,
    hash_combine: bool = False,
):
    """Calendar-period rollup (month/quarter/year): precompute the bucket
    per batch, then the standard algebraic partial/combine with width 1
    (the bucket column IS the grid)."""

    def pre(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                key_col: b[key_col],
                time_col: calendar_bucket(b[time_col], unit),
                value: b[value],
            }
        )

    partials = ds.map_batches(
        lambda b: partial_rollup_batch(pre(b), 1, value, time_col, key_col),
        batch_format="pyarrow",
    )
    return _combine(partials, key_col, hash_combine=hash_combine)


# ---------------------------------------------------------------------------
# OHLC rollup: open/close = value at the earliest/latest (time, seq) in the
# bucket — the reference's per-visit first/last channel stats
# (/root/reference/aisdb/network_graph.py:110-143 first/last point of a zone
# visit) as a candle tier.  arg-min/arg-max is expressed as a plain min/max
# over a PACKED int64, ``((rel * 2^14 + seq) * 2^20) + value`` with
# ``rel = time - bucket``, so the aggregate stays fully algebraic and
# cascade-compatible (tier-from-tier rebases ``rel`` by adding a constant).
# (time, seq) is unique per source after keep-first dedup, so the key part
# never ties and the value bits never influence which row wins.
# ---------------------------------------------------------------------------

_SEQ_MOD = 1 << 14   # seq must be in [0, 2^14)
_VAL_MOD = 1 << 20   # value channel must be in [0, 2^20)
PK_OPEN = "_pk_open"
PK_CLOSE = "_pk_close"


def _check_pack_bounds(name: str, arr, mod: int) -> None:
    mm = pc.min_max(arr)
    lo, hi = mm["min"], mm["max"]
    if lo.as_py() is not None and (lo.as_py() < 0 or hi.as_py() >= mod):
        raise ValueError(
            f"{name} out of packable range [0, {mod}): saw [{lo}, {hi}]"
        )


def partial_ohlc_batch(
    batch: pa.Table,
    width_s: int,
    value: str = N_TOK,
    time_col: str = TIME,
    key_col: str = SOURCE,
    seq_col: str = "seq",
) -> pa.Table:
    """Vectorized per-batch OHLC partial: one row per (key, bucket)."""
    t = pc.cast(batch[time_col], pa.int64())
    bucket = _bucket(t, width_s)
    rel = pc.subtract(t, bucket)
    sq = pc.cast(batch[seq_col], pa.int64())
    v = pc.cast(batch[value], pa.int64())
    if batch.num_rows:
        _check_pack_bounds(seq_col, sq, _SEQ_MOD)
        _check_pack_bounds(value, v, _VAL_MOD)
    key = pc.add(pc.multiply(rel, pa.scalar(_SEQ_MOD, pa.int64())), sq)
    packed = pc.add(pc.multiply(key, pa.scalar(_VAL_MOD, pa.int64())), v)
    t2 = pa.table(
        {key_col: batch[key_col], BUCKET: bucket, "pk": packed, value: v}
    )
    g = t2.group_by([key_col, BUCKET], use_threads=False).aggregate(
        [
            ("pk", "min"),
            ("pk", "max"),
            (value, "min"),
            (value, "max"),
            (value, "sum"),
            (value, "count", pc.CountOptions(mode="all")),
        ]
    )
    return g.rename_columns(
        [key_col, BUCKET, PK_OPEN, PK_CLOSE, MIN_V, MAX_V, SUM_V, CNT_V]
    )


def reohlc_batch(batch: pa.Table, width_s: int, key_col: str = SOURCE) -> pa.Table:
    """Partial combine of an OHLC tier into wider buckets: rebase the packed
    keys onto the wider bucket start (a constant shift of the rel field),
    then plain min/max/sum — exact tier-from-tier reaggregation."""
    old = pc.cast(batch[BUCKET], pa.int64())
    nb = _bucket(old, width_s)
    delta = pc.multiply(
        pc.subtract(old, nb), pa.scalar(_SEQ_MOD * _VAL_MOD, pa.int64())
    )
    t = pa.table(
        {
            key_col: batch[key_col],
            BUCKET: nb,
            PK_OPEN: pc.add(pc.cast(batch[PK_OPEN], pa.int64()), delta),
            PK_CLOSE: pc.add(pc.cast(batch[PK_CLOSE], pa.int64()), delta),
            MIN_V: batch[MIN_V],
            MAX_V: batch[MAX_V],
            SUM_V: batch[SUM_V],
            CNT_V: batch[CNT_V],
        }
    )
    g = t.group_by([key_col, BUCKET], use_threads=False).aggregate(
        [
            (PK_OPEN, "min"),
            (PK_CLOSE, "max"),
            (MIN_V, "min"),
            (MAX_V, "max"),
            (SUM_V, "sum"),
            (CNT_V, "sum"),
        ]
    )
    return g.rename_columns(
        [key_col, BUCKET, PK_OPEN, PK_CLOSE, MIN_V, MAX_V, SUM_V, CNT_V]
    )


def _finalize_ohlc(batch: pa.Table, key_col: str = SOURCE) -> pa.Table:
    mask = pa.scalar(_VAL_MOD - 1, pa.int64())
    return pa.table(
        {
            key_col: batch[key_col],
            BUCKET: pc.cast(batch[BUCKET], pa.int64()),
            OPEN_V: pc.bit_wise_and(pc.cast(batch[PK_OPEN], pa.int64()), mask),
            CLOSE_V: pc.bit_wise_and(pc.cast(batch[PK_CLOSE], pa.int64()), mask),
            MIN_V: pc.cast(batch[MIN_V], pa.int64()),
            MAX_V: pc.cast(batch[MAX_V], pa.int64()),
            SUM_V: pc.cast(batch[SUM_V], pa.int64()),
            CNT_V: pc.cast(batch[CNT_V], pa.int64()),
        }
    )


def _combine_ohlc(partials, key_col: str = SOURCE, hash_combine: bool = False):
    """Same funnel / hash-combine merge policy as :func:`_combine`, over the
    OHLC partial schema (see _combine's docstring for the policy)."""

    from aisdb_ray.stages._dist import funnel_combine

    def combine_b(b: pa.Table) -> pa.Table:
        return reohlc_batch(b, 1, key_col)

    return funnel_combine(
        partials, combine_b, key_col=key_col, hash_combine=hash_combine,
        finalize_fn=lambda b: _finalize_ohlc(b, key_col),
    )


def ohlc(
    ds,
    width_s: int,
    value: str = N_TOK,
    time_col: str = TIME,
    key_col: str = SOURCE,
    seq_col: str = "seq",
    hash_combine: bool | None = None,
):
    """Full OHLC rollup of a point dataset."""
    partials = ds.map_batches(
        lambda b: partial_ohlc_batch(b, width_s, value, time_col, key_col, seq_col),
        batch_format="pyarrow",
    )
    return _combine_ohlc(
        partials, key_col, hash_combine=_auto_hash_combine(hash_combine, width_s)
    )


def ohlc_from_ohlc(
    ds, width_s: int, key_col: str = SOURCE, hash_combine: bool | None = None
):
    """Next OHLC tier from the previous tier (needs the packed columns, i.e.
    the PRE-finalize partial schema — see :func:`ohlc_partial_tier`)."""
    partials = ds.map_batches(
        lambda b: reohlc_batch(b, width_s, key_col), batch_format="pyarrow"
    )
    return _combine_ohlc(
        partials, key_col, hash_combine=_auto_hash_combine(hash_combine, width_s)
    )


def ohlc_partial_tier(
    ds,
    width_s: int,
    value: str = N_TOK,
    time_col: str = TIME,
    key_col: str = SOURCE,
    seq_col: str = "seq",
    hash_combine: bool = False,
):
    """OHLC tier in PARTIAL (packed) form — what a cascade materializes so
    the next tier can reaggregate it exactly; finalize with
    ``map_batches(_finalize_ohlc)`` when serving."""

    from aisdb_ray.stages._dist import funnel_combine

    def combine_b(b: pa.Table) -> pa.Table:
        return reohlc_batch(b, 1, key_col)

    partials = ds.map_batches(
        lambda b: partial_ohlc_batch(b, width_s, value, time_col, key_col, seq_col),
        batch_format="pyarrow",
    )
    return funnel_combine(
        partials, combine_b, key_col=key_col, hash_combine=hash_combine,
    )


def first_per_bucket(
    ds,
    width_s: int,
    value: str = N_TOK,
    time_col: str = TIME,
    key_col: str = SOURCE,
    seq_col: str = "seq",
    hash_combine: bool = False,
):
    """Throttle / telemetry downsample: exactly ONE row per (key, bucket) —
    the earliest (time, seq) point, with its time, seq and value
    reconstructed EXACTLY from the packed arg-min (the OHLC packing carries
    all three fields losslessly).  Algebraic min partials: O7's
    decimation-as-sampling at rollup cost, no per-group shuffle."""
    from aisdb_ray.stages._dist import funnel_combine

    def partial(b: pa.Table) -> pa.Table:
        # lean variant of partial_ohlc_batch: only the packed arg-min is
        # needed, so aggregate once instead of six times per batch
        t = pc.cast(b[time_col], pa.int64())
        bucket = _bucket(t, width_s)
        rel = pc.subtract(t, bucket)
        sq = pc.cast(b[seq_col], pa.int64())
        v = pc.cast(b[value], pa.int64())
        if b.num_rows:
            _check_pack_bounds(seq_col, sq, _SEQ_MOD)
            _check_pack_bounds(value, v, _VAL_MOD)
        key = pc.add(pc.multiply(rel, pa.scalar(_SEQ_MOD, pa.int64())), sq)
        packed = pc.add(pc.multiply(key, pa.scalar(_VAL_MOD, pa.int64())), v)
        g = (
            pa.table({key_col: b[key_col], BUCKET: bucket, "pk": packed})
            .group_by([key_col, BUCKET], use_threads=False)
            .aggregate([("pk", "min")])
        )
        return g.rename_columns([key_col, BUCKET, PK_OPEN])

    def merge(b: pa.Table) -> pa.Table:
        g = b.group_by([key_col, BUCKET], use_threads=False).aggregate(
            [(PK_OPEN, "min")]
        )
        return g.rename_columns([key_col, BUCKET, PK_OPEN])

    def finalize(b: pa.Table) -> pa.Table:
        pk = pc.cast(b[PK_OPEN], pa.int64())
        val = pc.bit_wise_and(pk, pa.scalar(_VAL_MOD - 1, pa.int64()))
        key = pc.divide(pk, pa.scalar(_VAL_MOD, pa.int64()))
        sq = pc.subtract(
            key, pc.multiply(
                pc.divide(key, pa.scalar(_SEQ_MOD, pa.int64())),
                pa.scalar(_SEQ_MOD, pa.int64()),
            )
        )
        rel = pc.divide(key, pa.scalar(_SEQ_MOD, pa.int64()))
        bucket = pc.cast(b[BUCKET], pa.int64())
        return pa.table(
            {
                key_col: b[key_col],
                BUCKET: bucket,
                time_col: pc.add(bucket, rel),
                seq_col: sq,
                value: val,
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return funnel_combine(partials, merge, key_col, hash_combine, finalize)


# ---------------------------------------------------------------------------
# Real-time continuous aggregate: materialized tier + raw tail, unioned
# ---------------------------------------------------------------------------

def realtime_rollup(
    materialized,
    raw_points,
    width_s: int,
    watermark: int,
    value: str = N_TOK,
    time_col: str = TIME,
    key_col: str = SOURCE,
    hash_combine: bool = False,
):
    """TimescaleDB-style real-time continuous aggregate (the reference's
    deployment target configures continuous aggregates over the hypertable:
    /root/reference/aisdb/aisdb_sql/timescale_createtable_dynamic.sql): serve
    the MATERIALIZED tier for buckets strictly below the materialization
    watermark, aggregate the raw tail (``time >= watermark``) on the fly,
    and union the two.  The watermark is floored to the bucket grid so no
    bucket is ever split between the frozen and fresh sides; with an
    aligned watermark the union is exactly the full-data rollup.

    Both sides stream: the tier scan is a bucket-pruned filter (at real
    scale, partition pruning on the tier's bucket ranges), and the fresh
    side moves only algebraic partials through its combine."""
    wm = (int(watermark) // width_s) * width_s
    wm_s = pa.scalar(wm, pa.int64())
    cols = [key_col, BUCKET, MIN_V, MAX_V, SUM_V, CNT_V, MEAN_V]

    def frozen_b(b: pa.Table) -> pa.Table:
        return b.filter(pc.less(pc.cast(b[BUCKET], pa.int64()), wm_s)).select(cols)

    def tail_b(b: pa.Table) -> pa.Table:
        return b.filter(pc.greater_equal(pc.cast(b[time_col], pa.int64()), wm_s))

    frozen = materialized.map_batches(frozen_b, batch_format="pyarrow")
    fresh = rollup(
        raw_points.map_batches(tail_b, batch_format="pyarrow"),
        width_s, value, time_col, key_col, hash_combine,
    )
    return frozen.union(fresh)


# --------------------------------------------------------------------------
# Sparse value-histogram tiers: exact quantiles served from the cascade
# --------------------------------------------------------------------------

HVAL = "v"
HCNT = "c"


def _hist_merge(b: pa.Table, key_col: str = SOURCE) -> pa.Table:
    g = b.group_by([key_col, BUCKET, HVAL], use_threads=False).aggregate(
        [(HCNT, "sum")]
    )
    return g.rename_columns([key_col, BUCKET, HVAL, HCNT])


def hist_tier(ds, width_s: int, value: str = N_TOK, time_col: str = TIME,
              key_col: str = SOURCE, weight: str | None = None):
    """Sparse value-histogram tier: one (key, bucket, value, count) row per
    distinct value per window — the mergeable aggregate that makes EXACT
    quantiles (and modes, and value masks) answerable from the retention
    cascade instead of raw points, for bounded-domain integer channels
    like sequence length (TimescaleDB's percentile-agg continuous
    aggregate, but exact).  Tier width = (key × bucket × distinct values
    in bucket), independent of row count — the whole point at 10^12 rows.
    Same algebraic-partial + key-hash-combine shape as :func:`rollup`."""
    from aisdb_ray.stages._dist import funnel_combine

    def part(b: pa.Table) -> pa.Table:
        cols = {
            key_col: b[key_col],
            BUCKET: _bucket(b[time_col], width_s),
            HVAL: pc.cast(b[value], pa.int64()),
        }
        if weight is not None:
            # weighted histogram: c sums the weight channel instead of
            # counting rows — quantiles off it become WEIGHTED quantiles
            # (e.g. dt-weighted -> time-weighted median)
            cols["_w"] = pc.cast(b[weight], pa.int64())
        t = pa.table(cols)
        if weight is None:
            g = t.group_by([key_col, BUCKET, HVAL],
                           use_threads=False).aggregate([([], "count_all")])
        else:
            g = t.group_by([key_col, BUCKET, HVAL],
                           use_threads=False).aggregate([("_w", "sum")])
        return g.rename_columns([key_col, BUCKET, HVAL, HCNT])

    partials = ds.map_batches(part, batch_format="pyarrow")
    return funnel_combine(partials, lambda b: _hist_merge(b, key_col),
                          key_col=key_col, hash_combine=True)


def hist_retier(tier, width_s: int, key_col: str = SOURCE):
    """Reaggregate a histogram tier into wider buckets — exact, because
    count-per-value is algebraic (1d-from-1h == 1d-from-raw bit-for-bit)."""
    from aisdb_ray.stages._dist import funnel_combine

    def rebucket(b: pa.Table) -> pa.Table:
        return pa.table({
            key_col: b[key_col],
            BUCKET: _bucket(b[BUCKET], width_s),
            HVAL: b[HVAL],
            HCNT: b[HCNT],
        })

    return funnel_combine(tier.map_batches(rebucket, batch_format="pyarrow"),
                          lambda b: _hist_merge(b, key_col),
                          key_col=key_col, hash_combine=True)


def tier_quantiles(tier, ps=(50, 95), key_col: str = SOURCE):
    """Exact per-(key, bucket) discrete quantiles off a histogram tier —
    the (p·tot + 99) // 100 rank rule of the raw-path quantile operators,
    so tier-served answers equal raw-scan answers bit-for-bit.  One hash
    co-shuffle on the key; per-partition fully vectorized (global-cumsum
    searchsorted per group, no Python per group)."""
    import numpy as np

    from aisdb_ray.stages._dist import co_shuffle

    def per_part(part: pa.Table) -> pa.Table:
        idx = pc.sort_indices(part, sort_keys=[
            (key_col, "ascending"), (BUCKET, "ascending"),
            (HVAL, "ascending"),
        ])
        s = part.take(idx)
        key = s[key_col].to_numpy(zero_copy_only=False)
        bkt = s[BUCKET].to_numpy(zero_copy_only=False).astype(np.int64)
        v = s[HVAL].to_numpy(zero_copy_only=False).astype(np.int64)
        c = s[HCNT].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(v)
        cols = {key_col: pa.array([], part.schema.field(key_col).type),
                BUCKET: pa.array([], pa.int64())}
        if n == 0:
            for p in ps:
                cols[f"p{p}"] = pa.array([], pa.int64())
            return pa.table(cols)
        new = np.r_[True, (key[1:] != key[:-1]) | (bkt[1:] != bkt[:-1])]
        starts = np.flatnonzero(new)
        ends = np.r_[starts[1:], n]
        cum = np.cumsum(c)
        base = np.where(starts > 0, cum[starts - 1], 0)
        tot = cum[ends - 1] - base
        # a zero-total group (possible with weighted tiers where every row
        # weighs 0) has no distribution to sample — rank 0 would land
        # searchsorted in the PREVIOUS group's range and report a foreign
        # value; drop such groups.  rank clamps to >= 1 for the same
        # reason (p=0 must return the group's minimum, not stray left).
        live = tot > 0
        if not live.any():
            cols = {key_col: pa.array([], part.schema.field(key_col).type),
                    BUCKET: pa.array([], pa.int64())}
            for p in ps:
                cols[f"p{p}"] = pa.array([], pa.int64())
            return pa.table(cols)
        starts, base, tot = starts[live], base[live], tot[live]
        cols = {key_col: pa.array(key[starts]),
                BUCKET: pa.array(bkt[starts])}
        for p in ps:
            rank = np.maximum((p * tot + 99) // 100, 1)
            pos = np.searchsorted(cum, base + rank, side="left")
            cols[f"p{p}"] = pa.array(v[pos])
        return pa.table(cols)

    return co_shuffle(tier, [key_col], per_part)


def tier_mode(tier, key_col: str = SOURCE):
    """Exact per-(key, bucket) MODE off a histogram tier (ties → smallest
    value, the modeagg.py rule) — a second tier-served analytic on the
    same sparse count-per-value aggregate.  Vectorized per partition:
    sort by (key, bucket, count desc, v asc) and take group heads."""
    import numpy as np

    from aisdb_ray.stages._dist import co_shuffle

    def per_part(part: pa.Table) -> pa.Table:
        idx = pc.sort_indices(part, sort_keys=[
            (key_col, "ascending"), (BUCKET, "ascending"),
            (HCNT, "descending"), (HVAL, "ascending"),
        ])
        s = part.take(idx)
        key = s[key_col].to_numpy(zero_copy_only=False)
        bkt = s[BUCKET].to_numpy(zero_copy_only=False)
        if len(key) == 0:
            return pa.table({key_col: pa.array([], part.schema.field(key_col).type),
                             BUCKET: pa.array([], pa.int64()),
                             "mode": pa.array([], pa.int64()),
                             "mode_n": pa.array([], pa.int64())})
        head = np.r_[True, (key[1:] != key[:-1]) | (bkt[1:] != bkt[:-1])]
        h = s.filter(pa.array(head))
        return pa.table({key_col: h[key_col], BUCKET: h[BUCKET],
                         "mode": h[HVAL], "mode_n": h[HCNT]})

    return co_shuffle(tier, [key_col], per_part)
