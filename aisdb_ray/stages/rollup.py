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
    CNT_V,
    MAX_V,
    MEAN_V,
    MIN_V,
    N_TOK,
    SOURCE,
    SUM_V,
    TIME,
)


def _bucket(t: pa.ChunkedArray | pa.Array, width_s: int) -> pa.ChunkedArray:
    # integer divide truncates; epochs are positive, so this is a floor
    w = pa.scalar(width_s, pa.int64())
    return pc.multiply(pc.divide(pc.cast(t, pa.int64()), w), w)


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

    def combine_b(b: pa.Table) -> pa.Table:
        # width=1 keeps existing buckets: a pure (key, bucket) combine
        return repartial_batch(b, 1, key_col)

    local = partials.map_batches(combine_b, batch_format="pyarrow", batch_size=None)
    if hash_combine:
        merged = local.groupby(key_col).map_groups(
            combine_b, batch_format="pyarrow"
        )
    else:
        merged = local.repartition(1).map_batches(
            combine_b, batch_format="pyarrow", batch_size=None
        )
    return merged.map_batches(
        lambda b: _finalize(b, key_col), batch_format="pyarrow", batch_size=None
    )


def rollup(
    ds,
    width_s: int,
    value: str = N_TOK,
    time_col: str = TIME,
    key_col: str = SOURCE,
    hash_combine: bool = False,
):
    """Full rollup of a point dataset: partial per batch -> combine -> finalize."""
    partials = ds.map_batches(
        lambda b: partial_rollup_batch(b, width_s, value, time_col, key_col),
        batch_format="pyarrow",
    )
    return _combine(partials, key_col, hash_combine=hash_combine)


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
    ds, width_s: int, key_col: str = SOURCE, hash_combine: bool = False
):
    """Continuous-aggregate reaggregation: next tier from the previous tier."""
    partials = ds.map_batches(
        lambda b: repartial_batch(b, width_s, key_col), batch_format="pyarrow"
    )
    return _combine(partials, key_col, hash_combine=hash_combine)
