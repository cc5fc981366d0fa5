"""Sequence packing: greedy next-fit binning of documents into fixed
token-budget training bins.

An LLM training pipeline packs variable-length documents into fixed-size
context windows to minimize padding.  This operator assigns every document
(in per-source (time, seq) order — the reference's per-track ordering
contract, /root/reference/aisdb/track_gen.py TrackGen sort) to a bin:
a document joins the current bin while the bin's token total stays within
``cap``, else it opens a new bin; a document larger than ``cap`` gets a
bin of its own.  Bins restart at ``chunk_s`` time boundaries so that
(a) packing is resumable per time chunk — the same contract as the salted
time-chunk layout in stages/salted.py — and (b) a bounded number of rows
ever participates in one sequential packing decision chain.

Shape: one co-shuffle by hash(source) (the stages/window.py pattern), then
one vectorized task per partition.  Within a group, bin boundaries are
found by ``np.searchsorted`` on the prefix-sum of token counts — the loop
runs once per BIN (output windows), not once per row.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from aisdb_ray.schema import N_TOK, SOURCE, TIME

CHUNK = "chunk"
BIN = "bin"


def _pack_group(prefix: np.ndarray, cap: int) -> np.ndarray:
    """Next-fit bin ids for one group given the token prefix sums
    (prefix[0] = 0, prefix[i] = sum of the first i docs)."""
    n = len(prefix) - 1
    bins = np.empty(n, np.int64)
    i = b = 0
    while i < n:
        j = int(np.searchsorted(prefix, prefix[i] + cap, side="right")) - 1
        if j <= i:
            j = i + 1  # oversized document: its own bin
        bins[i:j] = b
        b += 1
        i = j
    return bins


def pack_block(
    tbl: pa.Table,
    cap: int,
    key_col: str = SOURCE,
    time_col: str = TIME,
    seq_col: str = "seq",
    value_col: str = N_TOK,
    chunk_s: int = 86400,
) -> pa.Table:
    """All groups in one table -> same rows + (chunk, bin) assignment."""
    n = len(tbl)
    if n == 0:
        out = tbl.append_column(CHUNK, pa.array([], pa.int64()))
        return out.append_column(BIN, pa.array([], pa.int64()))
    import pyarrow.compute as pc

    # fill_null BEFORE the int64 casts: a null would convert the whole
    # column to float64 and the NaN->int64 cast is undefined (INT64_MIN on
    # x86, 0 on aarch64 — the transits.py convention).  Null time/seq sort
    # to a deterministic -1 sentinel group; null n_tok packs as 0.
    t = pc.fill_null(pc.cast(tbl[time_col], pa.int64()), -1).to_numpy(
        zero_copy_only=False).astype(np.int64)
    sq = pc.fill_null(pc.cast(tbl[seq_col], pa.int64()), -1).to_numpy(
        zero_copy_only=False).astype(np.int64)
    v = pc.fill_null(pc.cast(tbl[value_col], pa.int64()), 0).to_numpy(
        zero_copy_only=False).astype(np.int64)
    kcol = tbl[key_col]
    if isinstance(kcol, pa.ChunkedArray):
        kcol = kcol.combine_chunks()
    ginv = pc.fill_null(  # null keys -> own -1 group, not a NaN cast
        pc.dictionary_encode(kcol).indices, -1
    ).to_numpy(zero_copy_only=False).astype(np.int64)
    chunk = (t // chunk_s) * chunk_s

    order = np.lexsort((sq, t, chunk, ginv))
    tbl = tbl.take(pa.array(order))
    g, ch, vs = ginv[order], chunk[order], v[order]

    # group boundaries: change of (source, chunk)
    change = np.r_[True, (g[1:] != g[:-1]) | (ch[1:] != ch[:-1])]
    starts = np.flatnonzero(change)
    ends = np.r_[starts[1:], len(g)]
    prefix = np.concatenate(([0], np.cumsum(vs, dtype=np.int64)))
    bins = np.empty(len(g), np.int64)
    for s, e in zip(starts, ends):
        bins[s:e] = _pack_group(prefix[s : e + 1] - prefix[s], cap)

    out = tbl.append_column(CHUNK, pa.array(ch, pa.int64()))
    return out.append_column(BIN, pa.array(bins, pa.int64()))


def pack_documents(
    ds,
    cap: int,
    key_col: str = SOURCE,
    time_col: str = TIME,
    seq_col: str = "seq",
    value_col: str = N_TOK,
    chunk_s: int = 86400,
    num_parts: int | None = None,
):
    """Per-(source, time-chunk) greedy next-fit sequence packing over a
    Dataset: every row gains (chunk, bin); bins are numbered from 0 within
    their (source, chunk) group in (time, seq) order.

    Skew: bins reset at chunk boundaries, so (key, chunk) groups are fully
    independent — the co-shuffle hashes on BOTH, spreading a hot source's
    chunks across partitions instead of pinning the whole source to one
    task (the salted-path contract, stages/salted.py)."""
    import pyarrow.compute as pc

    from aisdb_ray.stages._dist import co_shuffle

    def pre(b: pa.Table) -> pa.Table:
        # numpy floor division, NOT pc.divide: Arrow truncates toward
        # zero, so a negative epoch would route to a DIFFERENT partition
        # than the floor chunk pack_block assigns — splitting one logical
        # group and emitting duplicate, overfillable bin ids
        # fill_null(-1) BEFORE to_numpy: one null would float64 the whole
        # column, CHUNK would come out double (NaN for the null row) and
        # the same logical (source, chunk) group would hash to a different
        # partition than clean batches — exactly the split this pre-pass
        # exists to prevent.  Must match pack_block's fill rule.
        t = pc.fill_null(pc.cast(b[time_col], pa.int64()), -1).to_numpy(
            zero_copy_only=False).astype(np.int64)
        ck = pa.array((t // chunk_s) * chunk_s, pa.int64())
        if CHUNK in b.column_names:
            b = b.drop_columns([CHUNK])
        return b.append_column(CHUNK, ck)

    return co_shuffle(
        ds.map_batches(pre, batch_format="pyarrow"), [key_col, CHUNK],
        lambda part: pack_block(
            part.drop_columns([CHUNK]), cap, key_col, time_col, seq_col,
            value_col, chunk_s,
        ),
        num_parts,
    )


def pack_summary(packed, key_col: str = SOURCE, value_col: str = N_TOK):
    """Per-bin summary (docs, token total) of a packed dataset — the
    padding-efficiency audit table (all-integer, shuffle of partial rows
    only).  ``value_col`` must match what pack_documents packed on, or
    the audit would silently sum a column the bins were never capped
    against."""
    import pyarrow.compute as pc

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                key_col: b[key_col],
                CHUNK: b[CHUNK],
                BIN: b[BIN],
                "n_docs": pa.nulls(b.num_rows, pa.int64()),
                "sum_n_tok": pc.cast(b[value_col], pa.int64()),
            }
        )
        g = t.group_by([key_col, CHUNK, BIN], use_threads=False).aggregate(
            [("n_docs", "count", pc.CountOptions(mode="all")), ("sum_n_tok", "sum")]
        )
        return g.rename_columns([key_col, CHUNK, BIN, "n_docs", "sum_n_tok"])

    def merge(b: pa.Table) -> pa.Table:
        g = b.group_by([key_col, CHUNK, BIN], use_threads=False).aggregate(
            [("n_docs", "sum"), ("sum_n_tok", "sum")]
        )
        return g.rename_columns([key_col, CHUNK, BIN, "n_docs", "sum_n_tok"])

    from aisdb_ray.stages._dist import funnel_combine

    partials = packed.map_batches(partial, batch_format="pyarrow")
    # hash-combine, not the single-block funnel: the per-bin audit table
    # grows linearly with corpus size (~total_tokens / cap rows), so the
    # global merge must shuffle on the group key rather than collapse
    # into one task
    return funnel_combine(
        partials, merge, key_col=[key_col, CHUNK], hash_combine=True
    )
