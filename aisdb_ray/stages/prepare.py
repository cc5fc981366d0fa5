"""Ingest preparation: epoch derivation + validity filtering (stateless maps).

The reference derives epochs from raw payload headers and survives malformed
input by dropping bad lines while keeping good ones
(/root/reference/aisdb_lib/src/decode.rs:60-114, 446-485; validity window
checks :116-123).  Here the epoch is encoded in ``doc_id`` as
``{source}:{epoch:010d}:{seq:04d}``; rows that don't parse, or whose payload
is inconsistent (``n_tok <= 0`` or ``len(tokens) != n_tok``), are filtered —
vectorized pyarrow.compute, zero Python-per-row work.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from aisdb_ray.schema import DOC_ID, N_TOK, SEQ, TIME, TOKENS

_DIGITS = r"^[0-9]{1,18}$"


def derive_epoch(batch: pa.Table) -> pa.Table:
    """Append int64 ``time`` + int32 ``seq`` parsed from ``doc_id``.

    Unparsable rows get nulls (dropped later by :func:`validate`), mirroring
    the decoder's skip-don't-crash contract (decode.rs:446-485).
    """
    doc = batch[DOC_ID]
    if isinstance(doc, pa.ChunkedArray):
        doc = doc.combine_chunks()
    ncolon = pc.count_substring(doc, ":")
    safe = pc.if_else(pc.greater_equal(ncolon, 2), doc, pa.scalar("::"))
    parts = pc.split_pattern(safe, ":", max_splits=2, reverse=True)
    ep = pc.list_element(parts, 1)
    sq = pc.list_element(parts, 2)
    null_s = pa.scalar(None, pa.string())
    ep = pc.if_else(pc.match_substring_regex(ep, _DIGITS), ep, null_s)
    sq = pc.if_else(pc.match_substring_regex(sq, _DIGITS), sq, null_s)
    out = batch.append_column(TIME, pc.cast(ep, pa.int64()))
    # parse seq via int64 + range gate: _DIGITS admits up to 18 digits, so
    # a direct int32 cast would raise ArrowInvalid on an out-of-range seq
    # and kill the whole batch — the one malformed row must null instead
    # (the skip-don't-crash contract above)
    sq64 = pc.cast(sq, pa.int64())
    sq64 = pc.if_else(
        pc.and_(pc.greater_equal(sq64, -(1 << 31)),
                pc.less_equal(sq64, (1 << 31) - 1)),
        sq64, pa.scalar(None, pa.int64()),
    )
    return out.append_column(SEQ, pc.cast(sq64, pa.int32()))


def valid_mask(batch: pa.Table) -> pa.ChunkedArray:
    """True where the row is structurally valid (parsable + consistent)."""
    ntok_ok = pc.greater(batch[N_TOK], 0)
    len_ok = pc.equal(
        pc.list_value_length(batch[TOKENS]), pc.cast(batch[N_TOK], pa.int32())
    )
    time_ok = pc.and_(pc.is_valid(batch[TIME]), pc.is_valid(batch[SEQ]))
    m = pc.and_(pc.and_(ntok_ok, len_ok), time_ok)
    return pc.fill_null(m, False)


def validate(batch: pa.Table) -> pa.Table:
    """Keep only valid rows (decode-survival semantics)."""
    return batch.filter(valid_mask(batch))


def prepare(batch: pa.Table) -> pa.Table:
    """derive_epoch + validate, fused into one map_batches body."""
    return validate(derive_epoch(batch))


def append_datetime(batch: pa.Table, time_col: str = TIME) -> pa.Table:
    """M10 (datetime column appender): derive calendar columns from the
    epoch — the reference appends a datetime per row for export/plotting
    (/root/reference/aisdb/gis.py:38-77 dt_2_epoch/epoch_2_dt pair).
    Vectorized casts; year/month/day/hour as int64."""
    ts = pc.cast(pc.cast(batch[time_col], pa.int64()), pa.timestamp("s"))
    out = batch.append_column("dt", ts)
    for part, fn in (("year", pc.year), ("month", pc.month),
                     ("day", pc.day), ("hour", pc.hour)):
        out = out.append_column(part, pc.cast(fn(ts), pa.int64()))
    return out


def invalid_counts(batch: pa.Table) -> pa.Table:
    """Per-batch (valid, invalid) counters — feed a tiny Sum aggregate for
    the decoder-style instrumentation (decode.rs:228-257)."""
    b = derive_epoch(batch)
    m = valid_mask(b)
    n_valid = pc.sum(pc.cast(m, pa.int64())).as_py() or 0
    return pa.table(
        {"valid": pa.array([n_valid], pa.int64()),
         "invalid": pa.array([b.num_rows - n_valid], pa.int64())}
    )
