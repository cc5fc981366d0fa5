"""Deterministic sampling operators for training-data pipelines.

Random sampling is useless at 100 TB if it isn't reproducible and
resumable: a rerun (or a resumed partition) must pick the SAME rows.  So
both operators key off a content hash, not an RNG — the same property the
reference leans on for dedup keys and checksum resume
(/root/reference/aisdb/database/decoder.py checksum ledger), applied to
selection:

- ``hash_sample``: keep rows where ``md5(key) mod 100 < pct`` — an
  embarrassingly-parallel filter (no shuffle, no state), stable under
  repartitioning, resume, and cluster-size changes.  The md5 prefix is
  what the SQL oracle can recompute exactly (``CAST('0x' || substr(md5(k),
  1, 8) AS BIGINT)``), making the sample hash-verifiable.
- ``stratified_sample``: exactly ``k`` rows per group (fewer if the group
  is smaller), chosen as the k smallest key-hashes — a uniform-without-
  replacement sample per stratum, implemented as hash-ranked top-k via
  stages/rank.py (per-batch partials, one small shuffle).

md5 is a per-row Python call (~1 µs) — same accepted trade as
textstats.md5_batch: there is no vectorized md5 kernel in Arrow/NumPy,
and the cost is linear map work that scales with cores.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_HCOL = "_sample_h64"


def _arrow_names(ds) -> list[str]:
    sch = ds.schema()
    return list(sch.names) if sch is not None else []


def md5_u32(col) -> np.ndarray:
    """int(md5(s)[:8], 16) per row — matches the DuckDB oracle expression
    CAST('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 8) AS BIGINT).
    Integer keys hash their decimal-string form (what DuckDB's VARCHAR
    cast produces); float keys are rejected — their string forms are not
    portable across engines."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_floating(col.type) or pa.types.is_boolean(col.type):
        # float str() forms are not portable across engines; bool str()
        # is 'True'/'False' in Python but 'true'/'false' under DuckDB's
        # VARCHAR cast — either would silently sample different rows
        raise TypeError("hash-sample keys must be string or integer")
    if col.null_count:
        # md5(NULL) IS NULL in the oracle: a null key must never hash as
        # the string 'None' (which would make ALL null-key rows pass or
        # fail a sampling predicate together) — callers filter nulls first
        raise ValueError(
            "md5_u32: null keys — drop or fill them before hashing "
            "(SQL md5(NULL) is NULL, not md5('None'))"
        )
    return np.array(
        [
            int.from_bytes(hashlib.md5(str(s).encode()).digest()[:4], "big")
            for s in col.to_pylist()
        ],
        dtype=np.int64,
    )


def hash_sample(ds, key: str, pct: int):
    """Keep ~pct% of rows, deterministically, by key hash. Pure filter."""
    if not 0 <= pct <= 100:
        raise ValueError("pct must be in [0, 100]")

    def keep(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b[key]))  # SQL: md5(NULL) IS NULL -> out
        h = md5_u32(b[key]) % 100
        return b.filter(pa.array(h < pct))

    return ds.map_batches(keep, batch_format="pyarrow")


def stratified_sample(ds, group: str, key: str, k: int):
    """Exactly min(k, |group|) rows per group: the k smallest md5 hashes
    of ``key`` (ties broken by the key itself — md5 collisions in 32 bits
    are possible, key equality is not)."""
    from aisdb_ray.stages import rank

    if _HCOL in set(_arrow_names(ds)):
        # same guard weighted_sample applies to its appended columns: a
        # duplicate field name fails deep inside the shuffle otherwise
        raise ValueError(
            f"stratified_sample: input already carries {_HCOL!r} "
            "(the hash evidence column this stage appends)"
        )

    def add_h(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b[key]))  # null keys never sample in
        return b.append_column(_HCOL, pa.array(md5_u32(b[key])))

    with_h = ds.map_batches(add_h, batch_format="pyarrow")
    picked = rank.topk_per_group(
        with_h, group, [_HCOL, key], k, descending=[False, False]
    )
    return picked.map_batches(
        lambda b: b.drop_columns([_HCOL]), batch_format="pyarrow"
    )


def weighted_sample(ds, key: str, weight: str, k: int):
    """Sequential Poisson sampling (Ohlsson 1998): k rows chosen with
    inclusion probability ~ ``weight``, deterministically.  Rank
    ``r = u / w`` with ``u = md5_u32(key)`` ascending, keep the k
    smallest.  ``u / w`` is ONE IEEE division of exactly-representable
    integers, so numpy and the SQL oracle produce bit-identical doubles
    — unlike the Efraimidis-Spirakis ``u^(1/w)`` key whose pow/log
    last-ulp could reorder rows at the k-th boundary.  Rows with
    ``weight <= 0`` are excluded.  Per-batch top-k partials, one small
    shuffle (same path as stratified_sample) — no global sort."""
    from aisdb_ray.stages import rank

    _RCOL = "w_rank"
    _GCOL = "_scope"
    names = set(_arrow_names(ds))
    if _RCOL in names or _GCOL in names:
        raise ValueError(
            f"weighted_sample: input already carries {_RCOL!r}/{_GCOL!r} "
            "(the rank evidence / scope columns this stage appends)"
        )

    def add_rank(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b[key]))  # null keys never sample in
        w = b[weight].to_numpy(zero_copy_only=False).astype(np.float64)
        b = b.filter(pa.array(w > 0))
        if b.num_rows == 0:
            b = b.append_column(_RCOL, pa.array([], pa.float64()))
        else:
            u = md5_u32(b[key]).astype(np.float64)
            w = b[weight].to_numpy(zero_copy_only=False).astype(np.float64)
            b = b.append_column(_RCOL, pa.array(u / w))
        return b.append_column(
            _GCOL, pa.array(np.zeros(b.num_rows, dtype=np.int8))
        )

    ranked = ds.map_batches(add_rank, batch_format="pyarrow")
    picked = rank.topk_per_group(
        ranked, _GCOL, [_RCOL, key], k, descending=[False, False]
    )
    return picked.map_batches(
        lambda b: b.drop_columns([_GCOL]), batch_format="pyarrow"
    )
