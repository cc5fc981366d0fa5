"""Distributed total ordering: TeraSort-style range exchange + exact
global ranks.

The reference materializes time-ordered output per query through its SQL
backend's ORDER BY (/root/reference/aisdb/database/dbqry.py — every
track query ends ``ORDER BY mmsi, time``); at 10^12 rows a single ORDER
BY is the canonical all-to-all sort.  This module expresses it the
classic shared-nothing way (O'Malley's TeraSort, public):

1. **Sample** a bounded subset of order keys (at most ``keys_per_batch``
   evenly spaced rows per batch — boundary choice affects only load
   balance, never the output, so no hash mirroring is needed).
2. **Cut** ``num_parts - 1`` range boundaries from the sorted sample.
3. **Range exchange**: one map-only disk-staged shuffle
   (:func:`aisdb_ray.stages._dist.co_shuffle_staged` with
   ``part_fn=searchsorted(boundaries)``), so partition ``p`` holds
   exactly the rows in its key range.
4. **Per-partition sort + global offset**: each partition sorts locally
   (Arrow multi-column sort) and adds the exact prefix-sum of earlier
   partitions' row counts (free from the exchange manifest) — every row
   gets its exact 1-based global ``rownum`` with no single-node sort and
   no second pass over the data.

Composite (int, string, ...) order keys are compared via an
order-preserving byte encoding: non-negative int64 → 19-digit
zero-padded decimal, strings raw, components joined with ``\\x00``
(strictly below any payload byte), padded S-dtype memcmp == tuple
order == DuckDB's default binary collation for ORDER BY.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from aisdb_ray.stages._dist import _default_parts, co_shuffle_staged

ROWNUM = "rownum"


def _encode_order_keys(b: pa.Table, order_cols: list[str]) -> np.ndarray:
    """Order-preserving byte encoding of the composite key, vectorized.

    Returns an S-dtype array (numpy memcmp compare).  int-typed columns
    must be non-negative (epochs, ids) — decimal zero-pad only preserves
    order above zero; raise rather than mis-sort.
    """
    parts = []
    for c in order_cols:
        col = b[c]
        if b.num_rows and col.null_count:
            raise ValueError(
                f"global_rank: order column {c!r} contains nulls — SQL "
                "NULL ordering is dialect-dependent; filter or fill first"
            )
        if pa.types.is_integer(col.type):
            lo = pc.min(col).as_py() if b.num_rows else 0
            if lo is not None and lo < 0:
                raise ValueError(
                    f"global_rank: order column {c!r} has negative values; "
                    "the decimal byte encoding requires non-negative ints"
                )
            parts.append(pc.utf8_lpad(pc.cast(col, pa.string()), 19, "0"))
        elif pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            # \x00 is the component separator: a payload NUL would make
            # the encoded memcmp order disagree with Arrow's tuple sort
            # ('a\x00' < 'a' encoded, > 'a' in tuples) — wrong global
            # ranks whenever a range boundary falls between the two
            if b.num_rows and pc.any(
                pc.match_substring(col, "\x00")).as_py():
                raise ValueError(
                    f"global_rank: order column {c!r} contains NUL bytes; "
                    "strip or re-encode them first")
            parts.append(pc.cast(col, pa.string()))
        else:
            raise TypeError(f"global_rank: unsupported order column type "
                            f"{col.type} for {c!r}")
    if len(parts) == 1:
        joined = parts[0]
    else:
        joined = pc.binary_join_element_wise(*parts, "\x00")
    # cast to binary first: UTF-8 bytes exactly (numpy would ASCII-encode
    # str).  object(bytes) -> S: numpy pads with \x00 (< every byte),
    # preserving strict order under memcmp.
    raw = pc.cast(joined, pa.binary()).to_numpy(zero_copy_only=False)
    return np.asarray(raw, dtype=bytes)


def _sample_boundaries(ds, order_cols: list[str], num_parts: int,
                       keys_per_batch: int) -> np.ndarray:
    """Bounded boundary sample: at most ``keys_per_batch`` evenly spaced
    keys PER BATCH, so the driver-side sample is O(blocks × keys_per_batch)
    regardless of row count (boundary quality degrades gracefully; output
    correctness never depends on it)."""

    def sample(b: pa.Table) -> pa.Table:
        keys = _encode_order_keys(b, order_cols)
        if len(keys) > keys_per_batch:
            idx = np.linspace(0, len(keys) - 1, keys_per_batch).astype(np.int64)
            keys = keys[idx]
        return pa.table({"k": pa.array(list(keys), pa.binary())})

    sampled = ds.map_batches(sample, batch_format="pyarrow").take_all()
    keys = np.sort(np.asarray([r["k"] for r in sampled], dtype=bytes))
    if len(keys) == 0 or num_parts <= 1:
        return np.asarray([], dtype=bytes)
    # num_parts-1 evenly spaced cut points from the sorted sample
    cuts = (np.arange(1, num_parts) * len(keys)) // num_parts
    return keys[np.minimum(cuts, len(keys) - 1)]


def _ntile(rn: np.ndarray, total: int, k: int) -> np.ndarray:
    """SQL NTILE(k) bucket for 1-based ranks ``rn`` out of ``total`` rows:
    the first ``total % k`` buckets hold ``total // k + 1`` rows each."""
    q, r = divmod(total, k)
    if q == 0:
        return rn.astype(np.int64)  # fewer rows than tiles: tile == rank
    cut = r * (q + 1)
    i = rn - 1
    return np.where(i < cut, i // (q + 1), r + (i - cut) // q).astype(np.int64) + 1


def global_rank(
    ds,
    order_cols: list[str],
    num_parts: int | None = None,
    keys_per_batch: int = 16,
    staging_dir: str | None = None,
    out_col: str = ROWNUM,
    ntile: int | None = None,
    ntile_col: str = "tile",
    resume: bool = False,
    fingerprint_extra: str | None = None,
):
    """Append each row's exact 1-based global rank under
    ``ORDER BY order_cols`` (``row_number() OVER (ORDER BY ...)`` for a
    key set that totally orders the rows; ties share a partition and are
    broken by local sort order, so pass a unique composite for
    deterministic output).  Output rows are range-partitioned AND sorted
    within each partition — a global total order across partitions.

    ``ntile=k`` also appends the SQL ``NTILE(k)`` bucket (first
    ``total % k`` tiles get the extra row) — free, because the exchange
    manifest already knows the exact global row count.

    ``resume=True`` (with an explicit ``staging_dir``) checkpoints the
    range exchange: a rerun skips the all-to-all AND the boundary
    sampling pass (the sampled range boundaries are persisted in the
    exchange manifest, so the resumed run never re-scans the input) and
    restarts at the per-partition sort (stale/corrupt checkpoints
    rebuild automatically).  The checkpoint is keyed to the staging dir
    plus (order_cols, num_parts) — reuse one only for reruns over the
    SAME input.

    ``staging_dir`` defaults to a fresh unique directory per call (the
    returned Dataset reads its stage files LAZILY, so a shared fixed
    path would let a second call's cleanup delete a first call's
    unconsumed exchange); stale defaults are garbage-collected
    opportunistically after 8 h without a read (phase-B reads touch the
    dir as a lease)."""
    if staging_dir is None:
        import os
        import shutil
        import time
        import uuid

        root = "/tmp/aisdb_ray_ranksort"
        os.makedirs(root, exist_ok=True)
        # phase-B reads touch their staging dir (a lease — _dist.run_part),
        # so an 8h mtime cutoff only collects exchanges nothing has read
        # for 8 hours: truly abandoned, not merely slowly consumed
        cutoff = time.time() - 8 * 3600
        for d in os.listdir(root):
            p = os.path.join(root, d)
            try:
                if os.path.isdir(p) and os.path.getmtime(p) < cutoff:
                    shutil.rmtree(p, ignore_errors=True)
            except OSError:
                pass
        staging_dir = os.path.join(root, uuid.uuid4().hex)
    if num_parts is None:
        # fixed (the co_shuffle_staged rationale): a cluster-derived
        # default would invalidate resume manifests across cluster sizes
        num_parts = 64
    import base64
    import json as _json

    from aisdb_ray.stages._dist import staged_manifest_meta

    # fingerprint_extra is the caller's INPUT identity (file list + row
    # count, a config hash, ...): without it a resume=True rerun over
    # changed data silently serves the previous input's rows and ranks —
    # the drift guard co_shuffle_staged's fingerprint exists to provide
    fp = _json.dumps({"order_cols": list(order_cols),
                      "input": fingerprint_extra})
    bounds = None
    if resume:
        # a valid checkpoint pins the boundaries — skip the sampling scan
        # (the resume feature exists to skip passes over the input)
        meta = staged_manifest_meta(staging_dir, num_parts, fp,
                                    keys=list(order_cols),
                                    custom_part_fn=True)
        if meta is not None and "bounds_b64" in meta:
            bounds = np.asarray(
                [base64.b64decode(s) for s in meta["bounds_b64"]],
                dtype=bytes,
            )
    if bounds is None:
        bounds = _sample_boundaries(ds, order_cols, num_parts, keys_per_batch)

    def part_fn(b: pa.Table) -> np.ndarray:
        if len(bounds) == 0:
            return np.zeros(b.num_rows, dtype=np.int64)
        return np.searchsorted(bounds, _encode_order_keys(b, order_cols),
                               side="right").astype(np.int64)

    def rank_part(tbl: pa.Table, part: int, counts: np.ndarray) -> pa.Table:
        offset = int(counts[:part].sum())
        s = tbl.sort_by([(c, "ascending") for c in order_cols])
        rn = offset + 1 + np.arange(s.num_rows, dtype=np.int64)
        s = s.append_column(out_col, pa.array(rn))
        if ntile:
            s = s.append_column(
                ntile_col, pa.array(_ntile(rn, int(counts.sum()), ntile))
            )
        return s

    return co_shuffle_staged(
        ds, order_cols, rank_part, staging_dir,
        num_parts=num_parts, part_fn=part_fn, part_aware=True,
        resume=resume, fingerprint=fp,
        extra={"bounds_b64": [
            base64.b64encode(bytes(b)).decode() for b in bounds
        ]},
    )
