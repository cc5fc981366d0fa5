"""MERGE INTO / upsert semantics over keyed Datasets.

The warehouse CDC primitive: a base table plus an updates stream; on key
collision the update wins, otherwise rows pass through (insert).  The
reference's nearest analog is its INSERT OR IGNORE / dedup maintenance
pass (SURVEY §2.6 O4/O5); this is the overwrite-wins variant a token
lake needs when corrected sequences re-arrive.

Shape: tag each side with a priority column, union (cheap — Ray unions
are logical), ONE co-shuffle on the key, and a vectorized keep-highest-
priority-per-key kernel per partition.  Updates that match nothing are
inserts by construction; nothing is read twice and neither side
materializes on the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_PRIO = "_prio"


def upsert(base, updates, key_cols: list[str], num_parts: int | None = None,
           version_col: str | None = None):
    """updates ⟫ base on ``key_cols``; column schemas must match.

    ``version_col`` (optional, integer): among duplicate keys WITHIN a
    side, the row with the highest version wins deterministically.
    Without it, equal-(key, priority) duplicates resolve by partition
    row order — fine when each side carries a key at most once (the
    normal CDC contract), unspecified otherwise."""
    import pyarrow.compute as pc

    from aisdb_ray.stages._dist import co_shuffle

    def tag(p: int):
        def add(b: pa.Table) -> pa.Table:
            return b.append_column(
                _PRIO, pa.array(np.full(b.num_rows, p, np.int8))
            )
        return add

    both = base.map_batches(tag(0), batch_format="pyarrow").union(
        updates.map_batches(tag(1), batch_format="pyarrow")
    )

    def _key_codes(col) -> np.ndarray:
        """Equality-preserving int64 codes for a key column: dictionary
        indices with nulls as -1 (the transits.py convention).  A raw
        to_numpy would crash the lexsort on string nulls (None in an
        object array) or degrade int keys to float64 — where NaN != NaN
        keeps both null-key rows, and keys >= 2^53 silently collide."""
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        enc = pc.dictionary_encode(col)
        return pc.fill_null(enc.indices, -1).to_numpy(
            zero_copy_only=False).astype(np.int64)

    def per_part(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return part.drop_columns([_PRIO])
        keys = [_key_codes(part[c]) for c in key_cols]
        prio = part[_PRIO].to_numpy(zero_copy_only=False)
        tie = ()
        if version_col is not None:
            # order-preserving (not just equality-preserving): the winner
            # among same-side duplicates is the max version
            ver = pc.fill_null(
                pc.cast(part[version_col], pa.int64()),
                np.iinfo(np.int64).min,
            ).to_numpy(zero_copy_only=False).astype(np.int64)
            tie = (ver,)
        # sort by (key..., prio[, version]): the LAST row of each key run
        # is the winner
        order = np.lexsort(tie + (prio,) + tuple(reversed(keys)))
        sk = [k[order] for k in keys]
        n = len(order)
        change = np.zeros(n, bool)
        change[-1] = True
        for k in sk:
            change[:-1] |= k[1:] != k[:-1]
        winners = order[np.flatnonzero(change)]
        return part.take(pa.array(np.sort(winners))).drop_columns([_PRIO])

    return co_shuffle(both, key_cols, per_part, num_parts=num_parts)
