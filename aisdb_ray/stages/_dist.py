"""Shared distributed-kernel shapes.

Two patterns recur across the engine's operators; they live here so the
partition-count sizing and combine policy have ONE definition:

- :func:`co_shuffle` — ONE hash-partition exchange on a key set, then one
  multi-group vectorized task per partition (never
  ``groupby(key).map_groups`` per tiny group: per-group invocation
  overhead dominates when groups are small — see stages/window.py).
- :func:`funnel_combine` — per-block vectorized combine of algebraic
  partials, then either a single-block funnel (results small by
  construction: top-k, mode, sketches) or a ``groupby(key)`` hash combine
  (the scale path when the result itself outgrows one block).  Policy
  rationale: stages/rollup.py `_combine` docstring.
"""

from __future__ import annotations

import pyarrow as pa

_PART = "_part"


def _default_parts() -> int:
    import ray

    return max(16, int(ray.cluster_resources().get("CPU", 8)) * 2)


def co_shuffle(ds, keys: list[str], block_fn, num_parts: int | None = None):
    """Hash-partition ``ds`` by ``keys`` and run ``block_fn`` once per
    partition (the partition holds every row of each of its key groups)."""
    from aisdb_ray.stages.join import _key_hash

    if num_parts is None:
        num_parts = _default_parts()

    def add_part(b: pa.Table) -> pa.Table:
        return b.append_column(_PART, pa.array(_key_hash(b, keys, num_parts)))

    def per_part(part: pa.Table) -> pa.Table:
        return block_fn(part.drop_columns([_PART]))

    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby(_PART)
        .map_groups(per_part, batch_format="pyarrow")
    )


def funnel_combine(partials, merge_fn, key_col: str | None = None,
                   hash_combine: bool = False, finalize_fn=None):
    """Combine algebraic partial blocks: local vectorized merge, then one
    global merge (single-block funnel, or hash shuffle on ``key_col`` when
    ``hash_combine``), then an optional finalize map."""
    local = partials.map_batches(merge_fn, batch_format="pyarrow", batch_size=None)
    if hash_combine:
        if key_col is None:
            raise ValueError("hash_combine requires key_col")
        merged = local.groupby(key_col).map_groups(merge_fn, batch_format="pyarrow")
    else:
        merged = local.repartition(1).map_batches(
            merge_fn, batch_format="pyarrow", batch_size=None
        )
    if finalize_fn is None:
        return merged
    return merged.map_batches(finalize_fn, batch_format="pyarrow", batch_size=None)
