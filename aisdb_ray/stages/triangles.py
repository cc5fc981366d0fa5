"""Distributed triangle counting over the kNN similarity graph.

Local graph density is the clustering signal PageRank (stages/pagerank.py)
and label propagation (stages/labelprop.py) don't see: a vector whose
neighbors are also mutual neighbors sits inside a tight semantic cluster
(dedup candidate / low marginal value), while a triangle-free node bridges
clusters.  Per-node triangle counts are the numerator of the local
clustering coefficient.

Shape — the classic shared-nothing triangle count (Cohen's MapReduce
graph-twiddling / Suri-Vassilvitskii, public):

1. **symmetrize + dedup**: directed kNN edges → canonical undirected
   ``(u, v), u < v`` distinct pairs (packed-code dedup per batch, one
   code-keyed exchange).
2. **degree orientation**: orient every edge from its lower-(degree, id)
   endpoint — each node's out-adjacency is then O(√|E|) even for kNN
   hubs (in-degree in a kNN graph is unbounded; orientation is what
   bounds the wedge explosion at scale).
3. **wedges**: one hash exchange on the low endpoint; per partition,
   all ordered pairs of out-neighbors (fully vectorized repeat/cumsum —
   no per-group Python).
4. **close**: wedges LEFT SEMI hash-join the oriented edge list on the
   (b, c) pair — a wedge that closes is a triangle, counted exactly once
   because both the wedge and the closing edge use the same canonical
   (degree, id) order.
5. **per-node counts**: each triangle credits its three corners; one
   node-keyed algebraic combine.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_SHIFT = 1 << 32  # node ids are int32-ranged: (u, v) packs into int64


def _undirected_distinct(edges, num_parts=None):
    """(src, dst) directed multi-edges → distinct (u, v) with u < v."""
    from aisdb_ray.stages._dist import co_shuffle

    def canon(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = b["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        # the packed (u, v) code assumes int32-ranged non-negative ids:
        # an id >= 2^32 (e.g. a hashed 64-bit node id) or a negative id
        # would silently collide / mis-decode into wrong triangle counts
        if len(s) and (int(min(s.min(), d.min())) < 0
                       or int(max(s.max(), d.max())) >= _SHIFT):
            raise ValueError(
                "triangle_counts: node ids must be in [0, 2^32) for the "
                "packed-code dedup; remap hashed ids first")
        keep = s != d
        s, d = s[keep], d[keep]
        code = np.unique(np.minimum(s, d) * _SHIFT + np.maximum(s, d))
        return pa.table({"code": code})

    def per_part(part: pa.Table) -> pa.Table:
        code = np.unique(part["code"].to_numpy(zero_copy_only=False))
        return pa.table({"u": code // _SHIFT, "v": code % _SHIFT})

    return co_shuffle(edges.map_batches(canon, batch_format="pyarrow"),
                      ["code"], per_part, num_parts=num_parts)


def _degrees(e0):
    """Exact undirected degree per node (algebraic count partials)."""
    from aisdb_ray.stages._dist import funnel_combine

    def part(b: pa.Table) -> pa.Table:
        n = np.r_[b["u"].to_numpy(zero_copy_only=False),
                  b["v"].to_numpy(zero_copy_only=False)]
        node, c = np.unique(n, return_counts=True)
        return pa.table({"node": node, "d": c.astype(np.int64)})

    def merge(b: pa.Table) -> pa.Table:
        g = b.group_by(["node"], use_threads=False).aggregate([("d", "sum")])
        return g.rename_columns(["node", "d"])

    return funnel_combine(e0.map_batches(part, batch_format="pyarrow"),
                          merge, key_col="node", hash_combine=True)


def triangle_counts(edges, num_parts: int | None = None):
    """Per-node triangle counts over a directed edge Dataset (src, dst).

    Returns (node, n_tri) for every node in ≥ 1 triangle."""
    from aisdb_ray.stages import join as join_mod
    from aisdb_ray.stages._dist import co_shuffle, funnel_combine

    # pin the reused tables: Ray Data has no common-subexpression
    # sharing, so without materialize() the dedup exchange would re-run
    # for every downstream consumer (e0 feeds _degrees + the first join,
    # deg feeds two joins, o feeds the wedge shuffle + the closing join)
    e0 = _undirected_distinct(edges, num_parts=num_parts).materialize()
    deg = _degrees(e0).materialize()

    # join degrees onto both endpoints, then orient by (degree, id)
    ed = join_mod.hash_join(
        e0, deg.map_batches(
            lambda b: pa.table({"u": b["node"], "du": b["d"]}),
            batch_format="pyarrow"),
        on="u", num_parts=num_parts,
    )
    ed = join_mod.hash_join(
        ed, deg.map_batches(
            lambda b: pa.table({"v": b["node"], "dv": b["d"]}),
            batch_format="pyarrow"),
        on="v", num_parts=num_parts,
    )

    def orient(b: pa.Table) -> pa.Table:
        u = b["u"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = b["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        du = b["du"].to_numpy(zero_copy_only=False).astype(np.int64)
        dv = b["dv"].to_numpy(zero_copy_only=False).astype(np.int64)
        u_first = (du < dv) | ((du == dv) & (u < v))
        return pa.table({
            "lo": np.where(u_first, u, v),
            "hi": np.where(u_first, v, u),
            "dhi": np.where(u_first, dv, du),
        })

    o = ed.map_batches(orient, batch_format="pyarrow").materialize()

    def wedges(part: pa.Table) -> pa.Table:
        idx = pc.sort_indices(part, sort_keys=[("lo", "ascending"),
                                               ("dhi", "ascending"),
                                               ("hi", "ascending")])
        s = part.take(idx)
        lo = s["lo"].to_numpy(zero_copy_only=False)
        hi = s["hi"].to_numpy(zero_copy_only=False)
        n = len(lo)
        empty = pa.table({"a": pa.array([], pa.int64()),
                          "b": pa.array([], pa.int64()),
                          "c": pa.array([], pa.int64())})
        if n == 0:
            return empty
        # group end index per row (same lo) -> pair counts per row
        ends = np.searchsorted(lo, lo, side="right")
        i = np.arange(n, dtype=np.int64)
        reps = ends - i - 1
        total = int(reps.sum())
        if total == 0:
            return empty
        # _ranges_within needs strictly positive reps (zero-rep rows add
        # nothing to the repeat stream anyway)
        within = join_mod._ranges_within(reps[reps > 0])
        j = np.repeat(i + 1, reps) + within
        return pa.table({
            "a": np.repeat(lo, reps).astype(np.int64),
            "b": np.repeat(hi, reps).astype(np.int64),
            "c": hi[j].astype(np.int64),
        })

    w = co_shuffle(o, ["lo"], wedges, num_parts=num_parts)
    closed = join_mod.hash_join(
        w,
        o.map_batches(lambda b: pa.table({"b": b["lo"], "c": b["hi"]}),
                      batch_format="pyarrow"),
        on=["b", "c"], how="left semi", num_parts=num_parts,
    )

    def corner_part(b: pa.Table) -> pa.Table:
        n = np.r_[b["a"].to_numpy(zero_copy_only=False),
                  b["b"].to_numpy(zero_copy_only=False),
                  b["c"].to_numpy(zero_copy_only=False)]
        node, c = np.unique(n, return_counts=True)
        return pa.table({"node": node, "n_tri": c.astype(np.int64)})

    def corner_merge(b: pa.Table) -> pa.Table:
        g = b.group_by(["node"], use_threads=False).aggregate(
            [("n_tri", "sum")]
        )
        return g.rename_columns(["node", "n_tri"])

    return funnel_combine(
        closed.map_batches(corner_part, batch_format="pyarrow"),
        corner_merge, key_col="node", hash_combine=True,
    )
