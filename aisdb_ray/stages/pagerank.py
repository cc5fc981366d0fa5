"""Integer-exact PageRank over an edge Dataset — graph centrality as
iterative Dataset rounds.

Centrality over the similarity graph is a data-selection signal (pick the
most-representative documents of a near-dup neighborhood; down-weight
isolated outliers), and PageRank is its canonical form.  Floats would make
the result platform-dependent, so the recurrence is fixed-point integer —
``r⁰ = scale;  rᵗ⁺¹(v) = floor(scale·(1−d)) + Σ_{u→v} ⌊d_num·rᵗ(u) /
(d_den·outdeg(u))⌋`` — every intermediate is int64 and the whole K-round
computation is restatable as K unrolled SQL CTEs (hash-verifiable).

Shape per round (the components-style iterative-Dataset pattern,
stages/components.py): ONE src-keyed hash join of the rank table against
the edge list, a vectorized contribution map, ONE dst-keyed combine, and a
left join back to the node list (nodes with no in-edges keep the base).
Rank tables are O(nodes) skinny rows; edges are never mutated — at scale
both sides would be bucketed by the SAME node-hash so every round's joins
are co-partitioned reads, not fresh shuffles.  Rounds materialize to stop
lineage growth (same policy as pointer-jumping components).

Reference analog: /root/reference/aisdb/network_graph.py builds a
zone-transit graph and ranks hot zones by traversal counts; this is that
ranking done properly (stationary-distribution centrality) and at corpus
scale.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


LOCAL_EDGE_LIMIT = 200_000


def _pagerank_local(edges, nodes, iters, damp_num, damp_den, scale,
                    src_col, dst_col, node_col, seeds=None):
    """Size-adaptive fast path (the components.py LOCAL_EDGE_LIMIT
    policy): a graph whose edge list fits one block runs the K rounds as
    driver-local np.bincount passes — bit-identical to the distributed
    rounds (same floor arithmetic), without paying 3 exchange stages per
    round in fixed Ray latency.  The pull is bounded by construction
    (caller checked count() ≤ LOCAL_EDGE_LIMIT)."""
    # concat_tables([]) raises, and an edge-free graph (all isolated
    # nodes) is explicitly supported — fall back to typed empty tables
    et = pa.concat_tables(
        [pa.table({"s": b[src_col], "d": b[dst_col]})
         for b in edges.iter_batches(batch_format="pyarrow")]
        or [pa.table({"s": pa.array([], pa.int64()),
                      "d": pa.array([], pa.int64())})]
    )
    nt = pa.concat_tables(
        [pa.table({"n": b[node_col]})
         for b in nodes.iter_batches(batch_format="pyarrow")]
        or [pa.table({"n": pa.array([], pa.int64())})]
    )
    node_ids = nt["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    s = et["s"].to_numpy(zero_copy_only=False).astype(np.int64)
    d = et["d"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(node_ids, kind="stable")
    sorted_ids = node_ids[order]
    n = len(node_ids)
    # drop edges with an endpoint absent from the node list — the
    # distributed path's inner join does the same; an unguarded
    # searchsorted would IndexError past the end or silently alias a
    # between-ids endpoint to a different node's rank
    si = np.searchsorted(sorted_ids, s)
    di = np.searchsorted(sorted_ids, d)
    ok = ((si < n) & (di < n))
    if len(si):
        ok &= (sorted_ids[np.minimum(si, n - 1)] == s) & (
            sorted_ids[np.minimum(di, n - 1)] == d)
    si, di = si[ok], di[ok]
    deg = np.bincount(si, minlength=n).astype(np.int64)
    base = (scale * (damp_den - damp_num)) // damp_den
    if seeds is None:
        base_v = np.full(n, base, np.int64)
        r = np.full(n, scale, np.int64)
    else:
        is_seed = np.isin(sorted_ids, np.asarray(sorted(seeds), np.int64))
        base_v = np.where(is_seed, base, 0).astype(np.int64)
        r = np.where(is_seed, scale, 0).astype(np.int64)
    for _ in range(iters):
        give = (damp_num * r[si]) // (damp_den * deg[si])
        got = np.zeros(n, np.int64)
        np.add.at(got, di, give)
        r = base_v + got
    import ray.data as rd

    return rd.from_arrow(pa.table({
        node_col: pa.array(node_ids, pa.int64()),
        "pr": pa.array(r[np.searchsorted(sorted_ids, node_ids)], pa.int64()),
    }))


def pagerank(
    edges,
    nodes,
    iters: int = 4,
    damp_num: int = 85,
    damp_den: int = 100,
    scale: int = 1_000_000,
    src_col: str = "src",
    dst_col: str = "dst",
    node_col: str = "node",
    num_parts: int | None = None,
    local_edge_limit: int | None = None,
    seeds=None,
):
    """K rounds of integer PageRank.  Returns (node, pr) — int64 exact.

    ``seeds``: optional small collection of node ids for PERSONALIZED
    PageRank — the restart mass (both r⁰ and the per-round base) is paid
    only at seed nodes, so ``pr`` ranks the graph by proximity to the
    seed set (related-item discovery).  The seed set is driver-small by
    definition and rides into tasks as a broadcast constant.

    ``edges``: Dataset of (src, dst) int64 rows (a directed edge per row).
    ``nodes``: Dataset holding every node id once (isolated nodes score
    the bare base).  Dangling nodes (no out-edges) simply leak their mass
    — the standard simplification, mirrored exactly by the SQL oracle.

    Graphs at or under ``local_edge_limit`` (default LOCAL_EDGE_LIMIT)
    run the rounds driver-local (components.py's size-adaptive policy) —
    same arithmetic, no per-round exchange latency; parity is pinned by
    pytest on random graphs."""
    from aisdb_ray.stages import join
    from aisdb_ray.stages._dist import co_shuffle

    limit = LOCAL_EDGE_LIMIT if local_edge_limit is None else local_edge_limit
    if limit > 0 and edges.count() <= limit:
        return _pagerank_local(edges, nodes, iters, damp_num, damp_den,
                               scale, src_col, dst_col, node_col, seeds)
    seed_arr = (None if seeds is None
                else pa.array(sorted(int(x) for x in seeds), pa.int64()))

    base = (scale * (damp_den - damp_num)) // damp_den

    # out-degrees ride WITH the rank rows so each round's join is the only
    # edge-side exchange: deg(u) = count of edges leaving u
    deg = (
        edges.groupby(src_col)
        .count()
        .map_batches(
            lambda b: pa.table({
                node_col: b[src_col],
                "outdeg": pc.cast(b["count()"], pa.int64()),
            }),
            batch_format="pyarrow",
        )
    )
    def init_r(b: pa.Table) -> pa.Table:
        if seed_arr is None:
            r0 = pa.array(np.full(b.num_rows, scale, np.int64))
        else:
            m = pc.is_in(b[node_col], value_set=seed_arr)
            r0 = pc.if_else(m, pa.scalar(scale, pa.int64()),
                            pa.scalar(0, pa.int64()))
        return pa.table({
            node_col: b[node_col],
            "r": r0,
            "outdeg": pc.coalesce(b["outdeg"], pa.scalar(0, pa.int64())),
        })

    ranks = join.hash_join(
        nodes, deg, on=node_col, how="left outer", num_parts=num_parts
    ).map_batches(init_r, batch_format="pyarrow").materialize()

    def contrib(b: pa.Table) -> pa.Table:
        r = b["r"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = b["outdeg"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = d > 0
        give = np.zeros(len(r), np.int64)
        give[keep] = (damp_num * r[keep]) // (damp_den * d[keep])
        return pa.table({
            "dst": b["dst"], "give": pa.array(give, pa.int64())
        })

    def sum_block(part: pa.Table) -> pa.Table:
        g = part.group_by(["dst"], use_threads=False).aggregate(
            [("give", "sum")]
        )
        return g.rename_columns([node_col, "got"])

    for _ in range(iters):
        # src-keyed join: each edge row picks up its source's rank + degree
        sent = join.hash_join(
            edges.map_batches(
                lambda b: pa.table({"dst": b[dst_col], node_col: b[src_col]}),
                batch_format="pyarrow",
            ),
            ranks, on=node_col, how="inner", num_parts=num_parts,
        ).map_batches(contrib, batch_format="pyarrow")
        got = co_shuffle(sent, ["dst"], sum_block, num_parts)
        ranks = join.hash_join(
            ranks.select_columns([node_col, "outdeg"]), got,
            on=node_col, how="left outer", num_parts=num_parts,
        ).map_batches(
            lambda b: pa.table({
                node_col: b[node_col],
                "r": pc.add(
                    (pa.scalar(base, pa.int64()) if seed_arr is None
                     else pc.if_else(
                         pc.is_in(b[node_col], value_set=seed_arr),
                         pa.scalar(base, pa.int64()),
                         pa.scalar(0, pa.int64()))),
                    pc.coalesce(b["got"], pa.scalar(0, pa.int64())),
                ),
                "outdeg": b["outdeg"],
            }),
            batch_format="pyarrow",
        ).materialize()

    return ranks.map_batches(
        lambda b: pa.table({node_col: b[node_col], "pr": b["r"]}),
        batch_format="pyarrow",
    )
