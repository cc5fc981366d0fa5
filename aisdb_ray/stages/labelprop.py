"""Label propagation over an edge Dataset — semi-supervised labeling as
iterative Dataset rounds (the classification sibling of
stages/pagerank.py).

A small labeled seed set spreads over the similarity graph: each round,
every still-unlabeled node takes the majority label of its labeled
in-neighbors (ties → smallest label; no labeled neighbor → stays
unlabeled); already-labeled nodes are clamped.  All decisions are integer
counts + a deterministic tie rule, so K rounds unroll to K SQL CTEs and
the result is hash-verifiable bit-for-bit.

Shape per round: ONE src-keyed join of the label table against the edge
list, ONE (dst, label)-keyed count combine with a per-dst argmax block
kernel, and a left join back to the node table — the same
join/combine/join skeleton (and the same size-adaptive local fast path)
as PageRank.  At scale both sides bucket by the same node hash so each
round's joins are co-partitioned reads.

Use in a training-data pipeline: propagate sparse human topic/quality
labels over the embedding kNN graph to label the whole corpus.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

LOCAL_EDGE_LIMIT = 200_000
UNLABELED = -1


def _votes_argmax(part: pa.Table) -> pa.Table:
    """Per-dst majority label of one co-partition's (dst, lab) vote rows:
    count per (dst, lab), then argmax with ties to the SMALLEST label —
    one sort + first-of-run, no per-group Python."""
    if part.num_rows == 0:
        return pa.table({
            "dst": pa.array([], pa.int64()),
            "vote": pa.array([], pa.int64()),
        })
    g = part.group_by(["dst", "lab"], use_threads=False).aggregate(
        [([], "count_all")]
    ).rename_columns(["dst", "lab", "c"])
    idx = pc.sort_indices(
        g, sort_keys=[("dst", "ascending"), ("c", "descending"),
                      ("lab", "ascending")],
    )
    t = g.take(idx)
    d = t["dst"].to_numpy(zero_copy_only=False)
    first = np.r_[True, d[1:] != d[:-1]]
    t = t.filter(pa.array(first))
    return pa.table({"dst": t["dst"], "vote": t["lab"]})


def _labelprop_local(edges, labels, iters, src_col, dst_col,
                     node_col, label_col):
    """Driver-local rounds for graphs under LOCAL_EDGE_LIMIT — identical
    count/argmax/tie arithmetic to the distributed rounds."""
    # concat_tables([]) raises — empty edge/label inputs fall back to
    # typed empty tables (the pagerank-local fix, same construct)
    et = pa.concat_tables(
        [pa.table({"s": b[src_col], "d": b[dst_col]})
         for b in edges.iter_batches(batch_format="pyarrow")]
        or [pa.table({"s": pa.array([], pa.int64()),
                      "d": pa.array([], pa.int64())})]
    )
    lt = pa.concat_tables(
        [pa.table({"n": b[node_col], "l": b[label_col]})
         for b in labels.iter_batches(batch_format="pyarrow")]
        or [pa.table({"n": pa.array([], pa.int64()),
                      "l": pa.array([], pa.int64())})]
    )
    node_ids = lt["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    lab = lt["l"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(node_ids, kind="stable")
    sorted_ids = node_ids[order]
    lab_sorted = lab[order]
    s = et["s"].to_numpy(zero_copy_only=False).astype(np.int64)
    d = et["d"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = len(sorted_ids)
    # drop edges whose endpoint is absent from the label table — the
    # distributed path's inner join semantics; unguarded searchsorted
    # would IndexError or silently alias to a neighboring node
    si = np.searchsorted(sorted_ids, s)
    di = np.searchsorted(sorted_ids, d)
    okm = (si < n) & (di < n)
    if len(si):
        okm &= (sorted_ids[np.minimum(si, n - 1)] == s) & (
            sorted_ids[np.minimum(di, n - 1)] == d)
    si, di = si[okm], di[okm]
    cur = lab_sorted.copy()
    for _ in range(iters):
        src_lab = cur[si]
        ok = src_lab != UNLABELED
        if not ok.any():
            break
        # run-length pair counting, NOT di*labmax + lab packing: packed
        # keys silently wrap int64 for hash-sized label values and
        # mis-decode labels < -1, diverging from the distributed path's
        # Arrow group_by
        dd_, ll_ = di[ok], src_lab[ok]
        o2 = np.lexsort((ll_, dd_))
        dd_, ll_ = dd_[o2], ll_[o2]
        newrun = np.r_[True, (dd_[1:] != dd_[:-1]) | (ll_[1:] != ll_[:-1])]
        starts = np.flatnonzero(newrun)
        cnt = np.diff(np.r_[starts, len(dd_)])
        dsts = dd_[starts]
        labs = ll_[starts]
        # argmax per dst, ties -> smallest label: sort by (dst, -c, lab)
        o = np.lexsort((labs, -cnt, dsts))
        dd, ll = dsts[o], labs[o]
        first = np.r_[True, dd[1:] != dd[:-1]]
        win_d, win_l = dd[first], ll[first]
        nxt = cur.copy()
        tgt = win_d[cur[win_d] == UNLABELED]
        tgt_l = win_l[cur[win_d] == UNLABELED]
        nxt[tgt] = tgt_l
        cur = nxt
    import ray.data as rd

    back = np.searchsorted(sorted_ids, node_ids)
    return rd.from_arrow(pa.table({
        node_col: pa.array(node_ids, pa.int64()),
        label_col: pa.array(cur[back], pa.int64()),
    }))


def label_propagation(
    edges,
    labels,
    iters: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    node_col: str = "node",
    label_col: str = "label",
    num_parts: int | None = None,
    local_edge_limit: int | None = None,
):
    """K rounds of majority-vote label propagation.

    ``labels``: Dataset of (node, label) with ``label = -1`` for the
    unlabeled majority.  Returns the same shape after K rounds."""
    from aisdb_ray.stages import join
    from aisdb_ray.stages._dist import co_shuffle

    limit = LOCAL_EDGE_LIMIT if local_edge_limit is None else local_edge_limit
    if limit > 0 and edges.count() <= limit:
        return _labelprop_local(edges, labels, iters, src_col, dst_col,
                                node_col, label_col)

    cur = labels.materialize()
    for _ in range(iters):
        sent = join.hash_join(
            edges.map_batches(
                lambda b: pa.table({"dst": b[dst_col], node_col: b[src_col]}),
                batch_format="pyarrow",
            ),
            cur, on=node_col, how="inner", num_parts=num_parts,
        ).map_batches(
            lambda b: pa.table({"dst": b["dst"], "lab": b[label_col]}).filter(
                pc.not_equal(b[label_col], pa.scalar(UNLABELED, pa.int64()))
            ),
            batch_format="pyarrow",
        )
        votes = co_shuffle(sent, ["dst"], _votes_argmax, num_parts)
        cur = join.hash_join(
            cur, votes, on=node_col, right_on="dst",
            how="left outer", num_parts=num_parts,
        ).map_batches(
            lambda b: pa.table({
                node_col: b[node_col],
                label_col: pc.if_else(
                    pc.equal(b[label_col], pa.scalar(UNLABELED, pa.int64())),
                    pc.coalesce(
                        b["vote"], pa.scalar(UNLABELED, pa.int64())
                    ),
                    b[label_col],
                ),
            }),
            batch_format="pyarrow",
        ).materialize()
    return cur
