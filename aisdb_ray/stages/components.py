"""Distributed connected components over near-duplicate pair graphs.

The near-dup pipelines (stages/dedup_text.py) emit verified PAIRS; turning
pairs into deduplication decisions needs the transitive closure — documents
A~B and B~C are one duplicate *cluster* {A,B,C} even if A~C was never a
candidate.  The reference has no graph operator (its PK dedup is exact-key
only, /root/reference/aisdb/database/dbconn.py:404-419); this is the
training-data extension: cluster near-dup pairs, keep one canonical
document per cluster.

Algorithm: min-label propagation with pointer jumping.  Every node starts
labeled with itself; each round every node adopts the minimum label among
itself, its neighbors, and its LABEL's label (the pointer-jump hop, which
halves label chains); at the fixpoint a node's label is the lexicographic
minimum id of its connected component (the canonical member).  Rounds
needed = O(log diameter) — near-dup clusters are band-bucket cliques plus
short bridges, so this is 2-4 rounds in practice; ``max_rounds`` is a
guard, not a budget.

Everything is Dataset-native and streaming per round:

- the node set comes from a distributed ``groupby(node).count()``, never a
  driver-side ``unique()``;
- propagation is co-partitioned ``hash_join``s (stages/join.py) of the
  symmetric edge list and the label table against the labels, plus one
  ``groupby(node).min(label)`` — a constant number of key shuffles per
  round, each linear in |E| or |V|;
- convergence is an exact changed-label count (a join of the old and new
  label tables), not a heuristic signature: labels only ever decrease, so
  changed == 0 IS the fixpoint;
- the label table is materialized once per round — without pinning, Ray's
  lazy lineage would re-execute every prior round on each reuse.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from aisdb_ray.stages.join import hash_join

NODE = "node"
COMPONENT = "component"
_LBL = "_lbl"


def _with_global_shuffle_ctx(ds):
    """Re-align an input Dataset's snapshotted DataContext with the global
    one.  Upstream pipelines (dedup_text's _hash_ctx) build under the
    HASH_SHUFFLE strategy with fractional aggregator actors; datasets
    DERIVED from their outputs inherit that snapshot, and an iterative
    algorithm like this one would then spawn a standing aggregator actor
    pool per groupby per round — a livelock on small clusters (measured:
    120+ blocked workers on a 25-edge graph).  Components' shuffles are
    small and per-round; the session default strategy is the right one."""
    try:
        from ray.data import DataContext

        g = DataContext.get_current()
        ds.context.shuffle_strategy = g.shuffle_strategy
        ds.context.hash_shuffle_operator_actor_num_cpus_per_partition_override = (
            g.hash_shuffle_operator_actor_num_cpus_per_partition_override
        )
    except Exception:
        pass
    return ds


def _sym_edges(edges, a_col: str, b_col: str):
    """(a,b) -> both directions as (node, _nbr), self-pairs dropped."""

    def fwd(b: pa.Table) -> pa.Table:
        keep = pc.not_equal(b[a_col], b[b_col])
        t = b.filter(keep)
        return pa.table({NODE: t[a_col], "_nbr": t[b_col]})

    def rev(b: pa.Table) -> pa.Table:
        keep = pc.not_equal(b[a_col], b[b_col])
        t = b.filter(keep)
        return pa.table({NODE: t[b_col], "_nbr": t[a_col]})

    e = edges.select_columns([a_col, b_col])
    return e.map_batches(fwd, batch_format="pyarrow").union(
        e.map_batches(rev, batch_format="pyarrow")
    )


def _local_components(sym) -> "object":
    """Driver-local union-find over a SMALL edge set (the size-adaptive
    fast path: every pointer-jumping round costs a fixed ~1-2 s of Ray
    stage latency, which dominates when the whole graph fits one block;
    <= LOCAL_EDGE_LIMIT rows is a bounded driver pull by construction).
    Same (node, min-id component) contract as the distributed rounds —
    the root of each set is kept at the set's minimum node id."""
    import ray.data as rd

    tbl = pa.concat_tables(
        [pa.table({NODE: b[NODE], "_nbr": b["_nbr"]})
         for b in sym.iter_batches(batch_format="pyarrow")]
    )
    import numpy as np

    u = tbl[NODE].to_numpy(zero_copy_only=False)
    v = tbl["_nbr"].to_numpy(zero_copy_only=False)
    nodes, inv = np.unique(np.concatenate([u, v]), return_inverse=True)
    parent = np.arange(len(nodes))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    iu, iv = inv[: len(u)], inv[len(u):]
    for a, b in zip(iu, iv):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            # union by smaller NODE VALUE so the root is the min id
            if nodes[ra] <= nodes[rb]:
                parent[rb] = ra
            else:
                parent[ra] = rb
    comp = nodes[[find(int(i)) for i in range(len(nodes))]]
    return rd.from_arrow(pa.table({NODE: pa.array(nodes),
                                   COMPONENT: pa.array(comp)}))


# graphs at or under this many (symmetric) edges run the one-task path
LOCAL_EDGE_LIMIT = 200_000


def connected_components(edges, a_col: str = "a", b_col: str = "b",
                         max_rounds: int = 64, num_parts: int | None = None):
    """Dataset of undirected edges -> Dataset (node, component).

    ``component`` is the minimum node id of each connected component; every
    node that appears in at least one edge gets a row (isolated documents
    never enter the graph — they are trivially their own component).

    Size-adaptive: graphs whose symmetric edge list fits comfortably in
    one block (<= LOCAL_EDGE_LIMIT) run a single union-find task — the
    pointer-jumping rounds below are the scale path, and their per-round
    Ray stage latency dominates tiny inputs.  Both paths produce the
    identical min-label contract (pytest-pinned equivalence).
    """
    sym = _sym_edges(_with_global_shuffle_ctx(edges), a_col, b_col).materialize()
    n_sym = sym.count()
    if 0 < n_sym <= LOCAL_EDGE_LIMIT:
        return _local_components(sym)
    if n_sym == 0:
        import ray.data as rd

        try:
            node_t = edges.schema().base_schema.field(a_col).type
        except Exception:
            node_t = pa.string()
        return rd.from_arrow(
            pa.table({NODE: pa.array([], node_t), COMPONENT: pa.array([], node_t)})
        )

    import ray

    # bounded block count per round: a groupby's output arrives as hundreds
    # of tiny blocks, and feeding those back into next round's joins makes
    # the shuffle's object count COMPOUND round over round (measured 2s ->
    # 95s/round on a 12-node chain); one repartition per round caps it
    n_blocks = num_parts or max(8, int(ray.cluster_resources().get("CPU", 8)) * 2)

    labels = (
        sym.groupby(NODE)
        .count()
        .map_batches(
            lambda b: pa.table({NODE: b[NODE], _LBL: b[NODE]}),
            batch_format="pyarrow",
        )
        .repartition(n_blocks)
        .materialize()
    )

    from ray.data.aggregate import Max, Min

    for _ in range(max_rounds):
        # pointer jumping rides the SAME join as neighbor messages: the
        # reversed label pairs (lbl(x) -> x) are just extra edges, so
        # joining (sym ∪ label-edges) against labels delivers both each
        # neighbor's label AND the label's label (halving label chains:
        # O(log diameter) rounds) in ONE co-shuffle
        lbl_edges = labels.map_batches(
            lambda b: pa.table({NODE: b[_LBL], "_nbr": b[NODE]}),
            batch_format="pyarrow",
        )
        inbox = hash_join(
            sym.union(lbl_edges), labels, on=NODE, num_parts=num_parts
        ).map_batches(
            lambda b: pa.table(
                {
                    NODE: b["_nbr"],
                    _LBL: b[_LBL],
                    "_slf": pa.nulls(len(b), b[_LBL].type),
                }
            ),
            batch_format="pyarrow",
        )
        own = labels.map_batches(
            lambda b: pa.table({NODE: b[NODE], _LBL: b[_LBL], "_slf": b[_LBL]}),
            batch_format="pyarrow",
        )
        # one aggregate pass yields BOTH the new label (min) and the old
        # one (max of _slf: exactly one non-null per node) — the changed
        # count needs no extra join
        new = (
            inbox.union(own)
            .groupby(NODE)
            .aggregate(Min(_LBL), Max("_slf"))
            .map_batches(
                lambda b: pa.table(
                    {
                        NODE: b[NODE],
                        _LBL: b[f"min({_LBL})"],
                        "_old": b["max(_slf)"],
                    }
                ),
                batch_format="pyarrow",
            )
            .repartition(n_blocks)
            .materialize()
        )
        changed = new.map_batches(
            lambda b: pa.table(
                {"c": pc.cast(pc.not_equal(b[_LBL], b["_old"]), pa.int64())}
            ),
            batch_format="pyarrow",
        ).sum("c")
        labels = new.map_batches(
            lambda b: pa.table({NODE: b[NODE], _LBL: b[_LBL]}),
            batch_format="pyarrow",
        )
        if not changed:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds"
        )

    return labels.map_batches(
        lambda b: pa.table({NODE: b[NODE], COMPONENT: b[_LBL]}),
        batch_format="pyarrow",
    )


def dedup_survivors(ids, components, id_col: str = "doc_id"):
    """Keep one canonical row per duplicate cluster.

    ``ids``: Dataset holding ``id_col`` (one row per document).
    ``components``: output of :func:`connected_components` over that id
    space.  A document survives iff it is not a NON-canonical member of a
    cluster — i.e. unpaired documents and each cluster's minimum id.
    Expressed as a distributed left anti join (J7's machinery), so no side
    is ever collected to the driver.
    """
    losers = _with_global_shuffle_ctx(components).map_batches(
        lambda b: pa.table(
            {id_col: b[NODE].filter(pc.not_equal(b[NODE], b[COMPONENT]))}
        ),
        batch_format="pyarrow",
    )
    # realign BOTH inputs' snapshotted shuffle contexts (ids may come from
    # a dedup pipeline built under the hash-shuffle ctx — the union-side
    # groupby would otherwise run under the stale strategy, the measured
    # standing-aggregator livelock _with_global_shuffle_ctx documents)
    return hash_join(
        _with_global_shuffle_ctx(ids.select_columns([id_col])), losers,
        on=id_col, how="left anti",
    )


def refresh_components(components, new_edges, a_col: str = "a",
                       b_col: str = "b", num_parts: int | None = None):
    """Incremental connected components: merge NEW edges into an existing
    (node, component) labeling WITHOUT re-reading the original edge list.

    The existing labeling is itself a compressed spanning forest — each
    (node, component) row is an edge to the component's root — so the
    refreshed result is exactly ``connected_components(labeling-as-edges ∪
    new_edges)``: the expensive original graph (banding, candidate
    verification, n·k similarity tiles) is never touched again, and the
    recompute input is O(nodes + new edges).  Min-label contract
    preserved (the old component ids are node ids, so the global minimum
    of a merged component still wins).  This is the maintenance path when
    a corpus shard lands: pair-mine ONLY the new shard (plus cross
    pairs), then fold the pairs in here."""
    import ray.data as rd

    def as_edges(b: pa.Table) -> pa.Table:
        return pa.table({a_col: b[NODE], b_col: b[COMPONENT]})

    old_edges = components.map_batches(as_edges, batch_format="pyarrow")
    new_proj = new_edges.map_batches(
        lambda b: pa.table({a_col: b[a_col], b_col: b[b_col]}),
        batch_format="pyarrow",
    )
    return connected_components(
        old_edges.union(new_proj), a_col=a_col, b_col=b_col,
        num_parts=num_parts,
    )
