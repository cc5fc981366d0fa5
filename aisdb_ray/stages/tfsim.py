"""Exact sparse TF-cosine similarity join over the document corpus.

The exact (non-sketched) member of the near-dup family: pairs of documents
whose whitespace term-frequency vectors have cosine ≥ θ, decided entirely
in integers — ``dot² · thr_den ≥ thr_num · ‖a‖² · ‖b‖²`` with
θ² = thr_num / thr_den — so the result is hash-verifiable against a SQL
restatement (MinHash estimates Jaccard on shingles; embedding near-dup is
dense; this is the sparse lexical ground truth the others approximate).

Shape (never documents × documents):
- term frequencies are map-side per batch (a document is one row, so its
  whole tf vector — and its squared norm — is computed in place and rides
  along with each posting; no norm join later);
- ONE co-shuffle on (block_key, token): within a partition every
  (block, token) posting list is local, and pairs are emitted per posting
  list (df² per term, the classic positional-join bound).  ``max_df``
  optionally drops stop-term posting lists — the documented approximation
  knob at corpus scale (exact when max_df ≥ the true max df, since a pair
  with cosine ≥ θ > 0 must share at least one surviving term ONLY if no
  shared term was dropped);
- partial dots combine by pair key via a hash groupby (pairs-only
  shuffle), then a map-only integer threshold gate.

Reference analog: the reference's near-dup decisions are checksum/equality
based (/root/reference/aisdb/database/decoder.py keep-first dedup); this
is that decision generalized to a similarity threshold at warehouse scale.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

def _seg_arange(counts: np.ndarray) -> np.ndarray:
    """[0..c0), [0..c1), ... — a per-segment arange without a Python loop."""
    total = int(counts.sum())
    offs = np.r_[0, np.cumsum(counts)[:-1]]
    return np.arange(total, dtype=np.int64) - np.repeat(offs, counts)


def _pair_indices(sizes: np.ndarray, starts: np.ndarray):
    """Row indices (ii, jj) of every intra-group (i < j) pair, for groups
    of the given sizes beginning at the given row offsets — fully
    vectorized via two nested segmented expansions (one (g, i) level with
    sizes-1 rows per group, then sizes-1-i trailing j's per (g, i))."""
    n_i = sizes - 1                       # i in [0, m-1) per group
    gi_grp = np.repeat(np.arange(len(sizes), dtype=np.int64), n_i)
    i_loc = _seg_arange(n_i)
    cnt_j = sizes[gi_grp] - 1 - i_loc     # j's per (g, i)
    j_loc = _seg_arange(cnt_j) + np.repeat(i_loc, cnt_j) + 1
    base = starts[np.repeat(gi_grp, cnt_j)]
    return base + np.repeat(i_loc, cnt_j), base + j_loc


def _tf_postings(batch: pa.Table, block_key: str) -> pa.Table:
    """(block, token, doc_id, tf, n2) postings — map-side, norm attached."""
    toks = pc.split_pattern_regex(batch["text"], pattern=r"\s+")
    flat = pc.list_flatten(toks)
    parents = pc.list_parent_indices(toks)
    keep = pc.not_equal(flat, pa.scalar(""))
    parents = parents.filter(keep)
    t = pa.table({
        "block": batch[block_key].take(parents),
        "doc_id": batch["doc_id"].take(parents),
        "token": flat.filter(keep),
    }).group_by(["block", "doc_id", "token"], use_threads=False).aggregate(
        [([], "count_all")]
    ).rename_columns(["block", "doc_id", "token", "tf"])
    # per-doc squared norm: every (doc, token) row of a doc is in this batch
    tf = t["tf"].to_numpy(zero_copy_only=False).astype(np.int64)
    sq = pa.table({
        "doc_id": t["doc_id"], "sq": pa.array(tf * tf, pa.int64())
    }).group_by(["doc_id"], use_threads=False).aggregate([("sq", "sum")])
    n2 = dict(zip(sq["doc_id"].to_pylist(),
                  sq["sq_sum"].to_numpy(zero_copy_only=False)))
    docs = t["doc_id"].to_pylist()
    return t.append_column(
        "n2", pa.array([int(n2[d]) for d in docs], pa.int64())
    ).set_column(3, "tf", pa.array(tf, pa.int64()))


def _pairs_block(part: pa.Table, max_df: int | None) -> pa.Table:
    """All (a < b) partial dots of one (block, token) co-partition."""
    empty = pa.table({
        "a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
        "dot": pa.array([], pa.int64()),
        "na2": pa.array([], pa.int64()), "nb2": pa.array([], pa.int64()),
    })
    n = part.num_rows
    if n == 0:
        return empty
    blk = part["block"]
    if isinstance(blk, pa.ChunkedArray):
        blk = blk.combine_chunks()
    binv = pc.dictionary_encode(blk).indices.to_numpy().astype(np.int64)
    tok = part["token"]
    if isinstance(tok, pa.ChunkedArray):
        tok = tok.combine_chunks()
    tinv = pc.dictionary_encode(tok).indices.to_numpy().astype(np.int64)
    doc = part["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    tf = part["tf"].to_numpy(zero_copy_only=False).astype(np.int64)
    n2 = part["n2"].to_numpy(zero_copy_only=False).astype(np.int64)
    key = binv * (tinv.max() + 1) + tinv
    order = np.lexsort((doc, key))
    key, doc, tf, n2 = key[order], doc[order], tf[order], n2[order]
    starts = np.flatnonzero(np.r_[True, key[1:] != key[:-1]])
    ends = np.r_[starts[1:], n]
    sizes = ends - starts
    keepg = sizes >= 2
    if max_df is not None:
        keepg &= sizes <= max_df
    sizes, starts = sizes[keepg], starts[keepg]
    if len(sizes) == 0:
        return empty
    ii, jj = _pair_indices(sizes, starts)
    if len(ii) == 0:
        return empty
    return pa.table({
        "a": pa.array(doc[ii], pa.int64()),
        "b": pa.array(doc[jj], pa.int64()),
        "dot": pa.array(tf[ii] * tf[jj], pa.int64()),
        "na2": pa.array(n2[ii], pa.int64()),
        "nb2": pa.array(n2[jj], pa.int64()),
    })


def tf_cosine_pairs(
    ds_docs,
    thr_num: int,
    thr_den: int,
    block_key: str = "source",
    max_df: int | None = None,
    num_parts: int | None = None,
):
    """Document pairs with TF-vector cosine ≥ sqrt(thr_num / thr_den),
    within ``block_key`` blocks, as exact integer evidence
    ``(a, b, dot, na2, nb2)``."""
    from aisdb_ray.stages._dist import co_shuffle

    postings = ds_docs.map_batches(
        lambda b: _tf_postings(b, block_key), batch_format="pyarrow"
    )
    partials = co_shuffle(
        postings, ["block", "token"],
        lambda part: _pairs_block(part, max_df), num_parts,
    )

    def merge(b: pa.Table) -> pa.Table:
        g = b.group_by(["a", "b"], use_threads=False).aggregate(
            [("dot", "sum"), ("na2", "min"), ("nb2", "min")]
        )
        return g.rename_columns(["a", "b", "dot", "na2", "nb2"])

    def gate(part: pa.Table) -> pa.Table:
        b = merge(part)
        dot = b["dot"].to_numpy(zero_copy_only=False).astype(np.int64)
        na2 = b["na2"].to_numpy(zero_copy_only=False).astype(np.int64)
        nb2 = b["nb2"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(dot) and (
            int(dot.max()) ** 2 * thr_den >= (1 << 62)
            or int(na2.max()) * int(nb2.max()) * thr_num >= (1 << 62)
        ):
            raise OverflowError("tf_cosine_pairs: int64 evidence overflow")
        keep = dot * dot * thr_den >= thr_num * na2 * nb2
        return b.filter(pa.array(keep))

    # local pre-collapse (shrinks the pair shuffle), then ONE pair-keyed
    # co-shuffle whose block gate merges + thresholds all of its pairs
    collapsed = partials.map_batches(
        merge, batch_format="pyarrow", batch_size=None
    )
    return co_shuffle(collapsed, ["a", "b"], gate, num_parts)
