"""Deduplication family for training corpora.

- exact dedup: content-hash keep-first (the PK ``ON CONFLICT DO NOTHING``
  semantics of /root/reference/aisdb/aisdb_sql/insert_dynamic_clusteredidx.sql:16,
  generalized to document content).
- MinHash + LSH near-dup: shingle -> 64-perm MinHash (actor pool) ->
  band-bucket groupby -> candidate pairs -> exact Jaccard verify.
- SimHash near-dup: 64-bit signatures, banded by 16-bit chunks (pigeonhole),
  verified by vectorized Hamming distance.
- embedding-cosine near-dup: EXACT all-pairs via a block-pair matmul join —
  every (block_i, block_j) tile is one task; no full-corpus broadcast.

Scale shape (no driver-side corpus materialization anywhere):
candidate generation is a groupby on (band, bucket) where only signatures
shuffle; pair verification SEMI-JOINS the corpus down to candidate doc ids,
hash-joins shingle payloads onto the pairs, and verifies inside
``map_batches`` — the driver only orchestrates.  Distinctness of pairs uses
hash-partition-by-key + block-local combine (no single-block funnel).
These pipelines set ``DataContext.shuffle_strategy = HASH_SHUFFLE`` (joins
and keyed repartition require it).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from aisdb_ray.functions import text as T


from contextlib import contextmanager


@contextmanager
def _hash_ctx(ds=None):
    """Hash-shuffle backend for the enclosed pipeline BUILD (joins / keyed
    repartition require it).

    A Dataset snapshots its DataContext at creation, so: (a) the strategy is
    set on the process-global context so datasets created inside the block
    capture it (and on an already-created upstream ``ds``'s context), and
    (b) the GLOBAL context is restored on exit — otherwise every groupby a
    later, unrelated pipeline builds would silently spawn a 64-actor hash
    aggregator pool (a livelock on small clusters).  The datasets built
    inside keep their captured hash contexts and execute correctly later.
    """
    from ray.data import DataContext
    from ray.data.context import ShuffleStrategy

    g = DataContext.get_current()
    prior = (g.shuffle_strategy,
             g.hash_shuffle_operator_actor_num_cpus_per_partition_override)
    for ctx in filter(None, [g, ds.context if ds is not None else None]):
        ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
        # fractional-CPU aggregator actors: a full-CPU aggregator per
        # partition can deadlock against concurrent actor pools on small
        # clusters (aggregators park while pools hold every slot)
        ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = 0.25
    try:
        yield ds
    finally:
        g.shuffle_strategy = prior[0]
        g.hash_shuffle_operator_actor_num_cpus_per_partition_override = prior[1]


def _nparts() -> int:
    """Shuffle partition count sized to the cluster: every live hash-shuffle
    operator keeps num_partitions aggregator actors standing, so chained
    shuffles on a small cluster must keep this low (and pipelines insert
    materialize() boundaries so at most one shuffle op is live at a time)."""
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return max(2, min(16, cpus // 2))


# ------------------------------------------------------------- exact dedup

def keep_first(ds, key_col: str, order_col: str):
    """(key, min(order)) per key — vectorized partial combine per block,
    then hash-partition by key + block-local final combine (distinct keys
    co-located; no single-block funnel)."""

    def partial(b: pa.Table) -> pa.Table:
        g = (
            pa.table({key_col: b[key_col], order_col: b[order_col]})
            .group_by([key_col], use_threads=False)
            .aggregate([(order_col, "min")])
        )
        return g.rename_columns([key_col, order_col])

    with _hash_ctx(ds):
        local = ds.map_batches(partial, batch_format="pyarrow")
        return local.repartition(_nparts(), keys=[key_col]).map_batches(
            partial, batch_format="pyarrow", batch_size=None
        )


# --------------------------------------------------------- MinHash + LSH

class MinHashSig:
    """Actor-pool signature stage: text -> 64 minhashes (+ shingle count)."""

    def __init__(self, n_hashes: int = 64, k_shingle: int = 3):
        self.mh = T.MinHasher(n_hashes)
        self.k = k_shingle

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        sigs = np.empty((len(texts), self.mh.n), dtype=np.uint64)
        for i, t in enumerate(texts):
            sigs[i] = self.mh.signature(T.shingle_hashes(T.words(t), self.k))
        off = pa.array(
            np.arange(0, (len(texts) + 1) * self.mh.n, self.mh.n, dtype=np.int32)
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "sig": pa.ListArray.from_arrays(
                    off, pa.array(sigs.reshape(-1).astype(np.int64))
                ),
            }
        )


def _explode_bands(batch: pa.Table, n_bands: int, rows_per_band: int) -> pa.Table:
    if batch.num_rows == 0:
        # reshape(0, -1) raises; empty blocks (empty parquet fragments,
        # upstream filters) must pass through as empty band tables with
        # the non-empty branch's exact column types
        return pa.table({
            "band": pa.array([], pa.int32()),
            "bucket": pa.array([], pa.int64()),
            "doc_id": batch["doc_id"],
        })
    sig = batch["sig"].combine_chunks()
    flat = sig.values.to_numpy().reshape(batch.num_rows, -1).astype(np.uint64)
    if n_bands * rows_per_band > flat.shape[1]:
        raise ValueError(
            f"banding {n_bands}x{rows_per_band} oversubscribes the "
            f"{flat.shape[1]}-hash MinHash signature"
        )
    doc = batch["doc_id"].to_numpy(zero_copy_only=False)
    bands, keys, docs = [], [], []
    for b in range(n_bands):
        chunk = flat[:, b * rows_per_band : (b + 1) * rows_per_band]
        # fold the band rows into one bucket key
        key = np.zeros(len(doc), dtype=np.uint64)
        for j in range(rows_per_band):
            key = key * np.uint64(1_000_003) + chunk[:, j]
        bands.append(np.full(len(doc), b, dtype=np.int32))
        keys.append(key.astype(np.int64))
        docs.append(doc)
    return pa.table(
        {
            "band": pa.array(np.concatenate(bands)),
            "bucket": pa.array(np.concatenate(keys)),
            "doc_id": pa.array(np.concatenate(docs)),
        }
    )


def _pairs_of_sorted(ids: np.ndarray, payloads: list[np.ndarray] | None = None):
    """Upper-triangle pairs of a sorted id vector (+ aligned payloads)."""
    i, j = np.triu_indices(len(ids), k=1)
    cols = [ids[i], ids[j]]
    if payloads:
        for p in payloads:
            cols.extend([p[i], p[j]])
    return cols


def _bucket_pairs(g: pa.Table) -> pa.Table:
    ids = np.sort(g["doc_id"].to_numpy(zero_copy_only=False))
    if len(ids) < 2:
        return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
    a, b = _pairs_of_sorted(ids)
    return pa.table({"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64())})


def _distinct_pairs(pairs, extra: list[str] | None = None):
    """Distinct (a, b) pairs: local combine -> hash-partition -> combine.

    Dedup runs on the (a, b) COMPOSITE key directly — a packed single-int
    fuse (the old a·2³¹ + b) collides for ids ≥ 2³¹ (snowflake/hash-style
    64-bit doc ids), and the min-combine across a collision would emit a
    FABRICATED pair while dropping both real ones (and mix simhash
    signatures across pairs)."""
    extra = extra or []

    def dedup_pairs(b: pa.Table) -> pa.Table:
        g = b.group_by(["a", "b"], use_threads=False).aggregate(
            [(c, "min") for c in extra]
        )
        return g.rename_columns(["a", "b"] + extra)

    local = pairs.map_batches(dedup_pairs, batch_format="pyarrow")
    return local.repartition(_nparts(), keys=["a", "b"]).map_batches(
        dedup_pairs, batch_format="pyarrow", batch_size=None
    )


def minhash_candidates(ds_docs, n_bands: int = 16, rows_per_band: int = 4):
    """documents -> distinct candidate pairs (a < b) via banded MinHash."""
    with _hash_ctx(ds_docs):
        # task-based signature stage: the hasher state is two tiny arrays
        # built once on the driver and shipped in the closure.  (A standing
        # actor pool here can deadlock the hash-shuffle aggregator actors on
        # small clusters: the pool holds every CPU slot while they wait.)
        sig_fn = MinHashSig()
        sigs = ds_docs.map_batches(
            sig_fn, batch_format="pyarrow", batch_size=1024,
        )
        bands = sigs.map_batches(
            lambda b: _explode_bands(b, n_bands, rows_per_band),
            batch_format="pyarrow",
        )
        pairs = bands.groupby(["band", "bucket"], num_partitions=_nparts()).map_groups(
            _bucket_pairs, batch_format="pyarrow"
        ).materialize()  # shuffle boundary: release this op's aggregators
        return _distinct_pairs(pairs)


class ShingleSet:
    """Actor-pool stage: text -> sorted unique shingle-hash list column."""

    def __init__(self, k_shingle: int = 3):
        self.k = k_shingle

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        # binary blobs (raw little-endian int64), not list columns: the hash
        # join carries only scalar payload types
        sh = [
            np.unique(T.shingle_hashes(T.words(t), self.k)).astype(np.int64).tobytes()
            for t in texts
        ]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "sh": pa.array(sh, pa.binary()),
            }
        )


def minhash_dedup_pairs(sf_docs_path: str, jaccard_threshold: float = 0.7,
                        n_bands: int = 16, rows_per_band: int = 4):
    """Full near-dup pipeline: banded candidates -> exact Jaccard verify.

    Fully distributed: the corpus is SEMI-JOINED down to candidate doc ids,
    shingle sets are hash-joined onto the pairs, and verification runs
    vectorized per batch — no ``.to_pandas()`` of any corpus-derived table.
    """
    import ray.data as rd

    with _hash_ctx():
        docs = rd.read_parquet(sf_docs_path, columns=["doc_id", "text"])
        cands = minhash_candidates(docs, n_bands, rows_per_band).materialize()

        # ids needed for verification (both sides of every candidate pair)
        ids = cands.map_batches(
            lambda b: pa.table(
                {"doc_id": pa.concat_arrays(
                    [b["a"].combine_chunks(), b["b"].combine_chunks()]
                )}
            ),
            batch_format="pyarrow",
        )
        nparts = _nparts()
        needed = docs.join(ids, "left_semi", nparts, on=("doc_id",))
        shingled = needed.map_batches(ShingleSet(), batch_format="pyarrow",
                                      batch_size=1024).materialize()

        j1 = cands.join(shingled, "inner", nparts, on=("a",), right_on=("doc_id",))
        j1 = j1.map_batches(
            lambda b: b.rename_columns(
                [("sh_a" if c == "sh" else c) for c in b.column_names]
            ),
            batch_format="pyarrow",
        ).materialize()
        j2 = j1.join(shingled, "inner", nparts, on=("b",), right_on=("doc_id",))

    thr = jaccard_threshold

    def verify(b: pa.Table) -> pa.Table:
        sa = b["sh_a"].to_pylist()
        sb = b["sh"].to_pylist()
        a_ids = b["a"].to_numpy(zero_copy_only=False)
        b_ids = b["b"].to_numpy(zero_copy_only=False)
        out_a, out_b, out_i, out_u = [], [], [], []
        for i in range(b.num_rows):
            x = np.frombuffer(sa[i], dtype=np.int64)
            y = np.frombuffer(sb[i], dtype=np.int64)
            inter = len(np.intersect1d(x, y, assume_unique=True))
            union = len(x) + len(y) - inter
            j = (inter / union) if union else 1.0
            if j >= thr:
                out_a.append(int(a_ids[i]))
                out_b.append(int(b_ids[i]))
                out_i.append(inter)
                out_u.append(union)
        # exact integer evidence (n_inter, n_union) rides with each pair so
        # the SQL oracle can hash-compare without float-rounding hazards;
        # jaccard itself derives as n_inter/n_union
        return pa.table(
            {"a": pa.array(out_a, pa.int64()), "b": pa.array(out_b, pa.int64()),
             "n_inter": pa.array(out_i, pa.int64()),
             "n_union": pa.array(out_u, pa.int64()),
             "jaccard": pa.array(
                 [(i / u) if u else 1.0 for i, u in zip(out_i, out_u)],
                 pa.float64(),
             )}
        )

    return j2.map_batches(verify, batch_format="pyarrow")


# --------------------------------------------------------------- SimHash

class SimHashSig:
    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        sigs = np.array([T.simhash64(T.words(t)) for t in texts], dtype=np.uint64)
        return pa.table(
            {"doc_id": batch["doc_id"], "simhash": pa.array(sigs.astype(np.int64))}
        )


def _explode_simhash_bands(batch: pa.Table) -> pa.Table:
    h = batch["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
    doc = batch["doc_id"].to_numpy(zero_copy_only=False)
    bands, keys, docs, sigs = [], [], [], []
    for b in range(4):
        chunk = (h >> np.uint64(16 * b)) & np.uint64(0xFFFF)
        bands.append(np.full(len(doc), b, dtype=np.int32))
        keys.append(chunk.astype(np.int64))
        docs.append(doc)
        sigs.append(h.astype(np.int64))
    return pa.table(
        {
            "band": pa.array(np.concatenate(bands)),
            "bucket": pa.array(np.concatenate(keys)),
            "doc_id": pa.array(np.concatenate(docs)),
            "simhash": pa.array(np.concatenate(sigs)),
        }
    )


def _bucket_pairs_sig(g: pa.Table) -> pa.Table:
    ids = g["doc_id"].to_numpy(zero_copy_only=False)
    hs = g["simhash"].to_numpy(zero_copy_only=False)
    order = np.argsort(ids, kind="stable")
    ids, hs = ids[order], hs[order]
    if len(ids) < 2:
        return pa.table(
            {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
             "ha": pa.array([], pa.int64()), "hb": pa.array([], pa.int64())}
        )
    a, b, ha, hb = _pairs_of_sorted(ids, [hs])
    return pa.table(
        {"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64()),
         "ha": pa.array(ha, pa.int64()), "hb": pa.array(hb, pa.int64())}
    )


def _hamming_verify(max_hamming: int):
    """Shared vectorized Hamming-verify kernel for banded simhash-style
    candidate pairs: (a, b, ha, hb) -> (a, b, hamming) with d <= max.
    Used by simhash_pairs here and ahash_pairs (multimodal) so the uint64
    cast / hamming column contract cannot drift between the two."""
    from aisdb_ray.functions import text as T

    def verify(b: pa.Table) -> pa.Table:
        ha = b["ha"].to_numpy(zero_copy_only=False).astype(np.uint64)
        hb = b["hb"].to_numpy(zero_copy_only=False).astype(np.uint64)
        d = T.hamming64(ha, hb)
        keep = d <= max_hamming
        return pa.table(
            {
                "a": pa.array(b["a"].to_numpy(zero_copy_only=False)[keep]),
                "b": pa.array(b["b"].to_numpy(zero_copy_only=False)[keep]),
                "hamming": pa.array(d[keep].astype(np.int64)),
            }
        )

    return verify


def simhash_pairs(sf_docs_path: str, max_hamming: int = 8):
    """Near-dup pairs by SimHash: band the 64 bits into 4 x 16-bit chunks
    (any pair within Hamming <= 3*16 shares >= 1 exact chunk — standard
    pigeonhole banding), explode -> groupby(band, bucket) -> distinct pairs
    carrying both signatures -> vectorized Hamming verify.  Same fully
    distributed shape as MinHash; signatures ride with the pairs so no
    second corpus pass is needed.
    """
    import ray.data as rd

    with _hash_ctx():
        docs = rd.read_parquet(sf_docs_path, columns=["doc_id", "text"])
        sigs = docs.map_batches(
            SimHashSig(), batch_format="pyarrow", batch_size=1024,
        )
        bands = sigs.map_batches(_explode_simhash_bands, batch_format="pyarrow")
        pairs = bands.groupby(["band", "bucket"], num_partitions=_nparts()).map_groups(
            _bucket_pairs_sig, batch_format="pyarrow"
        ).materialize()  # shuffle boundary: release this op's aggregators
        distinct = _distinct_pairs(pairs, extra=["ha", "hb"])

    return distinct.map_batches(_hamming_verify(max_hamming),
                                batch_format="pyarrow")


# ------------------------------------------- embedding-cosine near-dup

def embedding_neardup_pairs(sf_emb_path: str, threshold: float = 0.95,
                            target_block_rows: int = 65_536):
    """All pairs (a < b) with cosine similarity >= threshold — EXACT, via a
    block-pair matmul join: the corpus is pinned as normalized blocks and
    every (block_i, block_j >= i) tile is one matmul task.  No full-corpus
    broadcast or driver materialization; the O(n^2) work is tiled across
    the cluster (the exact-all-pairs scale shape; the LSH/IVF bucketing in
    stages/ann.py is the approximate path when n^2 is unaffordable).
    """
    import ray.data as rd

    ds = rd.read_parquet(sf_emb_path, columns=["vec_id", "embedding"])
    nrows = ds.count()
    nblocks = max(1, min(64, nrows // max(1, target_block_rows)))
    mat = ds.repartition(nblocks).materialize()
    refs = mat.to_arrow_refs()
    tiles = [(i, j) for i in range(len(refs)) for j in range(i, len(refs))]

    def norm_block(tbl: pa.Table):
        from aisdb_ray.stages.ann import _norm_rows

        ids = tbl["vec_id"].to_numpy(zero_copy_only=False)
        if tbl.num_rows == 0:  # reshape(0, -1) cannot infer a dimension
            return ids, np.zeros((0, 1), np.float64)
        emb = tbl["embedding"].combine_chunks()
        m = emb.values.to_numpy().reshape(tbl.num_rows, -1).astype(np.float64)
        # _norm_rows guards zero vectors (0/0 NaN would silently fail the
        # threshold — the LSH path guards, the exact path must agree)
        return ids, _norm_rows(m)

    def tile_pairs(batch: pa.Table) -> pa.Table:
        out_a, out_b = [], []
        for i, j in zip(batch["i"].to_pylist(), batch["j"].to_pylist()):
            ids_i, mi = norm_block(ray.get(refs[i]))
            ids_j, mj = norm_block(ray.get(refs[j]))
            if len(ids_i) == 0 or len(ids_j) == 0:
                continue
            sims = mi @ mj.T
            ki, kj = np.nonzero(sims >= threshold)
            a, b = ids_i[ki], ids_j[kj]
            if i == j:
                # diagonal tile sees both (x,y) and (y,x): a<b keeps one
                mask = a < b
                out_a.append(a[mask])
                out_b.append(b[mask])
            else:
                # off-diagonal tile sees each cross-block pair ONCE, but
                # block order need not follow id order — emit (min, max),
                # never a<b (which silently dropped pairs whose smaller id
                # lived in the later block)
                mask = a != b
                out_a.append(np.minimum(a, b)[mask])
                out_b.append(np.maximum(a, b)[mask])
        if not out_a:
            return pa.table(
                {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "a": pa.array(np.concatenate(out_a).astype(np.int64)),
                "b": pa.array(np.concatenate(out_b).astype(np.int64)),
            }
        )

    items = rd.from_items(
        [{"i": i, "j": j} for i, j in tiles], override_num_blocks=len(tiles)
    )
    return items.map_batches(tile_pairs, batch_format="pyarrow", batch_size=None)


def embedding_neardup_lsh_pairs(
    sf_emb_path: str,
    threshold: float = 0.95,
    n_bits: int = 8,
    n_tables: int = 4,
    seed: int = 11,
):
    """APPROXIMATE near-dup pairs: candidates form only inside shared LSH
    buckets (random-hyperplane, multi-table union), with exact cosine
    verification inside each bucket group — the scale path when the exact
    all-pairs tiling (:func:`embedding_neardup_pairs`) is unaffordable.

    Recall is the standard LSH tradeoff: a pair at angle θ shares one
    table's bucket with prob (1 - θ/π)^n_bits; n_tables unions the chance.
    Near-identical vectors (the dedup regime, cos >= 0.95) are recovered
    with high probability; distant pairs are deliberately missed.
    """
    import pyarrow.parquet as pq
    import ray.data as rd

    from aisdb_ray.stages.ann import LshIndexParams, lsh_bucket_assign

    from aisdb_ray.state.lineage import list_parquet_files

    # accept the same inputs read_parquet does (file OR directory); probe
    # the first non-empty fragment for the embedding dim
    dim = None
    for f in list_parquet_files(sf_emb_path):
        pf = pq.ParquetFile(f)
        if pf.metadata.num_rows:
            dim = len(pf.read_row_group(0, columns=["embedding"]).column(0)[0])
            break
    if dim is None:
        raise ValueError(
            f"embedding_neardup_lsh_pairs: no rows under {sf_emb_path!r}")
    params = LshIndexParams(dim, n_bits, n_tables, seed)

    with _hash_ctx():
        ds = rd.read_parquet(sf_emb_path, columns=["vec_id", "embedding"])
        assigned = lsh_bucket_assign(ds, params)

        def explode(b: pa.Table) -> pa.Table:
            from aisdb_ray.stages.ann import _norm_rows

            if b.num_rows == 0:  # reshape(0, -1) raises on empty blocks
                return pa.table({
                    "tbl": pa.array([], pa.int64()),
                    "bucket": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "emb": pa.LargeListArray.from_arrays(
                        pa.array([0], pa.int64()),
                        pa.array([], pa.float64())),
                })
            ids = b["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            emb = b["embedding"].combine_chunks()
            m = _norm_rows(  # the zero-vector guard all cosine paths share
                emb.values.to_numpy().reshape(b.num_rows, -1).astype(
                    np.float64))
            tbls, bks, vids, rows = [], [], [], []
            for t in range(n_tables):
                tbls.append(np.full(len(ids), t, dtype=np.int64))
                bks.append(b[f"bucket_{t}"].to_numpy(zero_copy_only=False))
                vids.append(ids)
                rows.append(m)
            flat = np.concatenate(rows)
            off = np.arange(0, (len(flat) + 1) * dim, dim, dtype=np.int64)
            return pa.table(
                {
                    "tbl": pa.array(np.concatenate(tbls)),
                    "bucket": pa.array(np.concatenate(bks).astype(np.int64)),
                    "vec_id": pa.array(np.concatenate(vids)),
                    "emb": pa.LargeListArray.from_arrays(
                        pa.array(off), pa.array(flat.reshape(-1))
                    ),
                }
            )

        exploded = assigned.map_batches(explode, batch_format="pyarrow")

        def bucket_pairs(g: pa.Table) -> pa.Table:
            ids = g["vec_id"].to_numpy(zero_copy_only=False)
            la = g["emb"].combine_chunks()
            m = la.values.to_numpy().reshape(g.num_rows, -1)
            sims = m @ m.T
            ki, kj = np.nonzero(np.triu(sims >= threshold, k=1))
            a, b2 = ids[ki], ids[kj]
            lo = np.minimum(a, b2)
            hi = np.maximum(a, b2)
            keep = lo != hi
            return pa.table(
                {"a": pa.array(lo[keep].astype(np.int64)),
                 "b": pa.array(hi[keep].astype(np.int64))}
            )

        pairs = exploded.groupby(["tbl", "bucket"], num_partitions=_nparts()).map_groups(
            bucket_pairs, batch_format="pyarrow"
        ).materialize()
        return _distinct_pairs(pairs)


def semdedup_survivors(sf_emb_path: str, cent: np.ndarray,
                       threshold: float = 0.95):
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup by
    clustering the embedding space with k-means, then dropping — INSIDE
    each cluster only — every vector that has a same-cluster neighbor with
    cosine >= threshold and a smaller vec_id.  Keep-lowest-id replaces the
    paper's keep-farthest-from-centroid so the decision is deterministic
    and SQL-re-derivable; the clustering, cluster-locality and
    cosine-threshold semantics are the paper's.

    Scale shape: assignment is one vectorized map over the lake (argmax
    against the broadcast centroid matrix, same kernel as stages/ann IVF);
    pairwise work is cluster-local — O(sum g_i^2) with g_i ≈ n/k, never
    corpus^2 — and each cluster lands in one task via a hash groupby.
    Partitioning assumption: a single cluster's vectors fit one worker
    (pick k accordingly; the paper runs ~100k clusters at web scale).
    The per-cluster scan is chunked so peak memory is O(chunk x g), not
    O(g^2)."""
    import ray.data as rd

    cent_ref = ray.put(np.asarray(cent, np.float64))

    def assign(b: pa.Table) -> pa.Table:
        from aisdb_ray.stages.ann import _norm_rows

        c = ray.get(cent_ref)
        if b.num_rows == 0:  # reshape(0, -1) raises on empty blocks
            return pa.table({
                "vec_id": pa.array([], pa.int64()),
                "cluster": pa.array([], pa.int64()),
                "emb": pa.LargeListArray.from_arrays(
                    pa.array([0], pa.int64()), pa.array([], pa.float64())),
            })
        emb = b["embedding"].combine_chunks()
        m = _norm_rows(
            emb.values.to_numpy().reshape(b.num_rows, -1).astype(np.float64))
        lists = np.argmax(m @ c.T, axis=1)
        dim = m.shape[1]
        off = np.arange(0, (len(m) + 1) * dim, dim, dtype=np.int64)
        return pa.table(
            {
                "vec_id": pa.array(
                    b["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
                ),
                "cluster": pa.array(lists.astype(np.int64)),
                "emb": pa.LargeListArray.from_arrays(
                    pa.array(off),
                    pa.array(m.reshape(-1)),  # m is already normalized
                ),
            }
        )

    def prune(g: pa.Table, chunk: int = 2048) -> pa.Table:
        ids = g["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        m = (
            g["emb"].combine_chunks().values.to_numpy()
            .reshape(g.num_rows, -1)[order]
        )
        dup = np.zeros(len(ids), bool)
        for lo in range(0, len(ids), chunk):
            hi = min(lo + chunk, len(ids))
            sims = m[lo:hi] @ m[:hi].T          # only earlier-or-self cols
            # row i (global lo+i) duplicates if any strictly-earlier column
            # >= threshold
            tri = sims >= threshold
            cols = np.arange(hi)
            rows_g = np.arange(lo, hi)[:, None]
            tri &= cols[None, :] < rows_g
            dup[lo:hi] = tri.any(axis=1)
        keep = ~dup
        return pa.table(
            {
                "vec_id": pa.array(ids[keep]),
                "cluster": pa.array(
                    g["cluster"].to_numpy(zero_copy_only=False)
                    .astype(np.int64)[order][keep]
                ),
            }
        )

    with _hash_ctx():
        ds = rd.read_parquet(sf_emb_path, columns=["vec_id", "embedding"])
        assigned = ds.map_batches(assign, batch_format="pyarrow")
        return assigned.groupby("cluster", num_partitions=_nparts()).map_groups(
            prune, batch_format="pyarrow"
        )


# --------------------------------------------------------------------------
# corpus-frequency boilerplate removal (CCNet §4.1 / C4 boilerplate pass)
# --------------------------------------------------------------------------

def _doc_segments(texts: pa.Array, seg_words: int):
    """Aligned non-overlapping ``seg_words``-word segments per document.

    Returns (doc_idx, pos, segments): ``pos`` is the 1-based word index of
    the segment's first word (mirroring the oracle's
    ``generate_series(1, len(ws), seg_words)``), segments are the words
    joined by one space.  The trailing segment may be shorter.  Fully
    vectorized: one regex split pass, run-length segment offsets, one
    ``binary_join`` — no per-row Python."""
    import pyarrow.compute as pc

    from aisdb_ray.stages.textstats import _doc_words_flat

    flat, parent = _doc_words_flat(texts)
    if len(flat) == 0:
        return (np.zeros(0, np.int64), np.zeros(0, np.int64),
                pa.array([], pa.string()))
    starts = np.flatnonzero(np.r_[True, parent[1:] != parent[:-1]])
    pos_in_doc = np.arange(len(parent), dtype=np.int64) - np.repeat(
        starts, np.diff(np.r_[starts, len(parent)])
    )
    seg_j = pos_in_doc // seg_words
    brk = np.r_[True, (parent[1:] != parent[:-1]) | (seg_j[1:] != seg_j[:-1])]
    seg_starts = np.flatnonzero(brk)
    offsets = np.r_[seg_starts, len(parent)].astype(np.int32)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    lists = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), flat)
    segs = pc.binary_join(lists, pa.scalar(" "))
    return (
        parent[seg_starts].astype(np.int64),
        pos_in_doc[seg_starts] + 1,
        segs,
    )


def boilerplate_segments(ds, text_col: str = "text", seg_words: int = 2,
                         min_df: int = 20, min_len: int = 4):
    """Corpus-wide boilerplate inventory: the aligned word segments that
    appear in >= ``min_df`` DISTINCT documents (short segments under
    ``min_len`` chars never qualify).  Per-batch distinct-(doc, segment)
    partials (a doc never splits across batches), ONE segment-keyed
    co-shuffle to sum document frequencies, then the threshold filter —
    the result is bounded by the frequency cut, never corpus-sized.

    This is the df pass of CCNet-style repeated-paragraph removal
    (Wenzek et al. 2020 §4.1); the fixture's documents are single-line,
    so the removable unit here is the aligned ``seg_words``-word segment
    rather than the newline-delimited paragraph — same shape, same
    distributed plan."""
    import pyarrow.compute as pc

    from aisdb_ray.stages._dist import co_shuffle

    def partial(b: pa.Table) -> pa.Table:
        texts = b[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        doc_idx, _, segs = _doc_segments(texts, seg_words)
        keep = pc.greater_equal(
            pc.utf8_length(segs), pa.scalar(min_len)
        ).to_numpy(zero_copy_only=False)
        t = pa.table({"d": pa.array(doc_idx[keep]), "g": segs.filter(pa.array(keep))})
        distinct = t.group_by(["d", "g"], use_threads=False).aggregate([])
        g = distinct.group_by(["g"], use_threads=False).aggregate([([], "count_all")])
        return g.rename_columns(["g", "n_docs"])

    def combine(part: pa.Table) -> pa.Table:
        g = part.group_by(["g"], use_threads=False).aggregate([("n_docs", "sum")])
        g = g.rename_columns(["g", "n_docs"])
        return g.filter(pc.greater_equal(g["n_docs"], pa.scalar(min_df)))

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return co_shuffle(partials, ["g"], combine)


def strip_boilerplate(ds, id_col: str = "doc_id", text_col: str = "text",
                      seg_words: int = 2, min_df: int = 20, min_len: int = 4):
    """Remove corpus-frequent segments from every document and reassemble.

    Two streaming passes over the corpus: the df pass
    (:func:`boilerplate_segments`, distributed), then a broadcast of the
    (threshold-bounded) boilerplate set via ``ray.put`` and one map-only
    filter+rejoin — the corpus itself never shuffles.  Output per document
    with >= 1 segment: (id, n_segs, n_kept, text_clean); ``text_clean``
    re-joins the surviving segments with single spaces."""
    import pyarrow.compute as pc

    boiler_tbl = boilerplate_segments(
        ds, text_col, seg_words, min_df, min_len
    ).take_all()  # bounded by the min_df cut (inventory rows, not corpus)
    boiler = pa.array(sorted(r["g"] for r in boiler_tbl), pa.string())
    boiler_ref = ray.put(boiler)

    def strip(b: pa.Table) -> pa.Table:
        bset = ray.get(boiler_ref)
        texts = b[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        doc_idx, _, segs = _doc_segments(texts, seg_words)
        empty = pa.table({
            id_col: pa.array([], b[id_col].type),
            "n_segs": pa.array([], pa.int64()),
            "n_kept": pa.array([], pa.int64()),
            "text_clean": pa.array([], pa.string()),
        })
        if len(segs) == 0:
            return empty
        is_b = pc.is_in(segs, value_set=bset).to_numpy(zero_copy_only=False)
        n_segs = np.bincount(doc_idx, minlength=b.num_rows).astype(np.int64)
        kept_mask = ~is_b
        n_kept = np.bincount(
            doc_idx[kept_mask], minlength=b.num_rows
        ).astype(np.int64)
        kept_segs = segs.filter(pa.array(kept_mask))
        kept_doc = doc_idx[kept_mask]
        # per-doc offsets into the kept segments (kept_doc is sorted)
        offs = np.zeros(b.num_rows + 1, dtype=np.int64)
        np.cumsum(n_kept, out=offs[1:])
        lists = pa.ListArray.from_arrays(
            pa.array(offs, pa.int32()),
            kept_segs.combine_chunks() if isinstance(kept_segs, pa.ChunkedArray)
            else kept_segs,
        )
        text_clean = pc.binary_join(lists, pa.scalar(" "))
        has_seg = n_segs > 0
        out = pa.table({
            id_col: b[id_col],
            "n_segs": pa.array(n_segs),
            "n_kept": pa.array(n_kept),
            "text_clean": text_clean,
        })
        return out.filter(pa.array(has_seg))

    return ds.map_batches(strip, batch_format="pyarrow")
