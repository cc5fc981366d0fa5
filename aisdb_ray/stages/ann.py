"""Approximate-nearest-neighbor search over an embedding column.

Baseline: brute-force cosine top-k — the query matrix is broadcast once
(``ray.put``) and every batch does one numpy matmul against it (never a
shuffle).  Scale path: LSH random-hyperplane bucketing — embeddings are
assigned a signature bucket in one vectorized map, the query probes only its
own bucket (and optionally neighbors at Hamming distance 1), trading recall
for a candidate set ~ corpus/2^bits.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

import ray


def _norm_rows(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _topk_det(score: np.ndarray, ids: np.ndarray, k: int) -> np.ndarray:
    """Indices of the k best rows under (score desc, id asc), exact at the
    boundary: bare argpartition keeps an ARBITRARY subset of rows tied at
    the k-th score, so the surviving set (and thus the merged global
    top-k) depended on batch partitioning.  A full stable lexsort is
    O(n log n) of one batch — negligible next to the matmul that
    produced the scores."""
    order = np.lexsort((ids, -score))
    return order[: min(k, len(order))]


def _emb_matrix(batch: pa.Table) -> np.ndarray:
    emb = batch["embedding"].combine_chunks()
    return emb.values.to_numpy().reshape(batch.num_rows, -1).astype(np.float64)


def topk_cosine(ds_emb, query: np.ndarray, k: int = 10):
    """Exact top-k by cosine: per-batch top-k, then a tiny global merge.

    Per batch only (k) rows leave the task — the global merge sees
    O(k * n_batches) rows regardless of corpus size.
    """
    q = query.astype(np.float64)
    q = q / (np.linalg.norm(q) or 1.0)
    q_ref = ray.put(q)

    def batch_topk(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:  # _emb_matrix reshape(0, -1) raises
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        qv = ray.get(q_ref)
        m = _norm_rows(_emb_matrix(b))
        sims = m @ qv
        ids = b["vec_id"].to_numpy(zero_copy_only=False)
        # deterministic selection AND order: sim desc, vec_id asc; cosine
        # stays full precision until the final merge so near-ties rank by
        # the true float64 value (rounding first would reorder them)
        idx = _topk_det(sims, ids, k)
        return pa.table(
            {
                "vec_id": pa.array(ids[idx].astype(np.int64)),
                "cosine": pa.array(sims[idx]),
            }
        )

    partial = ds_emb.map_batches(batch_topk, batch_format="pyarrow")

    def merge(b: pa.Table) -> pa.Table:
        ids = b["vec_id"].to_numpy(zero_copy_only=False)
        sims = b["cosine"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -sims))[:k]
        return pa.table(
            {"vec_id": pa.array(ids[order].astype(np.int64)),
             "cosine": pa.array(np.round(sims[order], 4))}
        )

    return partial.repartition(1).map_batches(
        merge, batch_format="pyarrow", batch_size=None
    )


def embedding_dim_stats(ds_emb, scale: int = 1_000_000):
    """Per-dimension corpus statistics of the embedding column.

    Values are fixed-pointed (``floor(v * scale)`` as int64; the
    float32 -> float64 widening and the product are both exact) so sums are
    order-independent integers and the result hash-matches SQL exactly —
    the engine's money-in-cents policy applied to vectors.  Shape: one
    (dim, n, sum, min, max) partial row per dimension per batch, so only
    d rows per task ever shuffle; the global combine handles d rows total.
    """

    def partial(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return pa.table(
                {
                    "dim": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                    "sum_fx": pa.array([], pa.int64()),
                    "min_fx": pa.array([], pa.int64()),
                    "max_fx": pa.array([], pa.int64()),
                }
            )
        m = _emb_matrix(b).astype(np.float64)
        fx = np.floor(m * scale).astype(np.int64)
        d = fx.shape[1]
        return pa.table(
            {
                "dim": pa.array(np.arange(d, dtype=np.int64)),
                "n": pa.array(np.full(d, fx.shape[0], np.int64)),
                "sum_fx": pa.array(fx.sum(axis=0, dtype=np.int64)),
                "min_fx": pa.array(fx.min(axis=0)),
                "max_fx": pa.array(fx.max(axis=0)),
            }
        )

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["dim"], use_threads=False).aggregate(
            [("n", "sum"), ("sum_fx", "sum"), ("min_fx", "min"), ("max_fx", "max")]
        )
        return g.rename_columns(["dim", "n", "sum_fx", "min_fx", "max_fx"])

    def finalize(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mean = pc.divide(
            pc.cast(b["sum_fx"], pa.float64()), pc.cast(b["n"], pa.float64())
        )
        return b.append_column("mean_fx", mean)

    partials = ds_emb.map_batches(partial, batch_format="pyarrow")
    local = partials.map_batches(combine, batch_format="pyarrow", batch_size=None)
    # global combine input is exactly d rows per upstream block — tiny
    merged = local.repartition(1).map_batches(
        combine, batch_format="pyarrow", batch_size=None
    )
    return merged.map_batches(finalize, batch_format="pyarrow", batch_size=None)


def topk_cosine_multi(ds_emb, queries: np.ndarray, k: int = 10):
    """Batched exact top-k: Q probe vectors answered in ONE corpus pass.

    Per batch: one (B×d)·(d×Q) matmul, then per-query partial top-k — only
    O(Q·k) rows leave each task, and the global merge sees
    O(Q·k·n_batches) rows regardless of corpus size.  The workload form of
    :func:`topk_cosine`: a query STREAM amortizes the scan instead of
    rescanning the corpus per query.  Output rows
    (qid, rank, vec_id, cosine): rank 1..k per qid by (cosine desc,
    vec_id asc); qid is the row index into ``queries``.
    """
    Q = np.atleast_2d(np.asarray(queries, dtype=np.float64))
    norms = np.linalg.norm(Q, axis=1)
    norms[norms == 0] = 1.0
    q_ref = ray.put(Q / norms[:, None])
    nq = len(Q)

    def batch_topk(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:  # _emb_matrix reshape(0, -1) raises
            return pa.table({"qid": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        qm = ray.get(q_ref)
        m = _norm_rows(_emb_matrix(b))
        sims = m @ qm.T  # B x Q
        ids = b["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        qout, iout, sout = [], [], []
        for qi in range(nq):  # loop over the Q queries only
            s = sims[:, qi]
            idx = _topk_det(s, ids, k)
            qout.append(np.full(len(idx), qi, np.int64))
            iout.append(ids[idx])
            sout.append(s[idx])  # full precision until the final merge
        return pa.table(
            {
                "qid": pa.array(np.concatenate(qout)),
                "vec_id": pa.array(np.concatenate(iout)),
                "cosine": pa.array(np.concatenate(sout)),
            }
        )

    partial = ds_emb.map_batches(batch_topk, batch_format="pyarrow")

    def merge(b: pa.Table) -> pa.Table:
        qid = b["qid"].to_numpy(zero_copy_only=False)
        ids = b["vec_id"].to_numpy(zero_copy_only=False)
        sims = b["cosine"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -sims, qid))
        qs = qid[order]
        first = np.r_[True, qs[1:] != qs[:-1]]
        start = np.maximum.accumulate(np.where(first, np.arange(len(qs)), 0))
        rank = np.arange(len(qs)) - start + 1
        keep = rank <= k
        return pa.table(
            {
                "qid": pa.array(qs[keep].astype(np.int64)),
                "rank": pa.array(rank[keep].astype(np.int64)),
                "vec_id": pa.array(ids[order][keep].astype(np.int64)),
                "cosine": pa.array(np.round(sims[order][keep], 4)),
            }
        )

    return partial.repartition(1).map_batches(
        merge, batch_format="pyarrow", batch_size=None
    )


class LshIndexParams:
    """Multi-table random-hyperplane signatures (seeded, shared by index +
    query).  Multiple independent tables are the standard recall lever:
    candidate set = union over tables of the query's bucket (+ neighbors)."""

    def __init__(self, dim: int, n_bits: int = 8, n_tables: int = 4, seed: int = 11):
        rng = np.random.default_rng(seed)
        self.planes = rng.normal(size=(n_tables, n_bits, dim))
        self.n_bits = n_bits
        self.n_tables = n_tables
        self.seed = seed

    def buckets_of(self, m: np.ndarray) -> np.ndarray:
        """(n, n_tables) int64 bucket ids."""
        out = np.zeros((len(m), self.n_tables), dtype=np.int64)
        for t in range(self.n_tables):
            bits = (m @ self.planes[t].T) > 0
            for i in range(self.n_bits):
                out[:, t] |= bits[:, i].astype(np.int64) << i
        return out


def lsh_bucket_assign(ds_emb, params: LshIndexParams):
    """Vectorized bucket assignment — the 'build index' map stage.

    Appends one bucket column per table (bucket_0..bucket_{T-1}).
    """
    p_ref = ray.put(params)

    def assign(b: pa.Table) -> pa.Table:
        p = ray.get(p_ref)
        if b.num_rows == 0:  # _emb_matrix reshape(0, -1) raises
            for t in range(p.n_tables):
                b = b.append_column(
                    f"bucket_{t}", pa.array([], pa.int64()))
            return b
        m = _norm_rows(_emb_matrix(b))
        bk = p.buckets_of(m)
        for t in range(p.n_tables):
            b = b.append_column(f"bucket_{t}", pa.array(bk[:, t]))
        return b

    return ds_emb.map_batches(assign, batch_format="pyarrow")


def _candidates_topk(emb_path: str, cand: list, query: np.ndarray, k: int):
    """Shared index-probe tail: fetch candidate rows from the embedding
    lake (row-group pruned by the id filter) and brute-force exactly."""
    import pyarrow.dataset as pads
    import ray.data as rd

    if not cand:
        return rd.from_arrow(
            pa.table({"vec_id": pa.array([], pa.int64()),
                      "cosine": pa.array([], pa.float64())})
        )
    ds_cand = rd.read_parquet(emb_path, filter=pads.field("vec_id").isin(cand))
    return topk_cosine(ds_cand, query, k)


def build_lsh_index(
    ds_emb,
    index_dir: str,
    params: LshIndexParams,
    min_rows_per_file: int = 100_000,
) -> str:
    """Materialize the LSH assignment ONCE as a persisted postings index.

    Layout: ``postings/tbl=T/bucket=B/*.parquet`` holding skinny
    ``(vec_id)`` rows — one row per (table, bucket) membership.  The
    embedding payload is NOT duplicated into the index; it stays in the
    source lake, fetched for candidates only.  A query then reads just its
    probed (tbl, bucket) partitions — driver-side metadata pruning via the
    predicate layer, O(probes) directories instead of a corpus scan per
    query (the fix for recomputing signatures per query).  Idempotent via
    _SUCCESS; params (seed/bits/tables/dim) ride a JSON sidecar so query
    time reconstructs identical hyperplanes.
    """
    import json

    marker = os.path.join(index_dir, "_SUCCESS")
    if os.path.exists(marker):
        return index_dir

    _write_lsh_postings(ds_emb, index_dir, params, min_rows_per_file)
    dim = params.planes.shape[2]
    with open(os.path.join(index_dir, "params.json"), "w") as fh:
        json.dump(
            {"dim": dim, "n_bits": params.n_bits,
             "n_tables": params.n_tables, "seed": params.seed},
            fh,
        )
    with open(marker, "w") as fh:
        fh.write("ok\n")
    return index_dir


def _write_lsh_postings(ds_emb, index_dir: str, params: LshIndexParams,
                        min_rows_per_file: int = 100_000) -> None:
    """Assign + explode + write skinny (tbl, bucket) → vec_id postings
    into the index's hive layout.  Shared by the initial build and the
    append refresh — both produce identical rows for identical vectors
    because the hyperplanes are fully determined by the stored seed."""
    assigned = lsh_bucket_assign(ds_emb, params)
    n_tables = params.n_tables

    def explode(b: pa.Table) -> pa.Table:
        ids = b["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        tbls, bks, vids = [], [], []
        for t in range(n_tables):
            tbls.append(np.full(len(ids), t, dtype=np.int64))
            bks.append(b[f"bucket_{t}"].to_numpy(zero_copy_only=False))
            vids.append(ids)
        return pa.table(
            {
                "tbl": pa.array(np.concatenate(tbls)),
                "bucket": pa.array(np.concatenate(bks).astype(np.int64)),
                "vec_id": pa.array(np.concatenate(vids)),
            }
        )

    os.makedirs(index_dir, exist_ok=True)
    assigned.map_batches(explode, batch_format="pyarrow").write_parquet(
        os.path.join(index_dir, "postings"),
        partition_cols=["tbl", "bucket"],
        min_rows_per_file=min_rows_per_file,
    )


def append_lsh_index(
    ds_emb_new,
    index_dir: str,
    generation: str = "g1",
    min_rows_per_file: int = 100_000,
) -> str:
    """Incremental index refresh: add NEW vectors to an existing LSH
    postings index WITHOUT a rebuild (the streaming-ingest maintenance
    path; deletes are already rebuild-free via ``lsh_index_topk(keep_fn)``
    tombstones).

    The stored seed fully determines the hyperplanes, so appended vectors
    land in exactly the buckets a from-scratch build would assign them —
    serving after append is bit-identical to serving a full rebuild.  The
    append just writes more postings files into the same hive layout
    (queries list the directory, so they see old ∪ new); a per-generation
    marker makes re-runs idempotent, mirroring build's _SUCCESS."""
    marker = os.path.join(index_dir, f"_SUCCESS_APPEND_{generation}")
    if os.path.exists(marker):
        return index_dir
    params = load_lsh_params(index_dir)
    _write_lsh_postings(ds_emb_new, index_dir, params, min_rows_per_file)
    with open(marker, "w") as fh:
        fh.write("ok\n")
    return index_dir


def load_lsh_params(index_dir: str) -> LshIndexParams:
    import json

    with open(os.path.join(index_dir, "params.json")) as fh:
        meta = json.load(fh)
    return LshIndexParams(
        meta["dim"], meta["n_bits"], meta["n_tables"], meta["seed"]
    )


def lsh_index_topk(
    index_dir: str,
    emb_path: str,
    query: np.ndarray,
    k: int = 10,
    probe_hamming1: bool = True,
    keep_fn=None,
):
    """ANN top-k against the PERSISTED index: prune-read the probed
    (tbl, bucket) partitions, semi-join candidates back to the embedding
    lake, brute-force only the candidate set.

    Candidate-set size is the index's design knob (~ corpus·T·(1+bits) /
    2^bits) — sized so the id list is driver-safe for a query stream."""
    from aisdb_ray.predicates import Pred, field, scan_parquet

    params = load_lsh_params(index_dir)
    q = query.astype(np.float64)
    q = q / (np.linalg.norm(q) or 1.0)
    qb = params.buckets_of(q[None, :])[0]

    probe: Pred | None = None
    for t in range(params.n_tables):
        probes = {int(qb[t])}
        if probe_hamming1:
            probes |= {int(qb[t]) ^ (1 << i) for i in range(params.n_bits)}
        p = (field("tbl") == t) & field("bucket").isin(sorted(probes))
        probe = p if probe is None else (probe | p)

    postings = scan_parquet(
        os.path.join(index_dir, "postings"),
        where=probe,
        partition_cols=["tbl", "bucket"],
    )
    cand = sorted(set(postings.unique("vec_id")))
    if keep_fn is not None:
        # tombstone / predicate delete applied at serve time — the index
        # is immutable; deletes never force a rebuild
        cand = [c for c in cand if keep_fn(int(c))]
    return _candidates_topk(emb_path, cand, query, k)


# ------------------------------------------------------------------- IVF

def kmeans_fit(sample: np.ndarray, n_lists: int, iters: int = 10,
               seed: int = 23) -> np.ndarray:
    """Deterministic spherical k-means (Lloyd) on unit vectors — the IVF
    coarse quantizer.  Sample-sized driver work; assignment distributes."""
    rng = np.random.default_rng(seed)
    m = _norm_rows(sample.astype(np.float64))
    cent = m[rng.choice(len(m), size=min(n_lists, len(m)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(m @ cent.T, axis=1)
        for c in range(len(cent)):
            members = m[assign == c]
            if len(members):
                cent[c] = members.sum(axis=0)
        cent = _norm_rows(cent)
    return cent


def build_ivf_index(
    ds_emb,
    index_dir: str,
    n_lists: int = 16,
    sample_size: int = 2048,
    seed: int = 23,
    min_rows_per_file: int = 100_000,
) -> str:
    """IVF index build: fit the coarse quantizer on a bounded sample
    (driver-side, O(sample x lists)), then one distributed vectorized
    assignment pass writes skinny (vec_id) postings hive-partitioned by
    ``list`` — same prune-at-query layout as the LSH index.  Idempotent
    via _SUCCESS; centroids ride an .npy sidecar."""
    marker = os.path.join(index_dir, "_SUCCESS")
    if os.path.exists(marker):
        return index_dir

    head = ds_emb.limit(sample_size).take_all()  # bounded sample, driver-safe
    sample = np.stack([np.asarray(r["embedding"], np.float64) for r in head])
    cent = kmeans_fit(sample, n_lists, seed=seed)
    cent_ref = ray.put(cent)

    def assign(b: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        m = _norm_rows(_emb_matrix(b))
        lists = np.argmax(m @ c.T, axis=1).astype(np.int64)
        return pa.table(
            {
                "list": pa.array(lists),
                "vec_id": pa.array(
                    b["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
                ),
            }
        )

    os.makedirs(index_dir, exist_ok=True)
    ds_emb.map_batches(assign, batch_format="pyarrow").write_parquet(
        os.path.join(index_dir, "postings"),
        partition_cols=["list"],
        min_rows_per_file=min_rows_per_file,
    )
    np.save(os.path.join(index_dir, "centroids.npy"), cent)
    with open(marker, "w") as fh:
        fh.write("ok\n")
    return index_dir


def ivf_topk(
    index_dir: str,
    emb_path: str,
    query: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    keep_fn=None,
):
    """IVF query: nearest ``nprobe`` centroid lists prune-read via the
    predicate layer; candidates brute-force exactly.  ``keep_fn`` applies
    a serve-time tombstone predicate (see lsh_index_topk)."""
    from aisdb_ray.predicates import field, scan_parquet

    cent = np.load(os.path.join(index_dir, "centroids.npy"))
    q = query.astype(np.float64)
    q = q / (np.linalg.norm(q) or 1.0)
    probe_lists = np.argsort(-(cent @ q))[:nprobe].tolist()

    postings = scan_parquet(
        os.path.join(index_dir, "postings"),
        where=field("list").isin(sorted(int(x) for x in probe_lists)),
        partition_cols=["list"],
    )
    cand = sorted(set(postings.unique("vec_id")))
    if keep_fn is not None:
        # tombstone / predicate delete applied at serve time — the index
        # is immutable; deletes never force a rebuild
        cand = [c for c in cand if keep_fn(int(c))]
    return _candidates_topk(emb_path, cand, query, k)


def lsh_topk(ds_emb, query: np.ndarray, k: int = 10,
             params: LshIndexParams | None = None, probe_hamming1: bool = True):
    """ANN top-k: probe the query's bucket in every table (+ Hamming-1)."""
    import pyarrow.compute as pc

    dim = len(query)
    params = params or LshIndexParams(dim)
    q = query.astype(np.float64)
    q = q / (np.linalg.norm(q) or 1.0)
    qb = params.buckets_of(q[None, :])[0]
    probe_sets = []
    for t in range(params.n_tables):
        probes = {int(qb[t])}
        if probe_hamming1:
            probes |= {int(qb[t]) ^ (1 << i) for i in range(params.n_bits)}
        probe_sets.append(pa.array(list(probes), pa.int64()))

    assigned = lsh_bucket_assign(ds_emb, params)

    def filt(b: pa.Table) -> pa.Table:
        m = None
        for t, ps in enumerate(probe_sets):
            hit = pc.is_in(b[f"bucket_{t}"], value_set=ps)
            m = hit if m is None else pc.or_(m, hit)
        return b.filter(m)

    cand = assigned.map_batches(filt, batch_format="pyarrow")
    return topk_cosine(cand, query, k)


# ------------------------------------------------------- product quantization

def _fx_matrix(b: pa.Table, col: str = "embedding") -> np.ndarray:
    """(n, d) int64 fixed-point view (floor(x * 1e6)) of a vector column —
    the same exactness convention as embedding_dim_stats."""
    emb = b[col]
    if isinstance(emb, pa.ChunkedArray):
        emb = emb.combine_chunks()
    import pyarrow.compute as pc

    flat = pc.list_flatten(emb).to_numpy(zero_copy_only=False).astype(np.float64)
    n = b.num_rows
    d = len(flat) // max(n, 1)
    return np.floor(flat * 1_000_000.0).astype(np.int64).reshape(n, d)


def pq_fit(sample_fx: np.ndarray, m: int = 4, ksub: int = 16,
           iters: int = 10, seed: int = 29) -> np.ndarray:
    """Product-quantizer codebooks: per-SUBSPACE k-means over the int64
    fixed-point view, with integer-floor centroid updates and exact int64
    L2 distances (ties to the lower centroid id) — every quantity is an
    integer, so engine and oracle can never drift.

    The PQ code (m uint8s per vector) is the embedding analog of the
    Gorilla tier: a lossy-but-bounded compressed representation the ANN
    literature serves search from (Jégou et al., TPAMI 2011)."""
    n, d = sample_fx.shape
    assert d % m == 0, "dim must split evenly into subspaces"
    dsub = d // m
    rng = np.random.default_rng(seed)
    cents = np.empty((m, ksub, dsub), np.int64)
    for s in range(m):
        x = sample_fx[:, s * dsub:(s + 1) * dsub]
        cent = x[rng.choice(n, size=min(ksub, n), replace=False)].copy()
        for _ in range(iters):
            d2 = (
                (x * x).sum(1, keepdims=True)
                - 2 * (x @ cent.T)
                + (cent * cent).sum(1)[None, :]
            )
            assign = np.argmin(d2, axis=1)  # first (lowest id) min wins
            for c in range(len(cent)):
                members = x[assign == c]
                if len(members):
                    cent[c] = members.sum(0) // len(members)  # floor mean
        cents[s, : len(cent)] = cent
        if len(cent) < ksub:
            cents[s, len(cent):] = cent[-1]
    return cents


def pq_encode(ds_emb, cents: np.ndarray):
    """Distributed PQ encoding: per batch, one int64 matmul per subspace
    assigns every vector its nearest codebook entry; emits the m code
    columns plus the exact total quantization error (int64)."""
    m, ksub, dsub = cents.shape
    cent_ref = ray.put(cents)

    def encode(b: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        if b.num_rows == 0:  # _fx_matrix reshape(0, -1) raises
            cols = {"vec_id": pa.array([], pa.int64())}
            for si in range(m):
                cols[f"c{si}"] = pa.array([], pa.int64())
            cols["err_fx"] = pa.array([], pa.int64())
            return pa.table(cols)
        fx = _fx_matrix(b)
        # int64-exactness guard (the class_outliers policy): per-subspace
        # d2 sums dsub squared fixed-point values — magnitudes past
        # sqrt(9e18 / dsub) / 2 would wrap and argmin a wrong codebook
        # entry with no error
        bound = int((9.0e18 / max(dsub, 1)) ** 0.5 / 2)
        if max(int(np.abs(fx).max()), int(np.abs(c).max())) > bound:
            raise OverflowError(
                f"pq_encode: |fixed-point embedding| > {bound} would "
                "overflow the exact int64 distances; rescale first")
        out = {"vec_id": pa.array(
            b["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        )}
        err = np.zeros(len(fx), np.int64)
        for s in range(m):
            x = fx[:, s * dsub:(s + 1) * dsub]
            cs = c[s]
            d2 = (
                (x * x).sum(1, keepdims=True)
                - 2 * (x @ cs.T)
                + (cs * cs).sum(1)[None, :]
            )
            code = np.argmin(d2, axis=1)
            err += d2[np.arange(len(fx)), code]
            out[f"c{s}"] = pa.array(code.astype(np.int64))
        out["err_fx"] = pa.array(err, pa.int64())
        return pa.table(out)

    return ds_emb.map_batches(encode, batch_format="pyarrow")


def pq_adc_topk(ds_emb, cents: np.ndarray, query: np.ndarray, k: int = 10):
    """Asymmetric-distance top-k over PQ codes — serving search from the
    compressed representation (the point of PQ): the query builds ONE
    integer lookup table (m × ksub subspace distances to each codebook
    entry); every corpus vector's approximate distance is then the sum of
    m table lookups on its codes.  All int64 (query in the same fixed
    point), so ranks are exact given the codes; ties break to the lower
    vec_id.  Per-batch top-k, tiny candidate merge — the corpus never
    sorts."""
    m, ksub, dsub = cents.shape
    qfx = np.floor(np.asarray(query, np.float64) * 1_000_000.0).astype(np.int64)
    lut = np.empty((m, ksub), np.int64)
    for s in range(m):
        diff = cents[s] - qfx[s * dsub:(s + 1) * dsub][None, :]
        lut[s] = (diff * diff).sum(1)
    cent_ref = ray.put(cents)
    lut_ref = ray.put(lut)

    def batch_topk(b: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        t = ray.get(lut_ref)
        fx = _fx_matrix(b)
        vid = b["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        score = np.zeros(len(fx), np.int64)
        for s in range(m):
            x = fx[:, s * dsub:(s + 1) * dsub]
            cs = c[s]
            d2 = (
                (x * x).sum(1, keepdims=True)
                - 2 * (x @ cs.T)
                + (cs * cs).sum(1)[None, :]
            )
            score += t[s][np.argmin(d2, axis=1)]
        order = np.lexsort((vid, score))[:k]
        return pa.table(
            {"vec_id": pa.array(vid[order]),
             "adc_fx": pa.array(score[order], pa.int64())}
        )

    cand = ds_emb.map_batches(batch_topk, batch_format="pyarrow")

    def merge(b: pa.Table) -> pa.Table:
        vid = b["vec_id"].to_numpy(zero_copy_only=False)
        sc = b["adc_fx"].to_numpy(zero_copy_only=False)
        order = np.lexsort((vid, sc))[:k]
        return pa.table(
            {
                "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
                "vec_id": pa.array(vid[order].astype(np.int64)),
                "adc_fx": pa.array(sc[order].astype(np.int64)),
            }
        )

    return cand.repartition(1).map_batches(
        merge, batch_format="pyarrow", batch_size=None
    )


# --------------------------------------------------------------- IVF + PQ

def build_ivfpq_index(
    ds_emb,
    index_dir: str,
    cent: np.ndarray,
    cents_pq: np.ndarray,
    min_rows_per_file: int = 100_000,
) -> str:
    """IVFADC index (Jégou et al., TPAMI 2011 — the composition both
    halves of this file build toward): PQ codes stored INSIDE the coarse
    quantizer's inverted lists, so a query touches only its probed lists
    AND never reads a raw vector — serving runs entirely off m uint8-range
    codes per vector.  One distributed pass assigns every vector its list
    (argmax against ``cent``) and its m codes (exact-int64 argmin against
    ``cents_pq``); postings are hive-partitioned by list.  Quantizers are
    fit by the caller (bounded-sample driver work, same as the separate
    IVF / PQ builds) so the oracle can re-derive them.  Idempotent via
    _SUCCESS; quantizers ride .npy sidecars."""
    marker = os.path.join(index_dir, "_SUCCESS")
    if os.path.exists(marker):
        return index_dir

    m, ksub, dsub = cents_pq.shape
    cent_ref = ray.put(cent)
    pq_ref = ray.put(cents_pq)

    def assign_encode(b: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        cp = ray.get(pq_ref)
        lists = np.argmax(_norm_rows(_emb_matrix(b)) @ c.T, axis=1)
        fx = _fx_matrix(b)
        out = {
            "list": pa.array(lists.astype(np.int64)),
            "vec_id": pa.array(
                b["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            ),
        }
        for s in range(m):
            x = fx[:, s * dsub:(s + 1) * dsub]
            cs = cp[s]
            d2 = (
                (x * x).sum(1, keepdims=True)
                - 2 * (x @ cs.T)
                + (cs * cs).sum(1)[None, :]
            )
            out[f"c{s}"] = pa.array(np.argmin(d2, axis=1).astype(np.int64))
        return pa.table(out)

    os.makedirs(index_dir, exist_ok=True)
    ds_emb.map_batches(assign_encode, batch_format="pyarrow").write_parquet(
        os.path.join(index_dir, "postings"),
        partition_cols=["list"],
        min_rows_per_file=min_rows_per_file,
    )
    np.save(os.path.join(index_dir, "centroids.npy"), cent)
    np.save(os.path.join(index_dir, "pq_cents.npy"), cents_pq)
    with open(marker, "w") as fh:
        fh.write("ok\n")
    return index_dir


def ivfpq_topk(index_dir: str, query: np.ndarray, k: int = 10,
               nprobe: int = 4):
    """ANN top-k served from the IVFADC index: probe the ``nprobe``
    nearest lists, prune-read ONLY those lists' code rows (the raw
    embedding lake is never touched), build the query's integer ADC
    lookup table once, score every candidate as m table lookups, per-batch
    top-k then a tiny merge.  All int64; ties to the lower vec_id."""
    import pyarrow.compute as pc

    from aisdb_ray.predicates import field, scan_parquet

    cent = np.load(os.path.join(index_dir, "centroids.npy"))
    cents_pq = np.load(os.path.join(index_dir, "pq_cents.npy"))
    m, ksub, dsub = cents_pq.shape
    q = query.astype(np.float64)
    qn = q / (np.linalg.norm(q) or 1.0)
    probes = sorted(int(x) for x in np.argsort(-(cent @ qn))[:nprobe])

    qfx = np.floor(q * 1_000_000.0).astype(np.int64)
    lut = np.empty((m, ksub), np.int64)
    for s in range(m):
        diff = cents_pq[s] - qfx[s * dsub:(s + 1) * dsub][None, :]
        lut[s] = (diff * diff).sum(1)
    lut_ref = ray.put(lut)

    postings = scan_parquet(
        os.path.join(index_dir, "postings"),
        where=field("list").isin(probes),
        partition_cols=["list"],
        columns=["vec_id"] + [f"c{s}" for s in range(m)],
    )

    def batch_topk(b: pa.Table) -> pa.Table:
        t = ray.get(lut_ref)
        vid = b["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        score = np.zeros(len(vid), np.int64)
        for s in range(m):
            codes = b[f"c{s}"].to_numpy(zero_copy_only=False).astype(np.int64)
            score += t[s][codes]
        order = np.lexsort((vid, score))[:k]
        return pa.table(
            {"vec_id": pa.array(vid[order]),
             "adc_fx": pa.array(score[order], pa.int64())}
        )

    cand = postings.map_batches(batch_topk, batch_format="pyarrow")

    def merge(b: pa.Table) -> pa.Table:
        vid = b["vec_id"].to_numpy(zero_copy_only=False)
        sc = b["adc_fx"].to_numpy(zero_copy_only=False)
        order = np.lexsort((vid, sc))[:k]
        return pa.table(
            {
                "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
                "vec_id": pa.array(vid[order].astype(np.int64)),
                "adc_fx": pa.array(sc[order].astype(np.int64)),
            }
        )

    return cand.repartition(1).map_batches(
        merge, batch_format="pyarrow", batch_size=None
    )


def range_search(ds_emb, query: np.ndarray, threshold: float = 0.3):
    """Cosine range query: every vector with cosine(query, v) >= threshold
    — the radius-based companion of :func:`topk_cosine` (near-duplicate
    retrieval around a probe, recall-oriented curation pulls).

    Purely map-side: the normalized query broadcasts once via ``ray.put``,
    each batch computes one float64 matmul and filters locally — no
    shuffle, no driver materialization; output is the matching ids."""
    q = query.astype(np.float64)
    q = q / (np.linalg.norm(q) or 1.0)
    q_ref = ray.put(q)

    def batch_range(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:  # _emb_matrix reshape(0, -1) raises
            return pa.table({"vec_id": pa.array([], pa.int64())})
        qv = ray.get(q_ref)
        m = _norm_rows(_emb_matrix(b))
        sims = m @ qv
        ids = b["vec_id"].to_numpy(zero_copy_only=False)
        keep = sims >= threshold
        return pa.table({"vec_id": pa.array(ids[keep].astype(np.int64))})

    return ds_emb.map_batches(batch_range, batch_format="pyarrow")


def embedding_gram(ds_emb, scale: int = 1_000_000):
    """Exact second-moment Gram matrix of the embedding lake — the
    distributed primitive under PCA / whitening / covariance estimation
    (covariance = G/n − mean·meanᵀ is a consumer-side rank-1 update using
    :func:`embedding_dim_stats`' means; the eigen-solve on the tiny d×d
    result is a driver/consumer step, not a data pass).

    Same fixed-point policy as :func:`embedding_dim_stats`: one int64
    ``FᵀF`` matmul per batch (exact — |fx| ≤ scale·|v| keeps products far
    inside int64), emitted as upper-triangle (i ≤ j) rows.  Only
    d·(d+1)/2 rows per task ever shuffle regardless of corpus size."""

    def partial(b: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "i": pa.array([], pa.int64()),
                "j": pa.array([], pa.int64()),
                "g": pa.array([], pa.int64()),
            }
        )
        if len(b) == 0:
            return empty
        m = _emb_matrix(b).astype(np.float64)
        fx = np.floor(m * scale).astype(np.int64)
        gram = fx.T @ fx
        d = gram.shape[0]
        iu, ju = np.triu_indices(d)
        return pa.table(
            {
                "i": pa.array(iu.astype(np.int64)),
                "j": pa.array(ju.astype(np.int64)),
                "g": pa.array(gram[iu, ju]),
            }
        )

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["i", "j"], use_threads=False).aggregate([("g", "sum")])
        return g.rename_columns(["i", "j", "g"])

    from aisdb_ray.stages._dist import funnel_combine

    partials = ds_emb.map_batches(partial, batch_format="pyarrow")
    # d(d+1)/2 rows total: the funnel block IS the result size
    return funnel_combine(partials, combine)


def label_centroids(ds_emb, scale: int = 1_000_000):
    """Per-label centroid evidence: (label, dim, n, sum_fx) with the same
    fixed-point convention as :func:`embedding_dim_stats` — the exact
    integer sufficient statistics of each class centroid (mean = the
    consumer's one division).  Algebraic partials bounded by
    labels × dims per batch; one small funnel combine."""
    from aisdb_ray.stages._dist import funnel_combine

    def partial(b: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "label": pa.array([], pa.int64()),
                "dim": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "sum_fx": pa.array([], pa.int64()),
            }
        )
        if len(b) == 0:
            return empty
        m = _emb_matrix(b)
        fx = np.floor(m * scale).astype(np.int64)
        lab = b["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(lab, kind="stable")
        ls, fxs = lab[order], fx[order]
        starts = np.flatnonzero(np.r_[True, ls[1:] != ls[:-1]])
        bounds = np.r_[starts, len(ls)]
        d = fx.shape[1]
        out_l, out_n, out_s = [], [], []
        for b0, b1 in zip(bounds[:-1], bounds[1:]):
            out_l.append(ls[b0])
            out_n.append(b1 - b0)
            out_s.append(fxs[b0:b1].sum(axis=0, dtype=np.int64))
        L = len(out_l)
        return pa.table(
            {
                "label": pa.array(np.repeat(out_l, d).astype(np.int64)),
                "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), L)),
                "n": pa.array(np.repeat(out_n, d).astype(np.int64)),
                "sum_fx": pa.array(np.concatenate(out_s)),
            }
        )

    def merge(b: pa.Table) -> pa.Table:
        g = b.group_by(["label", "dim"], use_threads=False).aggregate(
            [("n", "sum"), ("sum_fx", "sum")]
        )
        return g.rename_columns(["label", "dim", "n", "sum_fx"])

    return funnel_combine(ds_emb.map_batches(partial, batch_format="pyarrow"), merge)


def centroid_classify(ds_emb, scale: int = 1_000_000):
    """Nearest-class-centroid serving: assign every vector to the label
    whose class MEAN it has the largest inner product with (ties → the
    smallest label) — the cheapest supervised consumer of the embedding
    lake, and the evaluation pass behind prototype/centroid classifiers.

    Float determinism: scores are the exact int64 dot product
    ``x_fx · S_label`` divided ONCE by the class count — both operands
    exact integers, so the IEEE division matches DuckDB bit-for-bit (the
    BM25/odds-idf contract).  The int64 dot is overflow-guarded.

    Shape: the centroid table is labels × dims — tiny — computed by
    :func:`label_centroids` and broadcast via ``ray.put``; classification
    is a single map-only matmul pass, no shuffle."""
    import ray

    cent = label_centroids(ds_emb, scale).to_pandas()
    labels = np.sort(cent["label"].unique()).astype(np.int64)
    d = int(cent["dim"].max()) + 1 if len(cent) else 0
    S = np.zeros((len(labels), d), dtype=np.int64)
    n_of = np.zeros(len(labels), dtype=np.int64)
    pos = {int(l): i for i, l in enumerate(labels)}
    for lab, grp in cent.groupby("label"):
        i = pos[int(lab)]
        S[i, grp["dim"].to_numpy()] = grp["sum_fx"].to_numpy()
        n_of[i] = int(grp["n"].iloc[0])
    ref = ray.put((labels, S, n_of))

    def classify(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        empty = pa.table(
            {
                "vec_id": pa.array([], pa.int64()),
                "pred_label": pa.array([], pa.int64()),
                "score": pa.array([], pa.float64()),
            }
        )
        if len(b) == 0:
            return empty
        labs, Sm, nn = ray.get(ref)
        m = _emb_matrix(b)
        fx = np.floor(m * scale).astype(np.int64)
        if len(labs) and fx.size:
            bound = (
                int(np.abs(fx).max() or 1)
                * int(np.abs(Sm).max() or 1)
                * fx.shape[1]
            )
            if bound >= (1 << 62):
                raise OverflowError("centroid dot product would overflow int64")
        dots = fx @ Sm.T  # exact int64
        scores = dots.astype(np.float64) / nn.astype(np.float64)
        # argmax with ties -> smallest label: labels are sorted ascending,
        # argmax returns the first (= smallest-label) maximum
        best = np.argmax(scores, axis=1)
        rows = np.arange(len(best))
        return pa.table(
            {
                "vec_id": pc.cast(b["vec_id"], pa.int64()),
                "pred_label": pa.array(labs[best]),
                "score": pa.array(scores[rows, best]),
            }
        )

    return ds_emb.map_batches(classify, batch_format="pyarrow")


def knn_graph(sf_emb_path: str, k: int = 5, target_block_rows: int = 65_536):
    """Exact k-nearest-neighbor graph over the embedding lake: for EVERY
    vector, its top-k cosine neighbors (self excluded, ties → smaller
    neighbor id) — the similarity-graph primitive behind graph-based
    dedup/clustering (and the all-queries generalization of
    :func:`topk_cosine`).

    Shape: the same block-pair matmul tiling as
    dedup_text.embedding_neardup_pairs — every (block_i, block_j ≥ i)
    tile is one task — but each tile emits only its LOCAL top-k rows per
    vector (k rows per vector per tile, both directions of an off-diagonal
    tile), so candidate volume is n·k·nblocks, never n².  One vec_id-keyed
    co-shuffle then merges candidates into the global top-k per vector.
    Output: (vec_id, rank, nbr_id)."""
    import ray
    import ray.data as rd

    from aisdb_ray.stages._dist import co_shuffle

    ds = rd.read_parquet(sf_emb_path, columns=["vec_id", "embedding"])
    nrows = ds.count()
    nblocks = max(1, min(64, nrows // max(1, target_block_rows)))
    mat = ds.repartition(nblocks).materialize()
    refs = mat.to_arrow_refs()
    tiles = [(i, j) for i in range(len(refs)) for j in range(i, len(refs))]

    def norm_block(tbl: pa.Table):
        ids = tbl["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        if tbl.num_rows == 0:  # reshape(0, -1) cannot infer a dimension
            return ids, np.zeros((0, 1), np.float64)
        emb = tbl["embedding"].combine_chunks()
        m = emb.values.to_numpy().reshape(tbl.num_rows, -1).astype(np.float64)
        n = np.linalg.norm(m, axis=1, keepdims=True)
        n[n == 0] = 1.0
        return ids, m / n

    def local_topk(ids_q, ids_c, sims):
        """Per-row local top-k of a sims matrix (queries × candidates)."""
        kk = min(k, sims.shape[1])
        if kk <= 0 or sims.shape[0] == 0:
            return None
        part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        # boundary-tie repair: a row whose kk-th best score also appears
        # OUTSIDE the partition kept an arbitrary tied subset — redo just
        # those rows with the deterministic (sim desc, id asc) rule
        thr = sims[np.arange(len(sims))[:, None], part].min(axis=1)
        bad = np.flatnonzero((sims >= thr[:, None]).sum(axis=1) > kk)
        if len(bad):
            csort = np.argsort(ids_c, kind="stable")
            for r in bad:
                ordr = np.argsort(-sims[r, csort], kind="stable")[:kk]
                part[r] = csort[ordr]
        rows = np.repeat(np.arange(sims.shape[0]), kk)
        cols = part.ravel()
        return (
            np.repeat(ids_q, kk),
            ids_c[cols],
            sims[rows, cols],
        )

    def tile_topk(batch: pa.Table) -> pa.Table:
        va, nb, sm = [], [], []
        for i, j in zip(batch["i"].to_pylist(), batch["j"].to_pylist()):
            ids_i, mi = norm_block(ray.get(refs[i]))
            ids_j, mj = norm_block(ray.get(refs[j]))
            if len(ids_i) == 0 or len(ids_j) == 0:
                continue
            sims = mi @ mj.T
            if i == j:
                np.fill_diagonal(sims, -np.inf)
            r = local_topk(ids_i, ids_j, sims)
            if r is not None:
                va.append(r[0]); nb.append(r[1]); sm.append(r[2])
            if i != j:
                r = local_topk(ids_j, ids_i, sims.T)
                if r is not None:
                    va.append(r[0]); nb.append(r[1]); sm.append(r[2])
        if not va:
            return pa.table(
                {
                    "vec_id": pa.array([], pa.int64()),
                    "nbr_id": pa.array([], pa.int64()),
                    "sim": pa.array([], pa.float64()),
                }
            )
        return pa.table(
            {
                "vec_id": pa.array(np.concatenate(va)),
                "nbr_id": pa.array(np.concatenate(nb)),
                "sim": pa.array(np.concatenate(sm)),
            }
        )

    items = rd.from_items(
        [{"i": i, "j": j} for i, j in tiles], override_num_blocks=len(tiles)
    )
    cands = items.map_batches(tile_topk, batch_format="pyarrow", batch_size=None)

    def merge(part: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "vec_id": pa.array([], pa.int64()),
                "rank": pa.array([], pa.int64()),
                "nbr_id": pa.array([], pa.int64()),
            }
        )
        if part.num_rows == 0:
            return empty
        v = part["vec_id"].to_numpy(zero_copy_only=False)
        b = part["nbr_id"].to_numpy(zero_copy_only=False)
        s = part["sim"].to_numpy(zero_copy_only=False)
        order = np.lexsort((b, -s, v))
        vs, bs = v[order], b[order]
        first = np.r_[True, vs[1:] != vs[:-1]]
        grp_start = np.maximum.accumulate(np.where(first, np.arange(len(vs)), 0))
        rank = np.arange(len(vs)) - grp_start + 1
        keep = rank <= k
        return pa.table(
            {
                "vec_id": pa.array(vs[keep]),
                "rank": pa.array(rank[keep].astype(np.int64)),
                "nbr_id": pa.array(bs[keep]),
            }
        )

    return co_shuffle(cands, ["vec_id"], merge)


def sq8_adc_topk(ds_emb, query: np.ndarray, k: int = 10, scale: int = 1_000_000):
    """Top-k by inner product served from the SQ8 scalar-quantized tier
    (the SQ counterpart of :func:`pq_adc_topk`): every vector is scored
    against its 8-bit reconstruction, kept EXACT by working in the
    255-scaled integer domain —

        score255(v) = Σ_d q_fx[d] · (255·mn[d] + code[v,d]·rng[d])

    with q_fx the fixed-point query, mn/rng the per-dimension ranges and
    code the SQ8 code; all operands int64 (overflow-guarded), so Ray and
    the SQL oracle agree bit-for-bit.  Ties → smaller vec_id.

    Shape: the d-row range table and the query broadcast once; per batch
    one integer matmul and a local top-k — only k rows leave each task."""
    import ray

    stats = embedding_dim_stats(ds_emb, scale).to_pandas()
    d = len(stats)
    mn = np.zeros(d, np.int64)
    mx = np.zeros(d, np.int64)
    mn[stats["dim"].to_numpy()] = stats["min_fx"].to_numpy()
    mx[stats["dim"].to_numpy()] = stats["max_fx"].to_numpy()
    rng = mx - mn
    rng[rng == 0] = 1
    qfx = np.floor(np.asarray(query, dtype=np.float64) * scale).astype(np.int64)
    bound = int(np.abs(qfx).max() or 1) * int(
        (255 * np.abs(mn) + 255 * rng).max() or 1
    ) * d
    if bound >= (1 << 62):
        raise OverflowError("sq8 score would overflow int64")
    ref = ray.put((qfx, mn, rng))

    def score(b: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "vec_id": pa.array([], pa.int64()),
                "score255": pa.array([], pa.int64()),
            }
        )
        if b.num_rows == 0:
            return empty
        qv, mn_v, rng_v = ray.get(ref)
        m = _emb_matrix(b)
        fx = np.floor(m * scale).astype(np.int64)
        code = ((fx - mn_v) * 255) // rng_v
        recon255 = 255 * mn_v + code * rng_v
        s = recon255 @ qv  # exact int64
        ids = b["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        idx = _topk_det(s, ids, k)  # integer scores tie often: exact sets
        return pa.table(
            {"vec_id": pa.array(ids[idx]), "score255": pa.array(s[idx])}
        )

    partial = ds_emb.map_batches(score, batch_format="pyarrow")

    def merge(b: pa.Table) -> pa.Table:
        ids = b["vec_id"].to_numpy(zero_copy_only=False)
        s = b["score255"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -s))[:k]
        return pa.table(
            {
                "rank": pa.array(
                    np.arange(1, len(order) + 1, dtype=np.int64)
                ),
                "vec_id": pa.array(ids[order].astype(np.int64)),
                "score255": pa.array(s[order].astype(np.int64)),
            }
        )

    return partial.repartition(1).map_batches(
        merge, batch_format="pyarrow", batch_size=None
    )


def mmr_rerank(emb_path: str, k: int = 10, pool: int = 30, probe_id: int = 0,
               lam_num: int = 7, lam_comp: int = 3):
    """MMR diversified re-ranking (Carbonell & Goldstein 1998) with
    float-free selection: 10x-scaled score

        m(d) = lam_num * s(q, d)  -  lam_comp * max_{p in S} s(d, p)

    over the exact int64 fixed-point inner product s (floor(x*1e6) per
    dim, |dot| <= d * 1e12 — int64-safe for d << 9e6), so every argmax the
    greedy selection takes compares integers and a SQL recursive-CTE
    oracle reproduces the identical picks.  Ties break toward the smaller
    vec_id; the first pick is pure relevance (empty diversity term).

    Distribution shape: the relevance scan is the topk_cosine pattern
    (per-batch int64 matvec, per-batch top-``pool``, one bounded merge);
    only the ``pool`` candidate rows and their vectors (a filtered parquet
    point-read) ever reach the driver, where the O(pool^2 * k) greedy loop
    is negligible.
    """
    import pyarrow.parquet as pq

    import ray.data as rd

    probe = pq.read_table(
        emb_path, columns=["vec_id", "embedding"],
        filters=[("vec_id", "==", probe_id)],
    )
    qfx = _fx_matrix(probe)[0]

    ds = rd.read_parquet(emb_path, columns=["vec_id", "embedding"])

    def batch_dots(b: pa.Table) -> pa.Table:
        ids = b["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = ids != probe_id
        if not keep.any():
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "dq": pa.array([], pa.int64())})
        fx = _fx_matrix(b)[keep]
        ids = ids[keep]
        d = fx @ qfx
        idx = _topk_det(d, ids, pool)  # integer dots tie often
        return pa.table({"vec_id": pa.array(ids[idx]),
                         "dq": pa.array(d[idx].astype(np.int64))})

    def merge(b: pa.Table) -> pa.Table:
        ids = b["vec_id"].to_numpy(zero_copy_only=False)
        d = b["dq"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -d))[:pool]
        return pa.table({"vec_id": pa.array(ids[order]),
                         "dq": pa.array(d[order])})

    cand = (
        ds.map_batches(batch_dots, batch_format="pyarrow")
        .repartition(1)
        .map_batches(merge, batch_format="pyarrow", batch_size=None)
        .take_all()
    )  # pool-bounded
    ids = [int(r["vec_id"]) for r in cand]
    dq = {int(r["vec_id"]): int(r["dq"]) for r in cand}
    vecs = pq.read_table(
        emb_path, columns=["vec_id", "embedding"],
        filters=[("vec_id", "in", ids)],
    )
    vfx = _fx_matrix(vecs)
    vids = vecs["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    row_of = {int(v): i for i, v in enumerate(vids)}
    gram = vfx @ vfx.T  # exact int64 pairwise dots

    picked: list[int] = []
    scores: list[int] = []
    remaining = sorted(ids)
    for _ in range(min(k, len(ids))):
        best_id, best_m = None, None
        for d in remaining:
            rel = lam_num * dq[d]
            if picked:
                div = max(int(gram[row_of[d], row_of[p]]) for p in picked)
                m = rel - lam_comp * div
            else:
                m = rel
            if best_m is None or m > best_m:
                best_id, best_m = d, m
        picked.append(best_id)
        scores.append(int(best_m))
        remaining.remove(best_id)

    return pa.table({
        "rank": pa.array(np.arange(1, len(picked) + 1, dtype=np.int64)),
        "vec_id": pa.array(picked, pa.int64()),
        "mmr_score": pa.array(scores, pa.int64()),
    })


def class_outliers(ds_emb, k: int = 3, scale: int = 1_000_000):
    """Per-label intra-class outliers: the k vectors farthest from their
    class centroid, scored by the EXACT integer

        score = sum_d (n_l * fx_d  -  s_{l,d})**2   ==  n_l**2 * ||x - c_l||**2

    (cross-multiplying the centroid division away keeps everything int64:
    |n*fx| <= n*1e6, squared and summed over d — guard below).  The
    mislabeled-point / label-noise sweep a curation pipeline runs before
    training on labeled embeddings.  Centroid evidence is labels x dims
    bounded and broadcasts once; scoring is map-only; only k rows per
    label survive the top-k partials."""
    import ray

    from aisdb_ray.stages import rank

    cent = label_centroids(ds_emb, scale=scale).take_all()
    n_of: dict[int, int] = {}
    s_of: dict[int, dict[int, int]] = {}
    for r in cent:
        lab = int(r["label"])
        n_of[lab] = int(r["n"])
        s_of.setdefault(lab, {})[int(r["dim"])] = int(r["sum_fx"])
    dims = 1 + max(d for m in s_of.values() for d in m)
    svec = {lab: np.array([m.get(d, 0) for d in range(dims)], np.int64)
            for lab, m in s_of.items()}
    n_max = max(n_of.values()) if n_of else 0
    smax = max((int(np.abs(v).max()) for v in svec.values() if v.size),
               default=0)
    bcast = ray.put((n_of, svec))

    def score(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return pa.table({
                "label": pa.array([], pa.int64()),
                "vec_id": pa.array([], pa.int64()),
                "score": pa.array([], pa.int64()),
            })
        nd, sd = ray.get(bcast)
        fx = _fx_matrix(b)
        lab = b["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        ids = b["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = np.array([nd[int(x)] for x in lab], np.int64)[:, None]
        s = np.stack([sd[int(x)] for x in lab])
        # exact overflow guard from the ACTUAL data: |diff| <= n·max|fx| +
        # max|s| (the old driver-side check assumed |embedding| <= 1, i.e.
        # |fx| <= scale — silently wrong for unnormalized vectors)
        fmax = int(np.abs(fx).max()) if fx.size else 0
        bound = int(n.max()) * fmax + smax if len(n) else 0
        if bound and fx.shape[1] * bound * bound >= (1 << 63):
            raise OverflowError(
                "class_outliers: n*fx square-sum would overflow int64 — "
                "rescale the embeddings or lower `scale`"
            )
        diff = n * fx - s
        sc = np.einsum("ij,ij->i", diff, diff)
        return pa.table({
            "label": pa.array(lab),
            "vec_id": pa.array(ids),
            "score": pa.array(sc.astype(np.int64)),
        })

    scored = ds_emb.map_batches(score, batch_format="pyarrow")
    return rank.topk_per_group(
        scored, "label", ["score", "vec_id"], k, descending=[True, False]
    )
