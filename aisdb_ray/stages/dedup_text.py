"""Deduplication family for training corpora.

- exact dedup: content-hash keep-first (the PK ``ON CONFLICT DO NOTHING``
  semantics of /root/reference/aisdb/aisdb_sql/insert_dynamic_clusteredidx.sql:16,
  generalized to document content).
- MinHash + LSH near-dup: shingle -> 64-perm MinHash (actor pool) ->
  band-bucket groupby -> candidate pairs -> exact Jaccard verify.
- SimHash near-dup: 64-bit signatures, banded by 16-bit chunks, verified by
  Hamming distance.
- embedding-cosine near-dup: all-pairs cosine over a broadcast matrix
  (brute force at test scale; the LSH/IVF bucketing in stages/ann.py is the
  scale path).

All candidate generation is a groupby on (band, key-hash): only signatures
shuffle, never documents.  Pair verification re-reads just the candidate
documents' signatures/shingles (broadcast via ``ray.put`` — the small-side
join pattern, SURVEY.md §2.4 J2).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from aisdb_ray.functions import text as T


# ------------------------------------------------------------- exact dedup

def keep_first(ds, key_col: str, order_col: str):
    """(key, min(order)) per key — vectorized partial+final combine."""

    def partial(b: pa.Table) -> pa.Table:
        g = (
            pa.table({key_col: b[key_col], order_col: b[order_col]})
            .group_by([key_col], use_threads=False)
            .aggregate([(order_col, "min")])
        )
        return g.rename_columns([key_col, order_col])

    local = ds.map_batches(partial, batch_format="pyarrow")
    return local.repartition(1).map_batches(
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
    sig = batch["sig"].combine_chunks()
    flat = sig.values.to_numpy().reshape(batch.num_rows, -1).astype(np.uint64)
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


def _bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
    ids = np.sort(g["doc_id"].to_numpy())
    if len(ids) < 2:
        return pd.DataFrame({"a": [], "b": []})
    a, b = np.triu_indices(len(ids), k=1)
    return pd.DataFrame({"a": ids[a], "b": ids[b]})


def minhash_candidates(ds_docs, n_bands: int = 16, rows_per_band: int = 4,
                       concurrency: int = 8):
    """documents -> distinct candidate pairs (a < b) via banded MinHash."""
    sigs = ds_docs.map_batches(
        MinHashSig, batch_format="pyarrow", concurrency=(1, concurrency),
        batch_size=1024,
    )
    bands = sigs.map_batches(
        lambda b: _explode_bands(b, n_bands, rows_per_band),
        batch_format="pyarrow",
    )
    pairs = bands.groupby(["band", "bucket"]).map_groups(
        _bucket_pairs, batch_format="pandas"
    )
    # distinct pairs via the keep-first combine on a fused key
    def fuse(b: pa.Table) -> pa.Table:
        a = b["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        bb = b["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"pair": pa.array(a * np.int64(1 << 31) + bb), "a": pa.array(a), "b": pa.array(bb)})

    fused = pairs.map_batches(fuse, batch_format="pyarrow")
    def dedup_pairs(b: pa.Table) -> pa.Table:
        g = b.group_by(["pair"], use_threads=False).aggregate(
            [("a", "min"), ("b", "min")]
        )
        return g.rename_columns(["pair", "a", "b"])
    local = fused.map_batches(dedup_pairs, batch_format="pyarrow")
    return local.repartition(1).map_batches(
        dedup_pairs, batch_format="pyarrow", batch_size=None
    )


def minhash_dedup_pairs(sf_docs_path: str, jaccard_threshold: float = 0.7,
                        n_bands: int = 16, rows_per_band: int = 4):
    """Full near-dup pipeline: candidates -> exact shingle-Jaccard verify.

    Verification broadcasts the shingle sets of candidate docs only (small
    side), never reshuffling the corpus.
    """
    import ray.data as rd

    docs = rd.read_parquet(sf_docs_path, columns=["doc_id", "text"])
    cands = minhash_candidates(docs, n_bands, rows_per_band)
    cand_tbl = cands.to_pandas()
    if len(cand_tbl) == 0:
        return pa.table(
            {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
             "jaccard": pa.array([], pa.float64())}
        )
    needed = sorted(set(cand_tbl["a"]) | set(cand_tbl["b"]))
    need_ref = ray.put(set(needed))

    def shingles_of(b: pa.Table) -> pa.Table:
        need = ray.get(need_ref)
        ids, sh = [], []
        for i in range(b.num_rows):
            d = b["doc_id"][i].as_py()
            if d in need:
                ids.append(d)
                sh.append(
                    T.shingle_hashes(T.words(b["text"][i].as_py())).astype(np.int64)
                )
        if not ids:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "sh": pa.array([], pa.list_(pa.int64()))})
        off = np.zeros(len(sh) + 1, dtype=np.int32)
        np.cumsum([len(x) for x in sh], out=off[1:])
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()),
             "sh": pa.ListArray.from_arrays(pa.array(off), pa.array(np.concatenate(sh)))}
        )

    sh_tbl = docs.map_batches(shingles_of, batch_format="pyarrow").to_pandas()
    sh_map = {d: np.asarray(s, dtype=np.uint64) for d, s in
              zip(sh_tbl["doc_id"], sh_tbl["sh"])}
    out_a, out_b, out_j = [], [], []
    for a, b in zip(cand_tbl["a"], cand_tbl["b"]):
        j = T.jaccard(sh_map[a], sh_map[b])
        if j >= jaccard_threshold:
            out_a.append(a)
            out_b.append(b)
            out_j.append(round(j, 6))
    return pa.table(
        {"a": pa.array(out_a, pa.int64()), "b": pa.array(out_b, pa.int64()),
         "jaccard": pa.array(out_j, pa.float64())}
    )


# --------------------------------------------------------------- SimHash

class SimHashSig:
    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        sigs = np.array([T.simhash64(T.words(t)) for t in texts], dtype=np.uint64)
        return pa.table(
            {"doc_id": batch["doc_id"], "simhash": pa.array(sigs.astype(np.int64))}
        )


def simhash_pairs(sf_docs_path: str, max_hamming: int = 8, concurrency: int = 8):
    """Near-dup pairs by SimHash: band the 64 bits into 4 x 16-bit chunks
    (any pair within Hamming<=3*16 shares >=1 exact chunk — standard
    pigeonhole banding), then verify exact Hamming distance."""
    import ray.data as rd

    docs = rd.read_parquet(sf_docs_path, columns=["doc_id", "text"])
    sigs = docs.map_batches(
        SimHashSig, batch_format="pyarrow", concurrency=(1, concurrency),
        batch_size=1024,
    ).to_pandas()
    h = sigs["simhash"].to_numpy().astype(np.uint64)
    ids = sigs["doc_id"].to_numpy()
    # banding (vectorized candidate generation at driver scale; at corpus
    # scale this becomes the same explode->groupby shape as MinHash)
    cands = set()
    for b in range(4):
        chunk = (h >> np.uint64(16 * b)) & np.uint64(0xFFFF)
        order = np.argsort(chunk, kind="stable")
        cs, ci = chunk[order], ids[order]
        first = np.flatnonzero(np.r_[True, cs[1:] != cs[:-1]])
        bounds = np.r_[first, len(cs)]
        for x, y in zip(bounds[:-1], bounds[1:]):
            if y - x > 1:
                grp = np.sort(ci[x:y])
                for i in range(len(grp)):
                    for j in range(i + 1, len(grp)):
                        cands.add((int(grp[i]), int(grp[j])))
    sig_map = dict(zip(ids.tolist(), h.tolist()))
    rows = [
        (a, b, int(T.hamming64(np.uint64(sig_map[a]), np.uint64(sig_map[b]))))
        for a, b in sorted(cands)
    ]
    rows = [(a, b, d) for a, b, d in rows if d <= max_hamming]
    return pa.table(
        {
            "a": pa.array([r[0] for r in rows], pa.int64()),
            "b": pa.array([r[1] for r in rows], pa.int64()),
            "hamming": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


# ------------------------------------------- embedding-cosine near-dup

def embedding_neardup_pairs(sf_emb_path: str, threshold: float = 0.95):
    """All pairs (a < b) with cosine similarity >= threshold.

    Brute force over a broadcast float64 matrix per batch (numpy matmul);
    at corpus scale the IVF/LSH bucketing in stages/ann.py prunes the
    candidate space first.
    """
    import ray.data as rd

    ds = rd.read_parquet(sf_emb_path, columns=["vec_id", "embedding"])
    all_tbl = ds.to_pandas()
    ids = all_tbl["vec_id"].to_numpy()
    m = np.stack([np.asarray(e, dtype=np.float64) for e in all_tbl["embedding"]])
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    mat_ref = ray.put((ids, m))

    def batch_pairs(b: pa.Table) -> pa.Table:
        all_ids, all_m = ray.get(mat_ref)
        emb = b["embedding"].combine_chunks()
        q = emb.values.to_numpy().reshape(b.num_rows, -1).astype(np.float64)
        q = q / np.linalg.norm(q, axis=1, keepdims=True)
        qid = b["vec_id"].to_numpy(zero_copy_only=False)
        sims = q @ all_m.T
        keep_i, keep_j = np.nonzero(sims >= threshold)
        a = qid[keep_i]
        bb = all_ids[keep_j]
        mask = a < bb
        return pa.table(
            {
                "a": pa.array(a[mask].astype(np.int64)),
                "b": pa.array(bb[mask].astype(np.int64)),
                "cosine": pa.array(np.round(sims[keep_i, keep_j][mask], 4)),
            }
        )

    return ds.map_batches(batch_pairs, batch_format="pyarrow")
