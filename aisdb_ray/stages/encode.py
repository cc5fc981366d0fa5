"""Embedding-PRODUCING inference stage: a model-in-actor encoder.

Everything else in the embedding family (ann.py, dedup_text.py) CONSUMES a
precomputed embedding column; a training-data pipeline also produces one.
This stage is the Ray-native shape for that: the "model" is loaded once per
actor in ``__init__`` and applied as a batch matmul in ``__call__`` — the
reference's heavyweight-state precedent is the denoising encoder actor
(/root/reference/aisdb/denoising_encoder.py:262-337), which loads weights
once and scores batches.

The model itself is deliberately a deterministic PUBLIC construction (no
weights shipped, nothing to download): a hashing-trick bag-of-words
(md5-low-64 word hash mod ``n_features`` buckets) followed by a seeded
random projection with INTEGER weights.  Integer weights make the encoder
exactly reproducible in SQL — the projection matrix embeds as literals in
the oracle (same trick as the PQ codebooks, ann.py) and int64 sums are
order-independent, so the driver's hash gate verifies the whole inference
stage end-to-end.  Swapping in a real sentence encoder changes ONLY
``__init__`` (load weights) and the matmul dtype; the Ray plumbing — actor
pool, batch size, zero-copy Arrow in/out — is the production shape.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from aisdb_ray.functions import text as T

ENC_SEED = 20240601
N_FEATURES = 64   # hashing-trick bucket count
N_DIMS = 16       # output embedding width


def encode_matrix(seed: int = ENC_SEED, n_features: int = N_FEATURES,
                  n_dims: int = N_DIMS) -> np.ndarray:
    """The (n_features × n_dims) integer projection — the 'model weights'.
    Small integer range keeps every partial sum exactly representable and
    the SQL literal table compact."""
    rng = np.random.default_rng(seed)
    return rng.integers(-9, 10, size=(n_features, n_dims), dtype=np.int64)


class Encoder:
    """Actor-pool encoder: text -> int64 embedding, one matmul per batch.

    ``__init__`` runs once per actor (model load + per-actor md5 memo);
    ``__call__`` is fully vectorized: one Arrow split pass, md5 only per
    UNIQUE word per batch (corpora repeat words heavily), one bincount and
    one int64 matmul.
    """

    def __init__(self, seed: int = ENC_SEED, n_features: int = N_FEATURES,
                 n_dims: int = N_DIMS):
        self.w = encode_matrix(seed, n_features, n_dims)
        self.n_features = n_features
        self.n_dims = n_dims

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        f = self.n_features
        if n == 0:
            y = np.zeros((0, self.n_dims), dtype=np.int64)
        else:
            wordlists = pc.split_pattern_regex(batch["text"], pattern=r"\s+")
            flat = pc.list_flatten(wordlists)
            parent = pc.list_parent_indices(wordlists).to_numpy(
                zero_copy_only=False
            )
            # split() emits empty strings at text edges; \S+ extraction does
            # not — drop them so the feature set matches the SQL oracle's
            # regexp_extract_all(text, '\S+')
            nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
            words = np.asarray(flat.to_pylist(), dtype=object)[nonempty]
            parent = parent[nonempty]
            uniq, inv = np.unique(words, return_inverse=True)
            hu = T.word_hashes(list(uniq))  # md5 low-64, memoized per actor
            bucket = (hu % np.uint64(f)).astype(np.int64)[inv]
            counts = np.bincount(
                parent.astype(np.int64) * f + bucket, minlength=n * f
            ).reshape(n, f)
            y = counts @ self.w
        cols = {"doc_id": batch["doc_id"]}
        for d in range(self.n_dims):
            cols[f"e{d:02d}"] = pa.array(y[:, d], pa.int64())
        return pa.table(cols)


def encode_documents(ds, concurrency: int = 8, batch_size: int = 512,
                     seed: int = ENC_SEED):
    """documents (doc_id, text) -> (doc_id, e00..e{D-1}) via the actor pool."""
    return ds.map_batches(
        Encoder,
        fn_constructor_kwargs={"seed": seed},
        batch_format="pyarrow",
        concurrency=(1, concurrency),
        batch_size=batch_size,
    )


def encode_sql(docs_table: str = "documents", seed: int = ENC_SEED,
               n_features: int = N_FEATURES, n_dims: int = N_DIMS) -> str:
    """The oracle: re-derives the exact encoder output in SQL with the
    projection matrix embedded as literals (word -> md5-low-64 bucket ->
    count -> integer matmul).  DuckDB's ('0x'||substr(md5(w),1,16))::UBIGINT
    equals python md5 digest[:8] big-endian."""
    w = encode_matrix(seed, n_features, n_dims)
    vals = ", ".join(
        f"({b}, {d}, {int(w[b, d])})"
        for b in range(n_features) for d in range(n_dims)
    )
    dim_cols = ",\n       ".join(
        f"COALESCE(max(CASE WHEN y.d = {d} THEN y.val END), 0) AS e{d:02d}"
        for d in range(n_dims)
    )
    return f"""WITH wd AS (
    SELECT doc_id,
           CAST(CAST('0x' || substr(md5(t.w), 1, 16) AS UBIGINT)
                % {n_features} AS BIGINT) AS b
    FROM {docs_table}, LATERAL unnest(regexp_extract_all(text, '\\S+')) AS t(w)
  ),
  cnt AS (SELECT doc_id, b, count(*)::BIGINT AS c FROM wd GROUP BY doc_id, b),
  wm(b, d, v) AS (VALUES {vals}),
  yy AS (
    SELECT c.doc_id, m.d, sum(c.c * m.v)::BIGINT AS val
    FROM cnt c JOIN wm m ON m.b = c.b
    GROUP BY c.doc_id, m.d
  )
SELECT doc.doc_id, {dim_cols}
FROM {docs_table} doc LEFT JOIN yy y ON y.doc_id = doc.doc_id
GROUP BY doc.doc_id"""
