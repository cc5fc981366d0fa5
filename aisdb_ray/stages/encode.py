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

from aisdb_ray.functions.codes import factorize_sorted

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
            words = flat.to_numpy(zero_copy_only=False)[nonempty]
            parent = parent[nonempty]
            uniq, inv = factorize_sorted(words)
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


def mips_queries(seed: int = ENC_SEED + 1, n_queries: int = 4,
                 n_dims: int = N_DIMS) -> np.ndarray:
    """Deterministic integer query vectors for the MIPS serving path."""
    rng = np.random.default_rng(seed)
    return rng.integers(-9, 10, size=(n_queries, n_dims), dtype=np.int64)


def mips_topk(ds, queries: np.ndarray, k: int = 8):
    """Exact max-inner-product top-k over PRODUCED embeddings — the
    inference stage composed with the ANN serving family: per-batch
    integer score matmul + partial top-k (O(n_q·k) rows leave each task),
    then one small funnel pick.  Ties break to the smaller doc_id, so the
    result is hash-exact vs the SQL window restatement."""
    from aisdb_ray.stages._dist import funnel_combine

    q = np.asarray(queries, dtype=np.int64)
    n_q, n_dims = q.shape

    def pick(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        scores = b["score"].to_numpy(zero_copy_only=False)
        qids = b["qid"].to_numpy(zero_copy_only=False)
        out_idx = []
        for qi in range(n_q):
            rows = np.flatnonzero(qids == qi)
            order = rows[np.lexsort((ids[rows], -scores[rows]))][:k]
            out_idx.append(order)
        sel = np.concatenate(out_idx) if out_idx else np.array([], np.int64)
        return b.take(pa.array(sel))

    def score_batch(b: pa.Table) -> pa.Table:
        n = b.num_rows
        y = np.empty((n, n_dims), dtype=np.int64)
        for d in range(n_dims):
            y[:, d] = b[f"e{d:02d}"].to_numpy(zero_copy_only=False)
        s = y @ q.T  # (n, n_q) integer scores — exact in any order
        t = pa.table(
            {
                "qid": pa.array(np.repeat(np.arange(n_q, dtype=np.int64), n)),
                "doc_id": pa.concat_arrays(
                    [b["doc_id"].combine_chunks()] * n_q
                ),
                "score": pa.array(s.T.reshape(-1), pa.int64()),
            }
        )
        return pick(t)

    partials = ds.map_batches(score_batch, batch_format="pyarrow")
    return funnel_combine(partials, pick)


def mips_topk_sql(queries: np.ndarray, k: int = 8,
                  docs_table: str = "documents", seed: int = ENC_SEED) -> str:
    """SQL restatement: replay the encoder, score each embedded query
    vector, window top-k with the identical tie rule."""
    q = np.asarray(queries, dtype=np.int64)
    enc = encode_sql(docs_table, seed)
    selects = []
    for qi in range(q.shape[0]):
        expr = " + ".join(
            f"e{d:02d} * ({int(q[qi, d])})" for d in range(q.shape[1])
        )
        selects.append(
            f"SELECT {qi} AS qid, doc_id, CAST({expr} AS BIGINT) AS score FROM enc"
        )
    union = "\n  UNION ALL ".join(selects)
    return f"""WITH enc AS ({enc}),
  scored AS ({union})
SELECT qid, doc_id, score FROM (
  SELECT *, row_number() OVER (
      PARTITION BY qid ORDER BY score DESC, doc_id ASC) AS rn
  FROM scored
) WHERE rn <= {k}"""


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
    # Keyed by a per-ROW surrogate (rid), not doc_id: the engine encodes
    # every input row independently, so a corpus with duplicate doc_ids
    # must yield one embedding per ROW — grouping by doc_id would merge
    # both rows' word counts into a single wrong embedding.  rid
    # assignment order is arbitrary but the emitted (doc_id, e*) multiset
    # is identical either way, which is what the order-insensitive hash
    # gate compares.
    return f"""WITH src AS (
    SELECT doc_id, text, row_number() OVER () AS rid FROM {docs_table}
  ),
  wd AS (
    SELECT rid,
           CAST(CAST('0x' || substr(md5(t.w), 1, 16) AS UBIGINT)
                % {n_features} AS BIGINT) AS b
    FROM src, LATERAL unnest(regexp_extract_all(text, '\\S+')) AS t(w)
  ),
  cnt AS (SELECT rid, b, count(*)::BIGINT AS c FROM wd GROUP BY rid, b),
  wm(b, d, v) AS (VALUES {vals}),
  yy AS (
    SELECT c.rid, m.d, sum(c.c * m.v)::BIGINT AS val
    FROM cnt c JOIN wm m ON m.b = c.b
    GROUP BY c.rid, m.d
  )
SELECT src.doc_id, {dim_cols}
FROM src LEFT JOIN yy y ON y.rid = src.rid
GROUP BY src.rid, src.doc_id"""
