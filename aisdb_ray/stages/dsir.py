"""DSIR importance weights — data selection for language models via
importance resampling (Xie et al. 2023), in the integer-quantized house
style.

Given a TARGET domain predicate (e.g. ``lang == 'en'``) over the corpus,
score every document by how target-like its hashed-bigram feature
distribution is:

    log w(x) ≈ Σ_features  [ log2 p_target(bucket) − log2 p_raw(bucket) ]

with add-1 smoothed bucket probabilities over ``B`` md5-hashed word-bigram
buckets.  Each log2 is quantized to ``bit_length`` (floor(log2)+1 — DuckDB
``length(bin(x))``), so the whole weight is an exact integer and the SQL
oracle matches bit-for-bit:

    dsir_fx = Σ_occ [bl(c_t[b]+1) − bl(c_r[b]+1)]
              + n_feats · [bl(C_r+B) − bl(C_t+B)]

The reference's analogous gate is its per-file quality filters
(/root/reference/aisdb/proc_util.py); this is the distribution-matching
generalization an LLM-corpus pipeline runs to up-sample target-domain
data.

Scale shape — TWO streaming passes, ZERO shuffles:

- pass 1 aggregates per-bucket occurrence counts (target, raw).  The
  count table is bounded by ``B`` (buckets), not the corpus: per-batch
  algebraic partials, one small funnel combine, driver collects 2·B ints;
- the λ table (one int per bucket) is broadcast once via ``ray.put``;
- pass 2 streams the corpus through a map-only scorer (vectorized n-gram
  build; md5 only on batch-distinct grams — md5 has no Arrow kernel).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from aisdb_ray.stages.contamination import GRAM, _bit_length, word_ngrams_block


def _bucket_of(grams: pa.Array, n_buckets: int) -> np.ndarray:
    from aisdb_ray.stages.sample import md5_u32

    return md5_u32(grams) % n_buckets


def dsir_weights(
    docs_ds,
    target_pred,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 2048,
):
    """(doc_id, n_feats, dsir_fx) per document with ≥1 word bigram.
    ``target_pred(batch) -> BooleanArray`` marks target-domain rows; the
    raw distribution is the WHOLE corpus (target included), as in the
    paper."""
    import ray

    from aisdb_ray.stages._dist import funnel_combine

    def count_partial(b: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "bucket": pa.array([], pa.int64()),
                "n_t": pa.array([], pa.int64()),
                "n_r": pa.array([], pa.int64()),
            }
        )
        if b.num_rows == 0:
            return empty
        tgt_rows = target_pred(b)
        g = word_ngrams_block(b, text_col, id_col, n=2)
        if g.num_rows == 0:
            return empty
        # one doc == one corpus row: recover the gram's target flag by
        # membership of its doc id in the batch's target ids
        tgt_ids = b[id_col].filter(tgt_rows)
        is_t = pc.is_in(g[id_col], value_set=(
            tgt_ids.combine_chunks() if isinstance(tgt_ids, pa.ChunkedArray)
            else tgt_ids
        ))
        # md5 only batch-distinct grams, then spread by dictionary code
        codes = pc.dictionary_encode(
            g[GRAM].combine_chunks()
            if isinstance(g[GRAM], pa.ChunkedArray) else g[GRAM]
        )
        bkt_of_code = _bucket_of(codes.dictionary, n_buckets)
        bkt = bkt_of_code[codes.indices.to_numpy(zero_copy_only=False)]
        t = pa.table(
            {
                "bucket": pa.array(bkt, pa.int64()),
                "n_t": pc.cast(is_t, pa.int64()),
                "n_r": pa.array(np.ones(len(bkt), np.int64)),
            }
        )
        out = t.group_by(["bucket"], use_threads=False).aggregate(
            [("n_t", "sum"), ("n_r", "sum")]
        )
        return out.rename_columns(["bucket", "n_t", "n_r"])

    def merge(b: pa.Table) -> pa.Table:
        g = b.group_by(["bucket"], use_threads=False).aggregate(
            [("n_t", "sum"), ("n_r", "sum")]
        )
        return g.rename_columns(["bucket", "n_t", "n_r"])

    # pin the corpus once: it is consumed twice (this counting pass, then
    # the scoring pass below), so an expensive — or worse, nondeterministic
    # — upstream pipeline must not re-execute between the lambda table and
    # the stream it scores (the contamination-stage policy)
    docs_ds = docs_ds.materialize()
    partials = docs_ds.map_batches(count_partial, batch_format="pyarrow")
    cnt = funnel_combine(partials, merge).to_pandas()

    lam = np.zeros(n_buckets, dtype=np.int64)
    c_t = np.zeros(n_buckets, dtype=np.int64)
    c_r = np.zeros(n_buckets, dtype=np.int64)
    c_t[cnt["bucket"].to_numpy()] = cnt["n_t"].to_numpy()
    c_r[cnt["bucket"].to_numpy()] = cnt["n_r"].to_numpy()
    lam = _bit_length(c_t + 1) - _bit_length(c_r + 1)
    C_t, C_r = int(c_t.sum()), int(c_r.sum())
    shift = int(
        _bit_length(np.array([C_r + n_buckets]))[0]
        - _bit_length(np.array([C_t + n_buckets]))[0]
    )
    lam_ref = ray.put(lam)

    def score(b: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                id_col: pa.array([], b.schema.field(id_col).type),
                "n_feats": pa.array([], pa.int64()),
                "dsir_fx": pa.array([], pa.int64()),
            }
        )
        if b.num_rows == 0:
            return empty
        g = word_ngrams_block(b, text_col, id_col, n=2)
        if g.num_rows == 0:
            return empty
        lam_v = ray.get(lam_ref)
        codes = pc.dictionary_encode(
            g[GRAM].combine_chunks()
            if isinstance(g[GRAM], pa.ChunkedArray) else g[GRAM]
        )
        bkt_of_code = _bucket_of(codes.dictionary, n_buckets)
        bkt = bkt_of_code[codes.indices.to_numpy(zero_copy_only=False)]
        t = pa.table(
            {
                id_col: g[id_col],
                "_lam": pa.array(lam_v[bkt], pa.int64()),
            }
        )
        out = t.group_by([id_col], use_threads=False).aggregate(
            [("_lam", "count"), ("_lam", "sum")]
        )
        n_feats = out["_lam_count"].to_numpy(zero_copy_only=False).astype(np.int64)
        s_lam = out["_lam_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                id_col: out[id_col],
                "n_feats": pa.array(n_feats),
                "dsir_fx": pa.array(s_lam + n_feats * shift),
            }
        )

    return docs_ds.map_batches(score, batch_format="pyarrow")
