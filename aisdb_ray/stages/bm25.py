"""Distributed BM25 document retrieval over the corpus.

The classic sparse-retrieval scorer an LLM-data pipeline uses for targeted
curation (pull documents matching a topic query before filtering/mixing).
Two streaming passes:

1. corpus statistics — one vectorized partial per batch (doc count, word
   count, per-query-term document frequencies), funnel-combined to a
   single tiny row; only O(|terms|) integers leave the pass;
2. scoring — each batch computes per-doc term frequencies and document
   length fully vectorized (flatten + bincount), then the BM25 formula;
   a global sort+limit keeps the top-k.

Float determinism: the idf uses the PRE-LOG odds ``(N - df + 0.5) /
(df + 0.5)`` instead of ``ln(1 + …)`` — the standard BM25 idf is monotone
in this quantity, so rankings are preserved for single-term queries and
near-identical for short queries, while the whole score stays inside
IEEE-exact ``+ - * /`` (no transcendental whose last ulp differs between
numpy and the SQL oracle's libm).  Every expression is written in the
same operation order on both sides, so scores hash bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

K1 = 1.2
B = 0.75


def _doc_words(batch: pa.Table, text_col: str):
    toks = pc.split_pattern_regex(batch[text_col], pattern=r"\s+")
    flat = pc.list_flatten(toks)
    parents = pc.list_parent_indices(toks)
    keep = pc.not_equal(flat, pa.scalar(""))
    w = flat.filter(keep)
    par = parents.filter(keep).to_numpy(zero_copy_only=False).astype(np.int64)
    return w, par


def stats_partial(batch: pa.Table, terms: list[str], text_col: str = "text") -> pa.Table:
    """One-row partial: (n_docs, n_words, df_0 … df_{k-1})."""
    w, par = _doc_words(batch, text_col)
    cols = {
        "n_docs": pa.array([batch.num_rows], pa.int64()),
        "n_words": pa.array([len(w)], pa.int64()),
    }
    for j, term in enumerate(terms):
        hit = pc.equal(w, pa.scalar(term)).to_numpy(zero_copy_only=False)
        # df: number of DISTINCT docs in this batch containing the term
        docs = np.unique(par[hit]) if hit.any() else np.array([], np.int64)
        cols[f"df_{j}"] = pa.array([len(docs)], pa.int64())
    return pa.table(cols)


def corpus_stats(ds, terms: list[str], text_col: str = "text") -> dict:
    """Exact corpus constants for the scorer.  One corpus row per doc, so
    per-batch dfs add up exactly; the combined result is ONE row."""
    from aisdb_ray.stages._dist import funnel_combine

    def merge(b: pa.Table) -> pa.Table:
        return pa.table(
            {c: pa.array([pc.sum(b[c]).as_py() or 0], pa.int64())
             for c in b.column_names}
        )

    partials = ds.map_batches(
        lambda b: stats_partial(b, terms, text_col), batch_format="pyarrow"
    )
    rows = funnel_combine(partials, merge).take_all()  # bounded: <= 1 row
    if not rows:  # fully empty input: zero stats, not IndexError
        return {"n_docs": 0, "n_words": 0,
                **{f"df_{j}": 0 for j in range(len(terms))}}
    return {k: int(v) for k, v in rows[0].items()}


def bm25_topk(ds, terms: list[str], k: int = 20, text_col: str = "text",
              id_col: str = "doc_id"):
    """Top-k documents by (odds-idf) BM25 over ``terms``; ties broken by
    doc_id ascending.  Docs matching no term are excluded."""
    stats = corpus_stats(ds, terms, text_col)
    n_docs, n_words = stats["n_docs"], stats["n_words"]
    if n_docs == 0:  # empty corpus: zero hits, not ZeroDivisionError
        import ray.data as rd

        # take the id dtype from the INPUT schema so the empty branch
        # returns the same schema as the scored path (hardcoding string
        # broke unions with per-corpus outputs when doc_id is int64)
        sch = ds.schema()
        id_t = dict(zip(sch.names, sch.types))[id_col]
        return rd.from_arrow(pa.table({
            id_col: pa.array([], id_t),
            "score": pa.array([], pa.float64()),
        }))
    avgdl = float(n_words) / float(n_docs)
    idfs = [
        (float(n_docs - stats[f"df_{j}"]) + 0.5) / (float(stats[f"df_{j}"]) + 0.5)
        for j in range(len(terms))
    ]

    def score(batch: pa.Table) -> pa.Table:
        ids = batch[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        w, par = _doc_words(batch, text_col)
        n = batch.num_rows
        dl = np.bincount(par, minlength=n).astype(np.float64)
        s = np.zeros(n, dtype=np.float64)
        # the shared length normalizer: tf-independent, computed once
        # (derive from the module constants — hardcoded 0.25/2.2 would
        # silently detach the formula from a tuned K1/B)
        norm = K1 * ((1.0 - B) + B * (dl / avgdl))
        for j in range(len(terms)):
            hit = pc.equal(w, pa.scalar(terms[j])).to_numpy(zero_copy_only=False)
            tf = np.bincount(par[hit], minlength=n).astype(np.float64)
            s = s + idfs[j] * ((tf * (K1 + 1.0)) / (tf + norm))
        keep = s > 0.0
        return pa.table(
            {id_col: ids.filter(pa.array(keep)),
             "score": pa.array(s[keep], pa.float64())}
        )

    scored = ds.map_batches(score, batch_format="pyarrow")
    return scored.sort(["score", id_col], descending=[True, False]).limit(k)
