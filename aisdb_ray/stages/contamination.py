"""Eval-set decontamination: flag training documents that share word
n-grams with a benchmark set.

The standard LLM-corpus hygiene pass: any training document containing an
exact word-level n-gram that also appears in an evaluation/benchmark
document is contaminated and must be dropped (or audited).  Shape:

- n-grams are built fully vectorized: regex split → flatten with parent
  indices → n shifted slices joined element-wise — no Python per row;
- the benchmark side is SMALL by construction (a held-out eval set), so
  its distinct gram set is collected once and broadcast via ``ray.put``;
  the training corpus then streams through a ``pc.is_in`` membership
  filter — the broadcast-semi-join pattern (SURVEY.md §4), never a
  corpus×corpus shuffle;
- a document's grams all come from its own row, so per-batch distinct
  (doc, gram) pairs are already globally distinct: the per-doc shared-gram
  count needs no extra dedup shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

GRAM = "gram"
N_SHARED = "n_shared"


def word_ngrams_block(
    batch: pa.Table, text_col: str = "text", id_col: str = "doc_id", n: int = 8
) -> pa.Table:
    """(id, gram) rows: every word-level n-gram of every document.
    Splitting on ``\\s+`` and dropping empties yields exactly the ``\\S+``
    match sequence (empties only ever appear at string boundaries, so word
    adjacency is preserved)."""
    ids = batch[id_col]
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    # the gram column inherits the text column's string class — a
    # hardcoded pa.string() empty would mix schemas with large_string
    # corpora and break block unification downstream
    gram_t = (pa.large_string()
              if pa.types.is_large_string(batch[text_col].type)
              else pa.string())
    empty = pa.table({id_col: ids.slice(0, 0), GRAM: pa.array([], gram_t)})
    if batch.num_rows == 0:
        return empty
    toks = pc.split_pattern_regex(batch[text_col], pattern=r"\s+")
    flat = pc.list_flatten(toks)
    parents = pc.list_parent_indices(toks)
    keep = pc.not_equal(flat, pa.scalar(""))
    w = flat.filter(keep)
    if isinstance(w, pa.ChunkedArray):
        w = w.combine_chunks()
    par = parents.filter(keep).to_numpy(zero_copy_only=False).astype(np.int64)
    L = len(w) - (n - 1)
    if L <= 0:
        return empty
    cols = [w.slice(k, L) for k in range(n)]
    grams = pc.binary_join_element_wise(*cols, pa.scalar(" "))
    valid = pa.array(par[:L] == par[n - 1:])
    doc = ids.take(pa.array(par[:L][valid.to_numpy(zero_copy_only=False)]))
    return pa.table({id_col: doc, GRAM: grams.filter(valid)})


def contamination(
    docs_ds,
    bench_pred,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
):
    """Per-TRAINING-doc count of distinct n-grams shared with the benchmark
    side.  ``bench_pred(batch) -> BooleanArray`` splits the corpus (True =
    benchmark row); only docs with ≥1 shared gram are returned."""
    import ray

    # every row lands on EXACTLY one side: a null predicate result (e.g.
    # pc.equal on a null split column) would be dropped by BOTH filters,
    # letting a contaminated doc skip the scan unflagged — nulls are
    # training rows (the side that gets checked).
    def bench_b(b: pa.Table) -> pa.Table:
        return b.filter(pc.fill_null(bench_pred(b), False))

    def train_b(b: pa.Table) -> pa.Table:
        return b.filter(pc.invert(pc.fill_null(bench_pred(b), False)))

    # the input is consumed twice (benchmark gram collection + the
    # training-side scan): pin it once so an expensive upstream pipeline
    # doesn't re-execute end-to-end for each pass
    docs_ds = docs_ds.materialize()

    bench_grams = (
        docs_ds.map_batches(bench_b, batch_format="pyarrow")
        .map_batches(
            lambda b: pa.table(
                {GRAM: pc.unique(word_ngrams_block(b, text_col, id_col, n)[GRAM])}
            ),
            batch_format="pyarrow",
        )
    )
    # benchmark = the small held-out side: collect its distinct grams once,
    # staying in Arrow end-to-end (no pandas object-column round trip)
    blocks = [b for b in ray.get(bench_grams.to_arrow_refs()) if b.num_rows]
    uniq = pc.unique(
        pa.concat_tables(blocks)[GRAM].combine_chunks()
        if blocks else pa.array([], pa.string())
    )
    bench_ref = ray.put(uniq)

    def flag(b: pa.Table) -> pa.Table:
        g = word_ngrams_block(b, text_col, id_col, n)
        vset = ray.get(bench_ref)
        hit = g.filter(pc.is_in(g[GRAM], value_set=vset))
        # one doc == one corpus row, so batch-local distinct is global
        dd = hit.group_by([id_col, GRAM], use_threads=False).aggregate([])
        out = dd.group_by([id_col], use_threads=False).aggregate(
            [([], "count_all")]
        )
        return out.rename_columns([id_col, N_SHARED])

    return docs_ds.map_batches(train_b, batch_format="pyarrow").map_batches(
        flag, batch_format="pyarrow"
    )


def dup_ngram_stats(
    docs_ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    num_parts: int | None = None,
):
    """Within-corpus duplicated-n-gram evidence per document (the Lee et
    al. 2022 "Deduplicating Training Data Makes Language Models Better"
    substring-dup signal, at word-n-gram granularity): for each document,
    how many of its distinct word n-grams also appear in at least one
    OTHER document.

    Returns integer evidence ``(doc_id, n_grams, n_dup)`` — distinct
    n-grams of the doc and how many of those are corpus-duplicated — so
    the dup fraction ``n_dup / n_grams`` is left to the consumer and the
    result hashes exactly.  Docs shorter than ``n`` words emit no row.

    Scale shape: per-batch distinct (doc, gram) pairs (one doc == one
    corpus row, so batch-local distinct is global), then ONE hash
    co-shuffle on the gram — every occurrence of a gram lands in one
    partition, so the partition-local doc count per gram IS the global
    count — emitting tiny per-(doc, partition) partials, finished by a
    hash combine on doc_id.  Gram payloads cross the wire once; the
    reference's corpus passes are per-file Python loops
    (/root/reference/aisdb/proc_util.py) — this is the distributed
    restatement."""
    from aisdb_ray.stages._dist import co_shuffle, funnel_combine

    def pairs_b(b: pa.Table) -> pa.Table:
        g = word_ngrams_block(b, text_col, id_col, n)
        return g.group_by([id_col, GRAM], use_threads=False).aggregate([])

    pairs = docs_ds.map_batches(pairs_b, batch_format="pyarrow")

    def per_part(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return pa.table(
                {
                    id_col: part[id_col],
                    "n_grams": pa.array([], pa.int64()),
                    "n_dup": pa.array([], pa.int64()),
                }
            )
        cnt = part.group_by([GRAM], use_threads=False).aggregate(
            [([], "count_all")]
        )
        dup = cnt.filter(pc.greater_equal(cnt["count_all"], pa.scalar(2)))[GRAM]
        if isinstance(dup, pa.ChunkedArray):
            dup = dup.combine_chunks()
        is_dup = pc.cast(pc.is_in(part[GRAM], value_set=dup), pa.int64())
        t = pa.table({id_col: part[id_col], "_d": is_dup})
        g = t.group_by([id_col], use_threads=False).aggregate(
            [("_d", "count"), ("_d", "sum")]
        )
        return g.rename_columns([id_col, "n_grams", "n_dup"])

    partials = co_shuffle(pairs, [GRAM], per_part, num_parts=num_parts)

    def merge(b: pa.Table) -> pa.Table:
        g = b.group_by([id_col], use_threads=False).aggregate(
            [("n_grams", "sum"), ("n_dup", "sum")]
        )
        return g.rename_columns([id_col, "n_grams", "n_dup"])

    # one output row per document: combine on the doc key (scale path)
    return funnel_combine(partials, merge, key_col=id_col, hash_combine=True)


def _bit_length(c: np.ndarray) -> np.ndarray:
    """Vectorized int bit_length (== DuckDB length(bin(x)) for x >= 1)."""
    out = np.zeros(len(c), dtype=np.int64)
    tmp = c.astype(np.int64).copy()
    while (tmp > 0).any():
        out += tmp > 0
        tmp >>= 1
    return out


def bigram_familiarity(
    docs_ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_parts: int | None = None,
):
    """Quantized bigram-LM familiarity score per document — the cheap
    perplexity proxy of n-gram-LM quality filtering (CCNet's LM gate,
    approximated in pure integers): for every adjacent word pair of the
    doc, add ``bit_length(corpus count of that pair)``; frequent
    constructions contribute ~log2(count), hapax pairs contribute 1.
    Low familiarity per bigram flags gibberish / OCR damage; the integer
    quantization (floor(log2)+1) makes Ray and SQL agree bit-for-bit
    (DuckDB: ``length(bin(c))``).

    Returns (doc_id, n_bigrams, familiarity) — occurrence-weighted, so
    the mean familiarity is the consumer's one division.  Shape: (doc,
    pair) rows co-shuffle once on the pair; the pair's corpus count is
    partition-local-exact, and per-(doc, partition) integer partials
    combine on doc_id."""
    from aisdb_ray.stages._dist import co_shuffle, funnel_combine

    def pairs_b(b: pa.Table) -> pa.Table:
        return word_ngrams_block(b, text_col, id_col, n=2)

    pairs = docs_ds.map_batches(pairs_b, batch_format="pyarrow")

    def per_part(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return pa.table(
                {
                    id_col: part[id_col],
                    "n_bigrams": pa.array([], pa.int64()),
                    "familiarity": pa.array([], pa.int64()),
                }
            )
        g = part[GRAM]
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        enc = pc.dictionary_encode(g)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        gid = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        counts = np.bincount(gid)          # corpus count per pair (exact here)
        fam = _bit_length(counts)[gid]     # per-occurrence contribution
        t = pa.table({id_col: part[id_col], "_f": pa.array(fam)})
        out = t.group_by([id_col], use_threads=False).aggregate(
            [("_f", "count"), ("_f", "sum")]
        )
        return out.rename_columns([id_col, "n_bigrams", "familiarity"])

    partials = co_shuffle(pairs, [GRAM], per_part, num_parts=num_parts)

    def merge(b: pa.Table) -> pa.Table:
        g = b.group_by([id_col], use_threads=False).aggregate(
            [("n_bigrams", "sum"), ("familiarity", "sum")]
        )
        return g.rename_columns([id_col, "n_bigrams", "familiarity"])

    return funnel_combine(partials, merge, key_col=id_col, hash_combine=True)
