"""Text-analysis stages: token counts, quality signals, language ID,
fingerprints — actor-pool ``map_batches`` over the documents table.

The actor pattern mirrors the reference's heavyweight-state precedent
(/root/reference/aisdb/denoising_encoder.py:262-337): regexes and stopword
tables are built once per actor in ``__init__``; ``__call__`` does per-batch
work.  Integer signals only — derived ratios are exact int/int divisions so
distributed results hash-match SQL oracles.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from aisdb_ray.functions import text as T


def _doc_words_arrow(texts):
    """Arrow-side \\S+ word extraction: (words, parent_indices), both
    Arrow arrays with edge-whitespace empties dropped.  The single home
    of the split contract (splitting on \\s+ and dropping empties yields
    exactly the \\S+ match set, both sides RE2) — _df_partial,
    term_freq_batch, oov_stats and source_minhash_overlap all share it."""
    wl = pc.split_pattern_regex(texts, pattern=r"\s+")
    flat = pc.list_flatten(wl)
    parents = pc.list_parent_indices(wl)
    keep = pc.not_equal(flat, pa.scalar(""))
    return flat.filter(keep), parents.filter(keep)


def _doc_words_flat(texts: pa.Array):
    """Flatten per-doc ``\\S+`` words: returns (words, parent_doc_index)
    with empties from edge whitespace removed — one Arrow split pass
    instead of a Python regex findall per row."""
    wl = pc.split_pattern_regex(texts, pattern=r"\s+")
    flat = pc.list_flatten(wl)
    parent = pc.list_parent_indices(wl).to_numpy(zero_copy_only=False)
    nonempty = pc.greater(pc.utf8_length(flat), 0).to_numpy(zero_copy_only=False)
    if not nonempty.all():
        flat = flat.filter(pa.array(nonempty))
        parent = parent[nonempty]
    return flat, parent


def _segment_starts(parent: np.ndarray) -> np.ndarray:
    """Start offsets of each contiguous parent run (parent is sorted)."""
    return np.flatnonzero(np.r_[True, parent[1:] != parent[:-1]])


def fingerprint64_batch(texts: pa.Array, _flat_parent=None) -> np.ndarray:
    """Vectorized :func:`aisdb_ray.functions.text.fingerprint64` over a
    string array: md5 once per UNIQUE word (pandas hash factorize), then
    the per-doc polynomial rolling hash as segmented uint64 arithmetic
    (natural mod-2^64 wraparound) with a power table indexed by word
    position.  The per-row function stays as the parity oracle in tests."""
    import pandas as pd

    n = len(texts)
    fps = np.zeros(n, dtype=np.uint64)
    flat, parent = _flat_parent or _doc_words_flat(texts)
    if len(flat) == 0:
        return fps
    codes, uniques = pd.factorize(flat.to_numpy(zero_copy_only=False))
    # word_hashes, not raw md5_64: corpora repeat words heavily across
    # batches, and the per-worker memo cache amortizes the md5 cost
    uh = T.word_hashes(list(uniques))
    h = uh[codes]
    starts = _segment_starts(parent)
    seg_len = np.diff(np.r_[starts, len(parent)])
    pos = np.arange(len(parent), dtype=np.int64)
    pos -= np.repeat(pos[starts], seg_len)
    # P^pos via a LUT over [0, max_doc_len): one cumprod, not 370k powmods
    lut = np.ones(int(seg_len.max()), dtype=np.uint64)
    lut[1:] = np.uint64(1_000_003)
    vals = h * np.cumprod(lut)[pos]
    fps[parent[starts]] = np.add.reduceat(vals, starts)
    return fps


class TextStats:
    """Per-document counts + fingerprint + heuristic language id.

    Fully vectorized: counts are single Arrow regex kernels, max word
    length is a segmented reduceat over the flattened word lengths, and
    the fingerprint hashes each unique word once (see
    :func:`fingerprint64_batch`); the per-row functions in
    ``functions/text.py`` remain the parity oracles."""

    def __init__(self):
        pass

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        n = len(texts)
        maxw = np.zeros(n, dtype=np.int64)
        nw = np.zeros(n, dtype=np.int64)
        flat, parent = _doc_words_flat(texts)
        if len(flat):
            wlen = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
            starts = _segment_starts(parent)
            maxw[parent[starts]] = np.maximum.reduceat(wlen, starts)
            nw = np.bincount(parent, minlength=n).astype(np.int64)
        i64 = pa.int64()
        out = pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_chars": pc.cast(pc.utf8_length(texts), i64),
                "n_words": pa.array(nw),
                "n_punct": pc.cast(
                    pc.count_substring_regex(texts, "[.,;:!?]"), i64
                ),
                "n_alpha": pc.cast(
                    pc.count_substring_regex(texts, "[A-Za-z]"), i64
                ),
                "max_word_len": pa.array(maxw),
                "pred_lang": T.lang_id_batch(texts),
                "fingerprint": pa.array(
                    fingerprint64_batch(
                        texts, _flat_parent=(flat, parent)
                    ).astype(np.int64)
                ),
            }
        )
        return out


def text_stats(ds, concurrency: int = 8):
    return ds.map_batches(
        TextStats, batch_format="pyarrow", concurrency=(1, concurrency),
        batch_size=1024,
    )


def token_count_batch(batch: pa.Table) -> pa.Table:
    """Vectorized whitespace-token count (no Python per row) — the exact
    mirror of SQL ``length(regexp_extract_all(text, '\\S+'))``."""
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_tokens": pc.cast(
                pc.count_substring_regex(batch["text"], r"\S+"), pa.int64()
            ),
        }
    )


# GPT-2-style pre-tokenizer pattern, RE2-safe (no lookahead): contraction
# suffixes, space-prefixed letter runs, digit runs, symbol runs, whitespace.
# Arrow and DuckDB both compile regexes with RE2, so the SAME pattern string
# yields identical counts on both sides — the hash-verifiable "BPE-ish"
# token count of a real tokenizer's pre-split stage.
BPE_PATTERN = r"'(?:[sdmt]|ll|ve|re)| ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+|\s+"


def bpe_token_count_batch(batch: pa.Table) -> pa.Table:
    """Vectorized BPE-ish pre-token count per document."""
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_bpe": pc.cast(
                pc.count_substring_regex(batch["text"], BPE_PATTERN), pa.int64()
            ),
        }
    )


def quality_batch(batch: pa.Table) -> pa.Table:
    """Vectorized quality counts + an exact-division score.

    score = (n_alpha / n_chars) * (1 - n_punct / n_chars): computed from the
    same int64 operands in SQL, so the doubles match bit-for-bit.
    """
    t = batch["text"]
    n_chars = pc.cast(pc.utf8_length(t), pa.int64())
    n_words = pc.cast(pc.count_substring_regex(t, r"\S+"), pa.int64())
    n_punct = pc.cast(pc.count_substring_regex(t, r"[.,;:!?]"), pa.int64())
    n_alpha = pc.cast(pc.count_substring_regex(t, r"[A-Za-z]"), pa.int64())
    nc = pc.cast(n_chars, pa.float64())
    score = pc.multiply(
        pc.divide(pc.cast(n_alpha, pa.float64()), nc),
        pc.subtract(
            pa.scalar(1.0), pc.divide(pc.cast(n_punct, pa.float64()), nc)
        ),
    )
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_chars": n_chars,
            "n_words": n_words,
            "n_punct": n_punct,
            "n_alpha": n_alpha,
            "quality_score": score,
        }
    )


def md5_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """Content hash per row (exact-dedup key; mirrors SQL md5())."""
    vals = batch[col].to_pylist()
    h = [hashlib.md5(v.encode()).hexdigest() for v in vals]
    return batch.append_column("text_md5", pa.array(h, pa.string()))


def md5_batch64(batch: pa.Table, col: str = "text") -> pa.Table:
    """md5_batch plus an int64 view of the digest's first 8 bytes — a
    Bloom-filter / bucketing key derived in the SAME per-row pass (no
    second hash loop).  Equality is still decided on the full hex string;
    the int64 only prefilters."""
    vals = batch[col].to_pylist()
    hexes, u64 = [], []
    for v in vals:
        d = hashlib.md5(v.encode())
        hexes.append(d.hexdigest())
        u64.append(int.from_bytes(d.digest()[:8], "big", signed=False) - (1 << 63))
    out = batch.append_column("text_md5", pa.array(hexes, pa.string()))
    return out.append_column("md5_i64", pa.array(u64, pa.int64()))


def _df_partial(batch: pa.Table) -> pa.Table:
    """Per-batch document-frequency partial: (token, #docs-in-batch).

    Fully vectorized: regex split -> flatten with parent indices ->
    per-document dedup via an Arrow group_by on (doc, token) -> count per
    token.  Splitting on ``\\s+`` and dropping empties yields exactly the
    ``\\S+`` match set (both sides RE2, same as token_count_batch)."""
    words, parents = _doc_words_arrow(batch["text"])
    pairs = pa.table({"d": parents, "token": words})
    uniq = pairs.group_by(["d", "token"], use_threads=False).aggregate([])
    g = uniq.group_by(["token"], use_threads=False).aggregate(
        [([], "count_all")]
    )
    return g.rename_columns(["token", "df"])


def _df_combine(b: pa.Table) -> pa.Table:
    """(token, df) partial merge — the one combine policy doc_freq_topk
    and oov_stats share (was two identical closures)."""
    g = b.group_by(["token"], use_threads=False).aggregate([("df", "sum")])
    return g.rename_columns(["token", "df"])


def term_freq_batch(batch: pa.Table) -> pa.Table:
    """Per-(document, token) term frequency — the tf half of TF-IDF.

    Same vectorized split as :func:`_df_partial` but keyed by doc_id and
    counting occurrences instead of deduping.  One row per document per
    batch, so per-batch output rows are already globally unique per
    (doc_id, token)."""
    words, parents = _doc_words_arrow(batch["text"])
    doc_ids = batch["doc_id"].take(parents)
    g = (
        pa.table({"doc_id": doc_ids, "token": words})
        .group_by(["doc_id", "token"], use_threads=False)
        .aggregate([([], "count_all")])
    )
    return g.rename_columns(["doc_id", "token", "tf"])


def doc_freq_topk(ds, k: int = 100):
    """Corpus document frequency: for each distinct whitespace token, the
    number of documents containing it; top-k by (df desc, token asc).

    The LLM-corpus vocabulary statistic (stop-word discovery, df-based
    filtering, the df half of TF-IDF).  Shape: vectorized per-batch
    partials (one row per document means a batch never splits a doc) ->
    per-block combine -> ``groupby(token)`` hash combine — only (token,
    partial df) rows shuffle, never text.  The final sort+limit runs on
    the combined vocabulary table (bounded by distinct-token count, not
    corpus size)."""

    from aisdb_ray.stages._dist import funnel_combine

    partials = ds.map_batches(_df_partial, batch_format="pyarrow")
    merged = funnel_combine(
        partials, _df_combine, key_col="token", hash_combine=True
    )
    return merged.sort(["df", "token"], descending=[True, False]).limit(k)


def _per_key_counts(*cols: np.ndarray):
    """Run-length counts over composite integer keys: returns (sort order,
    run start offsets into the sorted arrays, count per run).  Columns are
    given least-significant first (np.lexsort convention)."""
    order = np.lexsort(cols)
    sorted_cols = [c[order] for c in cols]
    change = np.zeros(len(order), dtype=bool)
    change[0] = True
    for c in sorted_cols:
        change[1:] |= c[1:] != c[:-1]
    starts = np.flatnonzero(change)
    counts = np.diff(np.r_[starts, len(order)])
    return order, starts, counts


def _top_adjacent_gram_counts(
    wcodes: np.ndarray, parent: np.ndarray, n_docs: int, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """(total k-grams, most-frequent k-gram count) per doc, over adjacent
    word k-grams — segmented: a gram never crosses a doc boundary."""
    total = np.zeros(n_docs, dtype=np.int64)
    top = np.zeros(n_docs, dtype=np.int64)
    if len(wcodes) < k:
        return total, top
    m = len(wcodes) - (k - 1)
    keep = parent[:m] == parent[k - 1:]
    if not keep.any():
        return total, top
    gp = parent[:m][keep]
    grams = [wcodes[j:m + j][keep] for j in range(k)]
    total += np.bincount(gp, minlength=n_docs)
    order, starts, counts = _per_key_counts(*reversed(grams), gp)
    # per-doc max count: runs are sorted with gp as the PRIMARY key
    gp_sorted = gp[order][starts]
    doc_starts = _segment_starts(gp_sorted)
    top[gp_sorted[doc_starts]] = np.maximum.reduceat(counts, doc_starts)
    return total, top


def repetition_batch(batch: pa.Table) -> pa.Table:
    """Gopher-style repetition signals per document (Rae et al. 2021,
    "Scaling Language Models", App. A1.1 — the public quality-filter
    heuristics), as exact INTEGER evidence so distributed results
    hash-match the SQL oracle (the float fractions derive as int/int):

    - ``n_lines`` / ``n_distinct_lines``: '\\n'-split line counts;
    - ``dup_line_chars``: total codepoints of lines whose within-doc
      occurrence count is >= 2 (all occurrences counted);
    - ``n_2grams`` / ``top_2gram_count`` (and the 3-gram pair): adjacent
      word n-gram totals and the most-frequent gram's count.

    Fully vectorized: one Arrow split pass per feature family, then
    factorize + lexsort run-length counting — no per-row Python.
    """
    import pandas as pd

    texts = batch["text"]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n = len(texts)
    n_lines = np.zeros(n, dtype=np.int64)
    n_dist = np.zeros(n, dtype=np.int64)
    dup_chars = np.zeros(n, dtype=np.int64)
    if n:
        ll = pc.split_pattern(texts, "\n")
        flat = pc.list_flatten(ll)
        parent = pc.list_parent_indices(ll).to_numpy(zero_copy_only=False)
        lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
        codes, _ = pd.factorize(flat.to_numpy(zero_copy_only=False))
        n_lines = np.bincount(parent, minlength=n).astype(np.int64)
        order, starts, counts = _per_key_counts(codes, parent)
        par_sorted = parent[order]
        n_dist = np.bincount(par_sorted[starts], minlength=n).astype(np.int64)
        # occurrences of each line within its doc, scattered back
        occ = np.empty(len(order), dtype=np.int64)
        occ[order] = np.repeat(counts, counts)
        dup = occ >= 2
        dup_chars = np.bincount(
            parent[dup], weights=lens[dup], minlength=n
        ).astype(np.int64)

    wflat, wparent = _doc_words_flat(texts)
    if len(wflat):
        wcodes, _ = pd.factorize(wflat.to_numpy(zero_copy_only=False))
        n2, top2 = _top_adjacent_gram_counts(wcodes, wparent, n, 2)
        n3, top3 = _top_adjacent_gram_counts(wcodes, wparent, n, 3)
    else:
        n2 = top2 = n3 = top3 = np.zeros(n, dtype=np.int64)

    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_lines": pa.array(n_lines),
            "n_distinct_lines": pa.array(n_dist),
            "dup_line_chars": pa.array(dup_chars),
            "n_2grams": pa.array(n2),
            "top_2gram_count": pa.array(top2),
            "n_3grams": pa.array(n3),
            "top_3gram_count": pa.array(top3),
        }
    )


def oov_stats(ds, min_df: int = 5, id_col: str = "doc_id"):
    """Per-document out-of-vocabulary evidence vs a corpus-derived
    vocabulary: ``(doc_id, n_words, n_oov)`` where the vocabulary is every
    token appearing in at least ``min_df`` documents (the CCNet/C4-style
    common-word quality signal: a high OOV rate marks gibberish, encoding
    damage, or non-target-language text).

    Two streaming passes over the corpus: (1) exact document frequencies
    via the token-keyed hash combine (only (token, df) rows shuffle), the
    >= min_df slice collected ONCE and broadcast via ``ray.put`` — the
    vocabulary is heavy-hitter-bounded by construction (raise ``min_df``
    or cap to top-k at extreme corpus sizes); (2) the corpus streams
    through a vectorized ``pc.is_in`` membership count.  Documents with no
    words emit no row (mirrored by the SQL oracle's inner unnest)."""
    import ray

    from aisdb_ray.stages._dist import funnel_combine

    partials = ds.map_batches(_df_partial, batch_format="pyarrow")
    merged = funnel_combine(
        partials, _df_combine, key_col="token", hash_combine=True
    )
    vocab_blocks = [
        b.filter(pc.greater_equal(b["df"], pa.scalar(min_df)))["token"]
        for b in ray.get(merged.to_arrow_refs())
        if b.num_rows
    ]
    vocab = (
        pa.concat_arrays(
            [c for blk in vocab_blocks for c in
             (blk.chunks if isinstance(blk, pa.ChunkedArray) else [blk])]
        )
        if vocab_blocks
        else pa.array([], pa.string())
    )
    vocab_ref = ray.put(vocab)

    def flag(b: pa.Table) -> pa.Table:
        ids = b[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        w, par = _doc_words_arrow(b["text"])
        inv = pc.cast(
            pc.invert(pc.is_in(w, value_set=ray.get(vocab_ref))), pa.int64()
        )
        t = pa.table({id_col: ids.take(par), "_oov": inv})
        g = t.group_by([id_col], use_threads=False).aggregate(
            [("_oov", "count"), ("_oov", "sum")]
        )
        return g.rename_columns([id_col, "n_words", "n_oov"])

    # one corpus row per doc, so per-batch aggregation is already global
    return ds.map_batches(flag, batch_format="pyarrow")


def winnow_fingerprints(
    ds,
    k: int = 4,
    w: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken 2003 —
    the MOSS local fingerprinting scheme): hash every word k-gram, slide a
    w-window over the hash sequence, select each window's minimum; the
    DISTINCT selected hashes are the document's fingerprint set.  Emitted
    as integer evidence (doc_id, n_fp, fp_sum) — count and sum of the
    distinct selected hashes — so the result hashes exactly (which
    position a duplicated minimum is picked at never matters to the set).

    Fully map-side (one corpus row per doc): vectorized k-gram build
    (contamination.word_ngrams_block), md5-prefix hashing (per-gram
    Python md5, bounded per batch — the same portable-hash contract as
    md5_batch/sketch.py), and the window minimum as w-1 shifted
    np.minimum passes (w is a small constant).  Docs with fewer than
    k+w-1 words emit no row, mirrored by the oracle."""
    from aisdb_ray.stages.contamination import word_ngrams_block

    def fp(b: pa.Table) -> pa.Table:
        g = word_ngrams_block(b, text_col, id_col, n=k)
        empty = pa.table(
            {
                id_col: g[id_col].slice(0, 0),
                "n_fp": pa.array([], pa.int64()),
                "fp_sum": pa.array([], pa.int64()),
            }
        )
        if g.num_rows == 0:
            return empty
        ids = g[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        enc = pc.dictionary_encode(ids)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        par = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        grams = g["gram"].to_pylist()
        hv = np.array(
            [int(hashlib.md5(s.encode()).hexdigest()[:8], 16) for s in grams],
            dtype=np.int64,
        )
        # window min over the last w hashes, valid only where the window
        # stays inside one doc (grams are doc-contiguous and in order)
        m = hv.copy()
        for shift in range(1, w):
            m[shift:] = np.minimum(m[shift:], hv[:-shift])
        valid = np.zeros(len(hv), dtype=bool)
        if len(hv) >= w:
            valid[w - 1:] = par[w - 1:] == par[: len(par) - (w - 1)]
        if not valid.any():
            return empty
        sel_doc, sel_m = par[valid], m[valid]
        uniq = np.unique(np.stack([sel_doc, sel_m], axis=1), axis=0)
        d, starts = np.unique(uniq[:, 0], return_index=True)
        counts = np.diff(np.r_[starts, len(uniq)])
        sums = np.add.reduceat(uniq[:, 1], starts)
        return pa.table(
            {
                id_col: enc.dictionary.take(pa.array(d)),
                "n_fp": pa.array(counts.astype(np.int64)),
                "fp_sum": pa.array(sums.astype(np.int64)),
            }
        )

    return ds.map_batches(fp, batch_format="pyarrow")


def source_minhash_overlap(ds, n_perms: int = 16):
    """Cross-source vocabulary-overlap matrix via per-source MinHash
    signatures — the corpus-mix diagnostic ("which crawls duplicate each
    other?") at sketch cost.

    Per source, signature[p] = min over the source's DISTINCT words of
    ``md5(word‖':mh'‖p)``; the per-pair agreement count estimates the
    vocabulary Jaccard (E[n_agree/P] = J).  Shape: per-batch (source, p,
    min) partials — algebraic min-merge like the HLL registers
    (stages/sketch.py), so only sources×P rows ever move; the pair matrix
    is computed once on the collapsed table.  Never a word-keyed shuffle,
    never source×source documents.

    Output: (a, b, n_agree) for every source pair a < b.
    """
    from aisdb_ray.stages._dist import funnel_combine
    from aisdb_ray.stages.sample import md5_u32

    def partial(b: pa.Table) -> pa.Table:
        words, parents = _doc_words_arrow(b["text"])
        srcs = b["source"].take(parents)
        pair = pa.table({"source": srcs, "word": words}).group_by(
            ["source", "word"], use_threads=False
        ).aggregate([])
        s_out, p_out, m_out = [], [], []
        for p in range(n_perms):
            salted = pc.binary_join_element_wise(
                pair["word"].combine_chunks(), pa.scalar(f":mh{p}"), ""
            )
            h = md5_u32(salted)
            t = pa.table({
                "source": pair["source"], "h": pa.array(h, pa.int64())
            }).group_by(["source"], use_threads=False).aggregate([("h", "min")])
            s_out.append(t["source"].combine_chunks())
            p_out.append(np.full(t.num_rows, p, dtype=np.int64))
            m_out.append(t["h_min"].to_numpy(zero_copy_only=False))
        return pa.table({
            "source": pa.concat_arrays([c for chunk in s_out for c in
                                        (chunk.chunks if isinstance(chunk, pa.ChunkedArray) else [chunk])]),
            "p": pa.array(np.concatenate(p_out), pa.int64()),
            "minh": pa.array(np.concatenate(m_out), pa.int64()),
        })

    def merge(b: pa.Table) -> pa.Table:
        g = b.group_by(["source", "p"], use_threads=False).aggregate(
            [("minh", "min")]
        )
        return g.rename_columns(["source", "p", "minh"])

    def pairs(b: pa.Table) -> pa.Table:
        src = np.asarray(b["source"].to_pylist())
        p = b["p"].to_numpy(zero_copy_only=False)
        mh = b["minh"].to_numpy(zero_copy_only=False)
        names = np.unique(src)
        sig = np.full((len(names), n_perms), -1, dtype=np.int64)
        sidx = {s: i for i, s in enumerate(names)}
        for s, pp, m in zip(src, p, mh):
            sig[sidx[s], pp] = m
        a_out, b_out, n_out = [], [], []
        for i in range(len(names)):
            for j in range(i + 1, len(names)):
                a_out.append(names[i])
                b_out.append(names[j])
                n_out.append(int((sig[i] == sig[j]).sum()))
        return pa.table({
            "a": pa.array(a_out, pa.string()),
            "b": pa.array(b_out, pa.string()),
            "n_agree": pa.array(n_out, pa.int64()),
        })

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return funnel_combine(partials, merge, finalize_fn=pairs)
