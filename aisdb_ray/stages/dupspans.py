"""Exact duplicated-substring spans — the suffix-array dedup signal of
Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
Better", public) restated as a shared-nothing, fingerprint-first n-gram
pipeline:

1. **fingerprints** (pass A): every length-``L`` byte window of every
   document is reduced to a 64-bit polynomial fingerprint, computed per
   batch with ONE stride-tricks view over the batch's concatenated text
   buffer (no per-character Python; windows crossing document boundaries
   are dropped vectorized).  Only ``(fp, partial count)`` rows travel —
   8 bytes per window pre-combine, and the map-side combine collapses a
   batch's repeats before the exchange — NOT the L window bytes (the
   round-3 engine shipped the windows themselves: corpus × L byte
   amplification, ~40× at L=40; this pass ships corpus × 8 bytes,
   independent of L).
2. **candidates**: one fp-keyed hash exchange sums the partial counts;
   a fingerprint with global count ≥ 2 is a *candidate* (a true
   duplicate, or an fp collision between distinct windows).  The
   candidate set — 8 bytes per distinct duplicated window, tiny
   relative to the corpus because duplication is the exception — is
   broadcast once via ``ray.put`` as a sorted uint64 array.
3. **confirm** (pass B): the corpus streams again; windows whose fp is
   NOT a candidate are dropped map-side (searchsorted against the
   broadcast array), so only candidate windows ship their actual bytes
   through the second, far smaller exchange.  Inside each partition the
   window BYTES are grouped exactly — ``np.unique`` over a void-dtype
   view of the uint8 window matrix, which compares every byte including
   trailing NULs (an S-dtype compare would strip them) — so an fp
   collision can never mark a false duplicate: exactness comes from the
   bytes, the fingerprint only prunes.
4. **spans**: confirmed duplicated positions coalesce into maximal
   spans per doc (overlap-or-touch, ``pos_j ≤ pos_i + L``) — exactly
   :func:`aisdb_ray.stages.join.coalesce_intervals`.

Byte semantics: windows are byte windows (UTF-8); on ASCII corpora this
equals the character windows the SQL oracle takes with ``substr``.

``_fingerprint64`` is deliberately a module-level seam: tests
monkeypatch it with a pathologically colliding function to prove the
confirm pass alone guarantees exactness.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_FNV_PRIME = np.uint64(0x100000001B3)


def _fingerprint64(win: np.ndarray) -> np.ndarray:
    """64-bit polynomial fingerprint of each row of the (n, L) uint8
    window matrix, wrapping uint64 arithmetic.  Horner accumulation over
    the L columns: peak transient memory is one n×8 accumulator (a full
    (n, L) uint64 product matrix would be 8× the window matrix — the
    window matrix itself already amplifies the text ~L×).  Collisions
    are possible and HARMLESS — the confirm pass compares the actual
    bytes; a weaker fingerprint only means more pass-B traffic."""
    fp = np.zeros(len(win), dtype=np.uint64)
    with np.errstate(over="ignore"):  # mod-2^64 wrap is the design
        for j in range(win.shape[1]):
            fp *= _FNV_PRIME
            fp += win[:, j]
    # one xor-shift mix so short/low-entropy windows spread across the
    # fp-keyed exchange (route quality only; exactness never depends on it)
    return fp ^ (fp >> np.uint64(29))


def _batch_windows(batch: pa.Table, L: int, text_col: str, id_col: str):
    """(win matrix [n, L] uint8, doc index per window, 1-based pos,
    doc_id array) for every in-document length-L byte window — ONE
    stride-tricks view over the batch's concatenated buffer."""
    if batch.num_rows == 0:
        return None
    texts = [t if t is not None else b""
             for t in pc.cast(batch[text_col], pa.binary()).to_pylist()]
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    buf = b"".join(texts)
    if len(buf) < L:
        return None
    lens = np.asarray([len(t) for t in texts], dtype=np.int64)
    starts = np.r_[0, np.cumsum(lens)[:-1]]
    arr = np.frombuffer(buf, dtype=np.uint8)
    win = np.lib.stride_tricks.sliding_window_view(arr, L)
    gpos = np.arange(len(win), dtype=np.int64)
    doc = np.searchsorted(starts, gpos, side="right") - 1
    ok = gpos + L <= starts[doc] + lens[doc]
    win, gpos, doc = win[ok], gpos[ok], doc[ok]
    if len(win) == 0:
        return None
    return win, doc, gpos - starts[doc] + 1, ids


def fingerprint_counts(batch: pa.Table, L: int, text_col: str = "text",
                       id_col: str = "doc_id") -> pa.Table:
    """Pass-A map side: (fp, n) partial window-fingerprint counts for one
    batch — repeats inside the batch already collapsed, so the exchange
    carries at most one row per (batch, distinct window)."""
    empty = pa.table({"fp": pa.array([], pa.int64()),
                      "n": pa.array([], pa.int64())})
    got = _batch_windows(batch, L, text_col, id_col)
    if got is None:
        return empty
    win = got[0]
    fp, cnt = np.unique(_fingerprint64(np.ascontiguousarray(win)),
                        return_counts=True)
    return pa.table({"fp": pa.array(fp.view(np.int64)),
                     "n": pa.array(cnt.astype(np.int64))})


def candidate_windows(batch: pa.Table, L: int, cand_sorted: np.ndarray,
                      text_col: str = "text",
                      id_col: str = "doc_id") -> pa.Table:
    """Pass-B map side: (fp, gram bytes, doc_id, pos) for windows whose
    fingerprint is in the sorted candidate array — everything else drops
    here, before the exchange."""
    empty = pa.table({
        "fp": pa.array([], pa.int64()),
        "gram": pa.array([], pa.binary()),
        id_col: pa.array([], pa.string()),
        "pos": pa.array([], pa.int64()),
    })
    got = _batch_windows(batch, L, text_col, id_col)
    if got is None:
        return empty
    win, doc, pos, ids = got
    win = np.ascontiguousarray(win)
    fp = _fingerprint64(win)
    if len(cand_sorted):
        at = np.searchsorted(cand_sorted, fp)
        hit = (at < len(cand_sorted)) & (cand_sorted[np.minimum(
            at, len(cand_sorted) - 1)] == fp)
    else:
        hit = np.zeros(len(fp), dtype=bool)
    if not hit.any():
        return empty
    win, fp, doc, pos = win[hit], fp[hit], doc[hit], pos[hit]
    return pa.table({
        "fp": pa.array(fp.view(np.int64)),
        "gram": pa.array(win.view(f"S{win.shape[1]}").ravel(), pa.binary()),
        id_col: pa.array(ids[doc]),
        "pos": pa.array(pos),
    })


def _gram_matrix(grams) -> np.ndarray:
    """(n, L) uint8 matrix of a fixed-width binary column.  Every gram is
    exactly L bytes and non-null, so each CHUNK's value buffer between
    its first and last offset is a dense byte matrix — reshaped
    zero-copy per chunk (no combine_chunks: a >2 GiB partition would
    overflow binary's int32 offsets), then stacked."""
    chunks = grams.chunks if isinstance(grams, pa.ChunkedArray) else [grams]
    mats = []
    for ch in chunks:
        if len(ch) == 0:
            continue
        odt = (np.int64 if pa.types.is_large_binary(ch.type)
               else np.int32)
        offs = np.frombuffer(ch.buffers()[1], dtype=odt)[
            ch.offset:ch.offset + len(ch) + 1
        ]
        data = np.frombuffer(ch.buffers()[2], dtype=np.uint8)
        mats.append(data[offs[0]:offs[-1]].reshape(len(ch), -1))
    if len(mats) == 1:
        return mats[0]
    return np.vstack(mats)


def _unique_rows(win: np.ndarray):
    """np.unique over rows of a uint8 matrix via a void-dtype view —
    bytewise-exact (trailing NUL bytes stay significant, unlike S-dtype)."""
    v = np.ascontiguousarray(win).view(
        np.dtype((np.void, win.shape[1]))
    ).ravel()
    _, inv, cnt = np.unique(v, return_inverse=True, return_counts=True)
    return inv, cnt


def duplicated_spans(ds, L: int = 40, text_col: str = "text",
                     id_col: str = "doc_id", num_parts: int | None = None):
    """Maximal duplicated-substring spans per document: (doc_id, w_start,
    w_end, n_merged) with 1-based inclusive start and exclusive end
    (w_end = last duplicated window start + L).

    Fingerprint-first: pass A ships 8-byte fingerprints only; pass B
    ships window bytes ONLY for fingerprints seen ≥ 2 times globally,
    and re-verifies byte equality inside the partition — exact under
    arbitrary fp collisions (see module docstring)."""
    import ray

    from aisdb_ray.stages._dist import co_shuffle
    from aisdb_ray.stages.join import coalesce_intervals

    # ---- pass A: fingerprint counts -> candidate set (count >= 2) ----
    partials = ds.map_batches(
        lambda b: fingerprint_counts(b, L, text_col, id_col),
        batch_format="pyarrow",
    )

    # ONE fp-keyed hash exchange, then one vectorized group_by per
    # PARTITION (co_shuffle) — never groupby(fp).map_groups: nearly every
    # window is unique, so per-group UDF invocation over millions of
    # 1-row groups dominates (the _dist module-docstring anti-pattern;
    # measured 6x slower on the bench corpus)
    def count_part(part: pa.Table) -> pa.Table:
        g = part.group_by(["fp"], use_threads=False).aggregate([("n", "sum")])
        g = g.rename_columns(["fp", "n"])
        return g.filter(
            pc.greater_equal(g["n"], pa.scalar(2, pa.int64()))
        ).select(["fp"])

    cands_ds = co_shuffle(partials, ["fp"], count_part, num_parts)
    # candidate set: 8 bytes per DISTINCT duplicated window — broadcast
    # once via ray.put.  (If even this outgrows driver memory the design
    # degrades gracefully: feed candidates through a second co-shuffle
    # join instead; at that point the corpus is mostly duplicates and
    # span removal itself is the wrong tool.)
    # empty input can yield blocks with a degenerate (schema-less) layout
    refs = [t for t in ray.get(cands_ds.to_arrow_refs())
            if "fp" in t.schema.names and t.num_rows]
    if refs:
        cand_tbl = pa.concat_tables(refs, promote_options="default")
        cand = np.sort(
            cand_tbl["fp"].to_numpy(zero_copy_only=False).view(np.uint64)
        )
    else:
        cand = np.asarray([], dtype=np.uint64)
    cand_ref = ray.put(cand)

    # ---- pass B: ship candidate windows only; confirm bytes exactly ----
    def pick(b: pa.Table) -> pa.Table:
        return candidate_windows(b, L, ray.get(cand_ref), text_col, id_col)

    wins = ds.map_batches(pick, batch_format="pyarrow")

    def mark_dups(part: pa.Table) -> pa.Table:
        empty = pa.table({id_col: pa.array([], pa.string()),
                          "ps": pa.array([], pa.int64()),
                          "pe": pa.array([], pa.int64())})
        if part.num_rows == 0:
            return empty
        win = _gram_matrix(part["gram"])
        inv, cnt = _unique_rows(win)
        dup = cnt[inv] >= 2
        kept = part.filter(pa.array(dup))
        pos = kept["pos"]
        return pa.table({
            id_col: kept[id_col],
            "ps": pos,
            "pe": pc.add(pos, pa.scalar(L, pa.int64())),
        })

    dups = co_shuffle(wins, ["fp"], mark_dups, num_parts)
    return coalesce_intervals(dups, key=id_col, start="ps", end="pe",
                              num_parts=num_parts)


def _cut_doc(t: bytes, ivs) -> tuple[str, int]:
    """Apply 1-based end-exclusive byte spans to one document."""
    if not ivs:
        return t.decode("utf-8", "ignore"), 0
    mask = np.ones(len(t), dtype=bool)
    for ws, we in ivs:
        mask[ws - 1:we - 1] = False
    arr = np.frombuffer(t, dtype=np.uint8)
    kept = arr[mask].tobytes()
    # byte-span removal can split a multi-byte UTF-8 sequence; decode
    # with 'ignore' drops any orphaned continuation bytes (a no-op on
    # ASCII, where the SQL oracle is byte==char exact)
    return kept.decode("utf-8", "ignore"), len(t) - len(kept)


def remove_spans(ds, spans, text_col: str = "text", id_col: str = "doc_id",
                 broadcast_limit: int = 2_000_000,
                 num_parts: int | None = None):
    """Apply duplicated-span removal (the Lee et al. action step): cut
    every byte in [w_start, w_end) — 1-based, end-exclusive — from each
    document, keeping everything else in order.  Output: (doc_id,
    clean_text, removed_bytes).

    ``spans`` is the output of :func:`duplicated_spans` — a
    ``ray.data.Dataset`` or an already-collected ``pa.Table``.  Two
    execution shapes, chosen by span count:

    - ``<= broadcast_limit`` rows: spans broadcast once via ``ray.put``;
      the corpus streams through ``map_batches`` and never shuffles.
    - above the limit (pathological corpus = O(corpus) spans): spans and
      corpus co-shuffle on ``hash(doc_id)`` — no driver-side span
      materialization, both sides stream; the corpus pays one exchange."""
    import ray
    import ray.data as rd

    from aisdb_ray.stages._dist import co_shuffle

    if isinstance(spans, pa.Table):
        n_spans = spans.num_rows
        spans_tbl, spans_ds = spans, None
    else:
        spans_ds = spans.materialize()  # consumed 1-2x below; spans are
        n_spans = spans_ds.count()      # tiny relative to the corpus
        spans_tbl = None

    if n_spans <= broadcast_limit:
        if spans_tbl is None:
            refs = ray.get(spans_ds.to_arrow_refs())
            spans_tbl = (
                pa.concat_tables(refs, promote_options="default") if refs
                else pa.table({id_col: pa.array([], pa.string()),
                               "w_start": pa.array([], pa.int64()),
                               "w_end": pa.array([], pa.int64())})
            )
        by_doc: dict = {}
        for r in spans_tbl.select([id_col, "w_start", "w_end"]).to_pylist():
            by_doc.setdefault(r[id_col], []).append(
                (int(r["w_start"]), int(r["w_end"]))
            )
        spans_ref = ray.put(by_doc)

        def cut(batch: pa.Table) -> pa.Table:
            sp = ray.get(spans_ref)
            texts = [t if t is not None else b""
                     for t in pc.cast(batch[text_col], pa.binary()).to_pylist()]
            ids = batch[id_col].to_pylist()
            out_text, removed = [], []
            for d, t in zip(ids, texts):
                ct, rm = _cut_doc(t, sp.get(d))
                out_text.append(ct)
                removed.append(rm)
            return pa.table({
                id_col: batch[id_col],
                "clean_text": pa.array(out_text, pa.string()),
                "removed_bytes": pa.array(removed, pa.int64()),
            })

        return ds.map_batches(cut, batch_format="pyarrow")

    # ---- co-shuffle path: spans too big to broadcast ----
    if spans_ds is None:
        spans_ds = rd.from_arrow(spans_tbl)

    # id_col keeps its INPUT type on both sides (the broadcast path never
    # casts it, and the two paths must emit identical schemas); spans come
    # from duplicated_spans over the same corpus, so the types agree.
    def tag_doc(b: pa.Table) -> pa.Table:
        return pa.table({
            id_col: b[id_col],
            "_doc": pa.array(np.ones(b.num_rows, dtype=bool)),
            "_text": pc.cast(b[text_col], pa.binary()),
            "w_start": pa.nulls(b.num_rows, pa.int64()),
            "w_end": pa.nulls(b.num_rows, pa.int64()),
        })

    def tag_span(b: pa.Table) -> pa.Table:
        return pa.table({
            id_col: b[id_col],
            "_doc": pa.array(np.zeros(b.num_rows, dtype=bool)),
            "_text": pa.nulls(b.num_rows, pa.binary()),
            "w_start": pc.cast(b["w_start"], pa.int64()),
            "w_end": pc.cast(b["w_end"], pa.int64()),
        })

    both = ds.map_batches(tag_doc, batch_format="pyarrow").union(
        spans_ds.map_batches(tag_span, batch_format="pyarrow")
    )

    def cut_part(part: pa.Table) -> pa.Table:
        empty = pa.table({
            id_col: pa.array([], part.schema.field(id_col).type),
            "clean_text": pa.array([], pa.string()),
            "removed_bytes": pa.array([], pa.int64()),
        })
        if part.num_rows == 0:
            return empty
        is_doc = part["_doc"].to_numpy(zero_copy_only=False)
        docs = part.filter(pa.array(is_doc))
        sp = part.filter(pa.array(~is_doc))
        by_doc: dict = {}
        for r in sp.select([id_col, "w_start", "w_end"]).to_pylist():
            by_doc.setdefault(r[id_col], []).append(
                (int(r["w_start"]), int(r["w_end"]))
            )
        texts = [t if t is not None else b""
                 for t in docs["_text"].to_pylist()]
        ids = docs[id_col].to_pylist()
        out_text, removed = [], []
        for d, t in zip(ids, texts):
            ct, rm = _cut_doc(t, by_doc.get(d))
            out_text.append(ct)
            removed.append(rm)
        return pa.table({
            id_col: docs[id_col],
            "clean_text": pa.array(out_text, pa.string()),
            "removed_bytes": pa.array(removed, pa.int64()),
        })

    return co_shuffle(both, [id_col], cut_part, num_parts)
