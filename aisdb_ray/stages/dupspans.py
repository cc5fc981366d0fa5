"""Exact duplicated-substring spans — the suffix-array dedup signal of
Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
Better", public) restated as a shared-nothing n-gram pipeline:

1. **windows**: every length-``L`` byte window of every document,
   extracted per batch with ONE stride-tricks view over the batch's
   concatenated text buffer (no per-character Python; windows crossing
   document boundaries are dropped vectorized).
2. **route**: one hash exchange keyed by an 8-byte window prefix — any
   function of the window routes equal windows together; exact grouping
   happens inside the partition via ``np.unique`` on the window bytes,
   so the route key needs no collision-freedom.  At 100 TB you would
   ship a 64-bit fingerprint first and verify in a second pass; here the
   windows themselves travel (bounded: corpus × L bytes) so the result
   is exact by construction — the documented trade.
3. **mark**: a window whose byte string occurs ≥ 2 times anywhere in
   the corpus (same doc or cross-doc, like the suffix-array criterion)
   marks its (doc, position) as duplicated.
4. **spans**: duplicated positions coalesce into maximal spans per doc
   (overlap-or-touch, ``pos_j ≤ pos_i + L``) — exactly
   :func:`aisdb_ray.stages.join.coalesce_intervals`.

Byte semantics: windows are byte windows (UTF-8); on ASCII corpora this
equals the character windows the SQL oracle takes with ``substr``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def window_positions(batch: pa.Table, L: int, text_col: str = "text",
                     id_col: str = "doc_id") -> pa.Table:
    """(gram bytes, route hash, doc_id, 1-based pos) for every in-doc
    length-L byte window of the batch — fully vectorized."""
    empty = pa.table({
        "gram": pa.array([], pa.binary()),
        "gh": pa.array([], pa.int64()),
        id_col: pa.array([], pa.string()),
        "pos": pa.array([], pa.int64()),
    })
    if batch.num_rows == 0:
        return empty
    texts = [t if t is not None else b""
             for t in pc.cast(batch[text_col], pa.binary()).to_pylist()]
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    buf = b"".join(texts)
    if len(buf) < L:
        return empty
    lens = np.asarray([len(t) for t in texts], dtype=np.int64)
    starts = np.r_[0, np.cumsum(lens)[:-1]]
    arr = np.frombuffer(buf, dtype=np.uint8)
    win = np.ascontiguousarray(
        np.lib.stride_tricks.sliding_window_view(arr, L)
    )
    gpos = np.arange(len(win), dtype=np.int64)
    doc = np.searchsorted(starts, gpos, side="right") - 1
    ok = gpos + L <= starts[doc] + lens[doc]
    win, gpos, doc = win[ok], gpos[ok], doc[ok]
    if len(win) == 0:
        return empty
    grams = win.view(f"S{L}").ravel()
    # route key: first 8 window bytes as little-endian int64 (any pure
    # function of the gram works — exactness comes from np.unique later)
    gh = win[:, :8].copy().view("<i8").ravel() if L >= 8 else (
        np.frombuffer(
            np.pad(win, ((0, 0), (0, 8 - L))).tobytes(), dtype="<i8"
        )
    )
    return pa.table({
        "gram": pa.array(grams, pa.binary()),
        "gh": pa.array(gh.astype(np.int64)),
        id_col: pa.array(ids[doc]),
        "pos": pa.array(gpos - starts[doc] + 1),
    })


def duplicated_spans(ds, L: int = 40, text_col: str = "text",
                     id_col: str = "doc_id", num_parts: int | None = None):
    """Maximal duplicated-substring spans per document: (doc_id, w_start,
    w_end, n_merged) with 1-based inclusive start and exclusive end
    (w_end = last duplicated window start + L)."""
    from aisdb_ray.stages._dist import co_shuffle
    from aisdb_ray.stages.join import coalesce_intervals

    wins = ds.map_batches(
        lambda b: window_positions(b, L, text_col, id_col),
        batch_format="pyarrow",
    )

    def mark_dups(part: pa.Table) -> pa.Table:
        grams = np.asarray(part["gram"].to_numpy(zero_copy_only=False),
                           dtype=bytes)
        if len(grams) == 0:
            return pa.table({id_col: pa.array([], pa.string()),
                             "ps": pa.array([], pa.int64()),
                             "pe": pa.array([], pa.int64())})
        _, inv, cnt = np.unique(grams, return_inverse=True,
                                return_counts=True)
        dup = cnt[inv] >= 2
        kept = part.filter(pa.array(dup))
        pos = kept["pos"]
        return pa.table({
            id_col: kept[id_col],
            "ps": pos,
            "pe": pc.add(pos, pa.scalar(L, pa.int64())),
        })

    dups = co_shuffle(wins, ["gh"], mark_dups, num_parts)
    return coalesce_intervals(dups, key=id_col, start="ps", end="pe",
                              num_parts=num_parts)


def remove_spans(ds, spans: pa.Table, text_col: str = "text",
                 id_col: str = "doc_id"):
    """Apply duplicated-span removal (the Lee et al. action step): cut
    every byte in [w_start, w_end) — 1-based, end-exclusive — from each
    document, keeping everything else in order.  ``spans`` is the (small
    by construction — one row per maximal duplicated region) output of
    :func:`duplicated_spans`, broadcast once via ``ray.put``; the corpus
    streams through ``map_batches`` and never shuffles.  Output:
    (doc_id, clean_text, removed_bytes)."""
    import ray

    by_doc: dict = {}
    for r in spans.select([id_col, "w_start", "w_end"]).to_pylist():
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
            ivs = sp.get(d)
            if not ivs:
                out_text.append(t.decode("utf-8", "ignore"))
                removed.append(0)
                continue
            mask = np.ones(len(t), dtype=bool)
            for ws, we in ivs:
                mask[ws - 1:we - 1] = False
            arr = np.frombuffer(t, dtype=np.uint8)
            kept = arr[mask].tobytes()
            # byte-span removal can split a multi-byte UTF-8 sequence;
            # decode with 'ignore' drops any orphaned continuation bytes
            # (a no-op on ASCII, where the SQL oracle is byte==char exact)
            out_text.append(kept.decode("utf-8", "ignore"))
            removed.append(len(t) - len(kept))
        return pa.table({
            id_col: batch[id_col],
            "clean_text": pa.array(out_text, pa.string()),
            "removed_bytes": pa.array(removed, pa.int64()),
        })

    return ds.map_batches(cut, batch_format="pyarrow")
