"""Corpus scrubbing + chunking — the last mile before tokenization.

Two per-batch, fully vectorized text transforms a training-data pipeline
runs on every document:

- ``scrub``: pattern redaction (PII and anything else expressible as RE2)
  via chained ``pc.replace_substring_regex`` — one C pass per pattern, no
  per-row Python.  Arrow and DuckDB both compile RE2, so the SQL oracle's
  nested ``regexp_replace(..., 'g')`` replays the engine's semantics
  exactly (same regex dialect, same all-occurrences rule, same order).
  The reference's CSV sanitizer (M6, /root/reference/aisdb/proc_util.py:
  14-31) is the fixed-pattern ancestor.

- ``chunk_documents``: split each document into fixed-width codepoint
  windows with overlap (the training-chunking shape).  Row-expanding but
  still vectorized: one ``utf8_slice_codeunits`` call per chunk INDEX (a
  small loop over k, not over rows), each slicing every surviving document
  at once.  Arrow slices and DuckDB ``substr`` both count codepoints
  (verified on CJK text), so the oracle is ``generate_series`` + substr.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# stock PII patterns (RE2-safe: no lookaround, no backrefs); applied in
# list order — order matters when patterns could overlap (emails contain
# dots that the URL pattern must not eat first)
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("url", r"https?://[^\s]+", "<URL>"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+?[0-9][0-9()\-\s]{6,}[0-9]", "<PHONE>"),
]


def scrub_batch(b: pa.Table, col: str,
                patterns: list[tuple[str, str, str]] = PII_PATTERNS,
                out_col: str | None = None) -> pa.Table:
    """Chained all-occurrence regex redaction of one string column."""
    s = b[col]
    for _name, pat, repl in patterns:
        s = pc.replace_substring_regex(s, pattern=pat, replacement=repl)
    out = out_col or col
    if out in b.column_names:
        b = b.drop_columns([out])
    return b.append_column(out, s)


def scrub(ds, col: str,
          patterns: list[tuple[str, str, str]] = PII_PATTERNS,
          out_col: str | None = None):
    return ds.map_batches(
        lambda b: scrub_batch(b, col, patterns, out_col),
        batch_format="pyarrow",
    )


def scrub_sql(col: str,
              patterns: list[tuple[str, str, str]] = PII_PATTERNS) -> str:
    """The DuckDB expression mirroring scrub_batch: nested regexp_replace
    in the same pattern order, global flag (RE2 on both sides)."""
    expr = col
    for _name, pat, repl in patterns:
        p = pat.replace("'", "''")
        r = repl.replace("'", "''")
        expr = f"regexp_replace({expr}, '{p}', '{r}', 'g')"
    return expr


def normalize_batch(b: pa.Table, col: str, out_col: str | None = None) -> pa.Table:
    """Canonical text normalization: NFC → lowercase → collapse whitespace
    runs to one space → trim edge spaces.

    NFC: Arrow's utf8_normalize(form="NFC") does NOT compose on this
    pyarrow build (measured: 'é' → 'e'+U+0301, diverging from DuckDB's
    nfc_normalize), so composition runs through unicodedata on exactly the
    rows containing non-ASCII bytes — NFC is the identity on ASCII, so the
    common path stays fully vectorized.  utf8_lower matches SQL lower()
    codepoint-for-codepoint (verified incl. ẞ→ß and fullwidth forms); the
    trim strips ASCII space only, mirroring SQL trim()'s default."""
    import unicodedata

    s = b[col]
    if isinstance(s, pa.ChunkedArray):
        s = s.combine_chunks()
    if pa.types.is_large_string(s.type):
        # replace_with_mask has no large_string kernel; the normalize
        # stage must not die the moment a large-writer corpus batch
        # carries one non-ASCII char
        s = pc.cast(s, pa.string())
    mask = pc.fill_null(pc.match_substring_regex(s, r"[^\x00-\x7F]"), False)
    if pc.any(mask).as_py():
        fixed = pa.array(
            [unicodedata.normalize("NFC", v) for v in s.filter(mask).to_pylist()],
            pa.string(),
        )
        s = pc.replace_with_mask(s, mask, fixed)
    s = pc.utf8_lower(s)
    s = pc.replace_substring_regex(s, pattern=r"\s+", replacement=" ")
    s = pc.utf8_trim(s, characters=" ")
    out = out_col or col
    if out in b.column_names:
        b = b.drop_columns([out])
    return b.append_column(out, s)


def normalize_text(ds, col: str, out_col: str | None = None):
    return ds.map_batches(
        lambda b: normalize_batch(b, col, out_col), batch_format="pyarrow"
    )


def chunk_table(b: pa.Table, id_col: str = "doc_id",
                text_col: str = "text", chunk_chars: int = 100,
                overlap: int = 20, carry_cols: tuple = ()) -> pa.Table:
    """Table-level chunking kernel (see :func:`chunk_documents`) — exposed
    so per-partition pipelines (pipelines/corpus.py) can chunk inside a
    partition task without a Dataset wrapper."""
    if not 0 <= overlap < chunk_chars:
        raise ValueError("need 0 <= overlap < chunk_chars")
    stride = chunk_chars - overlap
    n = pc.utf8_length(b[text_col])
    nmax = pc.max(n).as_py()
    outs = []
    k = 0
    while nmax is not None and k * stride < nmax:
        start = k * stride
        t = b.filter(pc.greater(n, start))
        piece = pc.utf8_slice_codeunits(
            t[text_col], start=start, stop=start + chunk_chars
        )
        outs.append(
            pa.table(
                {
                    id_col: t[id_col],
                    "chunk_idx": pa.array(
                        np.full(t.num_rows, k, np.int64)
                    ),
                    "chunk_text": piece,
                    "chunk_chars_n": pc.cast(
                        pc.utf8_length(piece), pa.int64()
                    ),
                    **{c: t[c] for c in carry_cols},
                }
            )
        )
        k += 1
    if not outs:
        return pa.table(
            {
                id_col: b[id_col].slice(0, 0),
                "chunk_idx": pa.array([], pa.int64()),
                # match the non-empty branch's output type exactly —
                # a string/large_string mix breaks block unification
                "chunk_text": pa.array(
                    [], pa.string()
                    if not pa.types.is_large_string(b[text_col].type)
                    else pa.large_string()),
                "chunk_chars_n": pa.array([], pa.int64()),
                **{c: b[c].slice(0, 0) for c in carry_cols},
            }
        )
    return pa.concat_tables(outs)



def chunk_documents(ds, id_col: str = "doc_id", text_col: str = "text",
                    chunk_chars: int = 100, overlap: int = 20,
                    carry_cols: tuple = ()):
    """Each document -> overlapping fixed-width codepoint chunks.

    Chunk k covers codepoints [k*stride, k*stride + chunk_chars) with
    stride = chunk_chars - overlap; chunks exist for every start < length
    (empty documents produce no chunks).  Output: (id, chunk_idx,
    chunk_text, chunk_chars_n [, carry_cols...]) — ``carry_cols`` are
    per-document columns replicated onto every chunk (e.g. a language tag).
    """
    return ds.map_batches(
        lambda b: chunk_table(b, id_col, text_col, chunk_chars, overlap,
                              carry_cols),
        batch_format="pyarrow",
    )


def chunk_token_sequences(ds, id_col: str = "doc_id",
                          tokens_col: str = "tokens",
                          window: int = 64, overlap: int = 16):
    """Pre-tokenized sequences -> fixed-length training windows.

    The token-level twin of :func:`chunk_documents`, operating directly on
    the engine's native ``list<int32>`` payload: window k of a document
    covers token positions [k*stride, k*stride + window).  Vectorized per
    window INDEX via ``pc.list_slice`` (one Arrow kernel call slices every
    surviving document's list at once); per-window evidence (length, sum,
    first, last — all int64) derives from the flattened child buffer with
    ``np.add.reduceat``, so the output is hash-comparable against DuckDB
    list slicing without shipping list columns through the compare.
    """
    if not 0 <= overlap < window:
        raise ValueError("need 0 <= overlap < window")
    stride = window - overlap

    def expand(b: pa.Table) -> pa.Table:
        toks = b[tokens_col]
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat_all = pc.list_flatten(toks)
        if flat_all.null_count:
            # a null ELEMENT flattens to NaN and casts to INT64_MIN —
            # garbage window evidence with no error; drop such rows
            par = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
            bad = np.unique(
                par[pc.is_null(flat_all).to_numpy(zero_copy_only=False)]
            )
            keepm = np.ones(b.num_rows, dtype=bool)
            keepm[bad] = False
            b = b.filter(pa.array(keepm))
        n = pc.list_value_length(b[tokens_col])
        nmax = pc.max(n).as_py()
        outs = []
        k = 0
        while nmax is not None and k * stride < nmax:
            start = k * stride
            t = b.filter(pc.greater(n, start))
            win = pc.list_slice(t[tokens_col], start=start, stop=start + window)
            lens = pc.list_value_length(win).to_numpy(zero_copy_only=False).astype(np.int64)
            flat = pc.list_flatten(win).to_numpy(zero_copy_only=False).astype(np.int64)
            offs = np.zeros(len(lens), dtype=np.int64)
            np.cumsum(lens[:-1], out=offs[1:])
            outs.append(
                pa.table(
                    {
                        id_col: t[id_col],
                        "win_idx": pa.array(np.full(t.num_rows, k, np.int64)),
                        "win_len": pa.array(lens),
                        "tok_sum": pa.array(np.add.reduceat(flat, offs) if len(lens) else np.array([], np.int64)),
                        "tok_first": pa.array(flat[offs] if len(lens) else np.array([], np.int64)),
                        "tok_last": pa.array(flat[offs + lens - 1] if len(lens) else np.array([], np.int64)),
                    }
                )
            )
            k += 1
        if not outs:
            return pa.table(
                {
                    id_col: b[id_col].slice(0, 0),
                    "win_idx": pa.array([], pa.int64()),
                    "win_len": pa.array([], pa.int64()),
                    "tok_sum": pa.array([], pa.int64()),
                    "tok_first": pa.array([], pa.int64()),
                    "tok_last": pa.array([], pa.int64()),
                }
            )
        return pa.concat_tables(outs)

    return ds.map_batches(expand, batch_format="pyarrow")
