"""Trained subword tokenizer (BPE): distributed pair statistics, a
broadcast merge table, and a fully vectorized corpus encode.

The engine previously only COUNTED pre-tokens (textstats.BPE_PATTERN); a
training-data pipeline also has to PRODUCE a ``tokens`` column.  This module
learns byte-pair merges from the corpus and encodes with them:

- **Count** (distributed): word frequencies via the same algebraic
  partial/groupby-combine as every other aggregate (functions/agg.py) —
  only the deduplicated (word, count) rows ever shuffle.
- **Train** (bounded): merges are learned over the TOP-``vocab_words``
  word-frequency rows (Zipf: a few thousand types cover almost all tokens),
  a deliberately bounded ``sort().limit().take_all()`` exactly like the
  PQ/IVF training samples (ann.py).  The merge loop itself is O(types ×
  merges) driver work on that small table, not a corpus pass.
- **Encode** (distributed, vectorized): the merge table is a closure
  constant (broadcast once per worker, never per batch).  Encoding is
  expressed as a chain of LITERAL string replacements over a
  symbol-delimited form in which every symbol is wrapped in its own
  U+001F pair: canon(text) = each codepoint c becomes SEP+c+SEP, and merge
  (a, b) -> replace(SEP+a+SEP+SEP+b+SEP, SEP+ab+SEP) in training order.
  The full wrapping makes every match symbol-ALIGNED (a symbol interior
  can never contain SEP, so e.g. piece "ban" followed by "a" cannot
  false-match the ("an","a") rule), and each symbol carrying its own
  delimiters keeps left-to-right non-overlapping replacement equal to
  BPE's left-to-right adjacent merge ("aaaa" + (a,a) -> (aa)(aa)).
  Python ``str.replace``, Arrow ``pc.replace_substring`` and DuckDB
  ``replace()`` all substitute non-overlapping occurrences left-to-right,
  so the whole tokenizer — training artifacts embedded as literals — is
  hash-verifiable in SQL (pipelines/queries.py doc_bpe_encode), the same
  trick as the PQ codebooks.  Sennrich's original subword-nmt applies
  merges in learned order exactly like this chain.

Merges never contain whitespace (pairs are counted within \\S+ words only),
so encoding the WHOLE document string at once cannot merge across word
boundaries — one vectorized pass per merge rule over the column, no per-row
Python in the encode path.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

SEP = "\x1f"  # unit separator: never appears in real text


def word_count_partial(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-batch (word, c) partial counts, fully vectorized.

    Strips the structural SEP first, mirroring encode_batch: training on
    un-stripped text would learn merges/vocab containing U+001F that the
    encoder can never produce (wasted merge slots, shifted piece ids)."""
    texts = pc.replace_substring(batch[text_col], pattern=SEP, replacement="")
    wl = pc.split_pattern_regex(texts, pattern=r"\s+")
    flat = pc.list_flatten(wl)
    flat = flat.filter(pc.not_equal(flat, ""))
    g = pa.table({"word": flat}).group_by("word", use_threads=False).aggregate(
        [([], "count_all")]
    )
    return g.rename_columns(["word", "c"])


def corpus_word_counts(ds, text_col: str = "text"):
    """documents -> (word, c) totals; only deduplicated partials shuffle."""

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by("word", use_threads=False).aggregate([("c", "sum")])
        return g.rename_columns(["word", "c"])

    partials = ds.map_batches(
        lambda b: word_count_partial(b, text_col), batch_format="pyarrow"
    )
    local = partials.map_batches(combine, batch_format="pyarrow", batch_size=None)
    return local.groupby("word").map_groups(combine, batch_format="pyarrow")


def corpus_alphabet(ds, text_col: str = "text") -> list[str]:
    """Distributed distinct-codepoint pass -> the sorted base alphabet
    (bounded: alphabet size, not corpus size).  Per batch a C-speed set()
    collapses the text; only distinct chars ever shuffle."""

    def chars(b: pa.Table) -> pa.Table:
        s = set("".join(t for t in b[text_col].to_pylist() if t is not None))
        s.discard(SEP)  # structural delimiter, stripped before encoding
        return pa.table({"ch": pa.array(sorted(s), pa.string())})

    distinct = (
        ds.map_batches(chars, batch_format="pyarrow")
        .groupby("ch")
        .count()
    )
    return sorted(r["ch"] for r in distinct.take_all())


def train_merges(word_counts: list[tuple[str, int]], n_merges: int = 80
                 ) -> list[tuple[str, str]]:
    """Learn BPE merges from a (word, count) table.

    Deterministic: each round picks the adjacent symbol pair with the
    highest total count, ties to the lexicographically smallest pair; the
    pair is merged left-to-right in every word.  Pure function of its
    (bounded) input — the SQL oracle embeds its output, and tests re-run it.
    """
    seqs: list[list[str]] = [list(w) for w, _ in word_counts]
    cnts = [int(c) for _, c in word_counts]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for seq, c in zip(seqs, cnts):
            for j in range(len(seq) - 1):
                p = (seq[j], seq[j + 1])
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < 2:
            break
        merges.append(best)
        a, b = best
        ab = a + b
        for seq in seqs:
            j = 0
            while j < len(seq) - 1:
                if seq[j] == a and seq[j + 1] == b:
                    seq[j : j + 2] = [ab]
                j += 1
    return merges


def fit_bpe(ds, text_col: str = "text", n_merges: int = 80,
            vocab_words: int = 2048) -> list[tuple[str, str]]:
    """Distributed counts -> bounded top-``vocab_words`` table -> merges."""
    wc = corpus_word_counts(ds, text_col)
    top = wc.sort(["c", "word"], descending=[True, False]).limit(
        vocab_words
    ).take_all()  # bounded: vocab_words rows, the training sample
    return train_merges([(r["word"], r["c"]) for r in top], n_merges)


def encode_batch(texts, merges: list[tuple[str, str]]):
    """Arrow string array -> encoded piece-string array (pieces separated by
    SEP).  One vectorized C pass per merge rule, no per-row Python."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    # the U+001F separator is the canon's structural delimiter — a raw
    # document containing it would misparse piece boundaries (identically
    # on the SQL side, so the hash gate could not catch it): strip it
    # first, mirrored in encode_sql
    texts = pc.replace_substring(texts, pattern=SEP, replacement="")
    # canon: wrap every codepoint in its own SEP pair ((?s): '.' must match
    # newlines too) so merge matches are always symbol-aligned
    out = pc.replace_substring_regex(
        texts, pattern="(?s)(.)", replacement=SEP + "\\1" + SEP
    )
    for a, b in merges:
        out = pc.replace_substring(
            out,
            pattern=SEP + a + SEP + SEP + b + SEP,
            replacement=SEP + a + b + SEP,
        )
    # unwrap: boundary double-SEP -> single, strip the outer pair
    out = pc.replace_substring(out, pattern=SEP + SEP, replacement=SEP)
    return pc.replace_substring_regex(
        out, pattern="^" + SEP + "|" + SEP + "$", replacement=""
    )


def piece_vocab(merges: list[tuple[str, str]], base: list[str]) -> dict[str, int]:
    """id table: sorted base alphabet first, merged pieces after in training
    order (stable ids under a fixed merge list)."""
    vocab = {ch: i for i, ch in enumerate(sorted(base))}
    for a, b in merges:
        piece = a + b
        if piece not in vocab:
            vocab[piece] = len(vocab)
    return vocab


# Single-slot cache: exactly one vocab is live per pipeline build, so one
# slot keeps the per-batch speedup without pinning every vocab a long-lived
# worker ever sees (the old id()-keyed dict grew without bound and held a
# strong reference to each dict plus its sorted key/value arrays forever).
_LOOKUP_CACHE: list[tuple] = []


def _vocab_lookup(vocab: dict[str, int]) -> tuple[np.ndarray, np.ndarray]:
    """Sorted (keys, vals) arrays for a vocab, built once per worker.  The
    slot holds a strong reference to the dict, so identity (`is`) can never
    alias a recycled object while cached; a different vocab evicts it."""
    if _LOOKUP_CACHE and _LOOKUP_CACHE[0][0] is vocab:
        return _LOOKUP_CACHE[0][1], _LOOKUP_CACHE[0][2]
    keys = np.array(sorted(vocab), dtype=object)
    vals = np.array([vocab[k] for k in keys], dtype=np.int32)
    _LOOKUP_CACHE[:] = [(vocab, keys, vals)]
    return keys, vals


def _ids_of_pieces(flat, vocab: dict[str, int]) -> np.ndarray:
    """Flat piece array -> int32 ids via a numpy searchsorted over the
    (per-worker constant) vocab — no per-token dict loop; unknown -> -1."""
    keys, vals = _vocab_lookup(vocab)
    fl = flat.to_numpy(zero_copy_only=False)
    if len(keys) == 0:
        # empty vocab (artifacts trained on an empty/all-null corpus):
        # every piece is out-of-vocab — the skip-bad posture, not a crash
        # (np.clip(idx, 0, -1) would index keys[-1] into an empty array)
        return np.full(len(fl), -1, np.int32)
    idx = np.clip(np.searchsorted(keys, fl), 0, len(keys) - 1)
    ok = keys[idx] == fl
    return np.where(ok, vals[idx], -1).astype(np.int32)


def encode_ids_batch(texts, merges, vocab: dict[str, int]):
    """Arrow string array -> list<int32> token ids (the `tokens` column a
    training pipeline materializes).  Splitting the encoded string on SEP is
    one Arrow pass; the piece->id lookup is vectorized.  Empty documents
    yield EMPTY lists (an empty text encodes to one empty piece — id -1
    otherwise), and out-of-vocab pieces are dropped (the skip-bad posture;
    token_ids_sql's inner join does the same)."""
    enc = encode_batch(texts, merges)
    pieces = pc.split_pattern(enc, pattern=SEP)
    if isinstance(pieces, pa.ChunkedArray):
        pieces = pieces.combine_chunks()
    flat = pc.list_flatten(pieces)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    keep_idx = np.flatnonzero(keep)
    ids = _ids_of_pieces(flat.filter(pa.array(keep)), vocab)
    good = ids >= 0
    keep_idx, ids = keep_idx[good], ids[good]
    par = pc.list_parent_indices(pieces).to_numpy(zero_copy_only=False)
    counts = np.bincount(par[keep_idx], minlength=len(pieces))
    offsets = np.r_[0, np.cumsum(counts)].astype(np.int32)
    return pa.ListArray.from_arrays(
        pa.array(offsets, pa.int32()), pa.array(ids, pa.int32())
    )


def decode_ids(ids, vocab: dict[str, int]) -> str:
    """Token ids -> original text (pieces concatenate losslessly)."""
    inv = {v: k for k, v in vocab.items()}
    return "".join(inv[int(i)] for i in ids)


def encode_documents(ds, merges: list[tuple[str, str]],
                     text_col: str = "text"):
    """documents -> (doc_id, enc, n_pieces): the hash-verifiable surface.
    ``merges`` is a small closure constant — shipped once per worker."""

    def per_batch(b: pa.Table) -> pa.Table:
        enc = encode_batch(b[text_col], merges)
        n_sep = pc.count_substring(enc, pattern=SEP)
        nonzero = pc.cast(pc.greater(pc.utf8_length(enc), 0), pa.int64())
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "enc": enc,
                "n_pieces": pc.add(pc.cast(n_sep, pa.int64()), nonzero),
            }
        )

    return ds.map_batches(per_batch, batch_format="pyarrow")


def encode_token_ids(ds, merges: list[tuple[str, str]], vocab: dict[str, int],
                     text_col: str = "text"):
    """documents -> exploded (doc_id, pos, token_id): the `tokens` column a
    training pipeline materializes, in the long form a value-hash gate can
    compare.  pos is 1-based (SQL generate_series parity)."""

    def per_batch(b: pa.Table) -> pa.Table:
        enc = encode_batch(b[text_col], merges)
        pieces = pc.split_pattern(enc, pattern=SEP)
        if isinstance(pieces, pa.ChunkedArray):
            pieces = pieces.combine_chunks()
        flat = pc.list_flatten(pieces)
        ids = _ids_of_pieces(flat, vocab)
        parent = pc.list_parent_indices(pieces)
        offs = pieces.offsets.to_numpy(zero_copy_only=False)
        pidx = parent.to_numpy(zero_copy_only=False)
        pos = np.arange(len(flat), dtype=np.int64) - offs[pidx] + 1
        # empty text -> enc "" -> one empty piece: emit no token rows;
        # out-of-vocab pieces (id -1, possible when replaying cached
        # artifacts against new text) drop too — the SQL oracle's inner
        # vocab join does the same
        keep = pa.array(
            pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
            & (ids >= 0)
        )
        return pa.table(
            {
                "doc_id": b["doc_id"].take(parent),
                "pos": pa.array(pos, pa.int64()),
                "token_id": pa.array(ids.astype(np.int64), pa.int64()),
            }
        ).filter(keep)

    return ds.map_batches(per_batch, batch_format="pyarrow")


def token_ids_sql(merges: list[tuple[str, str]], vocab: dict[str, int],
                  docs_table: str = "documents") -> str:
    """SQL restatement of the ids path: the learned vocab embeds as a
    literal table; pieces come from splitting the (replayed) encoded string
    and join to their ids positionally."""

    def q(s: str) -> str:
        return s.replace("'", "''")

    enc_inner = encode_sql(merges, docs_table)
    vals = ", ".join(f"('{q(p)}', {i})" for p, i in sorted(vocab.items()))
    return f"""WITH enc AS ({enc_inner}),
  s AS (SELECT doc_id, string_split(enc, chr(31)) AS ps FROM enc
        WHERE length(enc) > 0),
  x AS (
    SELECT doc_id, CAST(i AS BIGINT) AS pos, ps[i] AS piece
    FROM s, LATERAL (SELECT unnest(generate_series(1, len(ps))) AS i) t
  ),
  vocab(piece, id) AS (VALUES {vals})
SELECT x.doc_id, x.pos, CAST(v.id AS BIGINT) AS token_id
FROM x JOIN vocab v ON v.piece = x.piece"""


def encode_sql(merges: list[tuple[str, str]],
               docs_table: str = "documents") -> str:
    """SQL restatement with the LEARNED merge table embedded as literals:
    the same canon + left-to-right literal-replace chain, so the encoded
    strings hash-match byte for byte."""

    def q(s: str) -> str:
        return s.replace("'", "''")

    s31 = "chr(31)"
    # strip the structural delimiter first — mirrors encode_batch
    expr = (f"regexp_replace(replace(text, {s31}, ''), '(?s)(.)', "
            f"{s31} || '\\1' || {s31}, 'g')")
    for a, b in merges:
        expr = (f"replace({expr}, {s31} || '{q(a)}' || {s31} || {s31} || "
                f"'{q(b)}' || {s31}, {s31} || '{q(a + b)}' || {s31})")
    expr = (f"regexp_replace(replace({expr}, {s31} || {s31}, {s31}), "
            f"'^' || {s31} || '|' || {s31} || '$', '', 'g')")
    return f"""WITH e AS (SELECT doc_id, {expr} AS enc FROM {docs_table})
SELECT doc_id, enc,
       CAST(length(enc) - length(replace(enc, chr(31), ''))
            + CASE WHEN length(enc) > 0 THEN 1 ELSE 0 END AS BIGINT) AS n_pieces
FROM e"""
