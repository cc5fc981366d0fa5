"""Deterministic synthetic token-table fixtures (FIXTURES.md).

Mirrors the reference's test-data strategy — small inputs pushed through the
production path plus a deliberately corrupt corpus the pipeline must survive
(/root/reference/aisdb/tests/create_testing_data.py:57-68,
/root/reference/aisdb_lib/src/decode.rs:446-485) — with a seeded, fully
vectorized generator of the ``input_hint`` table shape:

    (doc_id: string, tokens: list<int32>, n_tok: int32, source: string)

``doc_id`` encodes the row's epoch seconds as ``{source}:{epoch:010d}:{seq:04d}``
so the engine can *derive* time, the way the reference derives epochs from
payload headers (/root/reference/aisdb_lib/src/decode.rs:60-114).

Injected anomalies (seeded, so oracles can recompute expectations):
duplicates, out-of-order rows, short/long gaps, length-1 series, same-second
bursts, invalid rows (n_tok <= 0 or len(tokens) != n_tok), one hot source
holding ~30% of rows (Zipf-ish skew).
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SEED = 42
T0 = 1_700_000_000  # 2023-11-14T22:13:20Z; all fixture epochs start here
VOCAB = 50_257


@dataclass(frozen=True)
class FixtureParams:
    n_rows: int
    n_sources: int
    step: int = 60            # base cadence, seconds
    ntok_max: int = 4096
    ntok_start: int = 512
    hot_frac: float = 0.30    # share of rows held by the single hot source
    p_gap_short: float = 0.05  # 2-5 missed steps (gap-fillable)
    p_gap_long: float = 0.01   # >= long_gap_steps steps (segment split)
    long_gap_steps: int = 240  # 4h at step=60 — beyond any split threshold used in tests
    p_burst: float = 0.03      # same-second rows (seq disambiguates)
    p_dup: float = 0.02        # exact duplicate rows appended
    p_invalid: float = 0.01    # corrupt rows: n_tok<=0 or len(tokens)!=n_tok
    n_single: int = 0          # sources forced to exactly one row
    seed: int = SEED


SCALES: dict[str, FixtureParams] = {
    # ~2.5k rows, like the reference's 2,499-row CSV test corpus
    "t0-micro": FixtureParams(n_rows=2_500, n_sources=8, n_single=1),
    "t1-small": FixtureParams(n_rows=60_000, n_sources=64, n_single=4),
    # bench tier: token payloads kept short so generation+IO stay tractable
    "bench": FixtureParams(
        n_rows=10_000_000, n_sources=512, ntok_max=96, ntok_start=48, n_single=8
    ),
}


def _source_row_counts(p: FixtureParams, rng: np.random.Generator) -> np.ndarray:
    """Zipf-skewed rows-per-source with one hot source and forced singletons."""
    s = p.n_sources
    if s == 1:  # the zipf tail weights are 0/0 for a single source
        return np.array([p.n_rows], dtype=np.int64)
    w = 1.0 / np.arange(1, s + 1, dtype=np.float64) ** 1.1
    w[0] = 0.0
    w = w / w.sum() * (1.0 - p.hot_frac)
    w[0] = p.hot_frac
    counts = np.floor(w * p.n_rows).astype(np.int64)
    # bump empty tail sources to 1 BEFORE settling the remainder on the
    # hot source, so the total stays exactly n_rows (the old
    # maximum-after-remainder order silently inflated it)
    counts = np.maximum(counts, 1)
    counts[0] += p.n_rows - counts.sum()
    if counts[0] < 1:
        raise ValueError(
            f"FixtureParams: n_rows={p.n_rows} too small for "
            f"n_sources={p.n_sources} (hot source would get {counts[0]})")
    if p.n_single:
        # the last n_single sources become length-1 series
        idx = np.arange(s - p.n_single, s)
        counts[0] += counts[idx].sum() - len(idx)
        counts[idx] = 1
    return counts


def _per_source_epochs(c: int, p: FixtureParams, rng: np.random.Generator) -> np.ndarray:
    """Epoch vector for one source: base cadence with seeded gap/burst anomalies."""
    t0 = T0 + int(rng.integers(0, 86_400))
    if c == 1:
        return np.array([t0], dtype=np.int64)
    r = rng.random(c - 1)
    deltas = np.full(c - 1, p.step, dtype=np.int64)
    burst = r < p.p_burst
    short = (r >= p.p_burst) & (r < p.p_burst + p.p_gap_short)
    longg = (r >= p.p_burst + p.p_gap_short) & (
        r < p.p_burst + p.p_gap_short + p.p_gap_long
    )
    deltas[burst] = 0
    deltas[short] = p.step * rng.integers(2, 6, short.sum())
    deltas[longg] = p.step * p.long_gap_steps * rng.integers(1, 4, longg.sum())
    out = np.empty(c, dtype=np.int64)
    out[0] = t0
    np.cumsum(deltas, out=out[1:])
    out[1:] += t0
    return out


def _seq_within_epoch(epochs: np.ndarray) -> np.ndarray:
    """0,1,2,... within runs of equal epoch (input sorted ascending)."""
    c = len(epochs)
    first = np.flatnonzero(np.r_[True, epochs[1:] != epochs[:-1]])
    rep = np.diff(np.r_[first, c])
    return (np.arange(c) - np.repeat(first, rep)).astype(np.int32)


def build_token_table(params: FixtureParams | str) -> pa.Table:
    """Build the synthetic input table. Pure function of (params, seed)."""
    p = SCALES[params] if isinstance(params, str) else params
    rng = np.random.default_rng(p.seed)
    counts = _source_row_counts(p, rng)

    src_idx = np.repeat(np.arange(p.n_sources), counts)
    epochs = np.empty(counts.sum(), dtype=np.int64)
    seqs = np.empty(counts.sum(), dtype=np.int32)
    off = 0
    for s in range(p.n_sources):
        c = int(counts[s])
        e = _per_source_epochs(c, p, rng)
        epochs[off : off + c] = e
        seqs[off : off + c] = _seq_within_epoch(e)
        off += c

    n = len(epochs)
    # value channel: clipped random walk per the FIXTURES.md spec
    walk = rng.integers(-40, 41, n).astype(np.int64)
    v = p.ntok_start + np.cumsum(walk)
    m = p.ntok_max
    n_tok = np.clip(np.abs((v % (2 * m)) - m), 1, m).astype(np.int32)  # reflecting walk

    # corrupt rows: half get n_tok <= 0, half get a token-length mismatch
    tok_len = n_tok.astype(np.int64).copy()
    n_bad = int(n * p.p_invalid)
    bad = rng.choice(n, size=n_bad, replace=False) if n_bad else np.array([], np.int64)
    half = n_bad // 2
    n_tok = n_tok.copy()
    n_tok[bad[:half]] = -np.int32(1) * rng.integers(0, 3, half).astype(np.int32)
    tok_len[bad[half:]] += 3  # len(tokens) != n_tok

    # token payload: one flat PRNG stream split by offsets (zero-copy list array)
    total = int(tok_len.sum())
    flat = rng.integers(0, VOCAB, total, dtype=np.int32)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(tok_len, out=offsets[1:])
    if total < 2**31:
        tokens = pa.ListArray.from_arrays(
            pa.array(offsets, type=pa.int32()), pa.array(flat)
        )
    else:
        # stay large_list: casting to list<int32> requires the final
        # offset (== total) to fit int32, which is false whenever this
        # branch runs — the downstream stages accept either list layout
        tokens = pa.LargeListArray.from_arrays(
            pa.array(offsets, type=pa.int64()), pa.array(flat)
        )

    # duplicates + global out-of-order shuffle.  The permutation applies to
    # the NUMPY columns (fancy indexing, no 32-bit Arrow offsets involved)
    # and to the single (non-chunked) tokens ListArray via Arrow take; the
    # utf8 doc_id column is then built chunk-wise FROM the permuted numpy
    # arrays.  Arrow take on a CHUNKED utf8 column concatenates the chunks
    # first, which at ~100 M rows crosses the 2 GiB 32-bit-offset capacity
    # ("offset overflow while concatenating arrays") — so doc_id is never
    # taken, only built.
    n_dup = int(n * p.p_dup)
    dup = rng.choice(n, size=n_dup, replace=False) if n_dup else np.array([], np.int64)
    sel = rng.permutation(np.r_[np.arange(n), dup])

    tokens_shuf = tokens.take(pa.array(sel))
    src_sel = src_idx[sel]
    epochs_sel = epochs[sel]
    seqs_sel = seqs[sel]
    n_tok_sel = n_tok[sel]

    # doc_id = source:epoch10:seq4 — vectorized string build, chunked so no
    # intermediate utf8 array crosses the 2 GiB 32-bit-offset capacity
    width = len(str(p.n_sources - 1)) if p.n_sources > 1 else 1
    names = np.char.add("src-", np.char.zfill(np.arange(p.n_sources).astype(str), width))
    CH = 8_000_000
    total_rows = len(sel)
    doc_chunks = []
    src_chunks = []
    for i in range(0, total_rows, CH):
        sl = slice(i, min(total_rows, i + CH))
        ep_str = pc.utf8_lpad(pc.cast(pa.array(epochs_sel[sl]), pa.string()), 10, "0")
        seq_str = pc.utf8_lpad(pc.cast(pa.array(seqs_sel[sl]), pa.string()), 4, "0")
        name_arr = pa.array(names[src_sel[sl]])
        doc_chunks.append(
            pc.binary_join_element_wise(name_arr, ep_str, seq_str, ":")
        )
        src_chunks.append(name_arr)

    return pa.table(
        {
            "doc_id": pa.chunked_array(doc_chunks),
            "tokens": tokens_shuf,
            "n_tok": pa.array(n_tok_sel),
            "source": pa.chunked_array(src_chunks),
        }
    )


def write_token_dataset(
    table_or_scale: pa.Table | str,
    out_dir: str,
    rows_per_file: int = 250_000,
) -> str:
    """Write the fixture as a directory of parquet files (parallel-readable).

    Idempotent: if ``out_dir`` already holds a ``_SUCCESS`` marker it is reused
    — callers can treat this as a deterministic content-addressed cache.
    """
    marker = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(marker):
        return out_dir
    t = (
        build_token_table(table_or_scale)
        if isinstance(table_or_scale, (str, FixtureParams))
        else table_or_scale
    )
    # per-process staging dir: two concurrent builders sharing one tmp
    # path could interleave files and publish the mix under _SUCCESS
    tmp = f"{out_dir}.tmp-{os.getpid()}"
    if os.path.exists(tmp):
        import shutil

        shutil.rmtree(tmp)
    os.makedirs(tmp, exist_ok=True)
    n = t.num_rows
    k = max(1, math.ceil(n / rows_per_file))
    for i in range(k):
        sl = t.slice(i * rows_per_file, rows_per_file)
        pq.write_table(sl, os.path.join(tmp, f"part-{i:05d}.parquet"))
    with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
        f.write("ok\n")
    if os.path.exists(out_dir):  # stale partial output — replace atomically
        import shutil

        shutil.rmtree(out_dir)
    os.replace(tmp, out_dir)
    return out_dir


def fixture_dir(scale: str, root: str = "/tmp/aisdb_ray_fixtures") -> str:
    """Deterministic cache path for a named scale; builds on first use."""
    return write_token_dataset(scale, os.path.join(root, scale))
