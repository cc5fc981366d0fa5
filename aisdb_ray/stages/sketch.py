"""Mergeable distinct-count sketches (HyperLogLog).

The reference counts distinct keys with exact SQL aggregation
(/root/reference/aisdb/database/dbqry.py distinct-vessel scans); at corpus
scale an exact distinct is a full shuffle of every key.  A HyperLogLog
register table is the classic mergeable substitute: each task folds its
batch into (register, max_rank) partials, the combine is a plain max — no
row ever moves twice, and sketches from disjoint partitions (or days, in a
continuous-aggregate cascade) merge exactly.

Determinism contract: the hash is md5 of the value's decimal/string form,
top ``b`` bits select the register, the rank is the 1-based position of
the highest set bit measured from the top of the remaining ``64-b`` bits —
all integers, so the register table is bit-exact reproducible and
SQL-expressible (DuckDB: ``md5``, hex cast, ``length(bin(x))``); only the
final cardinality estimate is floating point.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

REGISTER = "register"
MAX_RANK = "max_rank"


def _hash64(vals: list) -> np.ndarray:
    """First 8 bytes of md5(str(v)), big-endian — mirrors SQL
    ``CAST('0x' || substr(md5(v), 1, 16) AS UBIGINT)`` exactly."""
    return np.array(
        [int(hashlib.md5(str(v).encode()).hexdigest()[:16], 16) for v in vals],
        dtype=np.uint64,
    )


def _bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Vectorized integer bit_length (exact — no float log2)."""
    bl = np.zeros(len(x), np.int64)
    v = x.copy()
    for s in (32, 16, 8, 4, 2, 1):
        t = v >> np.uint64(s)
        m = t > 0
        bl[m] += s
        v[m] = t[m]
    bl += (v > 0).astype(np.int64)
    return bl


def hll_partial_batch(batch: pa.Table, key_col: str, value_col: str, b: int = 10) -> pa.Table:
    """Per-batch HLL partial: one (key, register, max_rank) row per touched
    register.  The md5 is a per-row loop (no vectorized md5 exists in Arrow —
    same precedent as textstats.md5_batch); everything after it is numpy."""
    if batch.num_rows == 0:
        # key type from the BATCH schema: a hard-coded string() would
        # break schema unification for int-keyed datasets
        return pa.table(
            {key_col: pa.array([], batch.schema.field(key_col).type),
             REGISTER: pa.array([], pa.int64()),
             MAX_RANK: pa.array([], pa.int64())}
        )
    # null values never count: SQL COUNT(DISTINCT v) excludes them, and
    # str(None) would hash as the literal string 'None' (colliding with a
    # real 'None' value and inflating the estimate by one)
    if batch[value_col].null_count:
        import pyarrow.compute as _pc

        batch = batch.filter(_pc.is_valid(batch[value_col]))
        if batch.num_rows == 0:
            return pa.table(
                {key_col: pa.array([], batch.schema.field(key_col).type),
                 REGISTER: pa.array([], pa.int64()),
                 MAX_RANK: pa.array([], pa.int64())}
            )
    h = _hash64(batch[value_col].to_pylist())
    suffix_bits = 64 - b
    reg = (h >> np.uint64(suffix_bits)).astype(np.int64)
    suffix = h & np.uint64((1 << suffix_bits) - 1)
    rank = np.where(
        suffix == 0, suffix_bits + 1, suffix_bits + 1 - _bit_length_u64(suffix)
    ).astype(np.int64)
    t = pa.table(
        {key_col: batch[key_col], REGISTER: pa.array(reg), MAX_RANK: pa.array(rank)}
    )
    g = t.group_by([key_col, REGISTER], use_threads=False).aggregate(
        [(MAX_RANK, "max")]
    )
    return g.rename_columns([key_col, REGISTER, MAX_RANK])


def _merge_b(b: pa.Table, key_col: str) -> pa.Table:
    g = b.group_by([key_col, REGISTER], use_threads=False).aggregate(
        [(MAX_RANK, "max")]
    )
    return g.rename_columns([key_col, REGISTER, MAX_RANK])


def hll_registers(ds, key_col: str, value_col: str, b: int = 10,
                  hash_combine: bool = False):
    """Distributed HLL register table per key: algebraic partials per batch,
    max-merge combine (same funnel / hash-combine policy as stages/rollup).
    Only touched registers appear (zero registers are implicit)."""
    from aisdb_ray.stages._dist import funnel_combine

    partials = ds.map_batches(
        lambda t: hll_partial_batch(t, key_col, value_col, b),
        batch_format="pyarrow",
    )
    return funnel_combine(
        partials, lambda t: _merge_b(t, key_col), key_col, hash_combine
    )


def merge_registers(*tables: pa.Table, key_col: str) -> pa.Table:
    """Exact sketch union: concat + max per (key, register) — sketches of
    disjoint (or overlapping) inputs merge to the sketch of the union."""
    return _merge_b(pa.concat_tables(list(tables)), key_col)


def hll_estimate(registers: pa.Table, key_col: str, b: int = 10) -> pa.Table:
    """Cardinality estimate per key from a register table (standard HLL:
    harmonic mean + small-range linear counting).  Float output — accuracy
    (±1.04/√m) is pinned by tests, not by a hash oracle."""
    m = 1 << b
    alpha = 0.7213 / (1.0 + 1.079 / m)
    # defensive union-merge first: callers may pass CONCATENATED register
    # tables (multi-period pattern — hll_pair_union_hist guards likewise);
    # last-write-wins register fill and the zeros count would both be
    # wrong on duplicate (key, register) rows
    registers = _merge_b(registers, key_col)
    keys = registers[key_col].to_pylist()
    regs = registers[REGISTER].to_numpy(zero_copy_only=False)
    ranks = registers[MAX_RANK].to_numpy(zero_copy_only=False)
    out_k, out_e = [], []
    # null-key-safe grouping order (np.argsort on an object array raises
    # comparing None with str; SQL GROUP BY keeps a null-key group)
    order = sorted(range(len(keys)),
                   key=lambda i: (keys[i] is None,
                                  keys[i] if keys[i] is not None else 0))
    keys_s = [keys[i] for i in order]
    regs_s, ranks_s = regs[order], ranks[order]
    i = 0
    n = len(keys_s)
    while i < n:
        j = i
        while j < n and keys_s[j] == keys_s[i]:
            j += 1
        # registers absent from the table have rank 0
        full = np.zeros(m, np.int64)
        full[regs_s[i:j]] = ranks_s[i:j]
        est = alpha * m * m / np.sum(np.exp2(-full.astype(np.float64)))
        zeros = m - (j - i)
        if est <= 2.5 * m and zeros > 0:
            est = m * np.log(m / zeros)
        out_k.append(keys_s[i])
        out_e.append(float(est))
        i = j
    return pa.table(
        {key_col: pa.array(out_k), "estimate": pa.array(out_e, pa.float64())}
    )


# ---------------------------------------------------------------------------
# Count-Min sketch (heavy-hitter counts over an unbounded vocabulary)
# ---------------------------------------------------------------------------

DEPTH = "depth"
COL = "col"
CNT = "cnt"


def _cms_empty() -> pa.Table:
    return pa.table(
        {DEPTH: pa.array([], pa.int64()),
         COL: pa.array([], pa.int64()),
         CNT: pa.array([], pa.int64())}
    )


def cms_partial_batch(
    batch: pa.Table, text_col: str = "text", d: int = 4, w: int = 256
) -> pa.Table:
    """Per-batch Count-Min partial over whitespace tokens: a (depth, col,
    cnt) counter table.  Tokens are counted vectorized FIRST (Arrow
    group_by), so the per-row md5 loop runs once per distinct token per
    batch, not once per occurrence.  Row i's hash is md5(f"{i}:{token}") —
    d independent hash functions by salting, mirrored exactly in SQL."""
    if batch.num_rows == 0:
        return _cms_empty()
    toks = pc.split_pattern_regex(batch[text_col], pattern=r"\s+")
    flat = pc.list_flatten(toks)
    keep = pc.not_equal(flat, pa.scalar(""))
    g = (
        pa.table({"w": flat.filter(keep)})
        .group_by(["w"], use_threads=False)
        .aggregate([([], "count_all")])
    )
    words = g["w"].to_pylist()
    counts = g.column(1).to_numpy(zero_copy_only=False).astype(np.int64)
    if not words:
        return _cms_empty()
    parts = []
    for i in range(d):
        h = np.array(
            [int(hashlib.md5(f"{i}:{t}".encode()).hexdigest()[:16], 16)
             for t in words],
            dtype=np.uint64,
        )
        col = (h % np.uint64(w)).astype(np.int64)
        parts.append(pa.table(
            {DEPTH: pa.array(np.full(len(words), i, np.int64)),
             COL: pa.array(col), CNT: pa.array(counts)}
        ))
    t = pa.concat_tables(parts)
    g2 = t.group_by([DEPTH, COL], use_threads=False).aggregate([(CNT, "sum")])
    return g2.rename_columns([DEPTH, COL, CNT])


def _cms_merge_b(b: pa.Table) -> pa.Table:
    g = b.group_by([DEPTH, COL], use_threads=False).aggregate([(CNT, "sum")])
    return g.rename_columns([DEPTH, COL, CNT])


def cms_counts(ds, text_col: str = "text", d: int = 4, w: int = 256):
    """Distributed Count-Min sketch of whitespace-token frequencies:
    algebraic counter partials per batch, sum-merge combine.  The result is
    a ≤ d·w-row integer counter table — mergeable across partitions/days
    by plain addition (see :func:`cms_merge`)."""
    from aisdb_ray.stages._dist import funnel_combine

    partials = ds.map_batches(
        lambda b: cms_partial_batch(b, text_col, d, w), batch_format="pyarrow"
    )
    return funnel_combine(partials, _cms_merge_b)


def cms_merge(*tables: pa.Table) -> pa.Table:
    """Exact sketch union: counters add."""
    return _cms_merge_b(pa.concat_tables(list(tables)))


def cms_estimate(counters: pa.Table, queries: list[str], d: int = 4, w: int = 256) -> dict:
    """Point estimates: min over depths of the addressed counter (0 when the
    counter was never touched).  Guarantees est >= true count always."""
    lut = {}
    for row in counters.to_pylist():
        lut[(row[DEPTH], row[COL])] = row[CNT]
    out = {}
    for q in queries:
        est = None
        for i in range(d):
            col = int(
                np.uint64(int(hashlib.md5(f"{i}:{q}".encode()).hexdigest()[:16], 16))
                % np.uint64(w)
            )
            c = lut.get((i, col), 0)
            est = c if est is None else min(est, c)
        out[q] = int(est)
    return out


def hll_distinct(ds, key_col: str, value_col: str, b: int = 10) -> pa.Table:
    """End-to-end approximate distinct: registers (distributed) → estimate
    (driver-side over the tiny ≤ m-rows-per-key register table)."""
    import ray

    regs = hll_registers(ds, key_col, value_col, b)
    all_tables = ray.get(regs.to_arrow_refs())
    tables = [t for t in all_tables if t.num_rows]
    if not tables:  # empty input: empty estimate, not ArrowInvalid
        kt = (all_tables[0].schema.field(key_col).type
              if all_tables and key_col in all_tables[0].schema.names
              else pa.string())
        return pa.table({key_col: pa.array([], kt),
                         "estimate": pa.array([], pa.float64())})
    return hll_estimate(pa.concat_tables(tables), key_col, b)


def hll_pair_union_hist(registers, key_col: str, b: int = 10):
    """Sketch set algebra: for every unordered key pair (a < b), the rank
    HISTOGRAM of the pairwise UNION sketch (register-wise max) — the
    mergeability property that lets distinct-count questions about ANY
    union of partitions be answered without touching raw data.  The
    histogram (max_rank, n_regs) is integer-exact (the hash/rank pipeline
    is integer end-to-end), so it hash-verifies against the same
    construction in SQL; rank 0 rows count the untouched registers
    (m − |touched|) and are emitted only when non-zero.  Intersection
    estimates (inclusion–exclusion) fold off the histogram —
    :func:`hll_overlap_estimate`.

    The register table is small by construction (≤ keys × m rows), so the
    pairing runs as one funneled vectorized task — the standard
    small-result policy (stages/_dist.funnel_combine docstring)."""
    m = 1 << b

    def pairs(t: pa.Table) -> pa.Table:
        # max-merge first: callers may pass concatenated register tables
        # (multiple periods) where (key, register) repeats — a raw scatter
        # would be last-write-wins instead of the sketch-union max
        t = _merge_b(t, key_col)
        keys = t[key_col].to_numpy(zero_copy_only=False)
        regs = t[REGISTER].to_numpy(zero_copy_only=False).astype(np.int64)
        ranks = t[MAX_RANK].to_numpy(zero_copy_only=False).astype(np.int64)
        uniq = np.unique(keys)
        vecs = {}
        for k in uniq:
            v = np.zeros(m, dtype=np.int64)
            sel = keys == k
            v[regs[sel]] = ranks[sel]
            vecs[k] = v
        ta, tb, mr, nr = [], [], [], []
        for i in range(len(uniq)):
            for j in range(i + 1, len(uniq)):
                u = np.maximum(vecs[uniq[i]], vecs[uniq[j]])
                hist = np.bincount(u, minlength=1)
                # flatnonzero walks ranks with a non-zero register count —
                # including rank 0 (the m − |touched| untouched registers)
                for rank in np.flatnonzero(hist):
                    ta.append(uniq[i])
                    tb.append(uniq[j])
                    mr.append(int(rank))
                    nr.append(int(hist[rank]))
        kt = t.schema.field(key_col).type
        return pa.table({
            # key dtype follows the register table (hll_registers
            # preserves int keys; a hard-coded string() raised
            # ArrowTypeError for them)
            "type_a": pa.array([v.item() if hasattr(v, "item") else v
                                for v in ta], kt),
            "type_b": pa.array([v.item() if hasattr(v, "item") else v
                                for v in tb], kt),
            "max_rank": pa.array(mr, pa.int64()),
            "n_regs": pa.array(nr, pa.int64()),
        })

    return registers.repartition(1).map_batches(
        pairs, batch_format="pyarrow", batch_size=None
    )


def hll_overlap_estimate(hist: pa.Table, singles: pa.Table, key_col: str,
                         b: int = 10) -> dict:
    """|A ∩ B| estimates by inclusion–exclusion: est(A) + est(B) −
    est(A ∪ B), where est(A ∪ B) folds off the pair-union histogram.
    Float output — accuracy pinned by tests, not by a hash oracle."""
    m = 1 << b
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est_single = {
        r[key_col]: r["estimate"]
        for r in hll_estimate(singles, key_col, b).to_pylist()
    }

    def fold(ranks: np.ndarray, counts: np.ndarray) -> float:
        denom = float(np.sum(counts * np.exp2(-ranks.astype(np.float64))))
        zeros = int(counts[ranks == 0].sum())
        est = alpha * m * m / denom
        if est <= 2.5 * m and zeros > 0:
            est = m * np.log(m / zeros)
        return float(est)

    out = {}
    t = hist.to_pandas()
    for (a, bb), g in t.groupby(["type_a", "type_b"]):
        union = fold(g["max_rank"].to_numpy(), g["n_regs"].to_numpy())
        out[(a, bb)] = est_single[a] + est_single[bb] - union
    return out


def hll_window_registers(ds, key_col: str, value_col: str, time_col: str,
                         width_s: int, hop_s: int, b: int = 6):
    """Windowed distinct-count sketches: HLL register tables per
    (key, hopping window) — the streaming-analytics composition
    (distinct users per type per sliding day) the fixed rollup tiers
    can't answer and exact distinct can't afford at scale.  Same
    replicate-partials trick as rollup.hopping_rollup: per-batch
    register partials collapse FIRST (hop-grid granularity), then only
    partial rows replicate width//hop times; the combine is a
    register-wise max keyed by (key, window).  ``b`` defaults small
    (64 registers) because the output is keys × windows × registers."""
    import pyarrow.compute as pc

    from aisdb_ray.stages._dist import co_shuffle

    if width_s % hop_s != 0:
        raise ValueError("width_s must be a multiple of hop_s")
    k = width_s // hop_s

    def part(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({key_col: pa.array(
                                 [], batch.schema.field(key_col).type),
                             "wstart": pa.array([], pa.int64()),
                             REGISTER: pa.array([], pa.int64()),
                             MAX_RANK: pa.array([], pa.int64())})
        h = _hash64(batch[value_col].to_pylist())
        suffix_bits = 64 - b
        reg = (h >> np.uint64(suffix_bits)).astype(np.int64)
        suffix = h & np.uint64((1 << suffix_bits) - 1)
        rank = np.where(
            suffix == 0, suffix_bits + 1,
            suffix_bits + 1 - _bit_length_u64(suffix)).astype(np.int64)
        t = pc.cast(batch[time_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        hb = (t // hop_s) * hop_s
        base = pa.table({
            key_col: batch[key_col],
            "hb": pa.array(hb),
            REGISTER: pa.array(reg),
            MAX_RANK: pa.array(rank),
        })
        g = base.group_by([key_col, "hb", REGISTER],
                          use_threads=False).aggregate([(MAX_RANK, "max")])
        g = g.rename_columns([key_col, "hb", REGISTER, MAX_RANK])
        shifted = []
        for i in range(k):
            off = pa.scalar(i * hop_s, pa.int64())
            shifted.append(pa.table({
                key_col: g[key_col],
                "wstart": pc.subtract(g["hb"], off),
                REGISTER: g[REGISTER],
                MAX_RANK: g[MAX_RANK],
            }))
        return pa.concat_tables(shifted)

    def per_part(part_tbl: pa.Table) -> pa.Table:
        g = part_tbl.group_by([key_col, "wstart", REGISTER],
                              use_threads=False).aggregate(
            [(MAX_RANK, "max")])
        return g.rename_columns([key_col, "wstart", REGISTER, MAX_RANK])

    partials = ds.map_batches(part, batch_format="pyarrow")
    return co_shuffle(partials, [key_col, "wstart"], per_part)
