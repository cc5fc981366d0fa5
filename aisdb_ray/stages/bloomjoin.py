"""Bloom-filter semi-join: prefilter a huge fact table against a key set
WITHOUT shuffling the fact table first.

At warehouse scale the dominant cost of ``fact SEMI JOIN keys`` is moving
every fact row through the key exchange (stages/join.py hash_join).  The
reference's checksum anti-join (J5, /root/reference/aisdb/database/
decoder.py:207-231) is the tiny ancestor: test membership against a compact
summary before doing work.  The scale form:

1. BUILD: one pass over the key side computes per-batch partial Bloom
   bitmaps (k hashes via splitmix64 double hashing, fully vectorized
   numpy); partials OR-combine in two levels — a ``groupby(slot)`` tree
   stage bounds the driver's final OR at ``n_slots`` bitmaps regardless of
   key-side size (no single-task funnel);
2. BROADCAST: the finished bitmap ships once via ``ray.put`` and is read
   zero-copy by every probe task (never re-shipped per batch);
3. PROBE: the fact side tests membership per batch (vectorized bit
   gather); Bloom misses are EXACT non-members, so dropped rows are
   certainly safe — survivors are true matches plus ~``fp_rate`` false
   positives;
4. EXACT VERIFY (optional, default on): the surviving sliver — typically
   orders of magnitude smaller than the fact table — goes through the
   ordinary co-partitioned ``hash_join(..., "left semi")``, making the
   operator exact end-to-end while the shuffle only ever sees the sliver.

Integer keys only (int32/int64): the fact tables' join keys.  String keys
would hash via the per-unique-value scheme in join._key_hash.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

from aisdb_ray.stages.join import hash_join

_SLOTS = 16  # level-2 OR fan-in; driver combines at most this many bitmaps


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer — the standard 64-bit integer mixer."""
    z = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _hash2(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Two independent 64-bit hash streams for double hashing
    h_i = h1 + i*h2 (Kirsch-Mitzenmacher: k independent hashes from two)."""
    x = keys.astype(np.int64).view(np.uint64)
    h1 = _splitmix64(x)
    h2 = _splitmix64(x ^ np.uint64(0xD6E8FEB86659FD93)) | np.uint64(1)
    return h1, h2


def _set_bits(words: np.ndarray, keys: np.ndarray, m_bits: int, k: int) -> None:
    h1, h2 = _hash2(keys)
    m = np.uint64(m_bits)
    for i in range(k):
        idx = (h1 + np.uint64(i) * h2) % m
        np.bitwise_or.at(words, (idx >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (idx & np.uint64(63)))


def _test_bits(words: np.ndarray, keys: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    h1, h2 = _hash2(keys)
    m = np.uint64(m_bits)
    hit = np.ones(len(keys), dtype=bool)
    for i in range(k):
        idx = (h1 + np.uint64(i) * h2) % m
        w = words[(idx >> np.uint64(6)).astype(np.int64)]
        hit &= (w >> (idx & np.uint64(63))) & np.uint64(1) != 0
    return hit


def build_bloom(keys_ds, key_col: str, m_bits: int = 1 << 23, k: int = 7):
    """One pass over the key side -> a single OR-combined Bloom bitmap
    (numpy uint64 words).  m_bits must be a multiple of 64."""
    assert m_bits % 64 == 0
    n_words = m_bits // 64

    def partial(b: pa.Table) -> pa.Table:
        words = np.zeros(n_words, dtype=np.uint64)
        col = b[key_col].drop_null() if b[key_col].null_count else b[key_col]
        keys = col.to_numpy(zero_copy_only=False)
        _set_bits(words, keys, m_bits, k)
        blob = words.tobytes()
        return pa.table(
            {
                "slot": pa.array([zlib.crc32(blob) % _SLOTS], pa.int32()),
                "bm": pa.array([blob], pa.binary()),
            }
        )

    def or_group(g: pa.Table) -> pa.Table:
        acc = np.zeros(n_words, dtype=np.uint64)
        for blob in g["bm"].to_pylist():
            acc |= np.frombuffer(blob, dtype=np.uint64)
        return pa.table(
            {"slot": g["slot"].slice(0, 1), "bm": pa.array([acc.tobytes()])}
        )

    lvl2 = (
        keys_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("slot")
        .map_groups(or_group, batch_format="pyarrow")
        .take_all()
    )  # bounded: at most _SLOTS one-megabyte rows reach the driver
    words = np.zeros(n_words, dtype=np.uint64)
    for row in lvl2:
        words |= np.frombuffer(row["bm"], dtype=np.uint64)
    return words


def bloom_semi_join(fact, keys_ds, on: str, right_on: str | None = None,
                    m_bits: int = 1 << 23, k: int = 7, exact: bool = True,
                    num_parts: int | None = None):
    """``fact LEFT SEMI JOIN keys_ds`` with a Bloom prefilter on the fact side.

    ``exact=True`` (default) verifies Bloom survivors with the ordinary
    co-partitioned hash semi-join, so the result is exact and only the
    surviving sliver is shuffled.  ``exact=False`` returns the prefiltered
    stream (true matches + ~fp-rate false positives) for pipelines that
    tolerate approximation.
    """
    import ray

    rkey = right_on or on
    words = build_bloom(keys_ds, rkey, m_bits, k)
    bm_ref = ray.put(words)

    def probe(b: pa.Table) -> pa.Table:
        w = ray.get(bm_ref)  # zero-copy plasma read, once per task
        col = b[on]
        if col.null_count:  # null keys never match a semi join
            b = b.filter(pa.compute.is_valid(col))
            col = b[on]
        keys = col.to_numpy(zero_copy_only=False)
        return b.filter(pa.array(_test_bits(w, keys, m_bits, k)))

    pre = fact.map_batches(probe, batch_format="pyarrow")
    if not exact:
        return pre
    # hash_join's right_on does the key rename — no hand-rolled
    # select+rename stage to drift from it
    return hash_join(pre, keys_ds.select_columns([rkey]), on=on,
                     right_on=rkey, how="left semi", num_parts=num_parts)


def bloom_anti_join(fact, keys_ds, on: str, bloom_on: str | None = None,
                    m_bits: int = 1 << 23, k: int = 7,
                    num_parts: int | None = None):
    """``fact LEFT ANTI JOIN keys_ds`` — the incremental-ingest dedup shape.

    A NEGATIVE Bloom test is a guarantee of absence, so most genuinely-new
    rows bypass the join entirely (no shuffle); only Bloom POSITIVES (true
    matches + false positives) go through the exact co-partitioned hash
    anti join, whose survivors union with the bypass stream.  ``bloom_on``
    names an int64 prefilter key present on BOTH sides when ``on`` itself
    is not integer (e.g. an md5 hex string with its md5_i64 sibling) —
    exactness is unaffected: a negative on the derived key implies no
    ledger row can equal the string key."""
    import ray

    bkey = bloom_on or on
    words = build_bloom(keys_ds, bkey, m_bits, k)
    bm_ref = ray.put(words)
    _FLAG = "_bloom_hit"
    if _FLAG in (fact.schema().names or []):
        raise ValueError(f"bloom_anti_join: input already carries {_FLAG!r}")

    def flag(b: pa.Table) -> pa.Table:
        w = ray.get(bm_ref)
        col = b[bkey]
        keys = np.asarray(
            pa.compute.fill_null(col, 0).to_numpy(zero_copy_only=False)
        )
        hit = _test_bits(w, keys, m_bits, k)
        if col.null_count:
            nulls = ~pa.compute.is_valid(col).to_numpy(zero_copy_only=False)
            if bkey == on:
                # anti-join semantics: a null JOIN key matches NOTHING, so
                # null rows are definite keeps (unlike the semi join)
                hit = hit & ~nulls
            else:
                # a null DERIVED key says nothing about the real join key:
                # the row must go through the exact verify, not the bypass
                # (a negative is only a guarantee when the ledger side
                # hashed the same non-null derived value)
                hit = hit | nulls
        return b.append_column(_FLAG, pa.array(hit))

    # flag ONCE and pin: the two downstream filters would otherwise
    # re-execute the whole upstream pipeline (and the k-hash probe) twice
    # — and a nondeterministic upstream could even route a row to both
    # streams or neither (the contamination-stage policy)
    flagged = fact.map_batches(flag, batch_format="pyarrow").materialize()

    def take(b: pa.Table, want_hit: bool) -> pa.Table:
        m = b[_FLAG]
        if isinstance(m, pa.ChunkedArray):
            m = m.combine_chunks()
        keep = m if want_hit else pa.compute.invert(m)
        return b.filter(keep).drop_columns([_FLAG])

    definite_new = flagged.map_batches(
        lambda b: take(b, False), batch_format="pyarrow"
    )
    positives = flagged.map_batches(
        lambda b: take(b, True), batch_format="pyarrow"
    )
    keys_proj = keys_ds.select_columns([on])
    verified = hash_join(positives, keys_proj, on=on, how="left anti",
                         num_parts=num_parts)
    return definite_new.union(verified)
