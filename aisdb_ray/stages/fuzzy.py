"""Fuzzy string-similarity self-join (edit distance <= 1) at scale.

The record-linkage primitive: find key pairs within Levenshtein 1 —
misspelled source labels, drifting entity names — WITHOUT the n² cross
join.  FastSS (Bocek et al. 2007): every string emits itself plus each
single-character deletion as blocking keys; any pair within distance 1
shares at least one key (equal, one-is-deletion-of-other, or same
deletion ⇒ substitution), so candidates come from a key-grouped shuffle
of (key, string) rows and only same-bucket pairs are verified with the
exact distance check.  Key volume is O(Σ len(s)) — linear in input.

Candidates at distance 2 can share a deletion key ("ab"/"ba" → "a"/"b"
...actually "ab"→{"ab","b","a"}, "ba"→{"ba","a","b"} share "a"), so the
verify step is mandatory, not belt-and-braces.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _edit_le1(a: str, b: str) -> bool:
    """Exact Levenshtein(a, b) <= 1 in O(len)."""
    if a == b:
        return True
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:
        return sum(x != y for x, y in zip(a, b)) <= 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    # b is one longer: one skip allowed
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1:]


def _deletion_keys(b: pa.Table, col: str) -> pa.Table:
    keys, vals = [], []
    for s in b[col].to_pylist():
        keys.append(s)
        vals.append(s)
        for i in range(len(s)):
            keys.append(s[:i] + s[i + 1:])
            vals.append(s)
    return pa.table({"key": pa.array(keys, pa.string()),
                     "val": pa.array(vals, pa.string())})


def fuzzy_pairs_le1(ds, col: str, num_parts: int | None = None):
    """Distinct (a < b, dist) pairs of ``ds[col]`` values within edit
    distance 1.  ``ds`` should already be distinct on ``col`` (pairs are
    of VALUES, not rows)."""
    from aisdb_ray.stages._dist import co_shuffle

    keyed = ds.map_batches(
        lambda b: _deletion_keys(b, col), batch_format="pyarrow"
    )

    def bucket_pairs(part: pa.Table) -> pa.Table:
        k = part["key"].to_numpy(zero_copy_only=False)
        v = part["val"].to_numpy(zero_copy_only=False)
        order = np.lexsort((v, k))
        k, v = k[order], v[order]
        gstart = np.r_[0, np.flatnonzero(k[1:] != k[:-1]) + 1]
        glen = np.diff(np.r_[gstart, len(k)])
        out_a, out_b = [], []
        for s, ln in zip(gstart, glen):
            if ln < 2:
                continue
            vs = np.unique(v[s:s + ln])
            for i in range(len(vs)):
                for j in range(i + 1, len(vs)):
                    if _edit_le1(vs[i], vs[j]):
                        out_a.append(vs[i])
                        out_b.append(vs[j])
        return pa.table({"a": pa.array(out_a, pa.string()),
                         "b": pa.array(out_b, pa.string())})

    pairs = co_shuffle(keyed, ["key"], bucket_pairs, num_parts=num_parts)

    def dedup(b: pa.Table) -> pa.Table:
        g = b.group_by(["a", "b"], use_threads=False).aggregate([])
        a = g["a"].to_numpy(zero_copy_only=False)
        bb = g["b"].to_numpy(zero_copy_only=False)
        # dist is always 1: pairs are built from strictly distinct unique
        # values (a < b in bucket_pairs), so a == b never occurs here
        return pa.table({"a": pa.array(a), "b": pa.array(bb),
                         "dist": pa.array(np.ones(len(a), np.int64))})

    return pairs.repartition(1).map_batches(
        dedup, batch_format="pyarrow", batch_size=None
    )
