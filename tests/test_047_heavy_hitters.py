"""Misra-Gries superset guarantee and the exact heavy-hitter filter."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from aisdb_ray.stages.heavyhitters import _mg_compress, frequent_keys


def test_mg_compress_bounds_and_deduction():
    keys = np.array([f"k{i}" for i in range(10)])
    counts = np.arange(10, 0, -1).astype(np.int64)  # 10..1
    k2, c2 = _mg_compress(keys, counts, k=3)
    # (k+1)-th largest = 7 deducted: survivors 10-7, 9-7, 8-7
    assert list(k2) == ["k0", "k1", "k2"]
    assert list(c2) == [3, 2, 1]


def test_frequent_keys_exact_vs_bruteforce():
    rng = np.random.default_rng(13)
    # heavy keys 0 and 1 dominate; a long uniform tail
    vals = np.concatenate([
        np.zeros(400, np.int64),
        np.ones(300, np.int64),
        rng.integers(2, 500, 1300),
    ])
    rng.shuffle(vals)
    t = pa.table({"user_id": pa.array(vals, pa.int64())})
    k = 16
    got = (
        frequent_keys(rd.from_arrow(t).repartition(8), "user_id", k=k)
        .to_pandas().sort_values("user_id").reset_index(drop=True)
    )
    uniq, cnt = np.unique(vals, return_counts=True)
    exp = {int(u): int(c) for u, c in zip(uniq, cnt) if c * k > len(vals)}
    assert {int(r.user_id): int(r.n) for r in got.itertuples()} == exp
    assert 0 in exp and 1 in exp  # the planted heavies are present


def test_frequent_keys_empty_when_uniform():
    t = pa.table({"user_id": pa.array(np.arange(1000), pa.int64())})
    got = frequent_keys(rd.from_arrow(t).repartition(4), "user_id", k=64)
    assert got.count() == 0
