"""Bloom-filter semi-join: no false negatives ever, exact mode equals a
plain semi join, prefilter fp-rate in the expected band, null keys safe."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from aisdb_ray.stages import bloomjoin


def _ds(tbl: pa.Table):
    import ray.data as rd

    return rd.from_arrow(tbl)


@pytest.fixture(scope="module")
def sides():
    rng = np.random.default_rng(11)
    fact_keys = rng.integers(0, 50_000, 20_000, dtype=np.int64)
    key_set = rng.choice(50_000, 3_000, replace=False).astype(np.int64)
    fact = pa.table(
        {"fk": pa.array(fact_keys), "payload": pa.array(np.arange(20_000))}
    )
    keys = pa.table({"pk": pa.array(key_set)})
    return fact, keys, set(key_set.tolist())


def test_exact_mode_equals_plain_semi_join(sides):
    fact, keys, key_set = sides
    got = (
        bloomjoin.bloom_semi_join(
            _ds(fact), _ds(keys), on="fk", right_on="pk", num_parts=4
        )
        .to_pandas()
        .sort_values(["fk", "payload"])
        .reset_index(drop=True)
    )
    want = (
        fact.to_pandas()[lambda d: d["fk"].isin(key_set)]
        .sort_values(["fk", "payload"])
        .reset_index(drop=True)
    )
    assert got.equals(want)


def test_prefilter_no_false_negatives_and_low_fp(sides):
    fact, keys, key_set = sides
    pre = bloomjoin.bloom_semi_join(
        _ds(fact), _ds(keys), on="fk", right_on="pk", exact=False
    ).to_pandas()
    member = fact.to_pandas()["fk"].isin(key_set)
    # every true match must survive
    assert member.sum() <= len(pre)
    assert set(pre.loc[pre["fk"].isin(key_set), "payload"]) == set(
        fact.to_pandas().loc[member, "payload"]
    )
    # false-positive sliver stays small (m=8Mbit, k=7, 3k keys -> fp ~ 0)
    fp = (~pre["fk"].isin(key_set)).sum()
    assert fp <= 0.01 * len(fact)


def test_small_filter_has_false_positives_but_exact_verify_removes_them(sides):
    fact, keys, key_set = sides
    # deliberately undersized bitmap: fp-rate becomes visible
    pre = bloomjoin.bloom_semi_join(
        _ds(fact), _ds(keys), on="fk", right_on="pk",
        m_bits=1 << 12, k=2, exact=False,
    ).to_pandas()
    member = fact.to_pandas()["fk"].isin(key_set)
    assert member.sum() <= len(pre)
    exact = bloomjoin.bloom_semi_join(
        _ds(fact), _ds(keys), on="fk", right_on="pk",
        m_bits=1 << 12, k=2, exact=True, num_parts=4,
    ).to_pandas()
    assert len(exact) == int(member.sum())


def test_null_keys_dropped():
    fact = pa.table(
        {"fk": pa.array([1, None, 2, None], pa.int64()),
         "payload": pa.array([0, 1, 2, 3])}
    )
    keys = pa.table({"fk": pa.array([1, 2], pa.int64())})
    got = bloomjoin.bloom_semi_join(
        _ds(fact), _ds(keys), on="fk", num_parts=2
    ).to_pandas()
    assert sorted(got["payload"].tolist()) == [0, 2]


def test_bloom_anti_join_exact_with_fp_pressure():
    """Anti join == brute set difference even when the bitmap is so small
    that most bloom tests are false positives (exact verify must catch
    them); negatives bypass correctly."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from aisdb_ray.stages.bloomjoin import bloom_anti_join

    rng = np.random.default_rng(47)
    fact = pd.DataFrame({"k": rng.integers(0, 4000, 3000).astype(np.int64),
                         "payload": np.arange(3000)})
    keys = pd.DataFrame({"k": rng.integers(0, 4000, 800).astype(np.int64)})
    got = (
        bloom_anti_join(rd.from_pandas(fact), rd.from_pandas(keys), on="k",
                        m_bits=64 * 4, k=3)  # tiny: heavy fp pressure
        .to_pandas().sort_values(["k", "payload"]).reset_index(drop=True)
    )
    want = (
        fact[~fact["k"].isin(set(keys["k"]))]
        .sort_values(["k", "payload"]).reset_index(drop=True)
    )
    assert len(got) == len(want) and len(got) > 0
    np.testing.assert_array_equal(got["k"].to_numpy(), want["k"].to_numpy())
    np.testing.assert_array_equal(got["payload"].to_numpy(),
                                  want["payload"].to_numpy())


def test_bloom_anti_join_keeps_null_keys():
    """Anti-join semantics: a null key matches nothing, so the row is a
    definite keep — parity with pa.Table.join 'left anti'."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from aisdb_ray.stages.bloomjoin import bloom_anti_join

    fact = pa.table({"k": pa.array([1, 2, None, 4], pa.int64()),
                     "p": pa.array([10, 20, 30, 40], pa.int64())})
    keys = pa.table({"k": pa.array([2, 4], pa.int64())})
    got = (
        bloom_anti_join(rd.from_arrow(fact), rd.from_arrow(keys), on="k")
        .to_pandas().sort_values("p").reset_index(drop=True)
    )
    assert got["p"].tolist() == [10, 30]  # k=1 kept, k=None kept


def test_anti_join_null_derived_key_still_verifies_real_key():
    """bloom_on != on: a null DERIVED key says nothing about the real join
    key, so the row must go through the exact verify — not leak into the
    bypass stream as a duplicate."""
    import ray.data as rd

    fact = rd.from_arrow(pa.table({
        "text_md5": pa.array(["abc", "new1", "abc2"]),
        "md5_i64": pa.array([None, 7, 9], pa.int64()),
    }))
    ledger = rd.from_arrow(pa.table({
        "text_md5": pa.array(["abc", "abc2"]),
        "md5_i64": pa.array([123, 9], pa.int64()),
    }))
    out = bloomjoin.bloom_anti_join(
        fact, ledger, on="text_md5", bloom_on="md5_i64"
    ).to_pandas()
    # 'abc' has a null derived key but IS in the ledger -> must not leak;
    # 'abc2' is a true bloom positive -> removed; 'new1' survives
    assert sorted(out.text_md5) == ["new1"]


def test_anti_join_null_join_key_is_definite_keep():
    """bloom_on == on: a null JOIN key matches nothing — definite keep."""
    import ray.data as rd

    fact = rd.from_arrow(pa.table({
        "k": pa.array([1, None, 2], pa.int64()),
    }))
    ledger = rd.from_arrow(pa.table({"k": pa.array([1], pa.int64())}))
    out = bloomjoin.bloom_anti_join(fact, ledger, on="k").to_pandas()
    assert sorted(out.k.fillna(-1)) == [-1, 2]
