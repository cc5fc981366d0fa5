"""FastSS blocking recall and the exact edit<=1 verify."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from aisdb_ray.stages.fuzzy import _edit_le1, fuzzy_pairs_le1


def test_edit_le1_cases():
    assert _edit_le1("abc", "abc")
    assert _edit_le1("abc", "abd")      # substitution
    assert _edit_le1("abc", "abcd")     # insertion at end
    assert _edit_le1("abc", "xabc")     # insertion at front
    assert _edit_le1("abc", "ac")       # deletion
    assert not _edit_le1("abc", "adc_x")
    assert not _edit_le1("ab", "ba")    # distance 2 (the FastSS trap)
    assert not _edit_le1("abc", "ade")  # two substitutions


def test_fuzzy_pairs_match_bruteforce():
    vals = ["alpha", "alpho", "alpa", "beta", "betas", "bets", "gamma",
            "gamm", "delta", "ba", "ab"]
    t = pa.table({"name": pa.array(vals, pa.string())})
    got = fuzzy_pairs_le1(rd.from_arrow(t).repartition(3), "name").to_pandas()
    got_pairs = set(zip(got["a"], got["b"]))

    def lev(a, b):
        m = np.zeros((len(a) + 1, len(b) + 1), np.int64)
        m[:, 0] = np.arange(len(a) + 1)
        m[0, :] = np.arange(len(b) + 1)
        for i in range(1, len(a) + 1):
            for j in range(1, len(b) + 1):
                m[i, j] = min(m[i - 1, j] + 1, m[i, j - 1] + 1,
                              m[i - 1, j - 1] + (a[i - 1] != b[j - 1]))
        return m[-1, -1]

    exp = {(min(x, y), max(x, y)) for x in vals for y in vals
           if x != y and lev(x, y) <= 1}
    assert got_pairs == exp
    assert ("ab", "ba") not in got_pairs  # shared-deletion false candidate
    assert (got["dist"] == 1).all()


def test_ev_except_and_ar1_end_to_end():
    from aisdb_ray.pipelines.queries import q_ev_except, q_ts_ar1

    ex = q_ev_except("/root/testdata/sf0.001").to_pandas()
    assert ex["user_id"].is_unique and len(ex) > 0

    ar = q_ts_ar1("/root/testdata/sf0.001").to_pandas()
    assert (ar["phi_den"] > 0).all()
    assert (ar["n_pairs"] >= 2).all()
    # phi is the exact ratio of its own evidence columns
    assert (ar["phi"] == ar["phi_num"] / ar["phi_den"]).all()
