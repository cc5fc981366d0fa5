"""Sequence packing: greedy next-fit parity, bin invariants, summary."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from aisdb_ray.stages import packing


def _brute_pack(v, cap):
    bins, b, acc = [], 0, 0
    for x in v:
        if acc and acc + x <= cap:
            acc += x
        else:
            if acc:
                b += 1
            acc = x
        bins.append(b)
    # first doc correction: b starts at 0 only when first row opens bin 0
    off = bins[0]
    return [x - off for x in bins]


def _frame(seed=5, n=600):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "source": rng.choice(["a", "b", "c"], n),
            "time": rng.integers(0, 4 * 86400, n).astype(np.int64),
            "seq": np.arange(n, dtype=np.int32),
            "n_tok": rng.integers(1, 9000, n).astype(np.int32),
            "doc_id": [f"d{i}" for i in range(n)],
        }
    )


def test_pack_matches_sequential_bruteforce():
    df = _frame()
    cap = 16384
    got = (
        packing.pack_documents(rd.from_pandas(df), cap=cap, chunk_s=86400)
        .to_pandas()
        .sort_values(["source", "chunk", "time", "seq"], kind="stable")
        .reset_index(drop=True)
    )
    assert len(got) == len(df)
    for (_, _), grp in got.groupby(["source", "chunk"], sort=False):
        want = _brute_pack(grp["n_tok"].tolist(), cap)
        np.testing.assert_array_equal(grp["bin"].to_numpy(), np.array(want))
        # invariants: bins contiguous from 0; totals within cap unless solo
        assert grp["bin"].iloc[0] == 0
        assert (np.diff(grp["bin"].to_numpy()) <= 1).all()
        tot = grp.groupby("bin")["n_tok"].agg(["sum", "size"])
        over = tot[tot["sum"] > cap]
        assert (over["size"] == 1).all()


def test_oversized_doc_gets_own_bin():
    df = pd.DataFrame(
        {
            "source": ["s"] * 4,
            "time": np.array([0, 1, 2, 3], np.int64),
            "seq": np.arange(4, dtype=np.int32),
            "n_tok": np.array([100, 99999, 50, 60], np.int32),
            "doc_id": list("wxyz"),
        }
    )
    got = (
        packing.pack_documents(rd.from_pandas(df), cap=1000, chunk_s=86400)
        .to_pandas().sort_values("time").reset_index(drop=True)
    )
    np.testing.assert_array_equal(got["bin"].to_numpy(), [0, 1, 2, 2])


def test_pack_summary_identities():
    df = _frame(seed=11)
    packed = packing.pack_documents(rd.from_pandas(df), cap=16384)
    summ = packing.pack_summary(packed).to_pandas()
    assert summ["n_docs"].sum() == len(df)
    assert summ["sum_n_tok"].sum() == int(df["n_tok"].sum())


def test_pack_property_random():
    """Hypothesis: _pack_group == the literal next-fit recurrence for any
    value sequence and cap."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=100, deadline=None)
    @given(
        vals=st.lists(st.integers(min_value=1, max_value=500),
                      min_size=1, max_size=60),
        cap=st.integers(min_value=1, max_value=800),
    )
    def check(vals, cap):
        prefix = np.concatenate(([0], np.cumsum(vals, dtype=np.int64)))
        got = packing._pack_group(prefix, cap).tolist()
        want = _brute_pack(vals, cap)
        assert got == want

    check()


def test_pack_documents_negative_epochs_floor_route():
    """Routing and grouping must agree on FLOOR chunks: a negative epoch
    used to route on trunc (chunk 0) but group on floor (chunk -86400),
    splitting one group across partitions and duplicating bin ids."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from aisdb_ray.stages import packing

    n = 8
    t = pa.table({
        "source": ["s"] * n,
        "time": pa.array(np.arange(-4, 4, dtype=np.int64) * 10),
        "seq": pa.array(np.zeros(n, np.int64)),
        "n_tok": pa.array(np.full(n, 30, np.int64)),
    })
    out = packing.pack_documents(
        rd.from_arrow(t), cap=100, chunk_s=86400, num_parts=4
    ).to_pandas()
    neg = out[out["time"] < 0]
    pos = out[out["time"] >= 0]
    assert (neg["chunk"] == -86400).all()
    assert (pos["chunk"] == 0).all()
    # within each floor chunk, bins fill to the cap with no duplicates
    for _, g in out.groupby(["chunk", "bin"]):
        assert g["n_tok"].sum() <= 100


def test_pack_summary_custom_value_col():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from aisdb_ray.stages import packing

    t = pa.table({
        "source": ["s"] * 4,
        "time": pa.array(np.arange(4, dtype=np.int64)),
        "seq": pa.array(np.zeros(4, np.int64)),
        "n_chars": pa.array(np.full(4, 60, np.int64)),
    })
    packed = packing.pack_documents(
        rd.from_arrow(t), cap=100, value_col="n_chars", num_parts=2
    )
    summ = packing.pack_summary(
        packed, value_col="n_chars"
    ).to_pandas()
    assert summ["sum_n_tok"].sum() == 240
    assert (summ["sum_n_tok"] <= 100).all()


def test_pack_block_null_time_key_value_deterministic():
    """Nulls in time/source/n_tok must not hit the undefined NaN->int64
    cast: null time/seq route to the -1 sentinel chunk, null sources form
    their own -1 group, null n_tok packs as 0 — and CHUNK stays int64."""
    import pyarrow as pa

    t = pa.table({
        "source": pa.array(["a", None, "a", None]),
        "time": pa.array([100, None, 200, 50], pa.int64()),
        "seq": pa.array([0, 0, 1, None], pa.int64()),
        "n_tok": pa.array([5, 7, None, 3], pa.int64()),
    })
    out = packing.pack_block(t, cap=10, chunk_s=86400)
    assert out["chunk"].type == pa.int64()
    df = out.to_pandas()
    a_rows = df[df.source == "a"]
    null_rows = df[df.source.isna()]
    assert set(a_rows.chunk) == {0}
    assert set(null_rows.chunk) == {-86400, 0}  # null time -> -1 sentinel
    # null n_tok == 0 tokens: fits in the open bin with the 5-token doc
    assert list(a_rows.sort_values(["time"]).bin) == [0, 0]


def test_pack_documents_null_time_groups_consistently(tmp_path):
    """The pre-shuffle chunk rule must equal pack_block's under nulls —
    a float64 CHUNK would split one logical group across partitions and
    emit duplicate, overfillable bin ids."""
    import pyarrow as pa

    t = pa.table({
        "source": pa.array(["s"] * 6),
        "time": pa.array([0, 100, None, 200, None, 300], pa.int64()),
        "seq": pa.array(np.arange(6), pa.int64()),
        "n_tok": pa.array([4] * 6, pa.int64()),
    })
    packed = packing.pack_documents(
        rd.from_arrow(t), cap=8, chunk_s=86400, num_parts=4
    ).to_pandas()
    # the two null-time rows form ONE (s, -86400) group with bins from 0
    nulls = packed[packed.chunk == -86400]
    assert len(nulls) == 2 and set(nulls.bin) == {0}
    summ = packing.pack_summary(
        packing.pack_documents(rd.from_arrow(t), cap=8, chunk_s=86400,
                               num_parts=4)
    ).to_pandas()
    assert (summ.sum_n_tok <= 8).all()  # no overfilled (merged) bin ids
