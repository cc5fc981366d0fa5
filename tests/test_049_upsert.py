"""merge.upsert MERGE INTO semantics: update-wins, insert pass-through."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from aisdb_ray.stages.merge import upsert


def _t(rows):
    k, v = zip(*rows)
    return pa.table({"k": pa.array(k, pa.string()),
                     "v": pa.array(v, pa.int64())})


def test_upsert_update_wins_insert_passes_delete_nothing():
    base = _t([("a", 1), ("b", 2), ("c", 3)])
    upd = _t([("b", 20), ("d", 40)])  # b updated, d inserted
    got = (
        upsert(rd.from_arrow(base), rd.from_arrow(upd), ["k"])
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    assert got["k"].tolist() == ["a", "b", "c", "d"]
    assert got["v"].tolist() == [1, 20, 3, 40]


def test_upsert_composite_key_and_empty_updates():
    base = pa.table({
        "k1": pa.array(["x", "x", "y"]), "k2": pa.array([1, 2, 1], pa.int64()),
        "v": pa.array([10, 20, 30], pa.int64()),
    })
    upd = base.slice(0, 0)
    got = (
        upsert(rd.from_arrow(base), rd.from_arrow(upd), ["k1", "k2"])
        .to_pandas().sort_values(["k1", "k2"]).reset_index(drop=True)
    )
    assert got["v"].tolist() == [10, 20, 30]

    upd2 = pa.table({
        "k1": pa.array(["x"]), "k2": pa.array([2], pa.int64()),
        "v": pa.array([99], pa.int64()),
    })
    got2 = (
        upsert(rd.from_arrow(base), rd.from_arrow(upd2), ["k1", "k2"])
        .to_pandas().sort_values(["k1", "k2"]).reset_index(drop=True)
    )
    assert got2["v"].tolist() == [10, 99, 30]


def test_upsert_many_keys_matches_dict_semantics():
    rng = np.random.default_rng(17)
    base_keys = [f"k{i}" for i in range(500)]
    base = _t([(k, i) for i, k in enumerate(base_keys)])
    upd_rows = [(f"k{int(i)}", 10_000 + int(i))
                for i in rng.choice(500, 120, replace=False)]
    upd_rows += [(f"new{i}", -i) for i in range(30)]
    upd = _t(upd_rows)
    got = upsert(
        rd.from_arrow(base).repartition(8), rd.from_arrow(upd).repartition(4),
        ["k"],
    ).to_pandas()
    exp = {k: v for k, v in [(f"k{i}", i) for i in range(500)]}
    exp.update(dict(upd_rows))
    assert dict(zip(got["k"], got["v"])) == exp


def test_epoch_shuffle_is_deterministic_and_dense():
    """Same input -> identical assignment; positions are dense 1..n per
    shard; changing the salt would change the order (not re-run here —
    determinism of the hash rule is the contract)."""
    from aisdb_ray.pipelines.queries import q_tok_epoch_shuffle

    a = q_tok_epoch_shuffle("/root/testdata/sf0.001").to_pandas()
    b = q_tok_epoch_shuffle("/root/testdata/sf0.001").to_pandas()
    key = ["shard", "pos"]
    assert a.sort_values(key).reset_index(drop=True).equals(
        b.sort_values(key).reset_index(drop=True))
    for s, d in a.groupby("shard"):
        assert sorted(d["pos"].tolist()) == list(range(1, len(d) + 1))
    # the shuffle must not be doc_id order: at least one shard deviates
    dev = any(
        list(d.sort_values("pos")["doc_id"]) != sorted(d["doc_id"])
        for _, d in a.groupby("shard")
    )
    assert dev


def test_skyline_block_bruteforce_parity():
    """_skyline_block == the O(n²) dominance definition, including ties
    and duplicate points."""
    from aisdb_ray.pipelines.queries import _skyline_block

    rng = np.random.default_rng(23)
    n = 300
    t = rng.integers(0, 40, n).astype(np.int64)
    v = rng.integers(0, 40, n).astype(np.int64)
    tbl = pa.table({
        "doc_id": pa.array([f"d{i}" for i in range(n)]),
        "time": pa.array(t), "n_tok": pa.array(v),
    })
    got = set(_skyline_block(tbl).to_pandas()["doc_id"])
    exp = set()
    for i in range(n):
        dominated = any(
            (t[j] <= t[i] and v[j] >= v[i]) and (t[j] < t[i] or v[j] > v[i])
            for j in range(n)
        )
        if not dominated:
            exp.add(f"d{i}")
    assert got == exp


def test_skyline_merge_is_algebraic():
    """skyline(skyline(A) ∪ skyline(B)) == skyline(A ∪ B)."""
    from aisdb_ray.pipelines.queries import _skyline_block

    rng = np.random.default_rng(29)

    def tblof(seed_rows, tag):
        t = rng.integers(0, 60, seed_rows).astype(np.int64)
        v = rng.integers(0, 60, seed_rows).astype(np.int64)
        return pa.table({
            "doc_id": pa.array([f"{tag}{i}" for i in range(seed_rows)]),
            "time": pa.array(t), "n_tok": pa.array(v),
        })

    A, B = tblof(200, "a"), tblof(200, "b")
    union = pa.concat_tables([A, B])
    direct = set(_skyline_block(union).to_pandas()["doc_id"])
    merged = set(_skyline_block(pa.concat_tables(
        [_skyline_block(A), _skyline_block(B)]
    )).to_pandas()["doc_id"])
    assert merged == direct


def test_pivot_row_sums_match_totals():
    from aisdb_ray.pipelines.queries import q_ev_pivot

    got = q_ev_pivot("/root/testdata/sf0.001").to_pandas()
    cols = [c for c in got.columns if c.startswith("n_")]
    assert len(cols) == 5
    assert got[cols].to_numpy().sum() == 1000  # sf0.001 has 1000 events
    assert got["user_id"].is_unique


def test_ann_topk_per_label_contains_global_winner():
    from aisdb_ray.pipelines.queries import (
        q_ann_topk,
        q_ann_topk_per_label,
    )

    per = q_ann_topk_per_label("/root/testdata/sf0.001").to_pandas()
    glob = q_ann_topk("/root/testdata/sf0.001").to_pandas()
    assert (per.groupby("label").size() <= 3).all()
    # the global #1 must be rank 1 within its own label
    top = int(glob["vec_id"].iloc[0])
    row = per[per.vec_id == top]
    assert len(row) == 1 and int(row["rank"].iloc[0]) == 1


def test_upsert_null_and_large_int_keys():
    """Null keys must form their own group (not crash the lexsort or
    NaN-compare unequal), and int keys >= 2^53 must not collide through
    a float64 degradation."""
    big = (1 << 53)
    base = pa.table({
        "k": pa.array([big, big + 1, None], pa.int64()),
        "v": pa.array([1, 2, 3], pa.int64()),
    })
    upd = pa.table({
        "k": pa.array([None, big], pa.int64()),
        "v": pa.array([30, 10], pa.int64()),
    })
    rows = upsert(rd.from_arrow(base), rd.from_arrow(upd), ["k"]).take_all()
    got = {(-1 if r["k"] is None else int(r["k"])): int(r["v"])
           for r in rows}
    assert got == {big: 10, big + 1: 2, -1: 30}


def test_upsert_string_null_keys():
    base = pa.table({"k": pa.array(["a", None]), "v": pa.array([1, 2])})
    upd = pa.table({"k": pa.array([None, "b"]), "v": pa.array([20, 9])})
    out = upsert(rd.from_arrow(base), rd.from_arrow(upd), ["k"]).to_pandas()
    got = {("<null>" if k is None else k): int(v)
           for k, v in zip(out.k, out.v)}
    assert got == {"a": 1, "<null>": 20, "b": 9}


def test_upsert_version_col_picks_max_version_deterministically():
    """Duplicate keys within the updates stream: version_col makes the
    winner the max version, independent of block order."""
    base = pa.table({
        "k": pa.array([1], pa.int64()),
        "v": pa.array([0], pa.int64()),
        "ver": pa.array([0], pa.int64()),
    })
    upd = pa.table({
        "k": pa.array([1, 1, 1], pa.int64()),
        "v": pa.array([10, 30, 20], pa.int64()),
        "ver": pa.array([1, 3, 2], pa.int64()),
    })
    for parts in (1, 3):
        out = upsert(rd.from_arrow(base),
                     rd.from_arrow(upd).repartition(parts),
                     ["k"], version_col="ver").to_pandas()
        assert len(out) == 1 and int(out.v.iloc[0]) == 30
