"""mmr_rerank greedy rule and the cluster-components composition."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from aisdb_ray.stages.ann import mmr_rerank


def _write_emb(tmp_path, vecs):
    t = pa.table({
        "vec_id": pa.array(list(range(len(vecs))), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array([0] * len(vecs), pa.int32()),
    })
    p = str(tmp_path / "emb.parquet")
    pq.write_table(t, p)
    return p


def test_mmr_prefers_diversity_over_redundancy(tmp_path):
    # probe q = e0; v1 and v2 nearly identical and most relevant; v3 less
    # relevant but orthogonal to them.  Pure relevance ranks (1, 2, 3);
    # MMR must interleave: after picking v1, v2's redundancy penalty
    # (max-sim to v1) exceeds v3's, so v3 comes second.
    q = [1.0, 0.0, 0.0, 0.0]
    v1 = [0.6, 0.8, 0.0, 0.0]
    v2 = [0.6, 0.8, 0.001, 0.0]     # near-duplicate of v1 (sim ~ 1.0)
    v3 = [0.59, 0.0, 0.8, 0.0]      # slightly less relevant, near-orthogonal
    path = _write_emb(tmp_path, [q, v1, v2, v3])
    got = mmr_rerank(path, k=3, pool=10, probe_id=0).to_pandas()
    assert got["vec_id"].tolist() == [1, 3, 2]
    assert got["rank"].tolist() == [1, 2, 3]
    # first score is pure relevance: 7 * dot_fx(q, v1)
    # the column is stored float32 — fixed-point applies to the f32 values
    fx = lambda v: np.floor(
        np.asarray(v, np.float32).astype(np.float64) * 1_000_000
    ).astype(np.int64)
    assert int(got["mmr_score"].iloc[0]) == 7 * int(fx(q) @ fx(v1))
    # second pick's score carries the diversity penalty vs v1
    expected = 7 * int(fx(q) @ fx(v3)) - 3 * int(fx(v3) @ fx(v1))
    assert int(got["mmr_score"].iloc[1]) == expected


def test_mmr_tie_breaks_smallest_vec_id(tmp_path):
    q = [1.0, 0.0]
    dup = [0.5, 0.5]
    path = _write_emb(tmp_path, [q, dup, dup, dup])
    got = mmr_rerank(path, k=3, pool=10, probe_id=0).to_pandas()
    assert got["vec_id"].tolist() == [1, 2, 3]  # identical scores -> id order


def test_mmr_excludes_probe_and_bounds_pool(tmp_path):
    vecs = [[1.0, 0.0]] + [[0.9, float(i) / 100] for i in range(1, 8)]
    path = _write_emb(tmp_path, vecs)
    got = mmr_rerank(path, k=20, pool=3, probe_id=0).to_pandas()
    assert 0 not in got["vec_id"].tolist()
    assert len(got) == 3  # k capped by the candidate pool


def test_class_outliers_flags_planted_point(tmp_path):
    import pyarrow.parquet as pq_mod
    import ray.data as rd

    from aisdb_ray.stages.ann import class_outliers

    rng = np.random.default_rng(2)
    # label 0: tight cluster + one planted far point (id 99)
    vecs, labels, ids = [], [], []
    for i in range(20):
        vecs.append((rng.normal(0, 0.01, 8) + 0.3).tolist())
        labels.append(0)
        ids.append(i)
    vecs.append([0.9] * 8)
    labels.append(0)
    ids.append(99)
    t = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([[float(x) for x in v] for v in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    })
    p = str(tmp_path / "emb.parquet")
    pq_mod.write_table(t, p)
    got = class_outliers(rd.read_parquet(p), k=2).to_pandas()
    assert int(got.sort_values("score", ascending=False)["vec_id"].iloc[0]) == 99


def test_tok_rle_counts_runs_exactly():
    import ray.data as rd

    from aisdb_ray.stages.tokstats import rle_runs

    t = pa.table({
        "doc_id": pa.array(["a", "b", "c", "bad"], pa.string()),
        "tokens": pa.array(
            [[1, 1, 2, 2, 2, 3], [7], [4, 4, 4, 4], [1, 2]],
            pa.list_(pa.int32())),
        "n_tok": pa.array([6, 1, 4, 99], pa.int32()),  # 'bad' violates contract
    })
    got = rle_runs(rd.from_arrow(t)).to_pandas().set_index("doc_id")
    assert "bad" not in got.index
    assert int(got.loc["a", "n_runs"]) == 3
    assert int(got.loc["b", "n_runs"]) == 1
    assert int(got.loc["c", "n_runs"]) == 1
    assert got.loc["c", "rle_ratio"] == 0.25
