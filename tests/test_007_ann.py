"""ANN over the embeddings table: brute-force exactness + LSH recall."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import ray.data as rd

from aisdb_ray.stages import ann, dedup_text

EMB = "/root/testdata/sf0.001/embeddings.parquet"


def _matrix():
    t = pq.read_table(EMB)
    ids = t["vec_id"].to_numpy()
    m = t["embedding"].combine_chunks().values.to_numpy().reshape(len(ids), -1)
    m = m.astype(np.float64)
    return ids, m / np.linalg.norm(m, axis=1, keepdims=True)


def test_topk_matches_numpy():
    ids, m = _matrix()
    q = m[0]
    got = ann.topk_cosine(rd.read_parquet(EMB), q, k=10).to_pandas()
    sims = m @ q
    order = np.lexsort((ids, -sims))[:10]
    np.testing.assert_array_equal(got["vec_id"].to_numpy(), ids[order])
    np.testing.assert_allclose(got["cosine"].to_numpy(), np.round(sims[order], 4))


def test_topk_multi_matches_single_and_numpy():
    ids, m = _matrix()
    qs = m[[0, 3, 7]]
    got = ann.topk_cosine_multi(rd.read_parquet(EMB), qs, k=10).to_pandas()
    assert len(got) == 30
    for qi, q in enumerate(qs):
        sub = got[got["qid"] == qi].sort_values("rank")
        sims = m @ q
        order = np.lexsort((ids, -sims))[:10]
        np.testing.assert_array_equal(sub["vec_id"].to_numpy(), ids[order])
        assert sub["rank"].tolist() == list(range(1, 11))
        # and the batched path agrees with the single-query operator
        single = ann.topk_cosine(rd.read_parquet(EMB), q, k=10).to_pandas()
        np.testing.assert_array_equal(
            sub["vec_id"].to_numpy(), single["vec_id"].to_numpy()
        )


def test_embedding_dim_stats_matches_numpy():
    ids, _ = _matrix()
    t = pq.read_table(EMB)
    raw = t["embedding"].combine_chunks().values.to_numpy().reshape(
        len(ids), -1
    ).astype(np.float64)
    fx = np.floor(raw * 1_000_000).astype(np.int64)
    got = ann.embedding_dim_stats(rd.read_parquet(EMB)).to_pandas()
    got = got.sort_values("dim").reset_index(drop=True)
    assert got["n"].tolist() == [len(ids)] * raw.shape[1]
    np.testing.assert_array_equal(got["sum_fx"].to_numpy(), fx.sum(axis=0))
    np.testing.assert_array_equal(got["min_fx"].to_numpy(), fx.min(axis=0))
    np.testing.assert_array_equal(got["max_fx"].to_numpy(), fx.max(axis=0))
    np.testing.assert_array_equal(
        got["mean_fx"].to_numpy(), fx.sum(axis=0) / len(ids)
    )


def test_lsh_topk_recall():
    ids, m = _matrix()
    q = m[3]
    exact = set(
        ann.topk_cosine(rd.read_parquet(EMB), q, k=10).to_pandas()["vec_id"]
    )
    approx = set(
        ann.lsh_topk(rd.read_parquet(EMB), q, k=10).to_pandas()["vec_id"]
    )
    # probing bucket + hamming-1 neighbors must recover most true neighbors
    assert len(exact & approx) >= 5
    # the query vector itself is its own nearest neighbor
    assert ids[3] in approx


def test_lsh_index_persisted_matches_inline(tmp_path):
    ids, m = _matrix()
    q = m[3]
    params = ann.LshIndexParams(m.shape[1])
    idx = str(tmp_path / "lsh")
    ann.build_lsh_index(rd.read_parquet(EMB), idx, params)
    # build is idempotent: second call is a no-op via _SUCCESS
    ann.build_lsh_index(rd.read_parquet(EMB), idx, params)

    inline = ann.lsh_topk(rd.read_parquet(EMB), q, k=10, params=params).to_pandas()
    persisted = ann.lsh_index_topk(idx, EMB, q, k=10).to_pandas()
    np.testing.assert_array_equal(
        persisted["vec_id"].to_numpy(), inline["vec_id"].to_numpy()
    )

    # the probe must READ only its probed partitions, not the whole index
    import glob

    from aisdb_ray.predicates import field, scan_parquet

    total = len(glob.glob(idx + "/postings/tbl=*/bucket=*"))
    probed = scan_parquet(
        idx + "/postings",
        where=(field("tbl") == 0) & field("bucket").isin([1, 2, 3]),
        partition_cols=["tbl", "bucket"],
    )
    assert len(probed.input_files()) < total


def test_ivf_index_recall_and_pruning(tmp_path):
    ids, m = _matrix()
    q = m[3]
    idx = str(tmp_path / "ivf")
    ann.build_ivf_index(rd.read_parquet(EMB), idx, n_lists=8, sample_size=512)
    ann.build_ivf_index(rd.read_parquet(EMB), idx)  # idempotent no-op

    exact = ann.topk_cosine(rd.read_parquet(EMB), q, k=10).to_pandas()
    approx = ann.ivf_topk(idx, EMB, q, k=10, nprobe=3).to_pandas()
    hit = set(exact["vec_id"]) & set(approx["vec_id"])
    assert len(hit) >= 5          # nprobe=3 of 8 lists recovers most
    assert ids[3] in set(approx["vec_id"])  # self is always found

    # nprobe=all lists == exact
    full = ann.ivf_topk(idx, EMB, q, k=10, nprobe=8).to_pandas()
    np.testing.assert_array_equal(
        full["vec_id"].to_numpy(), exact["vec_id"].to_numpy()
    )

    # probing reads only its lists' partitions
    import glob

    from aisdb_ray.predicates import field, scan_parquet

    total = len(glob.glob(idx + "/postings/list=*"))
    probed = scan_parquet(
        idx + "/postings", where=field("list").isin([0, 1]),
        partition_cols=["list"],
    )
    assert len(probed.input_files()) < total


def test_embedding_neardup_symmetric_threshold():
    # the synthetic embeddings are near-orthogonal (max off-diag cosine
    # ~0.48), so use a threshold that yields a non-trivial pair set
    thr = 0.35
    pairs = dedup_text.embedding_neardup_pairs(EMB, threshold=thr).to_pandas()
    ids, m = _matrix()
    sims = m @ m.T
    want = {(int(ids[i]), int(ids[j])) for i, j in zip(*np.nonzero(sims >= thr)) if ids[i] < ids[j]}
    got = {(int(a), int(b)) for a, b in zip(pairs["a"], pairs["b"])}
    assert want, "threshold produced no pairs — test would be vacuous"
    assert got == want


def test_pq_codes_properties():
    """PQ encoding: codes in range, err exact vs brute force, and the
    fitted codebook beats a degenerate one-centroid codebook."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from aisdb_ray.stages import ann

    rng = np.random.default_rng(53)
    n, d, m, ksub = 300, 32, 4, 8
    emb = rng.normal(size=(n, d)).astype(np.float32)
    t = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array(emb.tolist(), pa.list_(pa.float32())),
    })
    fx = ann._fx_matrix(t)
    cents = ann.pq_fit(fx, m=m, ksub=ksub, seed=3)
    got = (
        ann.pq_encode(rd.from_arrow(t), cents)
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    )
    dsub = d // m
    for s in range(m):
        codes = got[f"c{s}"].to_numpy()
        assert ((codes >= 0) & (codes < ksub)).all()
        # brute-force err check on a few rows
    for i in (0, 7, 123):
        err = 0
        for s in range(m):
            x = fx[i, s * dsub:(s + 1) * dsub]
            c = cents[s, got.loc[i, f"c{s}"]]
            dists = ((fx[i, s*dsub:(s+1)*dsub] - cents[s]) ** 2).sum(1)
            assert ((x - c) ** 2).sum() == dists.min()
            err += int(dists.min())
        assert got.loc[i, "err_fx"] == err
    # degenerate codebook: every subspace one repeated centroid (zeros)
    flat = np.zeros_like(cents)
    worse = (
        ann.pq_encode(rd.from_arrow(t), flat)
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    )
    assert got["err_fx"].sum() < worse["err_fx"].sum()


def test_pq_adc_recall_vs_exact():
    """ADC top-k over codes approximates exact fixed-point L2 top-k with
    decent recall, and the self-match (query == corpus row) ranks first."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from aisdb_ray.stages import ann

    rng = np.random.default_rng(61)
    n, d = 400, 32
    # clustered corpus (the regime PQ exists for; i.i.d. gaussian noise is
    # its known worst case): 8 centers + small noise
    centers = rng.normal(size=(8, d)) * 3.0
    emb = (
        centers[rng.integers(0, 8, n)] + rng.normal(size=(n, d)) * 0.3
    ).astype(np.float32)
    t = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array(emb.tolist(), pa.list_(pa.float32())),
    })
    fx = ann._fx_matrix(t)
    cents = ann.pq_fit(fx, m=4, ksub=32, seed=5)
    q = emb[0]
    got = ann.pq_adc_topk(rd.from_arrow(t), cents, q, k=10).to_pandas()
    assert got["vec_id"].iloc[0] == 0  # self-match wins (ADC err 0-ish tie low id)
    qfx = np.floor(q.astype(np.float64) * 1e6).astype(np.int64)
    exact = np.argsort(((fx - qfx) ** 2).sum(1), kind="stable")[:10]
    recall = len(set(got["vec_id"]) & set(exact.tolist())) / 10
    assert recall >= 0.5, recall


def test_ivfpq_index_serving(tmp_path):
    """IVFADC: serving from codes-in-lists must equal PQ-ADC restricted to
    the probed lists, and probing must prune the read to those lists."""
    ids, m = _matrix()
    q_raw = pq.read_table(EMB)["embedding"][5].as_py()
    q = np.asarray(q_raw, np.float64)

    head = pq.read_table(EMB, columns=["embedding"]).slice(0, 512)
    sample = np.stack([np.asarray(v, np.float64)
                       for v in head["embedding"].to_pylist()])
    cent = ann.kmeans_fit(sample, 8, seed=23)
    fx = np.floor(sample * 1_000_000.0).astype(np.int64)
    cents_pq = ann.pq_fit(fx, m=4, ksub=16)

    idx = str(tmp_path / "ivfpq")
    ann.build_ivfpq_index(rd.read_parquet(EMB), idx, cent, cents_pq)
    ann.build_ivfpq_index(rd.read_parquet(EMB), idx, cent, cents_pq)  # no-op

    got = ann.ivfpq_topk(idx, q, k=10, nprobe=3).to_pandas()
    assert list(got.columns) == ["rank", "vec_id", "adc_fx"]
    assert len(got) == 10 and got["rank"].tolist() == list(range(1, 11))

    # reference: numpy replica — assign all vectors, keep probed lists,
    # encode, LUT-score, rank by (adc, vec_id)
    mm = m  # normalized
    lists = np.argmax(mm @ cent.T, axis=1)
    qn = q / (np.linalg.norm(q) or 1.0)
    probes = set(int(x) for x in np.argsort(-(cent @ qn))[:3])
    keep = np.isin(lists, list(probes))
    allfx = np.floor(
        pq.read_table(EMB)["embedding"].combine_chunks().values.to_numpy()
        .reshape(len(ids), -1).astype(np.float64) * 1_000_000.0
    ).astype(np.int64)
    qfx = np.floor(q * 1_000_000.0).astype(np.int64)
    msub, ksub, dsub = cents_pq.shape
    score = np.zeros(len(ids), np.int64)
    for s in range(msub):
        x = allfx[:, s * dsub:(s + 1) * dsub]
        cs = cents_pq[s]
        d2 = ((x * x).sum(1, keepdims=True) - 2 * (x @ cs.T)
              + (cs * cs).sum(1)[None, :])
        codes = np.argmin(d2, axis=1)
        diff = cs - qfx[s * dsub:(s + 1) * dsub][None, :]
        lut = (diff * diff).sum(1)
        score += lut[codes]
    cand_ids = ids[keep].astype(np.int64)
    cand_score = score[keep]
    order = np.lexsort((cand_ids, cand_score))[:10]
    np.testing.assert_array_equal(got["vec_id"].to_numpy(), cand_ids[order])
    np.testing.assert_array_equal(got["adc_fx"].to_numpy(), cand_score[order])

    # pruned read: fewer input files than total list partitions
    import glob

    from aisdb_ray.predicates import field, scan_parquet

    total = len(glob.glob(idx + "/postings/list=*"))
    probed = scan_parquet(
        idx + "/postings", where=field("list").isin(sorted(probes)),
        partition_cols=["list"],
    )
    files = probed.input_files()
    assert files and len(files) < total
    # ONLY (and exactly) the probed lists' partitions are opened — the
    # disk-resident serving contract: unprobed inverted lists stay cold
    read_lists = {int(f.split("list=")[1].split("/")[0]) for f in files}
    assert read_lists == probes


def test_range_search_threshold_inclusive():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from aisdb_ray.stages import ann

    vecs = np.array(
        [[1.0, 0.0], [0.8, 0.6], [0.0, 1.0], [-1.0, 0.0]], dtype=np.float64
    )
    t = pa.table(
        {
            "vec_id": pa.array(range(4), pa.int64()),
            "embedding": pa.array([list(v) for v in vecs], pa.list_(pa.float64())),
        }
    )
    got = ann.range_search(rd.from_arrow(t), np.array([1.0, 0.0]), threshold=0.8)
    ids = sorted(got.to_pandas()["vec_id"].tolist())
    # cos = [1.0, 0.8, 0.0, -1.0]: threshold is inclusive
    assert ids == [0, 1]


def test_embedding_gram_matches_numpy():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from aisdb_ray.stages import ann

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(10, 4)).astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(range(10), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs],
                                  pa.list_(pa.float32())),
        }
    )
    got = ann.embedding_gram(rd.from_arrow(t)).to_pandas()
    fx = np.floor(vecs.astype(np.float64) * 1_000_000).astype(np.int64)
    ref = fx.T @ fx
    assert len(got) == 4 * 5 // 2
    for _, r in got.iterrows():
        assert ref[int(r.i), int(r.j)] == int(r.g)


def test_centroid_classify_planted_clusters():
    import pyarrow as pa

    # two tight clusters along orthogonal axes; every member must be
    # assigned to its own cluster's label
    rng = np.random.default_rng(7)
    a = np.zeros((20, 8)); a[:, 0] = 1.0; a += rng.normal(0, 0.01, a.shape)
    b = np.zeros((20, 8)); b[:, 1] = 1.0; b += rng.normal(0, 0.01, b.shape)
    m = np.vstack([a, b]).astype(np.float32)
    t = pa.table({
        "vec_id": pa.array(np.arange(40, dtype=np.int64)),
        "embedding": pa.array(list(m), pa.list_(pa.float32())),
        "label": pa.array([0] * 20 + [1] * 20, pa.int64()),
    })
    got = ann.centroid_classify(rd.from_arrow(t)).to_pandas().sort_values("vec_id")
    assert got["pred_label"].tolist() == [0] * 20 + [1] * 20


def test_centroid_classify_tie_breaks_smallest_label():
    import pyarrow as pa

    # identical class sums -> identical scores -> smallest label wins
    m = np.ones((4, 4), dtype=np.float32)
    t = pa.table({
        "vec_id": pa.array(np.arange(4, dtype=np.int64)),
        "embedding": pa.array(list(m), pa.list_(pa.float32())),
        "label": pa.array([3, 3, 1, 1], pa.int64()),
    })
    got = ann.centroid_classify(rd.from_arrow(t)).to_pandas()
    assert set(got["pred_label"]) == {1}


def test_label_centroids_exact_sums():
    import pyarrow as pa

    m = np.array([[0.5, -0.25], [0.5, 0.75]], dtype=np.float32)
    t = pa.table({
        "vec_id": pa.array([0, 1], pa.int64()),
        "embedding": pa.array(list(m), pa.list_(pa.float32())),
        "label": pa.array([4, 4], pa.int64()),
    })
    got = ann.label_centroids(rd.from_arrow(t)).to_pandas().sort_values("dim")
    assert got["n"].tolist() == [2, 2]
    assert got["sum_fx"].tolist() == [1000000, 500000]  # floor fixed-point


def test_knn_graph_matches_bruteforce_multiblock(tmp_path):
    import pyarrow as pa

    rng = np.random.default_rng(3)
    n, d = 60, 8
    m = rng.normal(size=(n, d)).astype(np.float32)
    t = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array(list(m), pa.list_(pa.float32())),
    })
    path = str(tmp_path / "emb.parquet")
    pq.write_table(t, path)
    # tiny block target forces the multi-tile path
    got = (
        ann.knn_graph(path, k=3, target_block_rows=16)
        .to_pandas()
        .sort_values(["vec_id", "rank"])
    )
    mm = m.astype(np.float64)
    mm = mm / np.linalg.norm(mm, axis=1, keepdims=True)
    sims = mm @ mm.T
    np.fill_diagonal(sims, -np.inf)
    for v in range(n):
        order = np.lexsort((np.arange(n), -sims[v]))[:3]
        mine = got[got["vec_id"] == v]["nbr_id"].to_numpy()
        np.testing.assert_array_equal(mine, order)
    assert got.groupby("vec_id")["rank"].max().eq(3).all()


def test_sq8_adc_topk_recalls_exact_on_separated_data(tmp_path):
    import pyarrow as pa

    # well-separated vectors: SQ8 ranking must match exact MIPS ranking
    rng = np.random.default_rng(11)
    m = (rng.normal(size=(40, 8)) * np.arange(1, 41)[:, None] * 0.1).astype(
        np.float32
    )
    t = pa.table({
        "vec_id": pa.array(np.arange(40, dtype=np.int64)),
        "embedding": pa.array(list(m), pa.list_(pa.float32())),
    })
    q = m[5].astype(np.float64)
    got = ann.sq8_adc_topk(rd.from_arrow(t), q, k=5).to_pandas()
    assert len(got) == 5
    assert got["rank"].tolist() == [1, 2, 3, 4, 5]
    # scores strictly ordered (ties impossible on this data)
    assert got["score255"].is_monotonic_decreasing
    # the quantized self-match must rank near the true exact argmax
    exact = np.argmax(m.astype(np.float64) @ q)
    assert exact in set(got["vec_id"])


def test_sq8_constant_dimension_codes_zero():
    import pyarrow as pa

    m = np.ones((3, 4), dtype=np.float32)  # every dim constant
    t = pa.table({
        "vec_id": pa.array([0, 1, 2], pa.int64()),
        "embedding": pa.array(list(m), pa.list_(pa.float32())),
    })
    got = ann.sq8_adc_topk(rd.from_arrow(t), np.ones(4), k=3).to_pandas()
    # all reconstructions identical -> ties broken by vec_id
    assert got["vec_id"].tolist() == [0, 1, 2]
    assert got["score255"].nunique() == 1


def test_lsh_append_refresh_equals_full_rebuild(tmp_path):
    """Appending new vectors to a persisted LSH index must serve exactly
    what a from-scratch full-corpus build serves (same seed -> same
    hyperplanes -> same buckets), and the append marker is idempotent."""
    import os

    ids, m = _matrix()
    q = m[1]
    params = ann.LshIndexParams(m.shape[1])

    full_idx = str(tmp_path / "lsh_full")
    ann.build_lsh_index(rd.read_parquet(EMB), full_idx, params)

    half = int(np.median(ids))
    inc_idx = str(tmp_path / "lsh_inc")
    emb = rd.read_parquet(EMB)
    ann.build_lsh_index(emb.filter(expr=f"vec_id <= {half}"), inc_idx, params)
    ann.append_lsh_index(emb.filter(expr=f"vec_id > {half}"), inc_idx)
    # idempotent: re-running the same generation is a no-op
    n_files = sum(len(fs) for _, _, fs in os.walk(inc_idx))
    ann.append_lsh_index(emb.filter(expr=f"vec_id > {half}"), inc_idx)
    assert sum(len(fs) for _, _, fs in os.walk(inc_idx)) == n_files

    got_full = ann.lsh_index_topk(full_idx, EMB, q, k=10).to_pandas()
    got_inc = ann.lsh_index_topk(inc_idx, EMB, q, k=10).to_pandas()
    np.testing.assert_array_equal(
        got_full["vec_id"].to_numpy(), got_inc["vec_id"].to_numpy()
    )
    # a second generation appends under its own marker
    ann.append_lsh_index(emb.filter(expr="vec_id < 0"), inc_idx, generation="g2")
    assert os.path.exists(os.path.join(inc_idx, "_SUCCESS_APPEND_g2"))


def test_batch_topk_boundary_ties_keep_smallest_ids():
    """argpartition used to keep an arbitrary tied subset at the k
    boundary, making the result batch-partition-dependent; the contract
    is (score desc, vec_id asc)."""
    import pyarrow as pa

    q = np.array([1.0, 0.0])
    emb = pa.table({
        "vec_id": pa.array([10, 3, 1, 2], pa.int64()),
        "embedding": pa.array(
            [[1.0, 0.0], [0.5, 0.5], [0.5, 0.5], [0.5, 0.5]],
            pa.list_(pa.float64())),
    })
    for parts in (1, 2, 4):
        out = ann.topk_cosine(
            rd.from_arrow(emb).repartition(parts), q, k=2).to_pandas()
        assert list(out.vec_id) == [10, 1], parts


def test_ann_kernels_tolerate_empty_blocks():
    """Filtered reads routinely produce 0-row blocks; the reshape(0, -1)
    sites used to crash."""
    import pyarrow as pa

    empty = pa.table({
        "vec_id": pa.array([], pa.int64()),
        "embedding": pa.ListArray.from_arrays(
            pa.array([0], pa.int32()), pa.array([], pa.float64())),
    })
    some = pa.table({
        "vec_id": pa.array([1, 2], pa.int64()),
        "embedding": pa.array([[1.0, 0.0], [0.0, 1.0]],
                              pa.list_(pa.float64())),
    })
    ds = rd.from_arrow(empty).union(rd.from_arrow(some))
    q = np.array([1.0, 0.0])
    assert ann.topk_cosine(ds, q, k=1).count() == 1
    assert ann.range_search(ds, q, threshold=0.5).count() == 1
    params = ann.LshIndexParams(2, 4, 2, 7)
    assert ann.lsh_bucket_assign(ds, params).count() == 2
