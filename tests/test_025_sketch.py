"""HyperLogLog sketch: exact register parity, merge law, estimate accuracy."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from aisdb_ray.stages import sketch

EVENTS = "/root/testdata/sf0.001/events.parquet"


def test_bit_length_exact():
    rng = np.random.default_rng(3)
    x = rng.integers(0, 1 << 54, 5000).astype(np.uint64)
    x[:5] = [0, 1, 2, (1 << 54) - 1, 1 << 53]
    got = sketch._bit_length_u64(x)
    want = np.array([int(v).bit_length() for v in x], np.int64)
    np.testing.assert_array_equal(got, want)


def _registers_df(ds, **kw) -> pd.DataFrame:
    return (
        sketch.hll_registers(ds, "event_type", "user_id", **kw)
        .to_pandas()
        .sort_values(["event_type", "register"], kind="stable")
        .reset_index(drop=True)
    )


def test_merge_law_and_hash_combine():
    """sketch(A) ⊔ sketch(B) == sketch(A ∪ B), and the groupby combine path
    equals the funnel path exactly."""
    df = pd.read_parquet(EVENTS, columns=["event_type", "user_id"])
    half = len(df) // 2
    a, b = df.iloc[:half], df.iloc[half:]

    full = _registers_df(rd.from_pandas(df))
    hashp = _registers_df(rd.from_pandas(df), hash_combine=True)
    pd.testing.assert_frame_equal(full, hashp, check_dtype=False)

    ra = pa.Table.from_pandas(_registers_df(rd.from_pandas(a)))
    rb = pa.Table.from_pandas(_registers_df(rd.from_pandas(b)))
    merged = (
        sketch.merge_registers(ra, rb, key_col="event_type")
        .to_pandas()
        .sort_values(["event_type", "register"], kind="stable")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        merged[full.columns.tolist()], full, check_dtype=False
    )


def test_estimate_accuracy():
    """Estimates within 3σ-ish (±12% at m=1024) of the exact distincts."""
    est = sketch.hll_distinct(
        rd.read_parquet(EVENTS, columns=["event_type", "user_id"]),
        "event_type", "user_id", b=10,
    ).to_pandas()
    exact = duckdb.sql(
        f"""SELECT event_type, count(DISTINCT user_id) AS n
FROM read_parquet('{EVENTS}') GROUP BY event_type"""
    ).df()
    j = est.merge(exact, on="event_type")
    assert len(j) == len(exact) and len(j) > 0
    rel = np.abs(j["estimate"] - j["n"]) / np.maximum(j["n"], 1)
    assert (rel < 0.12).all(), j


DOCS = "/root/testdata/sf0.001/documents.parquet"


def test_cms_overestimates_never_under():
    """CMS point estimates are >= the true counts, always."""
    ds = rd.read_parquet(DOCS, columns=["text"])
    counters = pa.Table.from_pandas(
        sketch.cms_counts(ds, "text", d=4, w=256).to_pandas()
    )
    truth = duckdb.sql(
        rf"""SELECT t.w AS w, count(*) AS c
FROM read_parquet('{DOCS}') doc,
     LATERAL unnest(regexp_extract_all(doc.text, '\S+')) AS t(w)
GROUP BY t.w ORDER BY c DESC LIMIT 50"""
    ).df()
    est = sketch.cms_estimate(counters, truth["w"].tolist(), d=4, w=256)
    assert len(truth) > 0
    for w_, c_ in zip(truth["w"], truth["c"]):
        assert est[w_] >= c_, (w_, est[w_], c_)
    # total mass per depth row equals the total token count (sum identity)
    import pandas as pd  # noqa: F811
    per_depth = counters.to_pandas().groupby("depth")["cnt"].sum()
    total = duckdb.sql(
        rf"""SELECT count(*) FROM read_parquet('{DOCS}') doc,
     LATERAL unnest(regexp_extract_all(doc.text, '\S+')) AS t(w)"""
    ).fetchone()[0]
    assert (per_depth == total).all()


def test_cms_merge_law():
    df = pd.read_parquet(DOCS, columns=["text"])
    half = len(df) // 2

    def counters(frame):
        return pa.Table.from_pandas(
            sketch.cms_counts(rd.from_pandas(frame), "text").to_pandas()
        )

    full = counters(df).to_pandas().sort_values(["depth", "col"]).reset_index(drop=True)
    merged = (
        sketch.cms_merge(counters(df.iloc[:half]), counters(df.iloc[half:]))
        .to_pandas().sort_values(["depth", "col"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(merged[full.columns.tolist()], full,
                                  check_dtype=False)


def test_hll_pair_union_and_overlap_estimate():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from aisdb_ray.stages import sketch

    rng = np.random.default_rng(31)
    # two keys with a planted 2000-user overlap
    a_users = np.arange(0, 6000)
    b_users = np.arange(4000, 10000)
    t = pa.table({
        "event_type": ["a"] * len(a_users) + ["b"] * len(b_users),
        "user_id": np.r_[a_users, b_users].astype(np.int64),
    })
    ds = rd.from_arrow(t)
    regs = sketch.hll_registers(ds, "event_type", "user_id", b=10)
    hist_ds = sketch.hll_pair_union_hist(regs, "event_type", b=10)
    hist = pa.concat_tables(
        __import__("ray").get(hist_ds.to_arrow_refs()),
        promote_options="default",
    )
    # histogram covers all 1024 registers for the single pair
    hp = hist.to_pandas()
    assert set(zip(hp["type_a"], hp["type_b"])) == {("a", "b")}
    assert hp["n_regs"].sum() == 1024

    singles = pa.concat_tables(
        __import__("ray").get(regs.to_arrow_refs()), promote_options="default"
    )
    est = sketch.hll_overlap_estimate(hist, singles, "event_type", b=10)
    got = est[("a", "b")]
    # HLL with m=1024: ±1.04/sqrt(m) ≈ 3.3% per sketch; allow a loose
    # union-of-errors band on the 2000-user truth
    assert 1300 < got < 2700, got


def test_hll_window_registers_union_law():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from aisdb_ray.stages import sketch

    rng = np.random.default_rng(53)
    n = 5_000
    t = pa.table({
        "k": rng.choice(["x", "y"], n),
        "u": rng.integers(0, 800, n).astype(np.int64),
        "time": rng.integers(0, 40_000, n).astype(np.int64),
    })
    width, hop = 4_000, 1_000
    got = sketch.hll_window_registers(
        rd.from_arrow(t).repartition(6), "k", "u", "time", width, hop, b=6
    ).to_pandas()

    # brute force: per (k, window) the register-wise max over member rows
    import hashlib
    df = t.to_pandas()
    regs = {}
    for _, r in df.iterrows():
        h = int(hashlib.md5(str(r["u"]).encode()).hexdigest()[:16], 16)
        reg = h >> 58
        suf = h & ((1 << 58) - 1)
        rank = 59 if suf == 0 else 59 - suf.bit_length()
        hb = (r["time"] // hop) * hop
        for i in range(width // hop):
            key = (r["k"], hb - i * hop, reg)
            regs[key] = max(regs.get(key, 0), rank)
    want = sorted(regs.items())
    gset = {(r["k"], r["wstart"], r["register"]): r["max_rank"]
            for _, r in got.iterrows()}
    assert len(gset) == len(want)
    for (key, rank) in want:
        assert gset[key] == rank, key


def test_hll_estimate_idempotent_on_concatenated_registers():
    """Passing two periods' register tables concatenated must estimate
    the UNION (register-wise max), identical to a pre-merged table."""
    import pyarrow as pa

    from aisdb_ray.stages import sketch

    r1 = pa.table({"k": ["a", "a"], "register": [3, 7],
                   "max_rank": [2, 5]})
    r2 = pa.table({"k": ["a", "a"], "register": [3, 9],
                   "max_rank": [4, 1]})
    both = pa.concat_tables([r1, r2]).rename_columns(
        ["k", sketch.REGISTER, sketch.MAX_RANK])
    merged = sketch.merge_registers(
        r1.rename_columns(["k", sketch.REGISTER, sketch.MAX_RANK]),
        r2.rename_columns(["k", sketch.REGISTER, sketch.MAX_RANK]),
        key_col="k")
    e1 = sketch.hll_estimate(both, "k").to_pandas()
    e2 = sketch.hll_estimate(merged, "k").to_pandas()
    assert e1["estimate"].tolist() == e2["estimate"].tolist()


def test_hll_distinct_empty_input():
    import pyarrow as pa
    import ray.data as rd

    from aisdb_ray.stages import sketch

    empty = rd.from_arrow(pa.table({
        "k": pa.array([], pa.string()), "v": pa.array([], pa.string()),
    }))
    got = sketch.hll_distinct(empty, "k", "v")
    assert got.num_rows == 0


def test_hll_null_values_excluded_and_null_keys_survive():
    """SQL COUNT(DISTINCT v) excludes null values (str(None) also collided
    with a literal 'None' string), and a null KEY group must estimate, not
    crash the object argsort."""
    import pyarrow as pa

    t = pa.table({
        "k": pa.array(["a", "a", "a", None], pa.string()),
        "v": pa.array([None, "None", "x", "y"], pa.string()),
    })
    regs = sketch.hll_partial_batch(t, "k", "v")
    est = sketch.hll_estimate(regs, "k").to_pandas()
    by_k = {("<null>" if k is None else k): e
            for k, e in zip(est.k, est.estimate)}
    assert round(by_k["a"]) == 2   # null value excluded; 'None' != null
    assert round(by_k["<null>"]) == 1


def test_hll_pair_union_int_keys():
    """Int-keyed register tables: the pair-union key columns must carry
    int64, not a hardcoded string type."""
    import pyarrow as pa
    import ray.data as rd

    t = pa.table({
        "k": pa.array([1, 1, 2, 2], pa.int64()),
        "v": pa.array(["a", "b", "b", "c"], pa.string()),
    })
    regs = sketch.hll_registers(rd.from_arrow(t), "k", "v")
    hist = sketch.hll_pair_union_hist(regs, "k").to_pandas()
    assert len(hist) > 0
    assert hist.type_a.dtype.kind == "i"
