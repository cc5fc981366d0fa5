"""Morton key interleave, layout locality, and pruned-scan correctness."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from aisdb_ray.stages.zorder import (
    box_scan,
    morton_key,
    scan_stats,
    write_zordered,
)


def test_morton_key_interleaves_bits():
    # full-range bounds make quantization the identity on 0..65535
    a = np.array([0, 1, 0, 65535], np.int64)
    b = np.array([0, 0, 1, 65535], np.int64)
    k = morton_key(a, b, 0, 65535, 0, 65535)
    assert k[0] == 0
    assert k[1] == 2          # a's bit 0 lands at position 1
    assert k[2] == 1          # b's bit 0 lands at position 0
    assert k[3] == (1 << 32) - 1


def test_morton_locality_beats_linear_for_2d_boxes(tmp_path):
    rng = np.random.default_rng(4)
    n = 40_000
    t = np.sort(rng.integers(0, 1_000_000, n)).astype(np.int64)
    v = rng.integers(0, 4096, n).astype(np.int64)
    tbl = pa.table({"time": pa.array(t), "n_tok": pa.array(v)})

    zdir = str(tmp_path / "z")
    write_zordered(rd.from_arrow(tbl), "time", "n_tok", zdir,
                   rows_per_group=256)
    # linear (time-sorted) layout with identical row-group size
    ldir = str(tmp_path / "lin")
    import os

    os.makedirs(ldir)
    pq.write_table(tbl, os.path.join(ldir, "part.parquet"),
                   row_group_size=256)

    box = dict(a_lo=400_000, a_hi=500_000, b_lo=1030, b_hi=1200)
    z = scan_stats(zdir, "time", "n_tok", **{k: v for k, v in box.items()})
    lin = scan_stats(ldir, "time", "n_tok", **{k: v for k, v in box.items()})
    # z-order prunes on BOTH dims; the time-sorted layout can only prune
    # on time, so it touches every group inside the time slice
    assert z["touched"] < lin["touched"]
    assert z["touched"] < z["total"] // 4

    got = (
        box_scan(zdir, "time", "n_tok", **box)
        .to_pandas().sort_values(["time", "n_tok"]).reset_index(drop=True)
    )
    mask = ((t >= box["a_lo"]) & (t <= box["a_hi"])
            & (v >= box["b_lo"]) & (v <= box["b_hi"]))
    exp = (
        tbl.to_pandas()[mask].sort_values(["time", "n_tok"])
        .reset_index(drop=True)
    )
    assert got.equals(exp)


def test_zorder_handles_constant_dimension(tmp_path):
    tbl = pa.table({
        "time": pa.array(np.arange(100, dtype=np.int64)),
        "n_tok": pa.array(np.full(100, 7, np.int64)),
    })
    zdir = str(tmp_path / "z")
    _, bounds = write_zordered(rd.from_arrow(tbl), "time", "n_tok", zdir,
                               rows_per_group=32)
    assert bounds == (0, 99, 7, 7)
    got = box_scan(zdir, "time", "n_tok", 10, 20, 0, 100).to_pandas()
    assert sorted(got["time"].tolist()) == list(range(10, 21))


def test_lsh_delete_excludes_tombstones_and_keeps_rank_order(tmp_path):
    """Serve-time tombstoning: excluded ids vanish, survivors keep their
    relative order vs the undeleted serving path."""
    import os

    from aisdb_ray.pipelines.queries import (
        q_ann_lsh_delete,
        q_ann_lsh_topk,
    )

    base = q_ann_lsh_topk("/root/testdata/sf0.001").to_pandas()
    dele = q_ann_lsh_delete("/root/testdata/sf0.001").to_pandas()
    assert (dele["vec_id"] % 7 != 0).all()
    kept = [v for v in base["vec_id"] if v % 7 != 0]
    # the surviving prefix must appear in the same relative order
    pos = {v: i for i, v in enumerate(dele["vec_id"])}
    filtered = [v for v in kept if v in pos]
    assert filtered == sorted(filtered, key=lambda v: pos[v])


def test_quantile_norm_percent_rank_rule():
    """Min-rank ties and the n=1 -> 0 guard."""
    from aisdb_ray.pipelines.queries import q_ts_quantile_norm

    got = q_ts_quantile_norm("/root/testdata/sf0.001").to_pandas()
    assert ((got["pr"] >= 0) & (got["pr"] <= 1)).all()
    # per source: min value has pr 0; ties share one rank
    g = got.groupby("source")
    for s, d in g:
        if len(d) == 1:
            assert d["pr"].iloc[0] == 0.0
            continue
        d = d.sort_values(["n_tok"])
        assert d["pr"].iloc[0] == 0.0
        # equal values -> equal pr
        eq = d.groupby("n_tok")["pr"].nunique()
        assert (eq == 1).all()


def test_quant_huge_span_no_overflow():
    """Nanosecond-scale spans overflowed (x-lo)*65535 in int64 and
    clipped the whole layout to bucket 0."""
    span = 3 * 10**16
    a = np.array([0, span // 2, span], np.int64)
    b = np.zeros(3, np.int64)
    k = morton_key(a, b, 0, span, 0, 1)
    # max of range must quantize to the top bucket, not 0
    assert k[2] > k[1] > k[0]


def test_write_zordered_rejects_null_layout_values(tmp_path):
    import pytest

    t = pa.table({
        "a": pa.array([1, None, 3], pa.int64()),
        "b": pa.array([1, 2, 3], pa.int64()),
    })
    with pytest.raises(Exception, match="null"):
        write_zordered(rd.from_arrow(t), "a", "b", str(tmp_path / "z"))


def test_scan_stats_tolerates_min_max_less_statistics(tmp_path):
    """An all-null column chunk writes stats with has_min_max=False —
    scan_stats must count it touched, not TypeError on None."""
    from aisdb_ray.stages.zorder import scan_stats

    t = pa.table({
        "a": pa.array([None, None], pa.int64()),
        "b": pa.array([1, 2], pa.int64()),
    })
    pq.write_table(t, str(tmp_path / "f.parquet"))
    r = scan_stats(str(tmp_path), "a", "b", 0, 10, 0, 10)
    assert r == {"touched": 1, "total": 1}
