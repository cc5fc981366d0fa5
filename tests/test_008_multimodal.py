"""Multimodal plumbing: stubbed decode + real Ray-side mechanics."""

from __future__ import annotations

import numpy as np
import pytest
import ray.data as rd

from aisdb_ray.stages import multimodal as mm


def test_decode_requires_explicit_fake():
    with pytest.raises(NotImplementedError):
        mm.DecodeImage()


def test_decode_and_featurize_pipeline():
    t = mm.synth_media_table(24)
    ds = rd.from_arrow(t)
    out = mm.decode_and_featurize(ds, concurrency=2, batch_size=8).to_pandas()
    assert len(out) == 24
    assert {"media_id", "mean_r", "mean_g", "mean_b", "lum_hist"} <= set(out.columns)
    # deterministic fake decode: rerunning yields identical features
    out2 = mm.decode_and_featurize(rd.from_arrow(t), concurrency=2, batch_size=8).to_pandas()
    a = out.sort_values("media_id").reset_index(drop=True)
    b = out2.sort_values("media_id").reset_index(drop=True)
    np.testing.assert_allclose(a["mean_r"], b["mean_r"])
    # histogram mass equals pixel count
    row = a.iloc[0]
    w = t["width"][int(np.flatnonzero(t["media_id"].to_numpy() == row["media_id"])[0])].as_py()
    h = t["height"][int(np.flatnonzero(t["media_id"].to_numpy() == row["media_id"])[0])].as_py()
    assert sum(row["lum_hist"]) == w * h


def test_frame_sampling():
    t = mm.synth_media_table(12)
    out = (
        rd.from_arrow(t)
        .map_batches(lambda b: mm.frame_sample_batch(b, every=8), batch_format="pyarrow")
        .to_pandas()
    )
    nf = {int(i): int(n) for i, n in zip(t["media_id"].to_numpy(), t["n_frames"].to_numpy())}
    for mid, grp in out.groupby("media_id"):
        assert list(grp["frame_idx"]) == list(range(0, nf[int(mid)], 8))
