"""ahash64 kernel bits and the perceptual near-dup pipeline recall."""

from __future__ import annotations

import numpy as np
import ray.data as rd

from aisdb_ray.stages.multimodal import (
    ahash64,
    ahash_pairs,
    decode_png,
    encode_bmp,
    encode_png,
    encode_ppm,
    synth_near_dup_media,
)


def test_ahash_constant_image_is_zero():
    px = np.full((16, 16, 3), 77, np.uint8)
    assert int(ahash64(px)) == 0  # no cell is strictly above the mean


def test_ahash_half_bright_sets_exactly_top_cells():
    px = np.zeros((16, 16, 3), np.uint8)
    px[:8] = 255  # top half bright -> cells 0..31 above global mean
    assert int(ahash64(px)) == 0x00000000FFFFFFFF


def test_ahash_invariant_across_containers():
    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, (24, 33, 3), dtype=np.uint8)
    h = ahash64(px)
    assert ahash64(decode_png(encode_png(px))) == h  # pixel-identical codecs
    assert int(h) != 0


def test_ahash_pairs_recall_and_rejection():
    t = synth_near_dup_media(12)
    got = ahash_pairs(rd.from_arrow(t), max_hamming=3, concurrency=2).to_pandas()
    # planted triplets occupy ids 0..35; ids >= 36 are unrelated randoms
    assert (got["a"] < 36).all() and (got["b"] < 36).all()
    # every exact re-encode pair (3k, 3k+1) found at distance 0
    ex = got[(got.a % 3 == 0) & (got.b == got.a + 1)]
    assert len(ex) == 12 and (ex.hamming == 0).all()
    # pairs never cross triplet groups
    assert (got.a // 3 == got.b // 3).all()
    assert (got.hamming <= 3).all()


def test_ahash_pairs_symmetric_formats(tmp_path):
    # the same pixels through PPM and BMP must pair at distance 0
    rng = np.random.default_rng(9)
    px = rng.integers(0, 256, (20, 20, 3), dtype=np.uint8)
    import pyarrow as pa

    from aisdb_ray.stages.multimodal import MEDIA_SCHEMA

    t = pa.table({
        "media_id": pa.array([0, 1], pa.int64()),
        "payload": pa.array([encode_ppm(px), encode_bmp(px)], pa.binary()),
        "mime": pa.array(["image/x-portable-pixmap", "image/bmp"]),
        "width": pa.array(np.array([20, 20], np.int32)),
        "height": pa.array(np.array([20, 20], np.int32)),
        "n_frames": pa.array(np.array([1, 1], np.int32)),
    }, schema=MEDIA_SCHEMA)
    got = ahash_pairs(rd.from_arrow(t), max_hamming=0).to_pandas()
    assert got[["a", "b", "hamming"]].values.tolist() == [[0, 1, 0]]
