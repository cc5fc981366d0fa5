"""Multimodal (image/audio/video) plumbing: opaque binary columns + typed
metadata, processed by actor-pool ``map_batches`` stages.

The image/audio codec libraries are not in this container, so the *decode*
kernels are stubbed exactly as the task prescribes: ``DecodeImage`` raises
``NotImplementedError`` unless constructed with ``fake=True``, in which case
it produces a deterministic fake decode (seeded by the payload's checksum).
Everything around the stub — schema, batch sizing for wide binary rows,
actor signatures, output layout — is real and tested, so swapping in a real
decoder is a one-line change per stage.

Batch-size note (the memory-aware rule): binary payload rows are wide; these
stages default to small ``batch_size`` so batch x concurrency fits worker
heaps, and they run ``batch_format="pyarrow"`` end-to-end (binary columns
round-trip Arrow cleanly but not pandas).
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("n_frames", pa.int32()),
    ]
)


def synth_media_table(n: int = 64, seed: int = 42) -> pa.Table:
    """Deterministic fake media corpus (payload = seeded random bytes)."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, int(rng.integers(256, 4096)), dtype=np.uint8).tobytes() for _ in range(n)]
    mimes = [["image/png", "audio/wav", "video/mp4"][i % 3] for i in range(n)]
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(mimes, pa.string()),
            "width": pa.array(rng.integers(16, 256, n).astype(np.int32)),
            "height": pa.array(rng.integers(16, 256, n).astype(np.int32)),
            "n_frames": pa.array(
                np.where(np.arange(n) % 3 == 2, rng.integers(8, 64, n), 1).astype(np.int32)
            ),
        },
        schema=MEDIA_SCHEMA,
    )


class DecodeImage:
    """Actor-pool decode stage (STUB).

    Real implementation would do ``PIL.Image.open(BytesIO(payload))`` in
    ``__call__`` with the library handle created once here in ``__init__``.
    """

    def __init__(self, fake: bool = False):
        self.fake = fake
        if not fake:
            raise NotImplementedError(
                "image codecs are not available in this container; "
                "construct with fake=True for the deterministic test decode"
            )

    def _fake_pixels(self, payload: bytes, w: int, h: int) -> np.ndarray:
        seed = zlib.crc32(payload)
        rng = np.random.default_rng(seed)
        return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)

    def __call__(self, batch: pa.Table) -> pa.Table:
        pixels = []
        for i in range(batch.num_rows):
            w = batch["width"][i].as_py()
            h = batch["height"][i].as_py()
            px = self._fake_pixels(batch["payload"][i].as_py(), w, h)
            pixels.append(px.reshape(-1))
        off = np.zeros(len(pixels) + 1, dtype=np.int64)
        np.cumsum([len(p) for p in pixels], out=off[1:])
        flat = np.concatenate(pixels) if pixels else np.array([], np.uint8)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "width": batch["width"],
                "height": batch["height"],
                "pixels": pa.LargeListArray.from_arrays(
                    pa.array(off, pa.int64()), pa.array(flat, pa.uint8())
                ),
            }
        )


class ImageFeatures:
    """Actor-pool feature extraction over decoded pixels: channel means +
    a 16-bin luminance histogram (vectorized per image)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        la = batch["pixels"].combine_chunks()
        off = la.offsets.to_numpy()
        flat = la.values.to_numpy()
        means, hists = [], []
        for i in range(batch.num_rows):
            px = flat[off[i]: off[i + 1]].reshape(-1, 3).astype(np.float64)
            means.append(px.mean(axis=0))
            lum = px @ np.array([0.299, 0.587, 0.114])
            hists.append(np.histogram(lum, bins=16, range=(0, 256))[0])
        means = np.stack(means) if means else np.zeros((0, 3))
        hists = np.stack(hists) if hists else np.zeros((0, 16), np.int64)
        hoff = pa.array(np.arange(0, (batch.num_rows + 1) * 16, 16, dtype=np.int32))
        return pa.table(
            {
                "media_id": batch["media_id"],
                "mean_r": pa.array(means[:, 0]),
                "mean_g": pa.array(means[:, 1]),
                "mean_b": pa.array(means[:, 2]),
                "lum_hist": pa.ListArray.from_arrays(
                    hoff, pa.array(hists.reshape(-1).astype(np.int64))
                ),
            }
        )


def frame_sample_batch(batch: pa.Table, every: int = 8) -> pa.Table:
    """Frame sampling plan for video rows: one output row per kept frame.

    Purely structural (no decode): mirrors how a video pipeline fans a clip
    out to per-frame rows before a decode/extract actor stage.
    """
    ids, frames = [], []
    for i in range(batch.num_rows):
        n = batch["n_frames"][i].as_py()
        keep = list(range(0, n, every))
        ids.extend([batch["media_id"][i].as_py()] * len(keep))
        frames.extend(keep)
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "frame_idx": pa.array(frames, pa.int32()),
        }
    )


def decode_and_featurize(ds, concurrency: int = 4, batch_size: int = 16):
    """The canonical multimodal chain: decode (stub) -> features, both
    actor pools with small batches (wide binary rows)."""
    decoded = ds.map_batches(
        DecodeImage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, concurrency),
        fn_constructor_kwargs={"fake": True},
    )
    return decoded.map_batches(
        ImageFeatures,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, concurrency),
    )
