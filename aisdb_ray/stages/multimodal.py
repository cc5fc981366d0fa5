"""Multimodal (image/audio/video) columns: opaque binary payloads + typed
metadata, processed by actor-pool ``map_batches`` stages.

The container has no codec LIBRARIES (no PIL/ffmpeg), but four classic
container formats decode for REAL with numpy + stdlib zlib alone:

- **PPM (P6)**: ``P6\\n<w> <h>\\n255\\n`` + raw RGB rows;
- **BMP (24-bit uncompressed)**: BITMAPFILEHEADER + BITMAPINFOHEADER,
  bottom-up BGR rows padded to 4 bytes;
- **PNG (8-bit RGB, non-interlaced)**: chunk walk + zlib inflate + full
  scanline unfilter (all five spec filters) — a genuinely COMPRESSED
  format, CRC-validated;
- **WAV (PCM16 mono)**: RIFF/fmt/data chunks + int16 samples.

Formats needing entropy/DCT codecs (JPEG/MP4) stay behind a declared
``NotImplementedError`` — swapping in a real codec is the ``__init__``
of the same actor class.  "Video" rows are modeled as a frame stream of
concatenated PPM images (the post-demux layout a real pipeline hands to
per-frame workers).

Batch-size note (the memory-aware rule): binary payload rows are wide;
these stages default to small ``batch_size`` so batch x concurrency fits
worker heaps, and they run ``batch_format="pyarrow"`` end-to-end (binary
columns round-trip Arrow cleanly but not pandas).
"""

from __future__ import annotations

import struct
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


# --------------------------------------------------------------- codecs

def encode_ppm(px: np.ndarray) -> bytes:
    h, w, _ = px.shape
    return b"P6\n%d %d\n255\n" % (w, h) + px.astype(np.uint8).tobytes()


def _parse_ppm_header(payload: bytes, start: int = 0) -> tuple[int, int, int]:
    """-> (width, height, data_offset relative to payload[0]); comments
    (#...) skipped.  ``start`` avoids per-frame byte copies when demuxing."""
    if payload[start : start + 2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    tokens, pos, n = [], start + 2, len(payload)
    while len(tokens) < 3:
        while payload[pos : pos + 1].isspace():
            pos += 1
        if pos >= n:  # truncated header: fewer than 3 tokens before EOF
            raise ValueError("truncated PPM header")
        if payload[pos : pos + 1] == b"#":
            pos = payload.index(b"\n", pos) + 1
            continue
        end = pos
        # bound by n: at EOF payload[end:end+1] == b'' is NOT whitespace,
        # so an unbounded scan would spin forever on a torn header
        while end < n and not payload[end : end + 1].isspace():
            end += 1
        if end == n:
            raise ValueError("truncated PPM header")
        tokens.append(int(payload[pos:end]))
        pos = end
    pos += 1  # single whitespace after maxval
    w, h, maxval = tokens
    if maxval != 255:
        raise ValueError("only 8-bit PPM supported")
    return w, h, pos


def decode_ppm(payload: bytes) -> np.ndarray:
    w, h, pos = _parse_ppm_header(payload)
    buf = np.frombuffer(payload, np.uint8, count=w * h * 3, offset=pos)
    return buf.reshape(h, w, 3)


def _ppm_frame_end(payload: bytes, start: int) -> int:
    w, h, data_off = _parse_ppm_header(payload, start)
    return data_off + w * h * 3


def encode_bmp(px: np.ndarray) -> bytes:
    """24-bit uncompressed BMP: bottom-up BGR rows, 4-byte row padding."""
    h, w, _ = px.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)  # flip rows, RGB->BGR
    data = rows.tobytes()
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + len(data), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    return header + info + data


def decode_bmp(payload: bytes) -> np.ndarray:
    magic, _size, _r1, _r2, off = struct.unpack_from("<2sIHHI", payload, 0)
    if magic != b"BM":
        raise ValueError("not a BMP payload")
    hsz, w, h, _planes, bpp, comp = struct.unpack_from("<IiiHHI", payload, 14)
    if bpp != 24 or comp != 0:
        raise ValueError("only 24-bit uncompressed BMP supported")
    stride = (w * 3 + 3) & ~3
    buf = np.frombuffer(payload, np.uint8, count=stride * abs(h), offset=off)
    rows = buf.reshape(abs(h), stride)[:, : w * 3].reshape(abs(h), w, 3)
    if h > 0:  # bottom-up
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data)) + typ + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def _paeth_vec(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor (PNG spec §9.4), vectorized over channel lanes."""
    p = a + b - c
    pa_, pb, pc_ = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa_ <= pb) & (pa_ <= pc_), a, np.where(pb <= pc_, b, c))


def encode_png(px: np.ndarray, filter_type: int = 0) -> bytes:
    """REAL PNG encoder for 8-bit RGB (color type 2): zlib-compressed
    scanlines, one filter byte per row (PNG spec; zlib is stdlib — the one
    compressed image format this container can do without codec libs).
    ``filter_type`` applies one of the five spec filters to every row so
    tests can exercise each decode path."""
    h, w, _ = px.shape
    raw = px.astype(np.int16)
    prev = np.zeros((w, 3), np.int16)
    parts = []
    for y in range(h):
        line = raw[y]
        if filter_type == 0:
            enc = line
        elif filter_type == 1:  # Sub
            left = np.vstack([np.zeros((1, 3), np.int16), line[:-1]])
            enc = (line - left) % 256
        elif filter_type == 2:  # Up
            enc = (line - prev) % 256
        elif filter_type in (3, 4):  # Average / Paeth: left-sequential
            enc = np.empty((w, 3), np.int16)
            left = np.zeros(3, np.int16)
            upleft = np.zeros(3, np.int16)
            for x in range(w):
                up = prev[x]
                pred = ((left + up) >> 1) if filter_type == 3 else _paeth_vec(
                    left, up, upleft
                )
                enc[x] = (line[x] - pred) % 256
                left = line[x]
                upleft = up
        else:
            raise ValueError(f"unknown PNG filter {filter_type}")
        parts.append(bytes([filter_type]) + enc.astype(np.uint8).tobytes())
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"".join(parts)))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> np.ndarray:
    """REAL PNG decoder: chunk walk, zlib inflate, full unfilter (all five
    spec filters).  Supports the encoder's profile — 8-bit RGB (color
    type 2), non-interlaced; anything else raises rather than guessing."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, idat = 8, []
    w = h = None
    while pos < len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        typ = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if crc != (zlib.crc32(typ + data) & 0xFFFFFFFF):
            raise ValueError(f"PNG chunk {typ!r} CRC mismatch")
        if typ == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if (depth, color, comp, filt, interlace) != (8, 2, 0, 0, 0):
                raise ValueError(
                    "only 8-bit RGB non-interlaced PNG supported "
                    f"(got depth={depth} color={color} interlace={interlace})"
                )
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
        pos += 12 + length
    if w is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    raw = zlib.decompress(b"".join(idat))
    stride = w * 3
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline payload truncated")
    out = np.empty((h, w, 3), np.uint8)
    prev = np.zeros((w, 3), np.int16)
    pos = 0
    for y in range(h):
        f = raw[pos]
        line = np.frombuffer(raw, np.uint8, stride, pos + 1).astype(
            np.int16
        ).reshape(w, 3)
        pos += 1 + stride
        if f == 0:
            rec = line
        elif f == 1:  # Sub: recon = cumsum per channel lane (mod 256)
            rec = (np.cumsum(line, axis=0, dtype=np.int64) % 256).astype(np.int16)
        elif f == 2:  # Up
            rec = (line + prev) % 256
        elif f in (3, 4):  # Average / Paeth: left-sequential per pixel
            rec = np.empty((w, 3), np.int16)
            left = np.zeros(3, np.int16)
            upleft = np.zeros(3, np.int16)
            for x in range(w):
                up = prev[x]
                pred = ((left + up) >> 1) if f == 3 else _paeth_vec(
                    left, up, upleft
                )
                rec[x] = (line[x] + pred) % 256
                left = rec[x]
                upleft = up
        else:
            raise ValueError(f"unknown PNG filter byte {f}")
        out[y] = rec.astype(np.uint8)
        prev = rec
    return out


def encode_wav(samples: np.ndarray, rate: int = 16_000) -> bytes:
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    return (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, samples = 12, None, None
    while pos + 8 <= len(payload):
        cid, sz = struct.unpack_from("<4sI", payload, pos)
        body = pos + 8
        if cid == b"fmt ":
            audio_fmt, ch, rate, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", payload, body
            )
            if audio_fmt != 1 or ch != 1 or bits != 16:
                raise ValueError("only PCM16 mono supported")
        elif cid == b"data":
            samples = np.frombuffer(payload, "<i2", count=sz // 2, offset=body)
        pos = body + sz + (sz & 1)
    if rate is None or samples is None:
        raise ValueError("missing fmt/data chunk")
    return samples, rate


def split_ppm_frames(payload: bytes) -> list[bytes]:
    """Demux a concatenated-PPM 'video' stream into per-frame payloads —
    linear in total bytes (header walks use offsets, not slices)."""
    frames, pos = [], 0
    while pos < len(payload):
        end = _ppm_frame_end(payload, pos)
        frames.append(payload[pos:end])
        pos = end
    return frames


# --------------------------------------------------------------- fixtures

def synth_media_table(n: int = 64, seed: int = 42) -> pa.Table:
    """Deterministic media corpus with REAL payloads: PPM and BMP images,
    PCM16 WAV clips, and concatenated-PPM frame streams for video rows."""
    rng = np.random.default_rng(seed)
    payloads, mimes, widths, heights, n_frames = [], [], [], [], []
    for i in range(n):
        w = int(rng.integers(8, 48))
        h = int(rng.integers(8, 48))
        kind = i % 4
        if kind == 0:
            px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            if i % 8 == 0:  # every other kind-0 row: a real COMPRESSED format
                payloads.append(encode_png(px, filter_type=(i // 8) % 5))
                mimes.append("image/png")
            else:
                payloads.append(encode_ppm(px))
                mimes.append("image/x-portable-pixmap")
            widths.append(w); heights.append(h); n_frames.append(1)
        elif kind == 1:
            px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            payloads.append(encode_bmp(px)); mimes.append("image/bmp")
            widths.append(w); heights.append(h); n_frames.append(1)
        elif kind == 2:
            nsamp = int(rng.integers(800, 4000))
            t = np.arange(nsamp)
            freq = float(rng.uniform(0.01, 0.2))
            samples = (np.sin(2 * np.pi * freq * t) * 12000).astype(np.int16)
            payloads.append(encode_wav(samples)); mimes.append("audio/wav")
            widths.append(0); heights.append(0); n_frames.append(1)
        else:
            nf = int(rng.integers(4, 12))
            frames = [
                encode_ppm(rng.integers(0, 256, (h, w, 3), dtype=np.uint8))
                for _ in range(nf)
            ]
            payloads.append(b"".join(frames)); mimes.append("video/x-ppm-stream")
            widths.append(w); heights.append(h); n_frames.append(nf)
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(mimes, pa.string()),
            "width": pa.array(np.array(widths, np.int32)),
            "height": pa.array(np.array(heights, np.int32)),
            "n_frames": pa.array(np.array(n_frames, np.int32)),
        },
        schema=MEDIA_SCHEMA,
    )


# --------------------------------------------------------------- stages

_IMAGE_DECODERS = {
    "image/x-portable-pixmap": decode_ppm,
    "image/bmp": decode_bmp,
    "image/png": decode_png,
}


class DecodeImage:
    """Actor-pool decode stage: header-only formats decode for real; for
    video streams the FIRST frame is decoded (frame fan-out is
    :func:`frame_sample_batch`'s job).  Compressed formats raise unless
    ``fake=True`` supplies the deterministic fallback decode."""

    def __init__(self, fake: bool = False):
        self.fake = fake
        self.decoders = dict(_IMAGE_DECODERS)

    def _decode(self, payload: bytes, mime: str, w: int, h: int) -> np.ndarray:
        if mime in self.decoders:
            return self.decoders[mime](payload)
        if mime == "video/x-ppm-stream":
            return decode_ppm(payload)  # P6 parser stops at frame 0
        if self.fake:
            rng = np.random.default_rng(zlib.crc32(payload))
            return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        raise NotImplementedError(
            f"no codec for {mime} in this container; construct with "
            "fake=True for the deterministic fallback decode"
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        pixels, widths, heights = [], [], []
        for i in range(batch.num_rows):
            px = self._decode(
                batch["payload"][i].as_py(),
                batch["mime"][i].as_py(),
                batch["width"][i].as_py(),
                batch["height"][i].as_py(),
            )
            heights.append(px.shape[0]); widths.append(px.shape[1])
            pixels.append(px.reshape(-1))
        off = np.zeros(len(pixels) + 1, dtype=np.int64)
        np.cumsum([len(p) for p in pixels], out=off[1:])
        flat = np.concatenate(pixels) if pixels else np.array([], np.uint8)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "width": pa.array(np.array(widths, np.int32)),
                "height": pa.array(np.array(heights, np.int32)),
                "pixels": pa.LargeListArray.from_arrays(
                    pa.array(off, pa.int64()), pa.array(flat, pa.uint8())
                ),
            }
        )


class DecodeAudio:
    """Actor-pool WAV decode -> per-clip features (rms, duration,
    zero-crossing rate) — decoded samples never leave the task."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        rms, dur, zcr, ids = [], [], [], []
        for i in range(batch.num_rows):
            if batch["mime"][i].as_py() != "audio/wav":
                continue
            s, rate = decode_wav(batch["payload"][i].as_py())
            x = s.astype(np.float64)
            ids.append(batch["media_id"][i].as_py())
            rms.append(float(np.sqrt(np.mean(x * x))))
            dur.append(len(s) / rate)
            zcr.append(float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "rms": pa.array(rms, pa.float64()),
                "duration_s": pa.array(dur, pa.float64()),
                "zcr": pa.array(zcr, pa.float64()),
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
            # zero-pixel images (0x0 metadata rows) would propagate silent
            # NaN channel means; report 0.0 alongside an all-zero histogram
            means.append(px.mean(axis=0) if len(px) else np.zeros(3))
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
    """Frame sampling: demux video payloads and emit one row per kept
    frame (frame payload included) — the fan-out a per-frame decode/extract
    actor stage consumes."""
    ids, frames, payloads = [], [], []
    for i in range(batch.num_rows):
        mid = batch["media_id"][i].as_py()
        if batch["mime"][i].as_py() == "video/x-ppm-stream":
            fr = split_ppm_frames(batch["payload"][i].as_py())
            keep = list(range(0, len(fr), every))
            ids.extend([mid] * len(keep))
            frames.extend(keep)
            payloads.extend(fr[j] for j in keep)
        else:
            n = batch["n_frames"][i].as_py()
            keep = list(range(0, n, every))
            ids.extend([mid] * len(keep))
            frames.extend(keep)
            payloads.extend([batch["payload"][i].as_py()] * len(keep))
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "frame_idx": pa.array(frames, pa.int32()),
            "payload": pa.array(payloads, pa.binary()),
        }
    )


def decode_and_featurize(ds, concurrency: int = 4, batch_size: int = 16):
    """The canonical multimodal chain: real decode -> features, both
    actor pools with small batches (wide binary rows).  Audio rows route
    to :class:`DecodeAudio`; this chain covers the pixel modalities."""
    import pyarrow.compute as pc

    ds = ds.map_batches(
        lambda b: b.filter(pc.invert(pc.equal(b["mime"], "audio/wav"))),
        batch_format="pyarrow",
    )
    decoded = ds.map_batches(
        DecodeImage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, concurrency),
    )
    return decoded.map_batches(
        ImageFeatures,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, concurrency),
    )


# --------------------------------------------------- perceptual hashing

def ahash64(px: np.ndarray) -> np.uint64:
    """8x8 integer average-hash of an (h, w, 3) uint8 image.

    All-integer construction (no float thresholds, no DCT): luminance =
    299R + 587G + 114B (x1000 fixed point), 8x8 average-pool cells by
    index mapping (y*8//h, x*8//w), bit_i set iff cell mean > global mean,
    decided by the exact cross-multiplication  cell_sum*N > total*cell_n.
    A shifted/re-encoded copy of an image keeps most bits; random images
    agree on ~32/64 — the standard aHash separation.
    """
    h, w = px.shape[0], px.shape[1]
    lum = px.astype(np.int64) @ np.array([299, 587, 114], np.int64)
    yc = (np.arange(h, dtype=np.int64) * 8) // h
    xc = (np.arange(w, dtype=np.int64) * 8) // w
    cid = (yc[:, None] * 8 + xc[None, :]).ravel()
    sums = np.zeros(64, np.int64)
    np.add.at(sums, cid, lum.ravel())
    cnts = np.bincount(cid, minlength=64).astype(np.int64)
    tot = int(lum.sum())
    n = h * w
    bits = (sums * n) > (tot * cnts)
    return np.packbits(bits.astype(np.uint8), bitorder="little").view(np.uint64)[0]


class AHashImage:
    """Actor-pool stage: decode image/video-first-frame payloads and emit
    (media_id, ahash) — audio rows are skipped.  Decode state (the codec
    table) lives in the actor; pixels never leave the task."""

    def __init__(self, fake: bool = False):
        self.dec = DecodeImage(fake=fake)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, hashes = [], []
        for i in range(batch.num_rows):
            mime = batch["mime"][i].as_py()
            if mime not in _IMAGE_DECODERS and mime != "video/x-ppm-stream":
                continue
            px = self.dec._decode(
                batch["payload"][i].as_py(), mime,
                batch["width"][i].as_py(), batch["height"][i].as_py(),
            )
            ids.append(batch["media_id"][i].as_py())
            hashes.append(ahash64(px))
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "ahash": pa.array(
                np.array(hashes, np.uint64).astype(np.int64)
                if hashes else np.array([], np.int64)
            ),
        })


def ahash_pairs(media_ds, max_hamming: int = 3, concurrency: int = 4):
    """Near-duplicate IMAGE pairs by perceptual hash: aHash in an actor
    pool, then the engine's SimHash banding machinery verbatim (4 x 16-bit
    bands pigeonhole-guarantee recall for Hamming <= 3), groupby(band,
    bucket) -> distinct candidate pairs -> vectorized Hamming verify.
    Output: (a, b, hamming) with a < b."""
    from aisdb_ray.stages import dedup_text as dt

    sigs = media_ds.map_batches(
        AHashImage, batch_format="pyarrow", batch_size=16,
        concurrency=(1, concurrency),
    )
    renamed = sigs.map_batches(
        lambda b: b.rename_columns(["doc_id", "simhash"]),
        batch_format="pyarrow",
    )
    with dt._hash_ctx(renamed):
        bands = renamed.map_batches(
            dt._explode_simhash_bands, batch_format="pyarrow"
        )
        pairs = bands.groupby(
            ["band", "bucket"], num_partitions=dt._nparts()
        ).map_groups(dt._bucket_pairs_sig, batch_format="pyarrow").materialize()
        distinct = dt._distinct_pairs(pairs, extra=["ha", "hb"])

    return distinct.map_batches(dt._hamming_verify(max_hamming),
                                batch_format="pyarrow")


def synth_near_dup_media(n_base: int = 12, seed: int = 7) -> pa.Table:
    """Image corpus with PLANTED near-duplicates: for each base image an
    exact re-encode in another container (PPM vs BMP/PNG — byte-different,
    pixel-identical) and a lightly perturbed copy (one cell brightened —
    Hamming <= 3 by construction is NOT guaranteed analytically, but the
    perturbation touches one pooling cell so at most a few bits move);
    plus unrelated random images as negatives.  ids: base 3k, re-encode
    3k+1, perturbed 3k+2, negatives follow."""
    rng = np.random.default_rng(seed)
    rows = []
    mid = 0
    for k in range(n_base):
        h = int(rng.integers(16, 40))
        w = int(rng.integers(16, 40))
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        rows.append((mid, encode_ppm(px), "image/x-portable-pixmap", w, h)); mid += 1
        alt = encode_png(px) if k % 2 == 0 else encode_bmp(px)
        rows.append((mid, alt, "image/png" if k % 2 == 0 else "image/bmp",
                     w, h)); mid += 1
        pert = px.copy()
        # whiten ONE full pooling cell: flips that cell's bit and (via the
        # shifted global mean) at most a couple of borderline others
        y0, x0 = (h * 3) // 8, (w * 3) // 8
        pert[y0:y0 + max(1, h // 8), x0:x0 + max(1, w // 8)] = 255
        rows.append((mid, encode_ppm(pert), "image/x-portable-pixmap",
                     w, h)); mid += 1
    for _ in range(n_base):
        h = int(rng.integers(16, 40))
        w = int(rng.integers(16, 40))
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        rows.append((mid, encode_ppm(px), "image/x-portable-pixmap", w, h))
        mid += 1
    ids, payloads, mimes, ws, hs = zip(*rows)
    return pa.table({
        "media_id": pa.array(ids, pa.int64()),
        "payload": pa.array(payloads, pa.binary()),
        "mime": pa.array(mimes, pa.string()),
        "width": pa.array(np.array(ws, np.int32)),
        "height": pa.array(np.array(hs, np.int32)),
        "n_frames": pa.array(np.ones(len(ids), np.int32)),
    }, schema=MEDIA_SCHEMA)
