"""Gorilla-style lossless codec: delta-of-delta timestamps + XOR values.

The reference *configures* TimescaleDB's Gorilla-style columnar compression
(``segmentby = mmsi``, ``orderby = time ASC`` —
/root/reference/aisdb/aisdb_sql/timescale_createtable_dynamic.sql:25-29) but
delegates the implementation; this engine implements the codec natively, per
the Facebook Gorilla paper layout (Pelkonen et al., VLDB 2015):

Timestamp stream (int64 epoch seconds, sorted):
- ``t0``: 64 raw bits; for i>=1 encode delta-of-delta ``dod`` bucketed:
  ``0`` -> '0';  [-63,64] -> '10'+7b;  [-255,256] -> '110'+9b;
  [-2047,2048] -> '1110'+12b;  else '1111'+64 raw bits.

Value stream (64-bit patterns; int64 directly, float64 via bit view):
- ``v0``: 64 raw bits; for i>=1 ``xor = v_i ^ v_{i-1}``:
  ``xor == 0`` -> '0'; else '1' + 6b leading-zero-count + 6b
  (meaningful-length - 1) + meaningful bits.

Deviation from the paper, documented: the value branch always re-emits the
leading/length window instead of reusing the previous one.  That choice keeps
the encoder fully vectorizable (no sequential control dependency) at a cost
of ~12 bits per changed value; the format stays self-describing and lossless.

Encoding is vectorized NumPy end-to-end (bit-plane packing, <=64 masked
passes).  Decoding walks the bitstream sequentially per stream — it's the
validation/read path; streams are decoded in parallel across series by the
actor-pool stage in ``stages/compress.py``.
"""

from __future__ import annotations

import numpy as np

_POW2 = (1 << np.arange(63, -1, -1).astype(np.uint64)).astype(np.uint64)


def _pack_bits(nbits: np.ndarray, vals: np.ndarray) -> tuple[bytes, int]:
    """Pack fields MSB-first: field i occupies nbits[i] bits of vals[i]."""
    nbits = nbits.astype(np.int64)
    vals = vals.astype(np.uint64)
    keep = nbits > 0
    nbits, vals = nbits[keep], vals[keep]
    total = int(nbits.sum())
    if total == 0:
        return b"", 0
    off = np.zeros(len(nbits), dtype=np.int64)
    np.cumsum(nbits[:-1], out=off[1:])
    bits = np.zeros(total, dtype=bool)
    mx = int(nbits.max())
    for b in range(mx):
        m = nbits > b
        shift = (nbits[m] - 1 - b).astype(np.uint64)
        bits[off[m] + b] = (vals[m] >> shift) & np.uint64(1)
    return np.packbits(bits).tobytes(), total


class _BitReader:
    __slots__ = ("bits", "pos")

    def __init__(self, buf: bytes, nbits: int):
        self.bits = np.unpackbits(np.frombuffer(buf, dtype=np.uint8))[:nbits]
        self.pos = 0

    def read(self, n: int) -> int:
        p = self.pos
        self.pos = p + n
        chunk = self.bits[p : p + n].astype(np.uint64)
        return int(chunk @ _POW2[64 - n :])


# ------------------------------------------------------------- timestamps

_TS_BUCKETS = (  # (low, high, control_bits, control_len, payload_bits, bias)
    (-63, 64, 0b10, 2, 7, 63),
    (-255, 256, 0b110, 3, 9, 255),
    (-2047, 2048, 0b1110, 4, 12, 2047),
)


def encode_timestamps(t: np.ndarray) -> tuple[bytes, int, int]:
    """Encode a sorted int64 epoch vector. Returns (buf, nbits, n)."""
    t = np.ascontiguousarray(t, dtype=np.int64)
    n = len(t)
    if n == 0:
        return b"", 0, 0
    d = np.diff(t)
    dod = np.diff(d, prepend=0) if n > 1 else np.array([], np.int64)
    m = len(dod)
    # two slots per point: control+small payload fused | 64-bit overflow payload
    nb = np.zeros((m, 2), dtype=np.int64)
    vv = np.zeros((m, 2), dtype=np.uint64)
    done = dod == 0
    nb[done, 0] = 1
    vv[done, 0] = 0
    for low, high, ctrl, clen, plen, bias in _TS_BUCKETS:
        sel = (~done) & (dod >= low) & (dod <= high)
        nb[sel, 0] = clen + plen
        vv[sel, 0] = (np.uint64(ctrl) << np.uint64(plen)) | (
            (dod[sel] + bias).astype(np.uint64)
        )
        done |= sel
    rest = ~done
    nb[rest, 0] = 4
    vv[rest, 0] = 0b1111
    nb[rest, 1] = 64
    vv[rest, 1] = dod[rest].astype(np.int64).view(np.uint64)
    all_nb = np.concatenate([[64], nb.ravel()])
    all_vv = np.concatenate([[np.int64(t[0]).view(np.uint64)], vv.ravel()])
    buf, nbits = _pack_bits(all_nb, all_vv)
    return buf, nbits, n


def decode_timestamps(buf: bytes, nbits: int, n: int) -> np.ndarray:
    if n == 0:
        return np.array([], dtype=np.int64)
    r = _BitReader(buf, nbits)
    t0 = np.uint64(r.read(64)).astype(np.int64)
    out = np.empty(n, dtype=np.int64)
    out[0] = t0
    d = 0
    for i in range(1, n):
        if r.read(1) == 0:
            dod = 0
        elif r.read(1) == 0:
            dod = r.read(7) - 63
        elif r.read(1) == 0:
            dod = r.read(9) - 255
        elif r.read(1) == 0:
            dod = r.read(12) - 2047
        else:
            dod = int(np.uint64(r.read(64)).astype(np.int64))
        d += dod
        out[i] = out[i - 1] + d
    return out


# ------------------------------------------------------------- values

def encode_values(v: np.ndarray) -> tuple[bytes, int, int]:
    """Encode int64/float64 values via XOR of 64-bit patterns."""
    v = np.ascontiguousarray(v)
    if np.issubdtype(v.dtype, np.floating):
        # upcast narrower floats: the old `== float64` check sent float32
        # through the int branch, silently TRUNCATING 1.5 -> 1 in a codec
        # documented as lossless (decode emits float64, value-preserving)
        bitsv = v.astype(np.float64).view(np.uint64)
    else:
        bitsv = v.astype(np.int64).view(np.uint64)
    n = len(bitsv)
    if n == 0:
        return b"", 0, 0
    xor = bitsv[1:] ^ bitsv[:-1]
    m = len(xor)
    nb = np.zeros((m, 2), dtype=np.int64)
    vv = np.zeros((m, 2), dtype=np.uint64)
    zero = xor == 0
    nb[zero, 0] = 1
    nz = ~zero
    if nz.any():
        x = xor[nz]
        # leading zeros via bit_length of the value (vectorized log2 on floats
        # is unsafe for 64-bit ints; use a 4-bit nibble scan instead)
        lead = np.zeros(len(x), dtype=np.int64)
        rem = x.copy()
        cnt = np.full(len(x), 64, dtype=np.int64)
        for shift in (32, 16, 8, 4, 2, 1):
            big = rem >= (np.uint64(1) << np.uint64(shift))
            cnt[big] -= shift
            rem[big] >>= np.uint64(shift)
        cnt -= 1  # cnt now == leading zero count (x != 0 guaranteed)
        lead = np.minimum(cnt, 63)
        trail = np.zeros(len(x), dtype=np.int64)
        rem = x.copy()
        for shift in (32, 16, 8, 4, 2, 1):
            div = (rem & ((np.uint64(1) << np.uint64(shift)) - np.uint64(1))) == 0
            sel = div & (rem != 0)
            trail[sel] += shift
            rem[sel] >>= np.uint64(shift)
        mlen = 64 - lead - trail
        # control '1' + 6b lead + 6b (mlen-1), then mlen meaningful bits
        nb[nz, 0] = 13
        vv[nz, 0] = (
            (np.uint64(1) << np.uint64(12))
            | (lead.astype(np.uint64) << np.uint64(6))
            | (mlen - 1).astype(np.uint64)
        )
        nb[nz, 1] = mlen
        vv[nz, 1] = x >> trail.astype(np.uint64)
    all_nb = np.concatenate([[64], nb.ravel()])
    all_vv = np.concatenate([[bitsv[0]], vv.ravel()])
    buf, nbits = _pack_bits(all_nb, all_vv)
    return buf, nbits, n


def decode_values(buf: bytes, nbits: int, n: int, dtype=np.int64) -> np.ndarray:
    if n == 0:
        return np.array([], dtype=dtype)
    r = _BitReader(buf, nbits)
    out = np.empty(n, dtype=np.uint64)
    out[0] = np.uint64(r.read(64))
    prev = out[0]
    for i in range(1, n):
        if r.read(1) == 0:
            out[i] = prev
            continue
        lead = r.read(6)
        mlen = r.read(6) + 1
        trail = 64 - lead - mlen
        xor = np.uint64(r.read(mlen)) << np.uint64(trail)
        prev = prev ^ xor
        out[i] = prev
    if dtype == np.float64:
        return out.view(np.float64)
    return out.view(np.int64).astype(dtype)
