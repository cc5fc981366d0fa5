"""Gorilla codec: lossless round-trip + compression-ratio sanity.

Property-style (hypothesis) + adversarial vectors, mirroring the reference's
corrupt-corpus discipline (/root/reference/aisdb_lib/src/decode.rs:446-485).
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from aisdb_ray.functions import gorilla


def _roundtrip_t(t):
    buf, nbits, n = gorilla.encode_timestamps(np.asarray(t, np.int64))
    out = gorilla.decode_timestamps(buf, nbits, n)
    np.testing.assert_array_equal(out, np.asarray(t, np.int64))


def _roundtrip_v(v, dtype=np.int64):
    arr = np.asarray(v, dtype)
    buf, nbits, n = gorilla.encode_values(arr)
    out = gorilla.decode_values(buf, nbits, n, dtype=dtype)
    np.testing.assert_array_equal(out, arr)


def test_timestamps_regular_cadence():
    _roundtrip_t(1_700_000_000 + 60 * np.arange(1000))


def test_timestamps_irregular():
    rng = np.random.default_rng(7)
    t = np.sort(rng.integers(0, 10**9, 500))
    _roundtrip_t(t)


def test_timestamps_edge_cases():
    _roundtrip_t([5])
    _roundtrip_t([5, 5])          # zero delta (same-second burst)
    _roundtrip_t([0, 2**40])      # overflow bucket
    _roundtrip_t([])


def test_values_int_walk():
    rng = np.random.default_rng(8)
    _roundtrip_v(np.cumsum(rng.integers(-40, 41, 2000)) + 512)


def test_values_constant():
    _roundtrip_v(np.full(100, 42))


def test_values_extremes():
    _roundtrip_v([0, -1, 2**62, -(2**62), 1, 0])
    _roundtrip_v([])
    _roundtrip_v([7])


def test_values_float64():
    rng = np.random.default_rng(9)
    _roundtrip_v(rng.normal(size=500), dtype=np.float64)
    _roundtrip_v([0.0, -0.0, np.inf, -np.inf, 1e-308, 1.5], dtype=np.float64)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=-(2**62), max_value=2**62), max_size=80))
def test_values_property(vals):
    _roundtrip_v(vals)


@settings(max_examples=50, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=80)
)
def test_timestamps_property(ts):
    _roundtrip_t(np.sort(np.asarray(ts, np.int64)))


def test_compression_ratio_regular_series():
    """Regular cadence + slowly-varying ints must compress far below raw."""
    t = 1_700_000_000 + 60 * np.arange(10_000)
    rng = np.random.default_rng(11)
    v = np.cumsum(rng.integers(-2, 3, 10_000)) + 512
    tb, tn, _ = gorilla.encode_timestamps(t)
    vb, vn, _ = gorilla.encode_values(v)
    raw_bytes = 10_000 * 16
    assert (len(tb) + len(vb)) < raw_bytes / 4
    # timestamps of a perfectly regular series ≈ 1 bit/point after the header
    assert tn < 64 + 14 + 10_000 * 1.1


class TestCompressStage:
    def test_roundtrip_through_ray(self, micro_dir):
        import ray.data as rd

        from aisdb_ray import oracle
        from aisdb_ray.fixtures import build_token_table
        from aisdb_ray.stages import compress, prepare

        ds = rd.read_parquet(micro_dir).map_batches(
            prepare.prepare, batch_format="pyarrow"
        )
        enc = compress.compress(ds, max_gap=7200, concurrency=2)
        dec = compress.decompress(enc, concurrency=2).to_pandas()

        want = oracle.add_segments(oracle.clean(build_token_table("t0-micro").to_pandas()), 7200)
        got = dec.sort_values(["source", "time", "n_tok"], kind="stable").reset_index(drop=True)
        # the packed tier collapses same-(time,seq) rows already deduped; compare point sets
        want = want.sort_values(["source", "time", "n_tok"], kind="stable").reset_index(drop=True)
        assert len(got) == len(want)
        np.testing.assert_array_equal(got["source"].to_numpy(), want["source"].to_numpy())
        np.testing.assert_array_equal(got["time"].to_numpy(), want["time"].to_numpy())
        np.testing.assert_array_equal(got["n_tok"].to_numpy(), want["n_tok"].to_numpy())
        np.testing.assert_array_equal(got["seg"].to_numpy(), want["seg"].to_numpy())
