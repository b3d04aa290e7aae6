"""CHIMP codec oracles (reference LongChimpEncoder/LongChimpDecoder pair,
ChimpDecoderTest.java workload shapes: random longs/doubles, constant runs,
periodic sensor patterns that exercise the 128-value hash candidates)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from sorting_compressed_time_series_spark.codecs.chimp import (
    chimp_decode_doubles,
    chimp_decode_longs,
    chimp_encode_doubles,
    chimp_encode_longs,
)


def _roundtrip_u64(v):
    v = np.asarray(v, dtype=np.uint64)
    got = chimp_decode_longs(chimp_encode_longs(v))
    np.testing.assert_array_equal(got, v)
    return got


@pytest.mark.parametrize("n", [0, 1, 2, 3, 7, 64, 129, 1000])
def test_roundtrip_random_longs(n):
    rng = np.random.default_rng(n)
    _roundtrip_u64(rng.integers(0, 2**63, size=n, dtype=np.uint64))


def test_roundtrip_constant_and_repeats():
    _roundtrip_u64(np.full(500, 0xDEADBEEF, dtype=np.uint64))
    _roundtrip_u64(np.tile(np.array([1, 2, 3], dtype=np.uint64), 200))


def test_roundtrip_periodic_exercises_candidates():
    # period-50 sensor pattern: every element's best reference is 50 back
    # (same low-14-bit key, huge trailing-zero run), not the previous value
    rng = np.random.default_rng(7)
    base = rng.integers(0, 2**62, size=50, dtype=np.uint64)
    v = np.tile(base, 40)
    blob = chimp_encode_longs(v)
    np.testing.assert_array_equal(chimp_decode_longs(blob), v)
    # identical repeats 50 apart must all hit the XOR==0 fast case:
    # ~2+7 bits/elem after the first period
    assert len(blob) < 50 * 8 + len(v) * 2


def test_roundtrip_period_beyond_window_falls_back():
    # period 200 > the 128-value window: candidates are stale, the codec
    # must fall back to previous-value XOR and still round-trip
    rng = np.random.default_rng(11)
    base = rng.integers(0, 2**62, size=200, dtype=np.uint64)
    _roundtrip_u64(np.tile(base, 10))


def test_doubles_roundtrip_bitexact_specials():
    v = np.array([0.0, -0.0, 1.5, np.nan, np.inf, -np.inf, 1e-300, -2.5e17,
                  np.pi] * 30, dtype=np.float64)
    got = chimp_decode_doubles(chimp_encode_doubles(v))
    np.testing.assert_array_equal(got.view(np.uint64), v.view(np.uint64))


def test_smooth_series_compresses():
    # slowly-varying double series — the codec's target workload; Chimp's
    # own paper reports ~0.5-0.7x of raw on such data
    rng = np.random.default_rng(3)
    v = np.cumsum(rng.normal(0, 0.001, size=4096)) + 20.0
    blob = chimp_encode_doubles(v)
    assert len(blob) < 0.75 * v.nbytes


def test_low_precision_beats_gorilla_on_decimal_data():
    # decimal-rounded values: low mantissa bits repeat, so the hash
    # candidate's trailing-zero truncation pays off
    rng = np.random.default_rng(5)
    v = np.round(rng.normal(25, 2, size=4096), 1)
    blob = chimp_encode_doubles(v)
    assert len(blob) < 0.8 * v.nbytes
    np.testing.assert_array_equal(
        chimp_decode_doubles(blob).view(np.uint64), v.view(np.uint64))


def test_chunk_container_chimp():
    from sorting_compressed_time_series_spark.codecs.chunk import (
        CODEC_CHIMP, CODEC_CHIMP_F64, decode_chunk, encode_chunk)

    rng = np.random.default_rng(31)
    vi = rng.integers(-(10**6), 10**6, size=4096).astype(np.int64)
    assert np.array_equal(decode_chunk(encode_chunk(vi, CODEC_CHIMP)), vi)
    vf = np.round(rng.normal(25, 2, size=4096), 2)
    got = decode_chunk(encode_chunk(vf, CODEC_CHIMP_F64))
    np.testing.assert_array_equal(got.view(np.uint64), vf.view(np.uint64))


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=300))
def test_roundtrip_property(xs):
    _roundtrip_u64(np.array(xs, dtype=np.uint64))


@settings(max_examples=40, deadline=None)
@given(st.lists(st.floats(allow_nan=True, allow_infinity=True,
                          width=64), max_size=200))
def test_roundtrip_property_doubles(xs):
    v = np.array(xs, dtype=np.float64)
    got = chimp_decode_doubles(chimp_encode_doubles(v))
    np.testing.assert_array_equal(got.view(np.uint64), v.view(np.uint64))
