"""Batched multi-series codec vs scalar chunk codec: byte-identical blobs,
exact round trip, Arrow list-offset compatibility."""

import numpy as np
import pyarrow as pa
import pytest

from sorting_compressed_time_series_spark.codecs import (
    CODEC_DELTA,
    CODEC_VARINT,
    decode_chunk,
    encode_chunk,
)
from sorting_compressed_time_series_spark.codecs.batched import decode_rows, encode_rows


def _random_rows(rng, n_rows, max_len=200, lo=-(10**4), hi=10**4):
    rows = [rng.integers(lo, hi, size=rng.integers(0, max_len)).astype(np.int64)
            for _ in range(n_rows)]
    flat = np.concatenate(rows) if rows else np.empty(0, np.int64)
    splits = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum([len(r) for r in rows], out=splits[1:])
    return rows, flat, splits


@pytest.mark.parametrize("codec", [CODEC_DELTA, CODEC_VARINT])
def test_batched_matches_scalar_blobs(codec):
    rng = np.random.default_rng(1)
    rows, flat, splits = _random_rows(rng, 100)
    buf, bsp = encode_rows(flat, splits, codec)
    for i, r in enumerate(rows):
        blob = buf[bsp[i]:bsp[i + 1]].tobytes()
        assert blob == encode_chunk(r, codec), f"row {i} blob mismatch"
        assert np.array_equal(decode_chunk(blob), r)


@pytest.mark.parametrize("codec", [CODEC_DELTA, CODEC_VARINT])
def test_batched_roundtrip_large(codec):
    rng = np.random.default_rng(2)
    rows, flat, splits = _random_rows(rng, 2000, max_len=1024,
                                      lo=-(2**40), hi=2**40)
    buf, bsp = encode_rows(flat, splits, codec)
    back_flat, back_splits = decode_rows(buf, bsp)
    assert np.array_equal(back_splits, splits)
    assert np.array_equal(back_flat, flat)


def test_batched_sorted_timestamps():
    # the seriesization regime: per-row increasing timestamps
    rng = np.random.default_rng(3)
    rows = []
    for _ in range(500):
        n = int(rng.integers(1, 300))
        rows.append(np.cumsum(rng.integers(1, 3000, size=n)).astype(np.int64))
    flat = np.concatenate(rows)
    splits = np.zeros(len(rows) + 1, dtype=np.int64)
    np.cumsum([len(r) for r in rows], out=splits[1:])
    buf, bsp = encode_rows(flat, splits, CODEC_DELTA)
    back_flat, back_splits = decode_rows(buf, bsp)
    assert np.array_equal(back_flat, flat)
    # small steps -> at most ~2 payload bytes/elem + 8/row + headers
    assert len(buf) < 2.6 * len(flat) + 24 * len(rows)


def test_arrow_list_integration():
    # flat values + offsets exactly as they come off an Arrow ListArray
    rng = np.random.default_rng(4)
    rows = [rng.integers(-(10**4), 10**4, size=rng.integers(0, 50)).tolist()
            for _ in range(300)]
    arr = pa.array(rows, type=pa.list_(pa.int32()))
    flat = arr.values.to_numpy(zero_copy_only=False).astype(np.int64)
    splits = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    buf, bsp = encode_rows(flat, splits, CODEC_VARINT)
    # build a Binary array straight from the buffers (no per-row Python)
    bin_arr = pa.Array.from_buffers(
        pa.large_binary(), len(rows),
        [None, pa.py_buffer(bsp.astype(np.int64)), pa.py_buffer(buf)],
    )
    for i, r in enumerate(rows):
        assert np.array_equal(decode_chunk(bin_arr[i].as_py()), np.array(r, dtype=np.int64))


def test_empty_batch():
    buf, bsp = encode_rows(np.empty(0, np.int64), np.zeros(1, np.int64), CODEC_DELTA)
    flat, splits = decode_rows(buf, bsp)
    assert len(flat) == 0


def test_decode_rows_skips_empty_blobs():
    rng = np.random.default_rng(9)
    rows = [rng.integers(-100, 100, size=rng.integers(1, 30)).astype(np.int64)
            for _ in range(20)]
    flat = np.concatenate(rows)
    splits = np.zeros(len(rows) + 1, dtype=np.int64)
    np.cumsum([len(r) for r in rows], out=splits[1:])
    buf, bsp = encode_rows(flat, splits, CODEC_VARINT)
    # interleave empty blobs (the fused flush table's partial rows)
    blobs = []
    for i in range(len(rows)):
        blobs.append(buf[bsp[i]:bsp[i + 1]].tobytes())
        blobs.append(b"")
    mixed = np.frombuffer(b"".join(blobs), dtype=np.uint8)
    msp = np.zeros(len(blobs) + 1, dtype=np.int64)
    np.cumsum([len(b) for b in blobs], out=msp[1:])
    back, bsplits = decode_rows(mixed, msp)
    assert np.array_equal(back, flat)
    assert list(np.diff(bsplits))[1::2] == [0] * len(rows)
