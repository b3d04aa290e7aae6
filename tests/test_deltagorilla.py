"""DeltaGorilla single-delta prefix codec + bit-level in-place sorter
(SURVEY.md §2.1 #9-#11): exact round trip, class thresholds, and the sorter
byte-identity oracle — sorted-in-compressed-domain equals canonical encode
of the sorted series (the reference DeltaGorillaSorter correctness
contract, re-expressed)."""

import numpy as np
import pytest

from sorting_compressed_time_series_spark.codecs.deltagorilla import (
    dg_decode,
    dg_encode,
    dg_sort,
)


def test_roundtrip_lengths_and_classes():
    rng = np.random.default_rng(3)
    for n in (0, 1, 2, 3, 100, 4096):
        base = int(rng.integers(1_500_000_000_000_000, 1_600_000_000_000_000))
        # deltas spanning every class: 0, <128, <512, <4096, >=4096, negative
        pool = np.array([0, 1, 127, 128, 511, 512, 4095, 4096, 100_000, -1, -5000])
        deltas = rng.choice(pool, size=max(n - 1, 0))
        v = np.concatenate([[base], base + np.cumsum(deltas)])[:n].astype(np.int64)
        assert np.array_equal(dg_decode(dg_encode(v)), v), n


def test_delta_overflow_refused():
    with pytest.raises(ValueError):
        dg_encode(np.array([0, 1 << 32], dtype=np.int64))


def test_sorter_noop_on_sorted():
    v = np.cumsum(np.ones(500, dtype=np.int64) * 7) + 10**15
    blob = dg_encode(v)
    out, lineage = dg_sort(blob)
    assert out == blob and lineage["path"] == "noop"


def test_sorter_rotation_byte_identity():
    rng = np.random.default_rng(4)
    base = 10**15
    steps = rng.integers(1, 4000, 2000)
    v = base + np.cumsum(steps).astype(np.int64)
    # displace every ~250th element 10 slots back in time (blockSort regime)
    arr = v.copy()
    for i in range(250, len(arr), 250):
        arr[i] = arr[i - 10] - 1
    blob = dg_encode(arr)
    out, lineage = dg_sort(blob)
    assert lineage["path"] == "rotate" and lineage["rotations"] > 0
    assert out == dg_encode(np.sort(arr, kind="stable"))


def test_sorter_reencode_fallback_heavy_shuffle():
    rng = np.random.default_rng(5)
    v = rng.permutation(np.arange(3000, dtype=np.int64) * 13 + 10**15)
    out, lineage = dg_sort(dg_encode(v))
    assert lineage["path"] == "reencode"
    assert out == dg_encode(np.sort(v, kind="stable"))


def test_sorter_head_displacement():
    v = np.array([100, 105, 110, 50, 120, 130], dtype=np.int64) + 10**15
    out, lineage = dg_sort(dg_encode(v))
    assert out == dg_encode(np.sort(v, kind="stable"))


def test_sorter_equal_timestamps_stable():
    v = np.array([10, 20, 20, 15, 20, 30], dtype=np.int64) + 10**15
    out, _ = dg_sort(dg_encode(v))
    assert np.array_equal(dg_decode(out), np.sort(v, kind="stable"))
