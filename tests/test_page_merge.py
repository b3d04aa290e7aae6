"""Compaction page-merge oracle, re-expressing CompactionSorterTest.testCorrect
(reference tsfile/.../sorter/CompactionSorterTest.java:30-90): build
overlapping sorted pages, merge, decoded result must equal the sorted union
of all pages with time/value lockstep; non-overlapping pairs take the
splice fast path and must be byte-identical to a canonical re-encode."""

import numpy as np

from sorting_compressed_time_series_spark.codecs.bytealigned import (
    delta_decode,
    delta_encode,
    varint_decode,
    varint_encode,
)
from sorting_compressed_time_series_spark.operators.page_merge import merge_pages


def _mk_pages(ts_pages, vs_pages):
    return (
        [delta_encode(np.asarray(t, dtype=np.int64)) for t in ts_pages],
        [varint_encode(np.asarray(v, dtype=np.int64)) for v in vs_pages],
    )


def _check(ts_pages, vs_pages, expect_path=None):
    tp, vp = _mk_pages(ts_pages, vs_pages)
    mt, mv, lineage = merge_pages(tp, vp)
    all_ts = np.concatenate([np.asarray(t, dtype=np.int64) for t in ts_pages] or [np.empty(0, np.int64)])
    all_vs = np.concatenate([np.asarray(v, dtype=np.int64) for v in vs_pages] or [np.empty(0, np.int64)])
    order = np.argsort(all_ts, kind="stable")
    assert np.array_equal(delta_decode(mt), all_ts[order])
    assert np.array_equal(varint_decode(mv), all_vs[order])
    # merged time plane must equal the canonical encode of the merged series
    canon = delta_encode(all_ts[order])
    assert mt.vals.tobytes() == canon.vals.tobytes()
    assert np.array_equal(mt.codes, canon.codes)
    if expect_path:
        assert lineage["path"] == expect_path
    return lineage


def test_empty():
    mt, mv, lineage = merge_pages([], [])
    assert mt.count == 0 and lineage["path"] == "empty"


def test_single_page():
    _check([[1, 2, 3]], [[7, 8, 9]], "single")


def test_disjoint_pages_splice():
    lineage = _check(
        [[0, 10, 20], [30, 40, 50], [60, 70]],
        [[1, 2, 3], [4, 5, 6], [7, 8]],
        "splice",
    )
    assert lineage["spliced_boundaries"] == 2


def test_touching_pages_equal_boundary():
    # max of page k == min of page k+1: still no inversion, splice path
    _check([[0, 10], [10, 20]], [[1, 2], [3, 4]], "splice")


def test_overlapping_pages_kmerge():
    # reference regime: PAGE_SIZE=10 sliding overlapping pairs
    rng = np.random.default_rng(42)
    base = np.sort(rng.integers(0, 10**6, size=20).astype(np.int64))
    p1, p2 = base[::2], base[1::2]
    _check([p1, p2], [np.arange(10), np.arange(10, 20)], "kmerge")


def test_overlap_sweep():
    rng = np.random.default_rng(7)
    for rep in range(50):
        n1, n2 = rng.integers(1, 30, size=2)
        p1 = np.sort(rng.integers(-(10**4), 10**4, size=n1).astype(np.int64))
        p2 = np.sort(rng.integers(-(10**4), 10**4, size=n2).astype(np.int64))
        _check([p1, p2], [np.arange(n1), np.arange(100, 100 + n2)])


def test_duplicate_ts_across_pages_last_page_wins_order():
    # stability: page order preserved for equal timestamps
    tp, vp = _mk_pages([[5, 10], [10, 15]], [[1, 2], [3, 4]])
    mt, mv, _ = merge_pages(tp, vp)
    assert list(delta_decode(mt)) == [5, 10, 10, 15]
    assert list(varint_decode(mv)) == [1, 2, 3, 4]


def test_many_pages_mixed():
    rng = np.random.default_rng(13)
    start = 0
    ts_pages, vs_pages = [], []
    for k in range(20):
        n = int(rng.integers(5, 50))
        ts = start + np.cumsum(rng.integers(1, 10, size=n)).astype(np.int64)
        start = int(ts[-1]) + (int(rng.integers(0, 3)) - 1)  # sometimes overlap
        ts_pages.append(ts)
        vs_pages.append(rng.integers(-(10**4), 10**4, size=n).astype(np.int64))
    _check(ts_pages, vs_pages)
