"""Compressed-domain sort: the reference's signature operator, re-expressed.

The reference observes that time-series points arrive *mostly* ordered, so a
nearly-sorted compressed series can be fixed up by (1) locating the
out-of-order run, (2) patching the 2–3 boundary delta codes, and (3) rotating
the affected byte ranges of the payload plane and the 2-bit entries of the
length plane — never touching the (vast) in-order remainder
(reference CompressedDataSorter.blockSort / persistentSortOpeHoldLen,
db/iotdb-core/datanode/.../compressedsort/CompressedDataSorter.java:24-176;
semantics re-derived, no code copied).

Two interchangeable paths, byte-identical outputs:

- `compressed_sort`    — the in-place path: rotations on the encoded planes
  plus canonical re-encode of the three boundary deltas. Because our delta
  encoder is deterministic per delta value, the result equals a fresh encode
  of the sorted arrays — which the oracle test asserts byte-for-byte.
- `sort_reencode`      — decode → stable argsort → encode. This is the
  fallback for heavily shuffled input and the semantic oracle
  (reference flush-sort `CompressedTVList.convertAndSort2`,
  CompressedTVList.java:616-716, is semantically a stable sort by ts).

Stability contract (matches the reference's TimSort-based oracle,
MemtableSortTest.java:377-389): equal timestamps keep arrival order, and the
value column is permuted in lockstep with the time column.
"""

from __future__ import annotations

import numpy as np

from ..codecs.bytealigned import (
    ByteAlignedData,
    CLASS_WIDTH,
    _classify,
    _emit_payload,
    delta_decode,
    delta_encode,
    permute,
    zigzag,
)

# how out-of-order a series may be before we give up on rotations and
# re-encode wholesale; mirrors the BackwardSort inversion-ratio idea
# (reference datanode/.../datastructure/BackwardSort.java:28,
# INVERSION_RATIOS_THRESHOLD = 0.004)
ROTATION_INVERSION_THRESHOLD = 0.05


def is_sorted(ts: np.ndarray) -> bool:
    return bool(np.all(ts[1:] >= ts[:-1])) if len(ts) > 1 else True


def stable_sort_order(ts: np.ndarray) -> np.ndarray:
    """Stable permutation sorting by timestamp, arrival order preserved on
    ties — the flush-sort semantic (convertAndSort2)."""
    return np.argsort(ts, kind="stable")


def sort_reencode(
    time_data: ByteAlignedData, value_data: ByteAlignedData
) -> tuple[ByteAlignedData, ByteAlignedData, int]:
    """Decode-sort-reencode fallback. Returns (time, value, n_moves)."""
    ts = delta_decode(time_data)
    order = stable_sort_order(ts)
    moved = int((order != np.arange(len(order))).sum())
    if moved == 0:
        return time_data, value_data, 0
    new_time = delta_encode(ts[order])
    new_value = permute(value_data, order)  # value plane: pure byte gather
    return new_time, new_value, moved


def _reencode_delta_at(data: ByteAlignedData, ts: np.ndarray, idx: int) -> None:
    """Patch element ``idx``'s delta code to ``ts[idx]-ts[idx-1]`` (or the raw
    first value when idx==0), splicing the payload plane if the width class
    changes — the reference's ``changeEncode`` (TS_DELTA_encoder.java:47-61)."""
    if idx == 0:
        zz = np.asarray(ts[0:1]).view(np.uint64)
        code = np.uint8(0)
    else:
        zz = zigzag(np.array([ts[idx] - ts[idx - 1]], dtype=np.int64))
        code = _classify(zz)[0]
    new_bytes = _emit_payload(zz, np.array([code], dtype=np.uint8))
    w = CLASS_WIDTH[data.codes]
    start = int(w[:idx].sum())
    old_w = int(w[idx])
    data.vals = np.concatenate([data.vals[:start], new_bytes, data.vals[start + old_w:]])
    data.codes[idx] = code


def _rotate_ranges(
    data: ByteAlignedData, p: int, mid: int, end: int
) -> None:
    """Rotate elements [p, end) so that [mid, end) comes before [p, mid),
    applied to both planes in the byte domain (reference dataMove /
    lenDataMove, CompressedDataSorter.java:119-176). Implemented as one
    gather over the affected slice only; untouched elements are not copied."""
    w = CLASS_WIDTH[data.codes]
    b_p = int(w[:p].sum())
    b_mid = b_p + int(w[p:mid].sum())
    b_end = b_mid + int(w[mid:end].sum())
    # payload plane rotation
    data.vals[b_p:b_end] = np.concatenate(
        [data.vals[b_mid:b_end], data.vals[b_p:b_mid]]
    )
    # length plane rotation
    data.codes[p:end] = np.concatenate([data.codes[mid:end], data.codes[p:mid]])


def compressed_sort(
    time_data: ByteAlignedData,
    value_data: ByteAlignedData,
    inversion_threshold: float = ROTATION_INVERSION_THRESHOLD,
) -> tuple[ByteAlignedData, ByteAlignedData, dict]:
    """In-place compressed-domain sort of a nearly-sorted series.

    Loop (reference blockSort, CompressedDataSorter.java:24-59): find the
    first inversion; the moved block M is the maximal non-decreasing run
    starting there whose elements all sort before the displaced block D;
    rotate M before D in both planes; patch the three boundary deltas.
    Falls back to `sort_reencode` when the inversion ratio exceeds
    `ROTATION_INVERSION_THRESHOLD` (BackwardSort-style regime switch).

    Returns (time, value, lineage) where lineage records rotations,
    patched codes and the path taken — the per-partition sort lineage the
    north rule requires.
    """
    ts = delta_decode(time_data)
    n = len(ts)
    lineage = {"path": "noop", "rotations": 0, "patched_codes": 0, "moved_elements": 0}
    if n < 2 or is_sorted(ts):
        return time_data, value_data, lineage

    inversions = int((ts[1:] < ts[:-1]).sum())
    if inversions > max(1, n * inversion_threshold):
        t, v, moved = sort_reencode(time_data, value_data)
        lineage.update(path="reencode", moved_elements=moved)
        return t, v, lineage

    lineage["path"] = "rotate"
    _rotation_sort_range(time_data, value_data, ts, 0, n, lineage)
    return time_data, value_data, lineage


def _rotation_sort_range(
    time_data: ByteAlignedData,
    value_data: ByteAlignedData,
    ts: np.ndarray,
    lo: int,
    hi: int,
    lineage: dict,
) -> None:
    """The blockSort loop bounded to ``ts[lo:hi]``: find the first inversion
    in the range, rotate the out-of-order run into place in both planes,
    patch the three boundary deltas, repeat. Only positions in [lo, hi]
    are touched (the delta AT ``hi`` is re-patched when ``ts[hi-1]``
    changes, keeping the global stream consistent); ``ts`` is updated in
    place so callers can compose ranges (the D&C merge below)."""
    n = len(ts)
    scan_from = lo + 1
    while scan_from < hi:
        # first inversion at/after scan_from, within the range
        inv = np.flatnonzero(ts[scan_from:hi] < ts[scan_from - 1 : hi - 1])
        if len(inv) == 0:
            break
        idx = scan_from + int(inv[0])
        # insertion point: stable → equal timestamps stay before the insert
        p = lo + int(np.searchsorted(ts[lo:idx], ts[idx], side="right"))
        # moved block: maximal non-decreasing run from idx with ts < ts[p]
        j = idx
        while j + 1 < hi and ts[j + 1] >= ts[j] and ts[j + 1] < ts[p]:
            j += 1
        # rotate [p, idx) after [idx, j]
        _rotate_ranges(time_data, p, idx, j + 1)
        _rotate_ranges(value_data, p, idx, j + 1)
        ts[p : j + 1] = np.concatenate([ts[idx : j + 1], ts[p:idx]])
        m = j + 1 - idx  # moved block length
        # patch boundary deltas: entry into M (now at p), entry into D
        # (now at p+m), and the element after the rotated range
        for b in (p, p + m, j + 1):
            if b < n:
                _reencode_delta_at(time_data, ts, b)
                lineage["patched_codes"] += 1
        lineage["rotations"] += 1
        lineage["moved_elements"] += m
        scan_from = max(j, lo + 1)


def bounded_ooo_sort(
    time_data: ByteAlignedData,
    value_data: ByteAlignedData,
    l: int = 1024,
) -> tuple[ByteAlignedData, ByteAlignedData, dict]:
    """Bounded-memory order/disorder-separation sort — the reference's
    experimental memtable alternative ``disordered_uncompressing_sort(l)``
    (CompressedTVList.java:286-398; §2.1 #22 family; semantics re-derived,
    no code copied): each pass extracts at most ``l`` out-of-order points
    (a point is OOO when its timestamp is below the running max of the
    points kept in place), sorts that bounded side list, and streams it
    back into the sequence — an OOO point lands immediately before the
    first later kept point that exceeds it, ties keeping the kept point
    first (which equals stable order, since an equal kept point always
    precedes its OOO twin in arrival order). A pass that extracts fewer
    than ``l`` points leaves the sequence sorted and ends the loop.

    The memtable story: the side list is the only O(l) working set per
    pass, so a nearly-sorted series sorts with bounded extra memory no
    matter its length. Vectorized deviation from the reference's streaming
    merge: insertion positions come from one ``searchsorted`` against the
    running max of the kept stream — the same positions the stream walk
    produces, without the per-point loop.

    Returns (time, value, lineage); byte-identity contract as above."""
    ts = delta_decode(time_data)
    n = len(ts)
    lineage = {"path": "bounded_ooo", "passes": 0, "extracted": 0}
    if n < 2 or is_sorted(ts):
        lineage["path"] = "noop"
        return time_data, value_data, lineage
    work = ts.copy()
    idx = np.arange(n, dtype=np.int64)
    while True:
        prevmax = np.maximum.accumulate(work)
        ooo = 1 + np.flatnonzero(work[1:] < prevmax[:-1])
        if len(ooo) == 0:
            break
        take = ooo[:l]
        lineage["passes"] += 1
        lineage["extracted"] += len(take)
        keep = np.ones(n, dtype=bool)
        keep[take] = False
        rest, rest_idx = work[keep], idx[keep]
        sub = np.argsort(work[take], kind="stable")
        block, block_idx = work[take][sub], idx[take][sub]
        # first kept point exceeding x == first index where the kept
        # stream's running max exceeds x (non-decreasing → searchsorted)
        pos = np.searchsorted(np.maximum.accumulate(rest), block, side="right")
        work = np.insert(rest, pos, block)
        idx = np.insert(rest_idx, pos, block_idx)
        if len(ooo) < l:
            break
        if lineage["passes"] > n:  # defensive: finish with one stable sort
            fix = np.argsort(work, kind="stable")
            work, idx = work[fix], idx[fix]
            lineage["path"] = "bounded_ooo+fallback"
            break
    order = idx
    new_time = delta_encode(ts[order])
    new_value = permute(value_data, order)
    return new_time, new_value, lineage


# base-case size for the divide-and-conquer sorter; reference
# TS_DELTA_sorter.java:31 blockThreshold = 300
DC_BLOCK_THRESHOLD = 300


def ts_delta_sort_dc(
    time_data: ByteAlignedData,
    value_data: ByteAlignedData,
    block_threshold: int = DC_BLOCK_THRESHOLD,
) -> tuple[ByteAlignedData, ByteAlignedData, dict]:
    """Divide-and-conquer compressed-domain sort — the reference's
    ``TS_DELTA_sorter.sort2`` (TS_DELTA_sorter.java:31-129: recursive split
    at an inversion point near the middle, sort halves, patch the one
    boundary delta, then a bounded blockSort pass merges the overlap;
    ``blockThreshold=300`` base case; semantics re-derived, no code copied).

    Where ``compressed_sort``'s flat loop pays one long-distance rotation
    per out-of-order run, the recursion keeps every rotation local to its
    half until the final merges, which only walk the overlap between two
    already-sorted runs — the same bounded-blockSort-as-merge the reference
    uses. Deviation from the reference's ``findMidIndexWithPosAndValue``:
    the split point is the first inversion at/after the midpoint (falling
    back to the midpoint when the crossing is inversion-free) rather than
    the second-block minimum — a constant-factor heuristic; outputs are
    byte-identical either way because every patch re-encodes canonically.

    Returns (time, value, lineage) with the same byte-identity contract as
    ``compressed_sort``: the result equals a fresh canonical encode of the
    stable-sorted series."""
    ts = delta_decode(time_data)
    n = len(ts)
    lineage = {
        "path": "dc", "splits": 0, "rotations": 0,
        "patched_codes": 0, "moved_elements": 0,
    }
    if n < 2 or is_sorted(ts):
        lineage["path"] = "noop"
        return time_data, value_data, lineage

    def rec(lo: int, hi: int) -> None:
        if hi - lo <= block_threshold:
            _rotation_sort_range(time_data, value_data, ts, lo, hi, lineage)
            return
        midpoint = lo + (hi - lo) // 2
        inv = np.flatnonzero(ts[midpoint:hi] < ts[midpoint - 1 : hi - 1])
        mid = midpoint + int(inv[0]) if len(inv) else midpoint
        if mid >= hi:  # inversion-free tail: split at the midpoint
            mid = midpoint
        lineage["splits"] += 1
        rec(lo, mid)
        rec(mid, hi)
        # merge: both halves sorted → the bounded loop only walks the
        # overlap (right-run elements >= left max are never visited)
        _rotation_sort_range(time_data, value_data, ts, lo, hi, lineage)

    rec(0, n)
    return time_data, value_data, lineage
