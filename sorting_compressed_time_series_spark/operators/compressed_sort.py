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
    scan_from = 1
    while True:
        # first inversion at/after scan_from
        inv = np.flatnonzero(ts[scan_from:] < ts[scan_from - 1 : -1])
        if len(inv) == 0:
            break
        idx = scan_from + int(inv[0])
        # insertion point: stable → equal timestamps stay before the insert
        p = int(np.searchsorted(ts[:idx], ts[idx], side="right"))
        # moved block: maximal non-decreasing run from idx with ts < ts[p]
        j = idx
        while j + 1 < n and ts[j + 1] >= ts[j] and ts[j + 1] < ts[p]:
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
        scan_from = max(j, 1)
    return time_data, value_data, lineage
