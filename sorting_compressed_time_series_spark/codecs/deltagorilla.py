"""DeltaGorilla: the fork's single-delta prefix-class codec and its
bit-level in-place sorter (SURVEY.md §2.1 #9-#11).

Re-expresses the reference's research-prototype pair — semantics only, no
code: ``DeltaGorillaEncoder`` (tsfile/.../encoder/DeltaGorillaEncoder.java:
118-186) writes ONE prefix-coded delta per point (not delta-of-delta), with
payload width chosen by magnitude class; ``DeltaGorillaSorter``
(tsfile/.../decoder/DeltaGorillaSorter.java:50-185) then sorts a
nearly-sorted series by splicing and moving BIT ranges of that stream
in place, never touching the in-order remainder.

Format redesign (clean-room, the same control/payload plane split as
``bitpacked``): the reference interleaves prefix bits with payloads in one
stream, which forces sequential decode AND makes the sorter's arithmetic
O(n) per probed element (it must re-walk prefixes to find a bit offset).
We store a fixed-width 3-bit class tag per element in its own plane, so

- decode is fully vectorized (unpack tags → widths → prefix-sum → gather);
- the sorter can address any element's payload bit range directly from the
  tag plane — the bit-granularity analogue of the byte-aligned family's
  ``lens`` array, and exactly what makes in-place sorting tractable.

Layout:  u32 count | i64 first | tag plane (3 bits/elem, elems 1..n-1) |
         payload plane.
Classes (thresholds follow DeltaGorillaEncoder.java:118-140):
    0 → 0  bits   delta == 0
    1 → 7  bits   0 < delta < 128
    2 → 9  bits   delta < 512
    3 → 12 bits   delta < 4096
    4 → 32 bits   delta ≥ 4096, or delta < 0 (two's-complement low 32)

The 32-bit ceiling is the reference's own contract (it truncates larger
deltas); we refuse instead of corrupting: |delta| must fit int32.
"""

from __future__ import annotations

import numpy as np

from .bitpacked import pack_bits, unpack_bits

_DG_WIDTH = np.array([0, 7, 9, 12, 32], dtype=np.int64)
_U64 = np.uint64


def _dg_classify(delta: np.ndarray) -> np.ndarray:
    codes = np.full(delta.shape, 4, dtype=np.uint8)
    codes[(delta >= 0) & (delta < 4096)] = 3
    codes[(delta >= 0) & (delta < 512)] = 2
    codes[(delta >= 0) & (delta < 128)] = 1
    codes[delta == 0] = 0
    return codes


def dg_encode(values: np.ndarray) -> bytes:
    v = np.asarray(values, dtype=np.int64)
    n = len(v)
    header = np.array([n], dtype="<u4").tobytes()
    if n == 0:
        return header
    first = v[0:1].astype("<i8").tobytes()
    if n == 1:
        return header + first
    delta = np.diff(v)
    if len(delta) and (int(delta.min()) < -(1 << 31) or int(delta.max()) >= (1 << 31)):
        raise ValueError("DeltaGorilla deltas must fit int32 (reference contract)")
    codes = _dg_classify(delta)
    widths = _DG_WIDTH[codes]
    payload_vals = delta.view(np.uint64)  # pack_bits masks to width
    tag_plane = pack_bits(codes.astype(np.uint64), np.full(n - 1, 3, np.int64))
    payload = pack_bits(payload_vals, widths)
    return header + first + tag_plane.tobytes() + payload.tobytes()


def dg_decode(blob: bytes | np.ndarray) -> np.ndarray:
    buf = np.frombuffer(blob, dtype=np.uint8)
    n = int(buf[:4].view("<u4")[0])
    if n == 0:
        return np.empty(0, dtype=np.int64)
    first = int(buf[4:12].view("<i8")[0])
    if n == 1:
        return np.array([first], dtype=np.int64)
    tag_bytes = (3 * (n - 1) + 7) // 8
    tags = unpack_bits(buf[12 : 12 + tag_bytes], np.full(n - 1, 3, np.int64)).astype(np.int64)
    widths = _DG_WIDTH[tags]
    raw = unpack_bits(buf[12 + tag_bytes :], widths)
    delta = raw.view(np.int64).copy()
    # sign-extend the 32-bit class from bit 31
    c4 = tags == 4
    neg = c4 & ((raw >> _U64(31)) & _U64(1)).astype(bool)
    delta[neg] -= 1 << 32
    out = np.empty(n, dtype=np.int64)
    out[0] = first
    np.cumsum(delta, out=out[1:])
    out[1:] += first
    return out


# ---------------------------------------------------------------------------
# bit-level in-place sorter
# ---------------------------------------------------------------------------


class _BitPlanes:
    """The two planes of one stream as bit arrays, plus per-element payload
    offsets — the sorter's working view.  Unpacked once on entry, packed
    once on exit; every rotation/splice touches only the affected bit
    ranges (the in-place semantic of the reference sorter, vectorized)."""

    def __init__(self, blob: bytes | np.ndarray):
        buf = np.frombuffer(blob, dtype=np.uint8)
        self.n = int(buf[:4].view("<u4")[0])
        self.first = int(buf[4:12].view("<i8")[0]) if self.n else 0
        m = max(self.n - 1, 0)
        tag_bytes = (3 * m + 7) // 8
        self.tag_bits = np.unpackbits(buf[12 : 12 + tag_bytes])[: 3 * m]
        self.tags = (
            self.tag_bits.reshape(-1, 3) @ np.array([4, 2, 1], dtype=np.uint8)
        ).astype(np.int64) if m else np.empty(0, np.int64)
        widths = _DG_WIDTH[self.tags]
        total = int(widths.sum())
        self.pay_bits = np.unpackbits(buf[12 + tag_bytes :])[:total]

    def _pay_off(self) -> np.ndarray:
        off = np.empty(len(self.tags) + 1, dtype=np.int64)
        off[0] = 0
        np.cumsum(_DG_WIDTH[self.tags], out=off[1:])
        return off

    def rotate(self, p: int, mid: int, end: int) -> None:
        """[mid, end) moves before [p, mid) in both planes (delta entries
        p..end-1 correspond to elements p..end-1; element 0 has no entry)."""
        off = self._pay_off()
        a, b, c = off[p - 1], off[mid - 1], off[end - 1]
        self.pay_bits[a:c] = np.concatenate(
            [self.pay_bits[b:c], self.pay_bits[a:b]]
        )
        ta, tb, tc = 3 * (p - 1), 3 * (mid - 1), 3 * (end - 1)
        self.tag_bits[ta:tc] = np.concatenate(
            [self.tag_bits[tb:tc], self.tag_bits[ta:tb]]
        )
        self.tags[p - 1 : end - 1] = np.concatenate(
            [self.tags[mid - 1 : end - 1], self.tags[p - 1 : mid - 1]]
        )

    def patch(self, idx: int, delta: int) -> None:
        """Re-encode element ``idx``'s delta code (idx ≥ 1): rewrite its
        3 tag bits and splice its payload bit range if the class changed."""
        code = int(_dg_classify(np.array([delta], dtype=np.int64))[0])
        w_new = int(_DG_WIDTH[code])
        off = self._pay_off()
        start, end = int(off[idx - 1]), int(off[idx])
        new_bits = (
            (np.int64(delta) >> np.arange(w_new - 1, -1, -1, dtype=np.int64)) & 1
        ).astype(np.uint8)
        self.pay_bits = np.concatenate(
            [self.pay_bits[:start], new_bits, self.pay_bits[end:]]
        )
        self.tag_bits[3 * (idx - 1) : 3 * idx] = [
            (code >> 2) & 1, (code >> 1) & 1, code & 1,
        ]
        self.tags[idx - 1] = code

    def tobytes(self) -> bytes:
        header = np.array([self.n], dtype="<u4").tobytes()
        if self.n == 0:
            return header
        first = np.array([self.first], dtype="<i8").tobytes()
        if self.n == 1:
            return header + first
        return (header + first + np.packbits(self.tag_bits).tobytes()
                + np.packbits(self.pay_bits).tobytes())


def dg_sort(blob: bytes | np.ndarray,
            inversion_threshold: float = 0.05) -> tuple[bytes, dict]:
    """Stable in-place sort of a nearly-sorted DeltaGorilla stream — the
    reference ``DeltaGorillaSorter`` semantic: locate each out-of-order run,
    rotate its BIT ranges into place, re-encode only the 2-3 boundary delta
    codes.  Output is byte-identical to ``dg_encode(sorted(values))``
    (canonical encode — pytest-asserted).  Heavily shuffled input falls
    back to decode → stable sort → encode, mirroring the BackwardSort
    inversion-ratio regime switch."""
    ts = dg_decode(blob)
    n = len(ts)
    lineage = {"path": "noop", "rotations": 0, "patched_codes": 0}
    if n < 2 or bool(np.all(ts[1:] >= ts[:-1])):
        return (bytes(blob) if isinstance(blob, (bytes, bytearray)) else blob.tobytes(), lineage)
    inversions = int((ts[1:] < ts[:-1]).sum())
    if inversions > max(1, n * inversion_threshold):
        lineage["path"] = "reencode"
        return dg_encode(np.sort(ts, kind="stable")), lineage

    lineage["path"] = "rotate"
    planes = _BitPlanes(blob)
    scan_from = 1
    while True:
        inv = np.flatnonzero(ts[scan_from:] < ts[scan_from - 1 : -1])
        if len(inv) == 0:
            break
        idx = scan_from + int(inv[0])
        p = int(np.searchsorted(ts[:idx], ts[idx], side="right"))
        j = idx
        while j + 1 < n and ts[j + 1] >= ts[j] and ts[j + 1] < ts[p]:
            j += 1
        if p == 0:
            # head displacement: the raw first value itself changes, which
            # the bit-plane rotation cannot express — canonical re-encode
            # (the reference sorter has the same special case and rebuilds
            # the stream head, DeltaGorillaSorter.java:94-117)
            ts[p : j + 1] = np.concatenate([ts[idx : j + 1], ts[p:idx]])
            lineage["path"] = "reencode"
            return dg_encode(np.sort(ts, kind="stable")), lineage
        planes.rotate(p, idx, j + 1)
        ts[p : j + 1] = np.concatenate([ts[idx : j + 1], ts[p:idx]])
        m = j + 1 - idx
        for b in (p, p + m, j + 1):
            if 1 <= b < n:
                planes.patch(b, int(ts[b] - ts[b - 1]))
                lineage["patched_codes"] += 1
        lineage["rotations"] += 1
        scan_from = max(j, 1)
    return planes.tobytes(), lineage
