"""Byte-aligned, compressed-sortable codecs (clean-room re-expression).

The reference keeps each memtable series as two byte streams plus a 2-bit
length-class side array (``TS_DELTA_data.vals`` / ``.lens`` — reference
db/iotdb-core/tsfile/src/main/java/org/apache/iotdb/tsfile/utils/
TS_DELTA_data.java:3-16).  The side array is the key design point: every
element's payload width is known *without* decoding, so a sorter can locate
and rotate byte ranges in the compressed domain.

Our format (own design; fixes the reference's zero-delta / 3-byte-class
round-trip quirks documented in SURVEY.md §2.1):

- ``lens``: one 2-bit class per element, 4 per byte, LSB-first within a byte.
  class → payload width: ``0 → 8 bytes, 1 → 1, 2 → 2, 3 → 4``.
  (Same class↔width mapping as the reference's TSDeltaEncoder.java:218-243;
  zero-width and 3-byte classes are deliberately NOT used so every int64
  round-trips exactly.)
- ``vals``: little-endian payload bytes, concatenated.

Two codecs share the container:

- **delta** (time column): element 0 is the raw int64 (class 0, 8 bytes);
  element i>0 stores ``zigzag(v[i] - v[i-1])`` in the smallest class that
  holds it.  Forward decode = cumulative sum; backward decode = suffix
  subtraction — both vectorized.
- **varint** (value column): every element independently stores
  ``zigzag(v)``; elements are order-independent, so the sorter can permute
  them by pure byte rotation with no re-encoding.

All kernels are whole-array numpy; no per-element Python in any hot path.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

# class code -> payload byte width (class 0 is the widest, matching the
# reference's "code 0 = 8 bytes" convention)
CLASS_WIDTH = np.array([8, 1, 2, 4], dtype=np.int64)


def zigzag(v: np.ndarray) -> np.ndarray:
    """Map signed int64 -> unsigned magnitude order-preserving code."""
    v = v.astype(np.int64, copy=False)
    return ((v << 1) ^ (v >> 63)).view(np.uint64)


def unzigzag(z: np.ndarray) -> np.ndarray:
    z = z.astype(np.uint64, copy=False)
    return ((z >> np.uint64(1)).view(np.int64)) ^ -((z & np.uint64(1)).view(np.int64))


@dataclass
class ByteAlignedData:
    """In-memory form of one encoded column: payload plane + class plane.

    ``codes`` is kept unpacked (one uint8 per element) while an operator works
    on the column; `pack()` / `unpack()` convert to/from the serialized 2-bit
    form. ``vals`` is a contiguous uint8 payload buffer.
    """

    vals: np.ndarray  # uint8[total_payload_bytes]
    codes: np.ndarray  # uint8[count], values in {0,1,2,3}
    count: int

    def widths(self) -> np.ndarray:
        return CLASS_WIDTH[self.codes]

    def byte_offsets(self) -> np.ndarray:
        """Start offset of each element's payload in ``vals``."""
        w = self.widths()
        off = np.empty(len(w), dtype=np.int64)
        if len(w):
            np.cumsum(w[:-1], out=off[1:])
            off[0] = 0
        return off

    def pack_lens(self) -> bytes:
        n = self.count
        padded = np.zeros((n + 3) // 4 * 4, dtype=np.uint8)
        padded[:n] = self.codes
        q = padded.reshape(-1, 4)
        return (q[:, 0] | (q[:, 1] << 2) | (q[:, 2] << 4) | (q[:, 3] << 6)).tobytes()

    @staticmethod
    def unpack_lens(buf: np.ndarray, count: int) -> np.ndarray:
        b = np.frombuffer(buf, dtype=np.uint8)
        out = np.empty(len(b) * 4, dtype=np.uint8)
        out[0::4] = b & 3
        out[1::4] = (b >> 2) & 3
        out[2::4] = (b >> 4) & 3
        out[3::4] = (b >> 6) & 3
        return out[:count]


def _classify(zz: np.ndarray) -> np.ndarray:
    """Smallest length class whose width holds each zigzag code."""
    codes = np.full(zz.shape, 0, dtype=np.uint8)  # default class 0 = 8B
    codes[zz < np.uint64(1) << np.uint64(32)] = 3
    codes[zz < np.uint64(1) << np.uint64(16)] = 2
    codes[zz < np.uint64(1) << np.uint64(8)] = 1
    return codes


def _emit_payload(zz: np.ndarray, codes: np.ndarray) -> np.ndarray:
    """Scatter little-endian payload bytes for all elements at once."""
    w = CLASS_WIDTH[codes]
    total = int(w.sum())
    out = np.zeros(total, dtype=np.uint8)
    off = np.empty(len(w), dtype=np.int64)
    if len(w):
        np.cumsum(w[:-1], out=off[1:])
        off[0] = 0
    for b in range(8):  # 8 fixed vectorized passes, not per-element
        m = w > b
        if not m.any():
            break
        out[off[m] + b] = ((zz[m] >> np.uint64(8 * b)) & np.uint64(0xFF)).astype(np.uint8)
    return out


def _gather_payload(data: ByteAlignedData) -> np.ndarray:
    """Inverse of `_emit_payload`: vals + codes -> zigzag codes."""
    w = data.widths()
    off = data.byte_offsets()
    zz = np.zeros(data.count, dtype=np.uint64)
    vals = data.vals
    for b in range(8):
        m = w > b
        if not m.any():
            break
        zz[m] |= vals[off[m] + b].astype(np.uint64) << np.uint64(8 * b)
    return zz


def delta_encode(values: np.ndarray) -> ByteAlignedData:
    """Delta codec for the (sorted-ish) time column.

    Element 0: raw int64 (class 0). Element i>0: zigzag(delta) in the
    smallest class. Mirrors reference TS_DELTA_encoder.encode semantics
    (TS_DELTA_encoder.java:19-45) with a round-trip-exact width table.
    """
    v = np.asarray(values, dtype=np.int64)
    n = len(v)
    if n == 0:
        return ByteAlignedData(np.empty(0, np.uint8), np.empty(0, np.uint8), 0)
    deltas = np.empty(n, dtype=np.int64)
    deltas[0] = 0
    np.subtract(v[1:], v[:-1], out=deltas[1:])
    zz = zigzag(deltas)
    # element 0 carries the raw first value, not a delta
    zz[0] = v[0:1].view(np.uint64)[0]
    codes = _classify(zz)
    codes[0] = 0
    vals = _emit_payload(zz, codes)
    return ByteAlignedData(vals, codes, n)


def delta_decode(data: ByteAlignedData, backward: bool = False) -> np.ndarray:
    """Decode the delta codec. ``backward=True`` exercises the reverse
    cursor semantics (reference TS_DELTA_decoder.backwardDecode,
    TS_DELTA_decoder.java:119-140): reconstruct by walking lens from the
    tail, subtracting deltas from the last value. Outputs are identical;
    both paths are fully vectorized.
    """
    if data.count == 0:
        return np.empty(0, dtype=np.int64)
    zz = _gather_payload(data)
    deltas = unzigzag(zz)
    first = np.uint64(zz[0]).reshape(1).view(np.int64)[0]
    deltas[0] = 0
    if not backward:
        out = np.cumsum(deltas)
        out += first
        return out
    # backward: v[i] = v[n-1] - sum(deltas[i+1:]); the suffix-sum over the
    # reversed delta stream proves the lens plane is walkable from the tail
    # (reference TS_DELTA_decoder.backwardDecode semantics). All int64 math
    # wraps (two's complement), matching Java long arithmetic.
    suffix = np.cumsum(deltas[::-1])[::-1]  # suffix[i] = sum(deltas[i:])
    total = suffix[0]
    out = (total - suffix) + deltas
    out += first
    return out


def varint_encode(values: np.ndarray) -> ByteAlignedData:
    """Order-independent zigzag varint codec for the value column
    (reference V_VARINT_encoder.java:16-30 semantics, clean width table)."""
    v = np.asarray(values, dtype=np.int64)
    zz = zigzag(v)
    codes = _classify(zz)
    vals = _emit_payload(zz, codes)
    return ByteAlignedData(vals, codes, len(v))


def varint_decode(data: ByteAlignedData, backward: bool = False) -> np.ndarray:
    out = unzigzag(_gather_payload(data))
    # backward decode of an order-independent codec is a tail-first walk of
    # the same lens plane; vectorized it is the same gather (kept for API
    # parity with the reference's forward/backward cursor pair).
    return out


def permute(data: ByteAlignedData, order: np.ndarray) -> ByteAlignedData:
    """Reorder elements of an order-independent (varint) column purely in the
    byte domain: gather each element's payload slice in ``order``.

    This is the generalized form of the value-plane rotation the reference
    sorter performs (CompressedDataSorter.dataMove — byte-range rotation);
    a gather expresses any permutation, rotation included, with one pass.
    """
    w = data.widths()
    off = data.byte_offsets()
    new_codes = data.codes[order]
    new_w = w[order]
    new_off = np.empty(len(new_w), dtype=np.int64)
    if len(new_w):
        np.cumsum(new_w[:-1], out=new_off[1:])
        new_off[0] = 0
    out = np.empty(int(new_w.sum()), dtype=np.uint8)
    src_off = off[order]
    for b in range(8):
        m = new_w > b
        if not m.any():
            break
        out[new_off[m] + b] = data.vals[src_off[m] + b]
    return ByteAlignedData(out, new_codes, data.count)
