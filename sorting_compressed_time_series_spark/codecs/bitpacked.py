"""Bit-packed codecs: delta-of-delta (timestamps) and Gorilla XOR (values).

Re-expresses the reference's two bit-packed codecs (SURVEY.md §2.1 #7-#10):

- ``DeltaDeltaLongEncoder`` (TSEncoding DELTA_OF_DELTA, reference
  db/iotdb-core/tsfile/.../encoder/DeltaDeltaLongEncoder.java:117-174):
  Gorilla-paper timestamp compression — store the second difference in a
  small number of bits chosen by magnitude class.
- ``LongGorillaEncoder`` / ``DoublePrecisionEncoderV2`` (TSEncoding GORILLA,
  reference .../encoder/LongGorillaEncoder.java:105-150): XOR with the
  previous value, store only the meaningful (non-zero window) bits.

Format redesign (clean-room, deliberately different from the reference):
the reference interleaves prefix codes with payloads in one bitstream, which
forces *sequential* decode.  We separate three planes —

    [fixed-width tag plane] [fixed-width window/param plane] [payload plane]

so decode is: unpack tags (vectorized) → derive every element's payload
width (vectorized) → prefix-sum offsets → gather payload bits (vectorized).
This is the same control/payload-plane split the reference's byte-aligned
``TS_DELTA_data.lens`` array uses, generalized to bit granularity.  It keeps
the compression ratio of delta-of-delta / Gorilla while making both encode
and decode whole-array numpy kernels.

Delta-of-delta layout (little header, then planes):
    u32 count | i64 first | tag plane: 3 bits/elem for elems 1..n-1 |
    payload plane: zigzag(dod) bits per class
    classes: 0→0 bits (dod==0), 1→7, 2→9, 3→12, 4→32, 5→64
    (class thresholds follow DeltaDeltaLongEncoder.java:117-156.)

Gorilla layout:
    u32 count | u32 n_windows | u64 first |
    tag plane: 2 bits/elem for elems 1..n-1 (0: xor==0, 1: reuse window,
    2: new window) | window plane: 12 bits per new-window elem
    (6b leading-zero count, 6b meaningful-length-1) | payload plane:
    meaningful bits per non-zero elem.

Bit order is MSB-first within the stream, matching the reference's packing
convention (DeltaDeltaLongEncoder quirks list, SURVEY.md §2.1).
"""

from __future__ import annotations

import numpy as np

from .bytealigned import unzigzag, zigzag

_U64 = np.uint64

# ---------------------------------------------------------------------------
# bit plane helpers (shared by both codecs)
# ---------------------------------------------------------------------------


def pack_bits(values: np.ndarray, widths: np.ndarray) -> np.ndarray:
    """Concatenate ``widths[i]`` MSB-first bits of ``values[i]`` into bytes.

    Word-lane algorithm: each element's code spans at most two 64-bit-aligned
    big-endian lanes (width ≤ 64). Compute both lane contributions for every
    element at once, then segment-OR contributions that share a lane with
    ``np.bitwise_or.reduceat`` — a constant number of whole-array passes,
    no per-bit expansion.
    """
    v = values.astype(np.uint64, copy=False)
    w = widths.astype(np.int64, copy=False)
    total = int(w.sum())
    if total == 0:
        return np.empty(0, dtype=np.uint8)
    if len(w) and w[0] in (1, 2, 4, 8, 16, 32, 64) and (w == w[0]).all():
        return _pack_fixed_pow2(v, int(w[0]))
    nz = w > 0
    if not nz.all():
        v = v[nz]
        w = w[nz]
    # mask stray high bits so OR-accumulation is safe (width-64 elements are
    # rare: patch them in place instead of a both-branches np.where pass)
    wu = w.astype(np.uint64)
    full = wu == _U64(64)
    mask = (_U64(1) << (wu & _U64(63))) - _U64(1)
    if full.any():
        mask[full] = ~_U64(0)
    v = v & mask
    ends = np.cumsum(w)
    offs = ends - w
    lane0 = offs >> 6
    s = (offs & 63).astype(np.int64)
    r = s + w - 64  # >0 → element spills into lane0+1
    spill = r > 0
    sh0 = np.where(spill, r, 64 - s - w).astype(np.uint64)
    c0 = np.where(spill, v >> sh0, v << sh0)
    c1 = np.where(spill, v << ((_U64(64) - sh0) & _U64(63)), _U64(0))
    n_lanes = (total + 63) // 64
    lanes = np.zeros(n_lanes + 1, dtype=np.uint64)  # +1: spill lane of last elem

    def _or_into(idx: np.ndarray, c: np.ndarray) -> None:
        # idx is non-decreasing (offsets grow monotonically)
        first = np.empty(len(idx), dtype=bool)
        first[0] = True
        np.not_equal(idx[1:], idx[:-1], out=first[1:])
        seg_starts = np.flatnonzero(first)
        lanes[idx[seg_starts]] |= np.bitwise_or.reduceat(c, seg_starts)

    _or_into(lane0, c0)
    _or_into(lane0 + 1, c1)
    out = lanes[:n_lanes].byteswap().view(np.uint8)
    return np.ascontiguousarray(out[: (total + 7) // 8])


def _pack_fixed_pow2(v: np.ndarray, w: int) -> np.ndarray:
    """Fixed power-of-two width: reshape so each output lane is one OR-reduce."""
    per = 64 // w
    n = len(v)
    n_lanes = (n + per - 1) // per
    if w < 64:
        v = v & ((_U64(1) << _U64(w)) - _U64(1))
    padded = np.zeros(n_lanes * per, dtype=np.uint64)
    padded[:n] = v
    cols = padded.reshape(n_lanes, per)
    shifts = (64 - w * (np.arange(per, dtype=np.uint64) + _U64(1)))
    lanes = np.bitwise_or.reduce(cols << shifts, axis=1)
    out = lanes.byteswap().view(np.uint8)
    return np.ascontiguousarray(out[: (n * w + 7) // 8])


def _unpack_fixed_pow2(buf: np.ndarray, w: int, count: int) -> np.ndarray:
    per = 64 // w
    n_lanes = (count + per - 1) // per
    padded = np.zeros(n_lanes * 8, dtype=np.uint8)
    raw = np.frombuffer(buf, dtype=np.uint8)[: (count * w + 7) // 8]
    padded[: len(raw)] = raw
    lanes = padded.view(np.uint64).byteswap()
    shifts = (64 - w * (np.arange(per, dtype=np.uint64) + _U64(1)))
    mask = ~_U64(0) if w == 64 else (_U64(1) << _U64(w)) - _U64(1)
    vals = (lanes[:, None] >> shifts) & mask
    return vals.reshape(-1)[:count]


def unpack_bits(buf: np.ndarray, widths: np.ndarray) -> np.ndarray:
    """Inverse of `pack_bits`: gather each element's bits back to uint64."""
    w_all = widths.astype(np.int64, copy=False)
    if len(w_all) and w_all[0] in (1, 2, 4, 8, 16, 32, 64) and (w_all == w_all[0]).all():
        return _unpack_fixed_pow2(buf, int(w_all[0]), len(w_all))
    total = int(w_all.sum())
    out = np.zeros(len(w_all), dtype=np.uint64)
    if total == 0:
        return out
    raw = np.frombuffer(buf, dtype=np.uint8)[: (total + 7) // 8]
    n_lanes = (total + 63) // 64
    padded = np.zeros((n_lanes + 1) * 8, dtype=np.uint8)
    padded[: len(raw)] = raw
    lanes = padded.view(np.uint64).byteswap()
    nz = w_all > 0
    w = w_all[nz]
    ends = np.cumsum(w)
    offs = ends - w
    lane0 = offs >> 6
    s = (offs & 63).astype(np.int64)
    r = s + w - 64
    spill = r > 0
    wu = w.astype(np.uint64)
    full = wu == _U64(64)
    mask = (_U64(1) << (wu & _U64(63))) - _U64(1)
    if full.any():
        mask[full] = ~_U64(0)
    sh = np.where(spill, r, 64 - s - w).astype(np.uint64)
    w0 = lanes[lane0]
    w1 = lanes[lane0 + 1]
    lo = np.where(spill, w0 << sh, w0 >> sh)
    hi = np.where(spill, w1 >> ((_U64(64) - sh) & _U64(63)), _U64(0))
    out[nz] = (lo | hi) & mask
    return out


def _fixed_unpack(buf: np.ndarray, width: int, count: int) -> np.ndarray:
    """Unpack ``count`` fixed-``width``-bit MSB-first codes."""
    if count == 0:
        return np.empty(0, dtype=np.uint64)
    return unpack_bits(buf, np.full(count, width, dtype=np.int64))


# ---------------------------------------------------------------------------
# delta-of-delta
# ---------------------------------------------------------------------------

# class -> payload width in bits
_DOD_WIDTH = np.array([0, 7, 9, 12, 32, 64], dtype=np.int64)


def _dod_classify(zz: np.ndarray) -> np.ndarray:
    codes = np.full(zz.shape, 5, dtype=np.uint8)
    codes[zz < _U64(1) << _U64(32)] = 4
    codes[zz < _U64(1) << _U64(12)] = 3
    codes[zz < _U64(1) << _U64(9)] = 2
    codes[zz < _U64(1) << _U64(7)] = 1
    codes[zz == _U64(0)] = 0
    return codes


def dod_encode(values: np.ndarray) -> bytes:
    v = np.asarray(values, dtype=np.int64)
    n = len(v)
    header = np.array([n], dtype="<u4").tobytes()
    if n == 0:
        return header
    first = v[0:1].astype("<i8").tobytes()
    if n == 1:
        return header + first
    delta = np.diff(v)
    dod = np.empty(n - 1, dtype=np.int64)
    dod[0] = delta[0]  # previous delta is defined as 0, as in the reference
    np.subtract(delta[1:], delta[:-1], out=dod[1:])
    zz = zigzag(dod)
    codes = _dod_classify(zz)
    tag_plane = pack_bits(codes.astype(np.uint64), np.full(n - 1, 3, dtype=np.int64))
    payload = pack_bits(zz, _DOD_WIDTH[codes])
    return header + first + tag_plane.tobytes() + payload.tobytes()


def dod_decode(blob: bytes | np.ndarray) -> np.ndarray:
    buf = np.frombuffer(blob, dtype=np.uint8)
    n = int(buf[:4].view("<u4")[0])
    if n == 0:
        return np.empty(0, dtype=np.int64)
    first = int(buf[4:12].view("<i8")[0])
    if n == 1:
        return np.array([first], dtype=np.int64)
    tag_bytes = (3 * (n - 1) + 7) // 8
    tags = _fixed_unpack(buf[12 : 12 + tag_bytes], 3, n - 1).astype(np.int64)
    widths = _DOD_WIDTH[tags]
    zz = unpack_bits(buf[12 + tag_bytes :], widths)
    dod = unzigzag(zz)
    delta = np.cumsum(dod)  # prev-delta chain starts at 0
    out = np.empty(n, dtype=np.int64)
    out[0] = first
    np.cumsum(delta, out=out[1:])
    out[1:] += first
    return out


def dod_encode_backward(values: np.ndarray) -> bytes:
    """Tail-decodable (sort-on-insert) variant of delta-of-delta: the
    stream is encoded from the NEWEST point backwards, so the latest
    points sit at the stream head and :func:`dod_decode_tail` can
    materialize the last ``k`` points reading only O(k) codes — the
    reference's ``DeltaDeltaBackwardEncoder`` (DeltaDeltaBackwardEncoder.
    java:181-342) exists for exactly this access pattern (LAST /
    latest-window queries against a sort-on-insert memtable)."""
    v = np.asarray(values, dtype=np.int64)
    return dod_encode(v[::-1])


def dod_decode_backward(blob: bytes | np.ndarray) -> np.ndarray:
    """Full decode of a backward stream, in chronological order."""
    return dod_decode(blob)[::-1]


def dod_decode_tail(blob: bytes | np.ndarray, k: int) -> np.ndarray:
    """Decode only the LAST ``k`` points (chronological order) of a
    backward-encoded stream, touching O(k) tag/payload bits: unpack the
    first ``k-1`` 3-bit tags, gather just their payload bits, one short
    cumsum. The fixed-width tag plane is what makes the tail seekable
    without decoding the body (same plane-split idea as the byte-aligned
    family's ``lens`` array)."""
    buf = np.frombuffer(blob, dtype=np.uint8)
    n = int(buf[:4].view("<u4")[0])
    if n == 0 or k <= 0:
        return np.empty(0, dtype=np.int64)
    k = min(k, n)
    first = int(buf[4:12].view("<i8")[0])
    if k == 1:
        return np.array([first], dtype=np.int64)
    tag_bytes_full = (3 * (n - 1) + 7) // 8
    tag_bytes_k = (3 * (k - 1) + 7) // 8
    tags = _fixed_unpack(buf[12 : 12 + tag_bytes_k], 3, k - 1).astype(np.int64)
    widths = _DOD_WIDTH[tags]
    zz = unpack_bits(buf[12 + tag_bytes_full :], widths)
    dod = unzigzag(zz)
    delta = np.cumsum(dod)
    out = np.empty(k, dtype=np.int64)
    out[0] = first
    np.cumsum(delta, out=out[1:])
    out[1:] += first
    return out[::-1]


# ---------------------------------------------------------------------------
# Gorilla XOR
# ---------------------------------------------------------------------------


def _clz64(x: np.ndarray) -> np.ndarray:
    """Vectorized count-leading-zeros for uint64 (x > 0).

    float64 exponent-field trick: the cast rounds, so the exponent is
    floor(log2(x)) or floor(log2(x))+1; one shift-compare fixes the
    rounded-up-across-a-power-of-two case exactly.
    """
    f = x.astype(np.float64)
    e = ((f.view(np.uint64) >> _U64(52)) & _U64(0x7FF)).astype(np.int64) - 1023
    # Clamp BEFORE the rounded-up correction: x in (2^64-1024, 2^64-1] casts
    # to exactly 2^64 (e=64); clamping to 63 is already the right exponent
    # there (bit_length 64), and the shift-compare below would otherwise be
    # unable to detect it (shift amount saturates at 63).
    e = np.minimum(e, 63)
    too_big = (x >> e.astype(np.uint64)) == 0  # x < 2^e → exponent rounded up
    e -= too_big
    return 63 - e


def _ctz64(x: np.ndarray) -> np.ndarray:
    """Vectorized count-trailing-zeros for uint64 (x > 0).

    The isolated lowest bit is an exact power of two ≤ 2^63, which float64
    represents exactly — the exponent field IS the answer, no rounded-up
    correction pass needed (unlike the general _clz64)."""
    lowbit = (x & (~x + _U64(1))).astype(np.float64)
    return ((lowbit.view(np.uint64) >> _U64(52)) & _U64(0x7FF)).astype(np.int64) - 1023


def gorilla_encode_longs(bit_patterns: np.ndarray) -> bytes:
    """Gorilla-XOR encode a uint64 bit-pattern array (works for int64 values
    and for float64 via ``.view(np.uint64)``).

    Window policy (vectorized, decoder-agnostic): an element reuses the
    running window iff its own (lead, trail) fit inside the *previous
    non-zero element's own* window — a conservative one-pass test that
    guarantees containment in the running window by induction, so the whole
    decision is a single vectorized comparison instead of the reference's
    sequential loop (LongGorillaEncoder.java:105-150).
    """
    x = np.ascontiguousarray(bit_patterns, dtype=np.uint64)
    n = len(x)
    head = np.array([n, 0], dtype="<u4")
    if n == 0:
        return head.tobytes()
    if n == 1:
        return head.tobytes() + x[0:1].astype("<u8").tobytes()
    xor = x[1:] ^ x[:-1]
    nz = xor != 0
    lead = np.zeros(n - 1, dtype=np.int64)
    trail = np.zeros(n - 1, dtype=np.int64)
    xnz = xor[nz]
    lead[nz] = _clz64(xnz)  # xnz ≥ 1 → clz ≤ 63, no extra clamp
    trail[nz] = _ctz64(xnz)
    mlen = np.where(nz, 64 - lead - trail, 0)

    # previous non-zero element's (lead, trail), aligned to each element
    nz_idx = np.flatnonzero(nz)
    tags = np.zeros(n - 1, dtype=np.uint64)  # 0 = xor==0
    if len(nz_idx):
        pl = lead[nz_idx]
        pt = trail[nz_idx]
        reuse = np.zeros(len(nz_idx), dtype=bool)
        if len(nz_idx) > 1:
            reuse[1:] = (pl[1:] >= pl[:-1]) & (pt[1:] >= pt[:-1])
        tags[nz_idx[reuse]] = 1
        tags[nz_idx[~reuse]] = 2
    # effective window for every element = forward-fill from new-window elems
    is_new = tags == 2
    eff_lead = lead.copy()
    eff_trail = trail.copy()
    if is_new.any():
        idx = np.where(is_new, np.arange(n - 1), -1)
        np.maximum.accumulate(idx, out=idx)
        filled = idx >= 0
        eff_lead[filled] = lead[idx[filled]]
        eff_trail[filled] = trail[idx[filled]]
    eff_mlen = 64 - eff_lead - eff_trail

    tag_plane = pack_bits(tags, np.full(n - 1, 2, dtype=np.int64))
    win_vals = ((lead[is_new].astype(np.uint64) << _U64(6))
                | (mlen[is_new] - 1).astype(np.uint64))
    win_plane = pack_bits(win_vals, np.full(int(is_new.sum()), 12, dtype=np.int64))
    pay_widths = np.where(tags == 0, 0, eff_mlen)
    payload_vals = (xor >> eff_trail.astype(np.uint64))
    payload = pack_bits(payload_vals, pay_widths)
    head[1] = int(is_new.sum())
    return (head.tobytes() + x[0:1].astype("<u8").tobytes()
            + tag_plane.tobytes() + win_plane.tobytes() + payload.tobytes())


def gorilla_decode_longs(blob: bytes | np.ndarray) -> np.ndarray:
    buf = np.frombuffer(blob, dtype=np.uint8)
    n = int(buf[:4].view("<u4")[0])
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    n_win = int(buf[4:8].view("<u4")[0])
    first = buf[8:16].view("<u8")[0]
    if n == 1:
        return np.array([first], dtype=np.uint64)
    pos = 16
    tag_bytes = (2 * (n - 1) + 7) // 8
    tags = _fixed_unpack(buf[pos : pos + tag_bytes], 2, n - 1).astype(np.int64)
    pos += tag_bytes
    win_bytes = (12 * n_win + 7) // 8
    wins = _fixed_unpack(buf[pos : pos + win_bytes], 12, n_win)
    pos += win_bytes
    lead_new = (wins >> _U64(6)).astype(np.int64)
    mlen_new = (wins & _U64(0x3F)).astype(np.int64) + 1
    is_new = tags == 2
    eff_lead = np.zeros(n - 1, dtype=np.int64)
    eff_mlen = np.zeros(n - 1, dtype=np.int64)
    eff_lead[is_new] = lead_new
    eff_mlen[is_new] = mlen_new
    idx = np.where(is_new, np.arange(n - 1), -1)
    np.maximum.accumulate(idx, out=idx)
    filled = idx >= 0
    eff_lead[filled] = eff_lead[idx[filled]]
    eff_mlen[filled] = eff_mlen[idx[filled]]
    widths = np.where(tags == 0, 0, eff_mlen)
    payload = unpack_bits(buf[pos:], widths)
    shift = (64 - eff_lead - eff_mlen).astype(np.uint64)
    xor = np.where(tags == 0, _U64(0), payload << shift)
    out = np.empty(n, dtype=np.uint64)
    out[0] = first
    # xor-scan: cumulative bitwise xor has no ufunc.accumulate fast path for
    # arbitrary dtypes pre-numpy2; use bitwise_xor.accumulate (supported).
    np.bitwise_xor.accumulate(xor, out=xor)
    out[1:] = first ^ xor
    return out


def gorilla_encode_doubles(values: np.ndarray) -> bytes:
    return gorilla_encode_longs(np.ascontiguousarray(values, dtype=np.float64).view(np.uint64))


def gorilla_decode_doubles(blob: bytes | np.ndarray) -> np.ndarray:
    return gorilla_decode_longs(blob).view(np.float64)


# ---------------------------------------------------------------------------
# TS_2DIFF (block min-delta, fixed width per block)
# ---------------------------------------------------------------------------

# Re-expresses IoTDB's TS_2DIFF (reference DeltaBinaryEncoder,
# tsfile/.../encoder/DeltaBinaryEncoder.java:46-129): deltas are grouped in
# blocks of 128; each block stores (min_delta, bit_width) and packs
# (delta - min_delta) at the block's fixed width. Fixed width per block is
# what makes this the FASTEST codec here: pack/unpack stay on the pow2/
# reduceat fast paths and there is no per-element class decision chain.
# Layout: u32 count | i64 first | per block: [i64 min_delta | u8 width |
# ceil(128*width/8) payload bytes] (last block truncated).

TS2DIFF_BLOCK = 128


def ts2diff_encode(values: np.ndarray) -> bytes:
    v = np.asarray(values, dtype=np.int64)
    n = len(v)
    head = np.array([n], dtype="<u4").tobytes()
    if n == 0:
        return head
    first = v[0:1].astype("<i8").tobytes()
    if n == 1:
        return head + first
    d = np.diff(v)
    m = len(d)
    n_blocks = (m + TS2DIFF_BLOCK - 1) // TS2DIFF_BLOCK
    pad = n_blocks * TS2DIFF_BLOCK - m
    dp = np.concatenate([d, np.zeros(pad, dtype=np.int64)]).reshape(
        n_blocks, TS2DIFF_BLOCK
    )
    if pad:
        dp[-1, TS2DIFF_BLOCK - pad :] = dp[-1, 0]  # pad with a real delta
    mins = dp.min(axis=1)
    rel = (dp - mins[:, None]).astype(np.uint64)
    maxs = rel.max(axis=1)
    widths = np.zeros(n_blocks, dtype=np.int64)
    nzb = maxs > 0
    widths[nzb] = _bitlen_u64(maxs[nzb])
    # block table: [min i64 | width u8] per block, then ONE payload plane —
    # per-element widths = repeat(block width); single pack_bits call
    counts = np.full(n_blocks, TS2DIFF_BLOCK, dtype=np.int64)
    if pad:
        counts[-1] -= pad
    keep = np.repeat(np.arange(n_blocks), TS2DIFF_BLOCK)
    keep_mask = (np.arange(n_blocks * TS2DIFF_BLOCK) % TS2DIFF_BLOCK) < counts[keep]
    flat_rel = rel.reshape(-1)[keep_mask]
    flat_w = np.repeat(widths, counts)
    payload = pack_bits(flat_rel, flat_w)
    table = np.zeros(n_blocks * 9, dtype=np.uint8)
    table.reshape(n_blocks, 9)[:, :8] = mins.astype("<i8").view(np.uint8).reshape(n_blocks, 8)
    table.reshape(n_blocks, 9)[:, 8] = widths.astype(np.uint8)
    return head + first + table.tobytes() + payload.tobytes()


def ts2diff_decode(blob: bytes | np.ndarray) -> np.ndarray:
    buf = np.frombuffer(blob, dtype=np.uint8)
    n = int(buf[:4].view("<u4")[0])
    if n == 0:
        return np.empty(0, dtype=np.int64)
    first = int(buf[4:12].view("<i8")[0])
    if n == 1:
        return np.array([first], dtype=np.int64)
    m = n - 1
    n_blocks = (m + TS2DIFF_BLOCK - 1) // TS2DIFF_BLOCK
    table = buf[12 : 12 + 9 * n_blocks].reshape(n_blocks, 9)
    mins = np.ascontiguousarray(table[:, :8]).view("<i8").reshape(-1)
    widths = table[:, 8].astype(np.int64)
    counts = np.full(n_blocks, TS2DIFF_BLOCK, dtype=np.int64)
    counts[-1] = m - TS2DIFF_BLOCK * (n_blocks - 1)
    flat_w = np.repeat(widths, counts)
    rel = unpack_bits(buf[12 + 9 * n_blocks :], flat_w)
    deltas = rel.view(np.int64) + np.repeat(mins, counts)
    out = np.empty(n, dtype=np.int64)
    out[0] = first
    np.cumsum(deltas, out=out[1:])
    out[1:] += first
    return out


def _bitlen_u64(x: np.ndarray) -> np.ndarray:
    """bit length of positive uint64 values (vectorized)."""
    return 64 - _clz64(x)
