"""CHIMP value codec (SURVEY.md §2 benchmark-baseline codec family).

Re-expresses the reference's Chimp128 encoder/decoder pair (reference
db/iotdb-core/tsfile/.../encoder/LongChimpEncoder.java:133-199 and
decoder/LongChimpDecoder.java; the upstream algorithm is Liakos,
Papakonstantinopoulou & Kotidis, "Chimp: Efficient Lossless Floating Point
Compression for Time Series Databases", VLDB 2022).  Chimp improves on
Gorilla-XOR by XOR-ing each value against the *best* of the previous 128
values — "best" = the most recent one sharing the value's low 14 bits
(a hash hit makes the XOR end in > 13 trailing zeros, so the payload
shrinks) — falling back to the immediately previous value otherwise.

Format redesign (clean-room, same plane-separation idiom as
codecs/bitpacked.py — the reference interleaves control bits and payloads
in one bitstream, which forces sequential decode):

    u32 count | u64 first |
    tag plane     2 bits/elem (elems 1..n-1)
    offset plane  7 bits per tag-0/1 elem: back-offset-1 to the reference
                  value (tag-2 elems implicitly reference offset 1)
    lead plane    3 bits per tag-1/2 elem: leading-zero class of the XOR,
                  classes round DOWN to {0,8,12,16,18,20,22,24}
    siglen plane  6 bits per tag-1 elem: significant XOR bits after
                  dropping the >13 trailing zeros
    payload plane tag 0: nothing (XOR == 0)
                  tag 1: siglen bits   (xor >> trailing_zeros)
                  tag 2: 64 - round_lead bits (XOR incl. trailing zeros)

Every plane decodes with whole-array kernels (fixed-width unpack, or
widths derived from already-unpacked planes).  The XOR *chain* — value[i]
= xor[i] ^ value[i - off[i]] with data-dependent offsets — is the one
inherently sequential piece of the reference decoder; here it is resolved
by pointer doubling: treat ``i - off[i]`` as a parent pointer into a
forest rooted at element 0, then ``acc ^= acc[parent]; parent =
parent[parent]`` for ceil(log2 n) rounds.  The root keeps ``acc == 0`` so
over-jumping past it XORs in zeros — no masking needed.  O(n log n) work,
every round two vectorized gathers.

Deliberate deviation from the reference (documented, not an oversight):
the reference's case 10 ("leading-zero count equals the running stored
count — omit the 3-bit lead class") is folded into tag 2, which always
stores the class.  The saving it forgoes is ≤ 3 bits on that case; keeping
the lead plane fixed-width is what lets the whole decode stay vectorized.
"""

from __future__ import annotations

import numpy as np

from .bitpacked import _clz64, _ctz64, _fixed_unpack, pack_bits, unpack_bits

_U64 = np.uint64

_PREV = 128              # candidate window (Chimp128)
_KEY_BITS = 14           # low bits hashed; reference SET_LSB = 2^14 - 1
_TZ_THRESHOLD = 13       # candidate wins iff trailing zeros exceed this
# leading-zero rounding: class c covers leads >= _LEAD_ROUND[c]; a XOR's
# class is the largest c with _LEAD_ROUND[c] <= clz(xor) (round DOWN, so
# the payload width 64 - _LEAD_ROUND[class] never truncates real bits)
_LEAD_ROUND = np.array([0, 8, 12, 16, 18, 20, 22, 24], dtype=np.int64)


def _lead_class(clz: np.ndarray) -> np.ndarray:
    return np.searchsorted(_LEAD_ROUND, clz, side="right") - 1


def _prev_same_key(keys: np.ndarray) -> np.ndarray:
    """For each i, the largest j < i with keys[j] == keys[i] (else -1).

    One stable argsort groups equal keys in index order; each element's
    candidate is then its in-group predecessor."""
    n = len(keys)
    order = np.argsort(keys, kind="stable")
    sk = keys[order]
    prev = np.full(n, -1, dtype=np.int64)
    same = sk[1:] == sk[:-1]
    scattered = np.full(n, -1, dtype=np.int64)
    prev[1:][same] = order[:-1][same]
    scattered[order] = prev
    return scattered


def chimp_encode_longs(bit_patterns: np.ndarray) -> bytes:
    """Chimp128-encode a uint64 bit-pattern array (int64 values, or float64
    via ``.view(np.uint64)``)."""
    v = np.ascontiguousarray(bit_patterns).astype(np.uint64, copy=False)
    n = len(v)
    header = np.empty(12, dtype=np.uint8)
    header[:4] = np.frombuffer(np.uint32(n).tobytes(), dtype=np.uint8)
    if n == 0:
        return header[:4].tobytes()
    header[4:] = np.frombuffer(v[0].tobytes(), dtype=np.uint8)
    if n == 1:
        return header.tobytes()

    idx = np.arange(n, dtype=np.int64)
    cand = _prev_same_key((v & _U64((1 << _KEY_BITS) - 1)).astype(np.int64))
    cand_ok = (cand >= 0) & (idx - cand < _PREV)
    cand_safe = np.where(cand_ok, cand, 0)
    xor_cand = v ^ v[cand_safe]
    # tz of a zero XOR is 64 in the reference (> threshold): a hash hit on
    # an identical value is always taken
    tz_cand = np.where(xor_cand == 0, 64,
                       _ctz64(np.where(xor_cand == 0, _U64(1), xor_cand)))
    use_cand = cand_ok & (tz_cand > _TZ_THRESHOLD)

    off = np.where(use_cand, idx - cand_safe, 1)
    ref = idx - off
    xor = v ^ v[ref]
    tags = np.where(xor == 0, 0, np.where(use_cand, 1, 2))[1:]
    xor1 = xor[1:]
    off1 = off[1:]

    nz = xor1 != 0
    clz = np.zeros(n - 1, dtype=np.int64)
    tz = np.zeros(n - 1, dtype=np.int64)
    clz[nz] = _clz64(xor1[nz])
    tz[nz] = _ctz64(xor1[nz])
    lead_cls = _lead_class(clz)
    round_lead = _LEAD_ROUND[lead_cls]

    t0 = tags == 0
    t1 = tags == 1
    t2 = tags == 2
    siglen = np.zeros(n - 1, dtype=np.int64)
    siglen[t1] = 64 - round_lead[t1] - tz[t1]

    tag_plane = pack_bits(tags.astype(np.uint64),
                          np.full(n - 1, 2, dtype=np.int64))
    off_plane = pack_bits((off1[t0 | t1] - 1).astype(np.uint64),
                          np.full(int(t0.sum() + t1.sum()), 7, dtype=np.int64))
    lead_plane = pack_bits(lead_cls[t1 | t2].astype(np.uint64),
                           np.full(int(t1.sum() + t2.sum()), 3, dtype=np.int64))
    sig_plane = pack_bits(siglen[t1].astype(np.uint64),
                          np.full(int(t1.sum()), 6, dtype=np.int64))
    pay_w = np.zeros(n - 1, dtype=np.int64)
    pay_w[t1] = siglen[t1]
    pay_w[t2] = 64 - round_lead[t2]
    payload = np.where(t1, xor1 >> tz.astype(np.uint64), xor1)
    pay_plane = pack_bits(payload, pay_w)
    return b"".join([header.tobytes(), tag_plane.tobytes(), off_plane.tobytes(),
                     lead_plane.tobytes(), sig_plane.tobytes(), pay_plane.tobytes()])


def chimp_decode_longs(blob: bytes | np.ndarray) -> np.ndarray:
    """Inverse of `chimp_encode_longs` — whole-array planes + pointer-doubling
    XOR-chain resolution (no per-element Python loop)."""
    raw = np.frombuffer(blob, dtype=np.uint8) if not isinstance(blob, np.ndarray) else blob
    n = int(np.frombuffer(raw[:4].tobytes(), dtype=np.uint32)[0])
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    first = np.frombuffer(raw[4:12].tobytes(), dtype=np.uint64)[0]
    if n == 1:
        return np.array([first], dtype=np.uint64)
    pos = 12
    m = n - 1
    tag_bytes = (2 * m + 7) // 8
    tags = _fixed_unpack(raw[pos:pos + tag_bytes], 2, m).astype(np.int64)
    pos += tag_bytes

    t0 = tags == 0
    t1 = tags == 1
    t2 = tags == 2
    n01 = int(t0.sum() + t1.sum())
    n12 = int(t1.sum() + t2.sum())
    off_bytes = (7 * n01 + 7) // 8
    offs01 = _fixed_unpack(raw[pos:pos + off_bytes], 7, n01).astype(np.int64) + 1
    pos += off_bytes
    lead_bytes = (3 * n12 + 7) // 8
    leads12 = _fixed_unpack(raw[pos:pos + lead_bytes], 3, n12).astype(np.int64)
    pos += lead_bytes
    n1 = int(t1.sum())
    sig_bytes = (6 * n1 + 7) // 8
    sig1 = _fixed_unpack(raw[pos:pos + sig_bytes], 6, n1).astype(np.int64)
    pos += sig_bytes

    off = np.ones(m, dtype=np.int64)
    off[t0 | t1] = offs01
    round_lead = np.zeros(m, dtype=np.int64)
    round_lead[t1 | t2] = _LEAD_ROUND[leads12]
    siglen = np.zeros(m, dtype=np.int64)
    siglen[t1] = sig1

    pay_w = np.zeros(m, dtype=np.int64)
    pay_w[t1] = siglen[t1]
    pay_w[t2] = 64 - round_lead[t2]
    payload = unpack_bits(raw[pos:], pay_w)
    # tag 1 dropped its trailing zeros: tz = 64 - round_lead - siglen
    tz = np.zeros(m, dtype=np.int64)
    tz[t1] = 64 - round_lead[t1] - siglen[t1]
    xor = payload << tz.astype(np.uint64)

    # pointer-doubling resolve of value[i] = xor[i] ^ value[i - off[i]]
    acc = np.zeros(n, dtype=np.uint64)
    acc[1:] = xor
    par = np.zeros(n, dtype=np.int64)
    par[1:] = np.arange(1, n, dtype=np.int64) - off
    while (par != 0).any():
        acc ^= acc[par]
        par = par[par]
    return acc ^ first


def chimp_encode_doubles(values: np.ndarray) -> bytes:
    return chimp_encode_longs(
        np.ascontiguousarray(values, dtype=np.float64).view(np.uint64))


def chimp_decode_doubles(blob: bytes | np.ndarray) -> np.ndarray:
    return chimp_decode_longs(blob).view(np.float64)
