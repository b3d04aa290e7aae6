"""Vectorized numpy codec kernels.

Two codec families, mirroring the reference's split (see /root/repo/SURVEY.md §2.1):

1. ``bytealigned`` — the "compressed-sortable" family. Payload bytes live in a
   ``vals`` plane; a 2-bit-per-element length-class ``lens`` plane makes every
   element's byte range addressable without decoding, which is what lets the
   compressed-domain sorter rotate byte ranges in place.
   Re-expresses: ``TS_DELTA_encoder/decoder`` (delta, time column) and
   ``V_VARINT_encoder/decoder`` (zigzag varint, value column)
   (reference: db/iotdb-core/datanode/src/main/java/org/apache/iotdb/db/utils/
   datastructure/compressedsort/TS_DELTA_encoder.java:19-129,
   V_VARINT_encoder.java:16-89 — format re-designed clean-room, not copied).

2. ``bitpacked`` — the high-ratio family: delta-of-delta for timestamps
   (reference DeltaDeltaLongEncoder.java:117-174) and Gorilla XOR for values
   (reference LongGorillaEncoder.java:105-150 / DoublePrecisionEncoderV2).
   Our format separates fixed-width control planes (tags, window params) from
   the variable-width payload plane so DECODE is fully vectorizable — the
   reference's interleaved prefix codes force sequential decode; ours do not.

Plus ``chimp`` — the CHIMP-128 benchmark-baseline codec (reference
LongChimpEncoder.java; the reference uses it only as a comparison point in
MemtableSortTest): same plane-split idiom, with the XOR back-reference
chain resolved by pointer doubling at decode, and ``deltagorilla`` — the
fork's interleaved single-delta research codec + bit-level in-place sorter.
"""

from .bytealigned import (  # noqa: F401
    ByteAlignedData,
    delta_decode,
    delta_encode,
    varint_decode,
    varint_encode,
    zigzag,
    unzigzag,
)
from .bitpacked import (  # noqa: F401
    dod_decode,
    dod_encode,
    gorilla_decode_doubles,
    gorilla_decode_longs,
    gorilla_encode_doubles,
    gorilla_encode_longs,
)
from .chimp import (  # noqa: F401
    chimp_decode_doubles,
    chimp_decode_longs,
    chimp_encode_doubles,
    chimp_encode_longs,
)
from .chunk import (  # noqa: F401
    CODEC_CHIMP,
    CODEC_CHIMP_F64,
    CODEC_DELTA,
    CODEC_DOD,
    CODEC_GORILLA,
    CODEC_GORILLA_F64,
    CODEC_TS2DIFF,
    CODEC_VARINT,
    chunk_stats,
    decode_chunk,
    encode_chunk,
)
