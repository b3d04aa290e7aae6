"""Property-based oracles (hypothesis) for the round-4 kernels: random
row shapes and value regimes must round-trip exactly and, for the sorters,
end byte-identical to a canonical encode of the stable-sorted series.
Deterministic profile (no deadline flakes on a steal-noisy host)."""

import numpy as np
from hypothesis import HealthCheck, given, settings, strategies as st

from sorting_compressed_time_series_spark.codecs.batched import (
    decode_chunk_rows,
    encode_chunk_rows,
)
from sorting_compressed_time_series_spark.codecs.bytealigned import (
    delta_decode,
    delta_encode,
    varint_decode,
    varint_encode,
)
from sorting_compressed_time_series_spark.codecs.chunk import (
    CODEC_DELTA,
    CODEC_DOD,
    CODEC_TS2DIFF,
    CODEC_VARINT,
    encode_chunk,
)
from sorting_compressed_time_series_spark.operators.compressed_sort import (
    bounded_ooo_sort,
    compressed_sort,
    ts_delta_sort_dc,
)

SETTINGS = settings(
    max_examples=40, deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

# rows: 0-8 rows of 0-200 values, magnitudes spanning the width classes
row_lists = st.lists(
    st.lists(
        st.integers(min_value=-(2**50), max_value=2**50), min_size=0, max_size=200
    ),
    min_size=0,
    max_size=8,
)


def _pack(rows):
    flat = (
        np.concatenate([np.asarray(r, np.int64) for r in rows])
        if any(len(r) for r in rows)
        else np.empty(0, np.int64)
    )
    splits = np.zeros(len(rows) + 1, np.int64)
    np.cumsum([len(r) for r in rows], out=splits[1:])
    return flat, splits


@given(rows=row_lists, codec=st.sampled_from([CODEC_DELTA, CODEC_VARINT,
                                              CODEC_DOD, CODEC_TS2DIFF]))
@SETTINGS
def test_batched_chunk_rows_roundtrip_and_scalar_parity(rows, codec):
    flat, splits = _pack(rows)
    buf, bsp = encode_chunk_rows(flat, splits, codec)
    for i, r in enumerate(rows):
        assert buf[bsp[i]:bsp[i + 1]].tobytes() == encode_chunk(
            np.asarray(r, np.int64), codec
        )
    back, back_sp = decode_chunk_rows(buf, bsp)
    assert np.array_equal(back_sp, splits)
    assert np.array_equal(back, flat)


ts_arrays = st.lists(
    st.integers(min_value=-(2**40), max_value=2**40), min_size=0, max_size=400
)


@given(ts=ts_arrays, l=st.sampled_from([1, 3, 50, 10**6]))
@SETTINGS
def test_sorters_agree_on_canonical_bytes(ts, l):
    ts = np.asarray(ts, np.int64)
    vs = np.arange(len(ts), dtype=np.int64)
    want = delta_encode(ts[np.argsort(ts, kind="stable")])
    outs = [
        compressed_sort(delta_encode(ts), varint_encode(vs)),
        ts_delta_sort_dc(delta_encode(ts), varint_encode(vs), block_threshold=37),
        bounded_ooo_sort(delta_encode(ts), varint_encode(vs), l=l),
    ]
    for td, vd, _ in outs:
        assert td.vals.tobytes() == want.vals.tobytes()
        assert np.array_equal(td.codes, want.codes)
        # value plane permuted in lockstep (stability: ties keep arrival order)
        assert np.array_equal(
            varint_decode(vd), vs[np.argsort(ts, kind="stable")]
        )
