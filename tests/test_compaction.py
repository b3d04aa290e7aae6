"""Spark-level compaction: per-series multi-chunk merge must reproduce the
single-flush chunk byte-for-byte (canonical-encode identity), for both the
non-overlapping (splice) and overlapping (k-merge) regimes."""

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from sorting_compressed_time_series_spark.codecs.chunk import (
    CODEC_DELTA,
    CODEC_VARINT,
    decode_chunk,
    encode_chunk,
)
from sorting_compressed_time_series_spark.operators.compaction import compact_chunks
from sorting_compressed_time_series_spark.operators.ingest import CHUNK_SCHEMA, flush
from sorting_compressed_time_series_spark.sources.synth import generate_tokens_df

SEED = 42


def _split_chunks(spark, chunks_pdf, interleave: bool):
    """Split each doc's points into two chunk rows: contiguous halves
    (non-overlapping ranges → splice path) or even/odd interleave
    (overlapping ranges → k-merge path)."""
    rows = []
    for _, r in chunks_pdf.iterrows():
        ts = decode_chunk(r.time_blob)
        vs = decode_chunk(r.value_blob)
        if interleave:
            parts = [(ts[0::2], vs[0::2]), (ts[1::2], vs[1::2])]
        else:
            cut = len(ts) // 2
            parts = [(ts[:cut], vs[:cut]), (ts[cut:], vs[cut:])]
        for pt, pv in parts:
            if len(pt) == 0:
                continue
            rows.append(
                {
                    "doc_id": r.doc_id,
                    "source": r.source,
                    "tier": 0,
                    "window_start": int(r.window_start),
                    "count": len(pt),
                    "min_ts": int(pt.min()),
                    "max_ts": int(pt.max()),
                    "min_v": int(pv.min()),
                    "max_v": int(pv.max()),
                    "first_v": int(pv[0]),
                    "last_v": int(pv[-1]),
                    "sum_v": int(pv.sum()),
                    "n_inversions": 0,
                    "sorted_input": True,
                    "bytes_raw": len(pt) * 16,
                    "bytes_time": 0,
                    "bytes_value": 0,
                    "time_blob": encode_chunk(pt, CODEC_DELTA),
                    "value_blob": encode_chunk(pv, CODEC_VARINT),
                    "encode_ns": 0,
                }
            )
    return spark.createDataFrame(pd.DataFrame(rows), schema=CHUNK_SCHEMA)


@pytest.fixture(scope="module")
def single_flush(spark):
    pdf = flush(generate_tokens_df(spark, 60, SEED), SEED).toPandas()
    return pdf.set_index("doc_id").sort_index()


@pytest.mark.parametrize("interleave", [False, True])
def test_compaction_reproduces_single_flush(spark, single_flush, interleave):
    split = _split_chunks(spark, single_flush.reset_index(), interleave)
    assert split.count() > 60  # really multiple chunks per doc
    merged = compact_chunks(split).toPandas().set_index("doc_id").sort_index()
    assert len(merged) == len(single_flush)
    for doc in single_flush.index:
        a, b = merged.loc[doc], single_flush.loc[doc]
        assert bytes(a.time_blob) == bytes(b.time_blob), doc
        assert bytes(a.value_blob) == bytes(b.value_blob), doc
        assert a["count"] == b["count"] and a.sum_v == b.sum_v
        assert a.first_v == b.first_v and a.last_v == b.last_v
        assert a.min_ts == b.min_ts and a.max_ts == b.max_ts
