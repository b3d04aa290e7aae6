"""Compaction: merge a series' accumulated chunks into one sorted chunk.

The Spark expression of the reference's compaction stage (SURVEY.md §3.4,
PersistUncompressingSorter): multiple flushes leave multiple (possibly
time-overlapping) chunks per series; compaction merges them per series
with the page-merge kernel — splice fast path when chunk time ranges do
not overlap (one patched boundary delta per seam, interiors untouched),
stable k-way merge otherwise.

Physical shape: ``groupBy(doc_id).applyInPandas`` — chunk rows are tiny
(blobs of a few KB), so a shuffle (when one happens) moves compressed
bytes, never points.  When the chunk table was committed with
``bucket_by=("doc_id", N)`` (Warehouse bucketed snapshots — the Iceberg
``bucket(doc_id, N)`` stand-in) and is read through the session catalog,
the scan reports ``HashPartitioning(doc_id, N)``, the groupBy's required
distribution is already satisfied, and compaction runs with NO exchange
at all (plan-audited in tests/test_plans.py).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame

from ..codecs.bytealigned import varint_decode
from ..codecs.chunk import (
    CODEC_DELTA,
    CODEC_VARINT,
    deserialize_bytealigned,
    serialize_bytealigned,
    _body,
)
from .ingest import CHUNK_SCHEMA
from .page_merge import merge_pages

WINDOW_1H_US = 3_600_000_000


def compact_chunks(chunks_df: DataFrame) -> DataFrame:
    """Merge every series' tier-0 chunks into one chunk (order = flush
    order by min_ts, stability gives last-writer-wins on ties)."""

    def kern(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["min_ts", "max_ts"], kind="stable")
        tpages = [deserialize_bytealigned(_body(b)[1]) for b in pdf["time_blob"]]
        vpages = [deserialize_bytealigned(_body(b)[1]) for b in pdf["value_blob"]]
        mt, mv, lineage = merge_pages(tpages, vpages)
        t_blob = serialize_bytealigned(mt, CODEC_DELTA)
        v_blob = serialize_bytealigned(mv, CODEC_VARINT)
        merged_vals = varint_decode(mv)
        out = {
            "doc_id": [pdf["doc_id"].iloc[0]],
            "source": [pdf["source"].iloc[0]],
            "tier": [0],
            "window_start": [int(pdf["min_ts"].min()) // WINDOW_1H_US * WINDOW_1H_US],
            "count": [int(pdf["count"].sum())],
            "min_ts": [int(pdf["min_ts"].min())],
            "max_ts": [int(pdf["max_ts"].max())],
            "min_v": [int(pdf["min_v"].min())],
            "max_v": [int(pdf["max_v"].max())],
            "first_v": [int(merged_vals[0]) if len(merged_vals) else 0],
            "last_v": [int(merged_vals[-1]) if len(merged_vals) else 0],
            "sum_v": [int(pdf["sum_v"].sum())],
            "n_inversions": [int(pdf["n_inversions"].sum())],
            "sorted_input": [bool(pdf["sorted_input"].all())],
            "bytes_raw": [int(pdf["bytes_raw"].sum())],
            "bytes_time": [len(t_blob)],
            "bytes_value": [len(v_blob)],
            "time_blob": [t_blob],
            "value_blob": [v_blob],
            "encode_ns": [int(pdf["encode_ns"].sum())],
        }
        return pd.DataFrame(out)

    src = chunks_df.filter("tier = 0")
    return src.groupBy("doc_id").applyInPandas(kern, schema=CHUNK_SCHEMA)
