"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The pattern for image/audio/video at 100 TB: the payload is an opaque
``binary`` column (or an object-store pointer), metadata is typed columns,
and decode/feature-extraction runs as Arrow-batched kernels via
``mapInArrow`` so bytes never take a per-row Python round trip.

The actual media decode is STUBBED (`decode_media` raises
NotImplementedError — no image/audio libs in this container, per the
build constraints); `binary_stats` is the deterministic fake extractor
that proves the Spark-side plumbing: schema, batching, buffer access and
the UDF signature are real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame, functions as F


def to_binary_payload(docs: DataFrame) -> DataFrame:
    """Model a multimodal table: payload = utf-8 bytes of text (stand-in
    for image/audio bytes), plus typed metadata columns."""
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.lit("text/plain").alias("mime"),
        F.length(F.encode("text", "utf-8")).alias("n_bytes"),
    )


def decode_media(payload_df: DataFrame) -> DataFrame:
    """Real media decode (image resize / audio resample / frame sample).
    STUB: the decode libraries are not available in this environment."""
    raise NotImplementedError(
        "media decode requires PIL/av which are not in this container; "
        "binary_stats() exercises the identical Spark plumbing"
    )


def frame_sample(payload_df: DataFrame, frame_bytes: int = 64,
                 every_k: int = 4) -> DataFrame:
    """Frame-sampling plumbing (video keyframe extraction shape): treat the
    payload as consecutive fixed-size frames, emit every ``every_k``-th
    COMPLETE frame as its own binary row (doc_id, frame_idx, frame).

    All offset arithmetic is vectorized over the batch's Arrow buffer and
    the exploded frame buffer is built by ONE gather — the real decode
    would replace the byte-slice with a pixel decode, the batch shape and
    zero-per-row-Python plumbing are exactly this."""

    def kern(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            col = b.column("payload")
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            bufs = col.buffers()
            offs = np.frombuffer(bufs[1], dtype=np.int32)[
                col.offset : col.offset + len(col) + 1
            ].astype(np.int64)
            data = (
                np.frombuffer(bufs[2], dtype=np.uint8)
                if bufs[2] is not None
                else np.empty(0, np.uint8)
            )
            lens = np.diff(offs)
            n_frames = lens // frame_bytes
            n_sampled = (n_frames + every_k - 1) // every_k
            total = int(n_sampled.sum())
            doc_idx = np.repeat(np.arange(len(lens)), n_sampled)
            within = np.arange(total, dtype=np.int64) - np.repeat(
                np.cumsum(n_sampled) - n_sampled, n_sampled
            )
            frame_idx = within * every_k
            starts = offs[:-1][doc_idx] + frame_idx * frame_bytes
            gather = (
                np.repeat(starts, frame_bytes)
                + np.tile(np.arange(frame_bytes, dtype=np.int64), total)
            )
            out_buf = data[gather] if total else np.empty(0, np.uint8)
            out_offs = np.arange(total + 1, dtype=np.int32) * frame_bytes
            frames = pa.Array.from_buffers(
                pa.binary(), total,
                [None, pa.py_buffer(out_offs), pa.py_buffer(out_buf)],
            )
            yield pa.RecordBatch.from_arrays(
                [
                    b.column("doc_id").take(pa.array(doc_idx)),
                    pa.array(frame_idx),
                    frames,
                ],
                names=["doc_id", "frame_idx", "frame"],
            )

    return payload_df.select("doc_id", "payload").mapInArrow(
        kern, schema="doc_id bigint, frame_idx bigint, frame binary"
    )


def binary_stats(payload_df: DataFrame) -> DataFrame:
    """Deterministic 'feature extractor' over the binary payload: byte
    length, first byte, a byte-histogram checksum — vectorized over the
    Arrow buffer of the whole batch, zero per-row Python."""

    def kern(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            col = b.column("payload")
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            bufs = col.buffers()
            offs = np.frombuffer(bufs[1], dtype=np.int32)[
                col.offset : col.offset + len(col) + 1
            ].astype(np.int64)
            data = (
                np.frombuffer(bufs[2], dtype=np.uint8)
                if bufs[2] is not None
                else np.empty(0, np.uint8)
            )
            lens = np.diff(offs)
            first = np.where(
                lens > 0, data[np.minimum(offs[:-1], max(len(data) - 1, 0))], -1
            )
            cs = np.zeros(len(data) + 1, dtype=np.int64)
            np.cumsum(data, out=cs[1:])
            csum = cs[offs[1:]] - cs[offs[:-1]]  # exact segmented sums
            yield pa.RecordBatch.from_arrays(
                [
                    b.column("doc_id"),
                    pa.array(lens),
                    pa.array(first.astype(np.int64)),
                    pa.array(csum % 1000000007),
                ],
                names=["doc_id", "n_bytes", "first_byte", "byte_checksum"],
            )

    return payload_df.select("doc_id", "payload").mapInArrow(
        kern, schema="doc_id bigint, n_bytes bigint, first_byte bigint, byte_checksum bigint"
    )
