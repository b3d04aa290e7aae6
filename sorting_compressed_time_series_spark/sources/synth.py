"""Deterministic synthetic input table (BASELINE.json input_hint shape).

Schema: ``doc_id string, tokens array<int>, n_tok int, source string`` —
an Iceberg table of pre-tokenized training sequences in production; a
parquet table here.  Every cell is a pure function of (seed, doc index)
via counter-based splitmix64, so any partitioning/parallelism produces the
identical table (FIXTURES.md F1: value range [-10000, 10000] matching the
reference's test regime, length mix {16,128,1024}, skewed source mix
web/code/books/wiki = 0.70/0.15/0.10/0.05 to exercise salting).
Generation itself is distributed: ``spark.range`` + ``mapInArrow``.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame, SparkSession

from ..functions.hashing import hash2, uniform_int

SOURCES = np.array(["web", "code", "books", "wiki"])
_SOURCE_CUM = np.array([0.70, 0.85, 0.95, 1.0])
_LEN_CHOICES = np.array([16, 128, 1024], dtype=np.int64)
_LEN_CUM = np.array([0.3, 0.8, 1.0])

ARROW_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("tokens", pa.list_(pa.int32())),
        pa.field("n_tok", pa.int32()),
        pa.field("source", pa.string()),
    ]
)


def _gen_batch(ids: np.ndarray, seed: int) -> pa.RecordBatch:
    n = len(ids)
    h_len = hash2(ids, 1, seed)
    u = (h_len >> np.uint64(11)).astype(np.float64) / float(1 << 53)
    lengths = _LEN_CHOICES[np.searchsorted(_LEN_CUM, u, side="left").clip(0, 2)]
    h_src = hash2(ids, 2, seed)
    us = (h_src >> np.uint64(11)).astype(np.float64) / float(1 << 53)
    src = SOURCES[np.searchsorted(_SOURCE_CUM, us, side="left").clip(0, 3)]
    splits = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lengths, out=splits[1:])
    total = int(splits[-1])
    # flat token stream: counter = doc_id * 2^20 + position (positions <2^20)
    flat_pos = np.arange(total, dtype=np.int64) - np.repeat(splits[:-1], lengths)
    flat_doc = np.repeat(ids, lengths)
    hv = hash2(flat_doc << np.uint64(20), flat_pos, seed + 7)
    tokens = uniform_int(hv, -(10**4), 10**4).astype(np.int32)

    doc_id = pa.array(np.char.add("doc", np.char.zfill(ids.astype("U10"), 10)))
    tok_arr = pa.ListArray.from_arrays(
        pa.array(splits, type=pa.int32()), pa.array(tokens, type=pa.int32())
    )
    return pa.RecordBatch.from_arrays(
        [doc_id, tok_arr, pa.array(lengths.astype(np.int32), type=pa.int32()),
         pa.array(src)],
        schema=ARROW_SCHEMA,
    )


def generate_tokens_df(spark: SparkSession, n_docs: int, seed: int = 42,
                       start: int = 0) -> DataFrame:
    """Distributed deterministic generation of the input table; rows are a
    pure function of (seed, doc index), so ``start`` slices the same
    infinite corpus (incremental-ingest batches)."""

    def gen(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in it:
            ids = batch.column("id").to_numpy(zero_copy_only=False).astype(np.uint64)
            yield _gen_batch(ids, seed)

    base = spark.range(start, start + n_docs)
    return base.mapInArrow(gen, schema="doc_id string, tokens array<int>, n_tok int, source string")


def generate_tokens_mapped(
    spark: SparkSession,
    n_docs: int,
    kernel,
    schema: str,
    seed: int = 42,
    start: int = 0,
) -> DataFrame:
    """Generate the corpus AND apply an Arrow-batch ``kernel`` inside the
    same Python worker (one ``mapInArrow``).

    Why this exists: chaining two ``mapInArrow`` calls with no exchange
    between them puts TWO Python runners in the SAME Spark stage, and the
    JVM relay between the workers dominates the task (measured: the fused
    token histogram runs the identical kernels in 1.2 s where the chained
    plan took ~15 s warm at the same input). At 100 TB the input is a
    parquet/Iceberg scan, so this hop never exists in production — the
    fusion applies only to the synthetic-source path, where the generator
    would otherwise be that upstream Python stage.

    ``kernel`` is an ``Iterator[RecordBatch] -> Iterator[RecordBatch]``
    over generated corpus batches (ARROW_SCHEMA shape), exactly as it
    would receive from ``DataFrame.mapInArrow`` on the generated table.
    """

    def fused(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        def gen() -> Iterator[pa.RecordBatch]:
            for batch in it:
                ids = batch.column("id").to_numpy(zero_copy_only=False).astype(np.uint64)
                yield _gen_batch(ids, seed)

        yield from kernel(gen())

    base = spark.range(start, start + n_docs)
    return base.mapInArrow(fused, schema=schema)
