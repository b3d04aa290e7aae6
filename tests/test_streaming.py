"""Streaming tier1 == batch tier1 on the same bounded input (events parquet
driven through readStream), modulo watermark-final windows."""

import numpy as np

from pyspark.sql import functions as F

from sorting_compressed_time_series_spark.streaming.stream_rollup import (
    run_stream_to_memory,
)

SF_DIR = "/root/testdata/sf0.001"
WINDOW_US = 3_600_000_000


def test_streaming_matches_batch(spark, tmp_path):
    import shutil

    src_dir = tmp_path / "events_stream"
    src_dir.mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", src_dir / "events.parquet")
    batch = spark.read.parquet(f"{SF_DIR}/events.parquet")
    schema = batch.schema
    src = (
        spark.readStream.schema(schema)
        .parquet(str(src_dir))
        .select(
            F.col("user_id").cast("string").alias("doc_id"),
            F.col("ts").cast("timestamp").alias("ts"),
            F.floor(F.col("value") * 1_000_000).cast("bigint").alias("value"),
        )
    )
    got = run_stream_to_memory(spark, src, WINDOW_US).toPandas()

    want = (
        batch.select(
            F.col("user_id").cast("string").alias("doc_id"),
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
            F.floor(F.col("value") * 1_000_000).cast("bigint").alias("v"),
        )
        .groupBy(
            "doc_id",
            ((F.col("ts_us") / WINDOW_US).cast("bigint") * WINDOW_US).alias("window_start"),
        )
        .agg(
            F.count("*").alias("cnt"),
            F.sum("v").alias("sum_v"),
            F.min("v").alias("min_v"),
            F.max("v").alias("max_v"),
        )
        .toPandas()
    )
    g = got.set_index(["doc_id", "window_start"]).sort_index()
    w = want.set_index(["doc_id", "window_start"]).sort_index()
    # append mode emits only watermark-closed windows; every emitted window
    # must match the batch result exactly, and coverage must be substantial
    assert len(g) > 0.5 * len(w)
    joined = g.join(w, lsuffix="_s", rsuffix="_b", how="inner")
    assert len(joined) == len(g)
    for col in ["cnt", "sum_v", "min_v", "max_v"]:
        assert np.array_equal(joined[f"{col}_s"].to_numpy(), joined[f"{col}_b"].to_numpy()), col
