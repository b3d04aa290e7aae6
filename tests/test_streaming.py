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


def test_streaming_session_window_matches_batch(spark, tmp_path):
    """Native session_window streaming == the batch islands construction
    for every watermark-finalized session."""
    import shutil

    from sorting_compressed_time_series_spark.operators.windows import session_windows
    from sorting_compressed_time_series_spark.streaming.stream_rollup import (
        run_stream_to_memory,
        streaming_session_tier,
    )

    gap_us = 1_800_000_000
    src_dir = tmp_path / "ev"
    src_dir.mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", src_dir / "events.parquet")
    batch = spark.read.parquet(f"{SF_DIR}/events.parquet")
    src = (
        spark.readStream.schema(batch.schema)
        .parquet(str(src_dir))
        .select(
            F.col("user_id").cast("string").alias("doc_id"),
            F.col("ts").cast("timestamp").alias("ts"),
            F.floor(F.col("value") * 1_000_000).cast("bigint").alias("value"),
        )
    )
    got = run_stream_to_memory(
        spark, None, agg=streaming_session_tier(src, gap_us), query_name="sess"
    ).toPandas()

    b = batch.select(
        F.col("user_id").cast("string").alias("doc_id"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        F.floor(F.col("value") * 1_000_000).cast("bigint").alias("v"),
    )
    w = session_windows(b, "doc_id", "ts_us", gap_us)
    want = (
        w.groupBy("doc_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("v").alias("sum_v"),
            F.min("ts_us").alias("start_ts"),
        )
        .toPandas()
    )
    g = got.set_index(["doc_id", "start_ts"]).sort_index()
    wt = want.set_index(["doc_id", "start_ts"]).sort_index()
    # append mode emits only watermark-closed sessions; each must match
    assert len(g) > 0.5 * len(wt)
    joined = g.join(wt, lsuffix="_s", rsuffix="_b", how="inner")
    assert len(joined) == len(g)
    assert (joined["n_events_s"] == joined["n_events_b"]).all()
    assert (joined["sum_v_s"] == joined["sum_v_b"]).all()


def test_streaming_variation_delta_stateful_across_batches(spark, tmp_path):
    """applyInPandasWithState variation windows: two forced micro-batches
    (maxFilesPerTrigger=1, files split by time) must carry (anchor, gid,
    cnt) state across the trigger boundary and reproduce the batch
    operator's windows exactly."""
    import numpy as np

    from sorting_compressed_time_series_spark.operators.windows import (
        variation_windows_delta,
    )
    from sorting_compressed_time_series_spark.streaming.stream_rollup import (
        run_stream_to_memory,
        streaming_variation_delta,
    )

    delta = 100.0
    ev = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select(
            F.col("user_id").cast("string").alias("doc_id"),
            F.col("ts").cast("timestamp").alias("ts"),
            F.col("value").cast("double").alias("value"),
        )
    )
    mid = ev.agg(F.expr("percentile_approx(unix_micros(ts), 0.5)")).collect()[0][0]
    src_dir = tmp_path / "vd"
    src_dir.mkdir()
    # file names order the batches: early half first, then late half
    ev.filter(F.unix_micros("ts") <= mid).coalesce(1).write.parquet(str(src_dir / "a=1"))
    ev.filter(F.unix_micros("ts") > mid).coalesce(1).write.parquet(str(src_dir / "a=2"))
    src = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src_dir) + "/a=*")
    )
    got = run_stream_to_memory(
        spark, None, agg=streaming_variation_delta(src, delta),
        query_name="vard", output_mode="update"
    ).toPandas()
    # update mode: last emission per (doc, gid) is the final count
    final = (
        got.sort_values(["doc_id", "variation_group", "cnt"])
        .groupby(["doc_id", "variation_group"]).last().reset_index()
    )
    want = (
        variation_windows_delta(
            ev.select("doc_id", F.unix_micros("ts").alias("ts_us"), "value"),
            "doc_id", "ts_us", "value", delta=delta)
        .groupBy("doc_id", "variation_group")
        .agg(F.count("*").alias("cnt"))
        .toPandas()
    )
    f = final.set_index(["doc_id", "variation_group"])["cnt"].sort_index()
    w = want.set_index(["doc_id", "variation_group"])["cnt"].sort_index()
    assert len(f) == len(w), (len(f), len(w))
    assert np.array_equal(f.to_numpy(), w.to_numpy())
