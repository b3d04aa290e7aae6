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


def test_streaming_dedup_exact_across_batches(spark, tmp_path):
    """dropDuplicatesWithinWatermark-based ingest dedup: a duplicate text
    arriving in a LATER micro-batch (same content key held in the state
    store) is dropped; fresh texts survive. Survivors == batch exact-dedup
    group count over the landed corpus."""
    from sorting_compressed_time_series_spark.operators.dedup import exact_dedup
    from sorting_compressed_time_series_spark.streaming.stream_rollup import (
        run_stream_to_memory,
        streaming_dedup_exact,
    )

    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .limit(200)
    )
    base = docs.withColumn(
        "ts", F.timestamp_micros(F.lit(1_700_000_000_000_000) + F.col("doc_id"))
    )
    # batch 2: 100 exact duplicates (whitespace-noised, same normalized
    # text) + 50 genuinely new docs, all 1s later
    dup = (
        base.filter(F.col("doc_id") % 2 == 0)
        .select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"),
            # spaces only: Spark's trim() strips ' ' but not tabs, so a
            # trailing tab would normalize to a trailing space != original
            F.concat(F.lit("  "), F.col("text"), F.lit("  ")).alias("text"),
            F.timestamp_micros(F.unix_micros("ts") + 1_000_000).alias("ts"),
        )
    )
    fresh = base.filter(F.col("doc_id") % 4 == 1).select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"),
        F.concat(F.lit("unique suffix "), F.col("doc_id").cast("string"), F.lit(" "),
                 F.col("text")).alias("text"),
        F.timestamp_micros(F.unix_micros("ts") + 1_000_000).alias("ts"),
    )
    src_dir = tmp_path / "dd"
    src_dir.mkdir()
    base.coalesce(1).write.parquet(str(src_dir / "a=1"))
    dup.unionByName(fresh).coalesce(1).write.parquet(str(src_dir / "a=2"))
    src = (
        spark.readStream.schema(base.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src_dir) + "/a=*")
    )
    got = run_stream_to_memory(
        spark, None, agg=streaming_dedup_exact(src, watermark="1 hour"),
        query_name="sdedup",
    ).toPandas()

    n_base, n_fresh = base.count(), fresh.count()
    # every base doc survives (first arrival), every cross-batch duplicate
    # is dropped, every fresh doc survives
    assert len(got) == n_base + n_fresh, (len(got), n_base, n_fresh)
    assert set(got.doc_id) == set(
        r.doc_id for r in base.select("doc_id").collect()
    ) | set(r.doc_id for r in fresh.select("doc_id").collect())
    # survivor count == batch dedup group count over the landed corpus
    landed = base.unionByName(dup).unionByName(fresh)
    assert exact_dedup(landed).count() == len(got)
    # pass-through schema: original columns unchanged, no key columns leak
    assert set(got.columns) == {"doc_id", "text", "ts"}


def test_streaming_pack_nosplit_matches_batch_across_batches(spark, tmp_path):
    """Ingest-time no-split packing: two forced micro-batches
    (maxFilesPerTrigger=1, files split by doc_id range so arrival order ==
    doc_id order) must carry the open sequence's fill state across the
    trigger boundary; the LAST emission per (grp, seq) must equal the
    batch operator exactly — including the sequence that straddles the
    boundary."""
    import numpy as np

    from sorting_compressed_time_series_spark.operators.packing import (
        pack_greedy_nosplit,
    )
    from sorting_compressed_time_series_spark.streaming.stream_rollup import (
        streaming_pack_nosplit,
    )

    L = 16
    rng = np.random.default_rng(11)
    rows = [
        (f"g{i % 3}d{i:04d}", [1] * int(rng.choice([3, 5, L, L + 4])), "web")
        for i in range(60)
    ]
    df = spark.createDataFrame(
        [(d, t, len(t), s) for d, t, s in rows],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    src_dir = tmp_path / "toks"
    src_dir.mkdir()
    # two files split mid-group so open sequences straddle the trigger
    df.filter(F.col("doc_id") < "g1d0030").coalesce(1).write.parquet(
        str(src_dir / "part1"))
    df.filter(F.col("doc_id") >= "g1d0030").coalesce(1).write.parquet(
        str(src_dir / "part2"))
    src = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src_dir) + "/part*")
    )
    from sorting_compressed_time_series_spark.streaming.stream_rollup import (
        run_stream_to_memory,
    )

    got = run_stream_to_memory(
        spark, None, agg=streaming_pack_nosplit(src, L, id_prefix_len=2),
        query_name="packns", output_mode="update",
    ).toPandas()
    # update mode: keep the LAST emission per (grp, seq) — running rows
    # grow monotonically in n_docs, so sorting by it makes .last() final
    got = (
        got.sort_values(["grp", "seq_in_grp", "n_docs"])
        .groupby(["grp", "seq_in_grp"]).last().sort_index()
    )
    want = (
        pack_greedy_nosplit(df, L, id_prefix_len=2)
        .toPandas()
        .groupby(["grp", "seq_in_grp"]).last().sort_index()
    )
    assert len(got) == len(want)
    for col in ["n_docs", "tok_sum", "pad", "first_doc", "last_doc", "oversize"]:
        assert (got[col] == want[col]).all(), col
