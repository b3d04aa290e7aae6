"""Independent oracle for the anchored variation window (the one gate
entry whose semantics are order-recursive and therefore rows-only at the
DuckDB gate): a plain-Python per-point reference scan."""

import numpy as np

from pyspark.sql import functions as F

from sorting_compressed_time_series_spark.operators.windows import (
    variation_windows_delta,
)

SF_DIR = "/root/testdata/sf0.001"


def _reference_scan(vals, delta):
    """Textbook per-point anchored scan: window breaks when the value
    leaves [anchor - delta, anchor + delta]; the breaker anchors the next
    window (reference VariationWindow semantics)."""
    groups = []
    g = -1
    anchor = None
    for v in vals:
        if anchor is None or abs(v - anchor) > delta:
            g += 1
            anchor = v
        groups.append(g)
    return groups


def test_variation_delta_matches_reference_scan(spark):
    delta = 100.0
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        F.col("user_id").cast("string").alias("doc_id"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        F.col("value").cast("double").alias("value"),
    )
    got = (
        variation_windows_delta(ev, "doc_id", "ts_us", "value", delta=delta)
        .toPandas()
        .sort_values(["doc_id", "ts_us"], kind="stable")
    )
    for doc_id, grp in got.groupby("doc_id"):
        want = _reference_scan(grp.value.to_numpy(), delta)
        # group ids are per-series ordinals in both
        assert grp.variation_group.tolist() == want, f"doc {doc_id}"
    assert got.variation_group.max() > 0  # scan actually breaks windows


def test_variation_delta_block_scan_edge_sizes(spark):
    """Block-vectorized scan vs reference at sizes that straddle the 4096
    block boundary and with breaks exactly at block edges."""
    rng = np.random.default_rng(5)
    n = 4096 * 2 + 7
    vals = np.cumsum(rng.normal(0, 30, n))
    rows = [("d", int(i), float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "doc_id string, ts_us long, value double")
    got = (
        variation_windows_delta(df, "doc_id", "ts_us", "value", delta=50.0)
        .toPandas()
        .sort_values("ts_us")
    )
    assert got.variation_group.tolist() == _reference_scan(vals, 50.0)
