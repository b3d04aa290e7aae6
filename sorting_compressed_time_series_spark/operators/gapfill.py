"""Gap-fill: FILL(PREVIOUS | LINEAR | constant) over a window spine.

IoTDB semantics (reference FillOperator / LinearFillOperator,
datanode/.../process/FillOperator.java, process/fill/*; grammar
``FILL '(' (LINEAR|PREVIOUS|constant) ')'`` IoTDBSqlParser.g4:757-759):
after aligning a series to tumbling windows, NULL cells are filled from
the previous non-null value, by linear interpolation between neighbors,
or with a constant.

Spark-first expression — all built-in, no UDFs:
- the spine is ``sequence(min_w, max_w, step)`` exploded per series
  (the reference's window iterator, AggrWindowIterator.java:30-33);
- PREVIOUS  = ``last(col, ignorenulls) OVER (... ROWS UNBOUNDED PRECEDING)``;
- LINEAR    = previous + next anchors via two mirrored windows, then one
  arithmetic expression;
- constant  = ``coalesce``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def window_spine(tier_df: DataFrame, window_us: int, key: str = "doc_id") -> DataFrame:
    """One row per (series, window) over each series' [min,max] span."""
    bounds = tier_df.groupBy(key).agg(
        F.min("window_start").alias("w0"), F.max("window_start").alias("w1")
    )
    return bounds.select(
        key,
        F.explode(F.sequence("w0", "w1", F.lit(window_us))).alias("window_start"),
    )


def gapfill(
    tier_df: DataFrame,
    window_us: int,
    value_col: str = "avg_v",
    mode: str = "previous",
    constant=None,
    key: str = "doc_id",
    max_gap_us: int | None = None,
) -> DataFrame:
    """Align ``tier_df`` (one row per present window) onto the full spine and
    fill missing windows' ``value_col``. Returns the spine with
    ``filled`` (+ ``was_missing`` marker)."""
    spine = window_spine(tier_df, window_us, key)
    joined = spine.join(tier_df.select(key, "window_start", value_col),
                        [key, "window_start"], "left")
    w_prev = W.partitionBy(key).orderBy("window_start").rowsBetween(W.unboundedPreceding, 0)
    col = F.col(value_col)
    if mode == "previous":
        filled = F.last(col, ignorenulls=True).over(w_prev)
        if max_gap_us is not None:
            # FILL(PREVIOUS, maxDuration): only fill within the gap bound
            last_ts = F.last(F.when(col.isNotNull(), F.col("window_start")),
                             ignorenulls=True).over(w_prev)
            filled = F.when(F.col("window_start") - last_ts <= max_gap_us, filled)
    elif mode == "linear":
        w_next = (W.partitionBy(key).orderBy("window_start")
                  .rowsBetween(0, W.unboundedFollowing))
        prev_v = F.last(col, ignorenulls=True).over(w_prev)
        prev_t = F.last(F.when(col.isNotNull(), F.col("window_start")),
                        ignorenulls=True).over(w_prev)
        next_v = F.first(col, ignorenulls=True).over(w_next)
        next_t = F.first(F.when(col.isNotNull(), F.col("window_start")),
                         ignorenulls=True).over(w_next)
        interp = prev_v + (next_v - prev_v) * (F.col("window_start") - prev_t) / (next_t - prev_t)
        # ends stay null when only one anchor exists (IoTDB linear fill
        # leaves leading/trailing nulls unfilled)
        filled = F.coalesce(col, F.when(prev_t.isNotNull() & next_t.isNotNull(), interp))
    elif mode == "constant":
        filled = F.coalesce(col, F.lit(constant))
    else:
        raise ValueError(f"unknown fill mode {mode}")
    return joined.select(
        key,
        "window_start",
        col.alias("raw_value"),
        filled.alias("filled"),
        col.isNull().alias("was_missing"),
    )
