"""Driver contract for the spark-graft builder (PySpark target).

``entry``   — flagship: tokens → seriesize → flush (compressed-domain
              sort + encode) → tier rollup cascade, on sf0.001-scale input.
``queries`` — every implemented operator from SURVEY.md §2 plus the
              training-data curation family (64 entries; `time_joins` and
              `gapfill_fill_modes` are tagged unions of 3 variants each,
              so the operator count is higher).
``oracle_sql`` — exact DuckDB twins for ALL 64 entries (incl. the
              anchored variation window via recursive CTE, MinHash/SimHash
              on md5-portable hashes, the tokens pipeline via a
              splitmix64-in-SQL corpus regeneration, the compression-
              metrics rollup whose oracle recomputes encoded plane sizes
              in closed form from the codec's class widths, and both
              approximate-ANN paths — the LSH hyperplanes are splitmix64
              Box–Muller draws regenerated in SQL, and the IVF quantizer
              is a portable-md5-sampled seed set + one Lloyd step the
              oracle replays).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001-scale synthetic tokens; returns the tier-2
    (1-minute) continuous aggregate table."""
    from sorting_compressed_time_series_spark.queries import tokens_pipeline_tiers

    return tokens_pipeline_tiers(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from sorting_compressed_time_series_spark.queries import SPARK_QUERIES

    return dict(SPARK_QUERIES)


def oracle_sql() -> dict[str, str]:
    from sorting_compressed_time_series_spark.queries import ORACLES

    return dict(ORACLES)
