"""TTL retention, per tier.

IoTDB semantics (reference ``SET TTL`` grammar IoTDBSqlParser.g4:310-312;
write-path check DataRegion.java:866-872, file-level expiry
DataRegion.java:1623-1637): rows older than now-ttl are rejected at ingest
and expired storage is dropped wholesale.

Spark expression: (a) an ingest-time filter, (b) a per-tier partition drop —
retention rewrites only the manifest-visible partition set, realized here as
``filter(p_day >= cutoff_day)`` + snapshot rewrite; with Iceberg this is a
metadata-only ``DELETE WHERE p_day < cutoff``. Coarser tiers get longer
TTLs (the whole point of multi-tier downsampling: raw ages out fast,
rollups live long)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..sources.warehouse import US_PER_DAY, Warehouse


def ingest_ttl_filter(df: DataFrame, now_us: int, ttl_us: int, ts_col: str = "max_ts") -> DataFrame:
    """Reject points/chunks older than the write-path TTL."""
    return df.filter(F.col(ts_col) >= F.lit(now_us - ttl_us))


def apply_retention(
    wh: Warehouse,
    spark,
    table: str,
    now_us: int,
    ttl_us: int,
    partition_col: str = "p_day",
) -> dict:
    """Drop expired partitions of a tier table; returns lineage summary."""
    df = wh.read(spark, table)
    cutoff_day = (now_us - ttl_us) // US_PER_DAY
    kept = df.filter(F.col(partition_col) >= F.lit(cutoff_day))
    n_before = df.count()
    n_after = kept.count()
    if n_after < n_before:
        wh.write(kept, table, partition_by=(partition_col,),
                 watermark_us=wh.watermark(table), op=f"retention<{cutoff_day}")
    return {"table": table, "cutoff_day": int(cutoff_day),
            "rows_before": n_before, "rows_after": n_after}
