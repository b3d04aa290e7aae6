"""spark-tsrollup: a PySpark-native time-series rollup + downsample + retention engine.

From-scratch re-expression (NOT a port) of the capabilities of the Compressed-Sort
research fork of Apache IoTDB (liuzhiheng20/Sorting-compressed-time-series,
read-only snapshot at /root/reference). The reference's novel contribution —
sorting time series in the *compressed domain* (patch a few boundary delta codes
and rotate byte ranges instead of decode→sort→re-encode) — is realized here as
vectorized numpy kernels driven from Arrow-batched PySpark UDFs
(``mapInArrow`` / ``applyInPandas``), with all relational work (windows,
aggregation, joins, retention) expressed as native DataFrame/SQL so Catalyst
and Tungsten own the physical plan.

Layout
------
- ``codecs``     : numpy codec kernels (byte-aligned delta/varint, bit-packed
                   delta-of-delta, Gorilla XOR) + the chunk blob format.
- ``operators``  : compressed-domain sort, page merge, rollup tiers, gap-fill,
                   window variants, dedup / similarity / text analysis.
- ``sources``    : parquet-backed warehouse (manifest + atomic commit),
                   deterministic synthetic input generator, seriesization.
- ``functions``  : small Spark-side helpers (aggregate aliases, hashing).
- ``plans``      : end-to-end pipeline jobs + checkpoint-resumable promotion.
- ``streaming``  : Structured Streaming front-end for the same rollups.
"""

__version__ = "0.1.0"
