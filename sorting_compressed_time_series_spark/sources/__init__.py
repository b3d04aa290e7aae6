"""Sources & storage: deterministic synthetic input, seriesization, and the
parquet-backed warehouse with manifest/checkpoint semantics."""
