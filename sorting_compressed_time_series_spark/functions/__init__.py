"""Spark-side helper functions: deterministic hashing, aggregate aliases."""
