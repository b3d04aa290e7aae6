"""Structured Streaming front-end for the rollup engine."""
