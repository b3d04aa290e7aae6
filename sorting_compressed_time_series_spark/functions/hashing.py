"""Deterministic counter-based hashing (splitmix64) used for synthetic data
generation and seriesization.  Counter-based means every value is a pure
function of (seed, index) — identical output at any partitioning or
parallelism level, which is what makes the N-vs-4N scaling run's outputs
byte-comparable. splitmix64 is the public-domain mixer from Steele et al.,
"Fast Splittable Pseudorandom Number Generators" (OOPSLA 2014).
"""

from __future__ import annotations

import numpy as np

_U = np.uint64


def splitmix64(x: np.ndarray) -> np.ndarray:
    z = x.astype(np.uint64, copy=True)
    z += _U(0x9E3779B97F4A7C15)
    z = (z ^ (z >> _U(30))) * _U(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> _U(27))) * _U(0x94D049BB133111EB)
    return z ^ (z >> _U(31))


def hash2(a: np.ndarray, b: np.ndarray | int, seed: int = 0) -> np.ndarray:
    """Mix two counters and a seed into one uint64 stream."""
    a = np.asarray(a, dtype=np.uint64)
    bb = np.asarray(b, dtype=np.uint64)
    return splitmix64(splitmix64(a ^ _U(seed * 0x9E3779B97F4A7C15 & 0xFFFFFFFFFFFFFFFF)) ^ bb)


def uniform_int(h: np.ndarray, lo: int, hi: int) -> np.ndarray:
    """Map hashes to integers in [lo, hi] (inclusive), small-bias modulo."""
    span = np.uint64(hi - lo + 1)
    return (h % span).astype(np.int64) + lo
