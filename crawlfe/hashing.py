"""Stable, pure, seedable hashing — the only "randomness" in crawlfe.

Every synthetic value and every hashed feature bucket is a pure function of
(seed, integer key) via splitmix64 (public-domain finalizer, Steele et al.,
"Fast Splittable Pseudorandom Number Generators", OOPSLA 2014). No RNG
state anywhere, so the distributed Spark generator and the single-node
pandas oracle produce identical bytes (SURVEY.md §7 hard-part #5).

Both a scalar-int and a numpy-vectorized uint64 implementation are given;
they are bit-identical.
"""

from __future__ import annotations

import numpy as np

_MASK = (1 << 64) - 1

_GAMMA = 0x9E3779B97F4A7C15
_M1 = 0xBF58476D1CE4E5B9
_M2 = 0x94D049BB133111EB


def splitmix64(x: int) -> int:
    """Scalar splitmix64 finalizer of a 64-bit integer."""
    x = (x + _GAMMA) & _MASK
    x = ((x ^ (x >> 30)) * _M1) & _MASK
    x = ((x ^ (x >> 27)) * _M2) & _MASK
    return x ^ (x >> 31)


def splitmix64_np(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 over a uint64 ndarray (bit-identical to scalar)."""
    x = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        x += np.uint64(_GAMMA)
        x ^= x >> np.uint64(30)
        x *= np.uint64(_M1)
        x ^= x >> np.uint64(27)
        x *= np.uint64(_M2)
        x ^= x >> np.uint64(31)
    return x


def h64(seed: int, *keys: int) -> int:
    """Stable scalar hash of (seed, keys...) -> uint64 int."""
    acc = splitmix64(seed & _MASK)
    for k in keys:
        acc = splitmix64((acc ^ (k & _MASK)) & _MASK)
    return acc


def h64_np(seed: int, *key_arrays: np.ndarray) -> np.ndarray:
    """Vectorized h64: each element i hashes (seed, a0[i], a1[i], ...)."""
    acc = np.full(
        key_arrays[0].shape, splitmix64(seed & _MASK), dtype=np.uint64
    )
    for arr in key_arrays:
        acc = splitmix64_np(acc ^ arr.astype(np.uint64))
    return acc


def fnv1a64_bytes_np(codes: np.ndarray) -> np.ndarray:
    """Not used for ngrams (see textfeat); kept for payload checks."""
    h = np.uint64(0xCBF29CE484222325)
    with np.errstate(over="ignore"):
        for i in range(codes.shape[-1]):
            h = (h ^ codes[..., i].astype(np.uint64)) * np.uint64(0x100000001B3)
    return h
