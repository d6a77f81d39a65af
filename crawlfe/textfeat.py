"""Closed-form text featurizers — numpy, row-local, deterministic.

These are the engine's analog of the reference's per-entity spectral
features (SURVEY.md §2.A A5–A7):

  * ``ngram_profile``  — hashed char-3gram L1-normalized class profile
    (analog of the normalized pitch-class profile, ref:
    acoss/features.py::AudioFeatures.hpcp [R])
  * ``cepstrum``       — orthonormal DCT-II of the log token-length
    histogram, first 13 coefficients ("cepstrum of text", analog of ref:
    acoss/features.py::AudioFeatures.mfcc_htk [R])

The SAME functions run inside the Spark pandas UDFs and inside the pandas
oracle (crawlfe/oracle.py), which is what makes the allclose parity gate
(BASELINE.json:2) meaningful: parity failures indicate a non-determinism
bug (batch-order dependence, dtype drift), not an algorithm fork.

All functions are row-local: the feature of a row depends only on that
row's text, never on Arrow batch composition (SURVEY.md §7 hard-part #3).
"""

from __future__ import annotations

import hashlib

import numpy as np

from .hashing import splitmix64_np

PROFILE_DIM = 64
CEPSTRUM_DIM = 13
_HIST_BINS = 32  # token-length histogram bins (lengths 1..32, clipped)
FEAT_DIM = PROFILE_DIM + CEPSTRUM_DIM
FEAT_VERSION = 1

_NGRAM_SEED = 0xC0FFEE


def _dct2_matrix(n_out: int, n_in: int) -> np.ndarray:
    """Orthonormal DCT-II basis, rows = coefficients (float64)."""
    n = np.arange(n_in, dtype=np.float64)
    k = np.arange(n_out, dtype=np.float64)[:, None]
    mat = np.cos(np.pi * (n[None, :] + 0.5) * k / n_in)
    mat *= np.sqrt(2.0 / n_in)
    mat[0, :] *= 1.0 / np.sqrt(2.0)
    return mat


_DCT = _dct2_matrix(CEPSTRUM_DIM, _HIST_BINS)


def ngram_profile(text: str, dim: int = PROFILE_DIM) -> np.ndarray:
    """Hashed char-3gram histogram over UTF-8 bytes, L1-normalized."""
    b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    if b.size < 3:
        return np.zeros(dim, dtype=np.float64)
    codes = (
        b[:-2].astype(np.uint64) << np.uint64(16)
    ) | (
        b[1:-1].astype(np.uint64) << np.uint64(8)
    ) | b[2:].astype(np.uint64)
    buckets = splitmix64_np(codes ^ np.uint64(_NGRAM_SEED)) % np.uint64(dim)
    hist = np.bincount(buckets.astype(np.int64), minlength=dim).astype(np.float64)
    total = hist.sum()
    return hist / total if total > 0 else hist


def cepstrum(text: str) -> np.ndarray:
    """DCT-II of log1p token-length histogram; first CEPSTRUM_DIM coeffs."""
    lengths = np.array(
        [min(len(t), _HIST_BINS) for t in text.split()], dtype=np.int64
    )
    hist = np.zeros(_HIST_BINS, dtype=np.float64)
    if lengths.size:
        np.add.at(hist, lengths - 1, 1.0)
    return _DCT @ np.log1p(hist)


def featurize_one(text: str) -> np.ndarray:
    """Full fixed-dim feature vector for one text (FEAT_DIM doubles)."""
    return np.concatenate([ngram_profile(text), cepstrum(text)])


def featurize_batch(texts) -> np.ndarray:
    """(n, FEAT_DIM) float64 matrix for an iterable of texts."""
    out = np.empty((len(texts), FEAT_DIM), dtype=np.float64)
    for i, t in enumerate(texts):
        out[i] = featurize_one(t if t is not None else "")
    return out


def sha256_hex(text: str) -> str:
    return hashlib.sha256(text.encode("utf-8")).hexdigest()
