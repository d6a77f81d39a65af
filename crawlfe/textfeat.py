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

Version-contract scope (ADVICE r2): the ``FEAT_VERSION = 1`` feature
contract is defined over EXTRACTOR-CANONICAL text — the output of
``crawlfe.extract.extract_text`` (v1), whose only whitespace is ASCII
' ' / '\\n'. On such text the ASCII tokenizer (``ascii_tokens``) equals
``str.split()`` exactly. External callers feeding raw text containing
Unicode whitespace (e.g. U+00A0) get tokenization per the ASCII rule;
that behavior is part of v1, not a drift — any change to the tokenizer
class requires a FEAT_VERSION bump.
"""

from __future__ import annotations

import hashlib

import numpy as np

from .hashing import _WS_LUT, ascii_tokens, splitmix64_np

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
    """DCT-II of log1p token-length histogram; first CEPSTRUM_DIM coeffs.

    Tokens are ASCII-whitespace-delimited (crawlfe.hashing.ascii_tokens
    — the extractor emits only ASCII ' '/'\\n' whitespace, so this
    equals str.split() on real pipeline text); lengths are CHARACTERS.
    """
    lengths = np.array(
        [min(len(t), _HIST_BINS) for t in ascii_tokens(text)],
        dtype=np.int64,
    )
    hist = np.zeros(_HIST_BINS, dtype=np.float64)
    if lengths.size:
        np.add.at(hist, lengths - 1, 1.0)
    # same fixed ascending-bin accumulation as the batch kernel (bit-
    # exact twin; a dot product would reassociate the 32-term sum)
    lh = np.log1p(hist)
    out = np.zeros(CEPSTRUM_DIM, dtype=np.float64)
    for j in range(_HIST_BINS):
        out += lh[j] * _DCT[:, j]
    return out


def featurize_one(text: str) -> np.ndarray:
    """Full fixed-dim feature vector for one text (FEAT_DIM doubles).
    Scalar reference path — the hot path is ``featurize_batch``."""
    return np.concatenate([ngram_profile(text), cepstrum(text)])


def featurize_batch(texts, chunk_bytes: int = 1 << 15) -> np.ndarray:
    """(n, FEAT_DIM) float64 matrix for an iterable of texts.

    Batch-vectorized: one numpy pass over the concatenated UTF-8 bytes
    of the whole Arrow batch computes every document's hashed-trigram
    profile AND token-length cepstrum — no per-row Python (the round-1
    version looped featurize_one per row at ~100 µs/row; this is the
    headline featurize hot path). Chunked at 32 KB so every working
    array stays L2-cache-resident: measured on this box, 32 KB chunks
    are 1.5x faster single-core than 2 MB chunks AND scale linearly to
    8 pinned cores (437k rows/s) where 2 MB chunks go DRAM-bandwidth-
    bound (206k rows/s) — at 1000 executors the same cache-vs-DRAM
    trade decides whether the featurize stage scales. Bit-parity with
    the scalar twins is pytest-enforced (tests/test_feature_parity.py).
    """
    enc = [
        (t if t is not None else "").encode("utf-8") for t in texts
    ]
    n = len(enc)
    out = np.zeros((n, FEAT_DIM), dtype=np.float64)
    lo = 0
    while lo < n:
        hi, size = lo, 0
        while hi < n and (size == 0 or size < chunk_bytes):
            size += len(enc[hi]) + 1
            hi += 1
        _featurize_chunk(enc[lo:hi], out[lo:hi])
        lo = hi
    return out


def _featurize_chunk(enc: list[bytes], out: np.ndarray) -> None:
    m = len(enc)
    lens = np.fromiter(
        (len(e) for e in enc), dtype=np.int64, count=m
    )
    # single separator space after each doc: gives the token pass clean
    # boundaries; the trigram pass masks separator-crossing trigrams
    blob = b" ".join(enc) + b" "
    b = np.frombuffer(blob, dtype=np.uint8)
    nb = b.size
    doc_of = np.repeat(np.arange(m, dtype=np.int64), lens + 1)
    sep_pos = np.cumsum(lens + 1) - 1
    doc_of[sep_pos] = -1

    # --- hashed char-trigram profile (identical math to ngram_profile)
    if nb >= 3:
        codes = (
            (b[:-2].astype(np.uint64) << np.uint64(16))
            | (b[1:-1].astype(np.uint64) << np.uint64(8))
            | b[2:].astype(np.uint64)
        )
        d0, d2 = doc_of[: nb - 2], doc_of[2:]
        valid = (d0 == d2) & (d0 >= 0)
        buckets = (
            splitmix64_np(codes[valid] ^ np.uint64(_NGRAM_SEED))
            % np.uint64(PROFILE_DIM)
        ).astype(np.int64)
        hist = np.bincount(
            d0[valid] * PROFILE_DIM + buckets,
            minlength=m * PROFILE_DIM,
        ).reshape(m, PROFILE_DIM).astype(np.float64)
        totals = hist.sum(axis=1, keepdims=True)
        np.divide(
            hist, totals, out=out[:, :PROFILE_DIM],
            where=totals > 0,
        )

    # --- token-length cepstrum (identical math to cepstrum())
    ws = _WS_LUT[b]
    nw = ~ws
    prev_ws = np.empty(nb, dtype=bool)
    prev_ws[0] = True
    np.copyto(prev_ws[1:], ws[:-1])
    next_ws = np.empty(nb, dtype=bool)
    next_ws[-1] = True
    np.copyto(next_ws[:-1], ws[1:])
    s_idx = np.flatnonzero(nw & prev_ws)
    e_idx = np.flatnonzero(nw & next_ws)
    hist2 = np.zeros((m, _HIST_BINS), dtype=np.float64)
    if s_idx.size:
        # char length = non-continuation-byte count (UTF-8)
        cont = np.concatenate(
            ([0], np.cumsum(((b & np.uint8(0xC0)) == np.uint8(0x80))
                            .astype(np.int64)))
        )
        char_len = (e_idx - s_idx + 1) - (cont[e_idx + 1] - cont[s_idx])
        char_len = np.minimum(char_len, _HIST_BINS)
        tok_doc = doc_of[s_idx]
        hist2 = np.bincount(
            tok_doc * _HIST_BINS + (char_len - 1),
            minlength=m * _HIST_BINS,
        ).reshape(m, _HIST_BINS).astype(np.float64)
    # fixed-order accumulation, NOT a BLAS matmul: dgemm's blocking
    # reassociates the 32-term sums differently per batch shape, which
    # breaks the bit-identical-across-partitionings invariant (features
    # must be row-local — SURVEY.md §7 hard-part #3). 32 vectorized
    # fused steps in ascending bin order are shape-independent.
    lh = np.log1p(hist2)
    cep = out[:, PROFILE_DIM:]
    for j in range(_HIST_BINS):
        cep += lh[:, j : j + 1] * _DCT[:, j]


def sha256_hex(text: str) -> str:
    return hashlib.sha256(text.encode("utf-8")).hexdigest()
