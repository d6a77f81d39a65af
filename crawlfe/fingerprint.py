"""Document fingerprinting: winnowing over a token rolling hash.

Standard winnowing (Schleimer/Wilkerson/Aiken, SIGMOD 2003 — public
algorithm): hash every k-token shingle, slide a window of w hashes,
keep the minimum of each window (rightmost on ties), dedupe. The
surviving hash set is the document fingerprint; shared fingerprints
between documents indicate copied passages.

Pure numpy kernel (Arrow-batch friendly, no per-row Python at the Spark
level) + the same algorithm is exercised by the pytest parity test via
``fingerprint_oracle`` (plain-python reimplementation).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

K_TOKENS = 4  # shingle size (tokens)
WINDOW = 5  # winnowing window (hashes)

FINGERPRINT_SCHEMA = "doc_id long, n_fp int, fp_xor long, fp_min long"


def _shingle_hashes(tokens: list[str]) -> np.ndarray:
    n = len(tokens) - K_TOKENS + 1
    if n <= 0:
        # short doc: one shingle of everything
        h = hashlib.blake2b(
            " ".join(tokens).encode(), digest_size=8
        ).digest()
        return np.array([int.from_bytes(h, "big")], dtype=np.uint64)
    return np.array(
        [
            int.from_bytes(
                hashlib.blake2b(
                    " ".join(tokens[i : i + K_TOKENS]).encode(),
                    digest_size=8,
                ).digest(),
                "big",
            )
            for i in range(n)
        ],
        dtype=np.uint64,
    )


def winnow(hashes: np.ndarray, w: int = WINDOW) -> np.ndarray:
    """Distinct selected hashes (sorted). Rightmost-min per window."""
    if len(hashes) <= w:
        return np.unique(hashes.min(keepdims=True))
    windows = np.lib.stride_tricks.sliding_window_view(hashes, w)
    # rightmost argmin: reverse, argmin, map back
    rev = windows[:, ::-1]
    idx = (w - 1) - rev.argmin(axis=1)
    picked = windows[np.arange(len(windows)), idx]
    return np.unique(picked)


def fingerprint_oracle(text: str) -> set[int]:
    """Plain-python reference for the pytest parity test."""
    tokens = text.split()
    hs = _shingle_hashes(tokens)
    if len(hs) <= WINDOW:
        return {int(hs.min())}
    out = set()
    for i in range(len(hs) - WINDOW + 1):
        win = hs[i : i + WINDOW]
        m = win.min()
        # rightmost occurrence of the min
        j = max(k for k in range(WINDOW) if win[k] == m)
        out.add(int(win[j]))
    return out


def _fp_iter(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        n_fp, fp_xor, fp_min = [], [], []
        for text in pdf["text"]:
            sel = winnow(_shingle_hashes((text or "").split()))
            n_fp.append(len(sel))
            fp_xor.append(
                int(np.bitwise_xor.reduce(sel) & np.uint64(2**63 - 1))
            )
            fp_min.append(int(sel.min() & np.uint64(2**63 - 1)))
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].to_numpy(),
                "n_fp": n_fp,
                "fp_xor": fp_xor,
                "fp_min": fp_min,
            }
        )


def doc_fingerprints(docs: DataFrame) -> DataFrame:
    """documents(doc_id, text) -> winnowing fingerprint summary row."""
    return docs.select("doc_id", "text").mapInPandas(
        _fp_iter, schema=FINGERPRINT_SCHEMA
    )
