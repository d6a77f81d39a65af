"""Property-based bit-parity tests for the batch-vectorized hashing and
featurizing kernels: for ANY unicode input and ANY chunk size, the
vectorized path must equal the scalar spec exactly (the invariant the
minhash/simhash/fingerprint kernels and the featurizer rest on)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from crawlfe.hashing import (
    ascii_tokens,
    h64,
    shingle_hashes_batch,
    token_hash_scalar,
    token_hashes_batch,
)
from crawlfe.textfeat import featurize_batch, featurize_one

texts_st = st.lists(
    st.text(
        alphabet=st.characters(codec="utf-8"),
        max_size=120,
    ),
    min_size=0,
    max_size=12,
)
chunk_st = st.sampled_from([1, 7, 64, 1 << 15])


@settings(max_examples=120, deadline=None)
@given(texts=texts_st, chunk=chunk_st)
def test_token_hashes_batch_matches_scalar(texts, chunk):
    th, td = token_hashes_batch(texts, chunk_bytes=chunk)
    exp_h, exp_d = [], []
    for i, t in enumerate(texts):
        for tok in ascii_tokens(t):
            exp_h.append(token_hash_scalar(tok))
            exp_d.append(i)
    assert td.tolist() == exp_d
    assert th.tolist() == exp_h


@settings(max_examples=60, deadline=None)
@given(texts=texts_st, k=st.integers(min_value=1, max_value=5))
def test_shingle_hashes_batch_matches_scalar(texts, k):
    seed = 0xF00D
    th, td = token_hashes_batch(texts)
    sh, sd = shingle_hashes_batch(th, td, len(texts), k, seed)
    exp = []
    for i, t in enumerate(texts):
        toks = [token_hash_scalar(x) for x in ascii_tokens(t)]
        if len(toks) >= k:
            for j in range(len(toks) - k + 1):
                exp.append((i, h64(seed, *toks[j : j + k])))
        else:
            exp.append((i, h64(seed, *toks)))
    assert sorted(zip(sd.tolist(), sh.tolist())) == sorted(exp)
    # doc order preserved
    assert sd.tolist() == sorted(sd.tolist())


@settings(max_examples=60, deadline=None)
@given(texts=texts_st, chunk=chunk_st)
def test_featurize_batch_matches_scalar(texts, chunk):
    got = featurize_batch(texts, chunk_bytes=chunk)
    for i, t in enumerate(texts):
        assert np.array_equal(got[i], featurize_one(t or "")), i
