"""Semantic tests for feature-eng pack #92: mean pairwise cosine
(closed form), partition-function isotropy, JL distortion audit
(brute python replicas; cross-engine parity is proven by the
check_entry sweeps)."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd

from crawlfe.queries import (
    _ISO_DIRS,
    _JL_K,
    q_embedding_isotropy,
    q_jl_distortion,
    q_mean_pairwise_cosine,
)

SF = "/root/testdata/sf0.001"


def _q():
    e = pd.read_parquet(f"{SF}/embeddings.parquet").sort_values("vec_id")
    m = np.stack([np.asarray(v, dtype=np.float64) for v in e.embedding])
    return e.vec_id.to_numpy(), np.round(m * 1e6).astype(np.int64)


def _sign(prefix, a, b):
    return (
        int(hashlib.md5(f"{prefix}{a}:{b}".encode()).hexdigest()[:1], 16)
        % 2
    ) * 2 - 1


def test_mean_pairwise_cosine_brute(spark):
    out = q_mean_pairwise_cosine(spark, SF).toPandas().iloc[0]
    _, q = _q()
    n = len(q)
    nrm = np.sqrt((q.astype(np.float64) ** 2).sum(axis=1))
    u = np.round(1e6 * q / nrm[:, None]).astype(np.int64)
    sd = u.sum(axis=0)
    sum_sd2 = float((sd.astype(np.float64) ** 2).sum())
    sum_self = int((u.astype(object) ** 2).sum())
    mc = (sum_sd2 - sum_self) / (n * (n - 1)) / 1e12
    assert out.n == n
    assert out.sum_self == sum_self
    assert abs(out.sum_sd2 - round(sum_sd2, 1)) < 1.0
    assert abs(out.mean_cos - round(mc, 6)) < 1e-6
    # cosine mean must be a valid cosine
    assert -1 <= out.mean_cos <= 1
    # brute-force check on a small prefix agrees with the closed form
    un = (q[:20] / nrm[:20, None]).astype(np.float64)
    cos = un @ un.T
    brute = (cos.sum() - np.trace(cos)) / (20 * 19)
    full_un = (q / nrm[:, None]).astype(np.float64)
    cos_f = full_un @ full_un.T
    brute_f = (cos_f.sum() - np.trace(cos_f)) / (n * (n - 1))
    assert abs(brute_f - mc) < 1e-4  # quantization error bound


def test_embedding_isotropy_brute(spark):
    out = q_embedding_isotropy(spark, SF).toPandas().iloc[0]
    _, q = _q()
    d = q.shape[1]
    zs = []
    for k in range(1, _ISO_DIRS + 1):
        s = np.array([_sign("iso", k, dim) for dim in range(d)])
        dots = (q * s).sum(axis=1)
        zs.append(float(np.exp(dots / (1e6 * 8.0)).sum()))
    assert out.n_dirs == _ISO_DIRS
    assert abs(out.z_min - round(min(zs), 4)) < 1e-2
    assert abs(out.z_max - round(max(zs), 4)) < 1e-2
    assert abs(out.isotropy - round(min(zs) / max(zs), 6)) < 1e-6
    assert 0 < out.isotropy <= 1


def test_jl_distortion_brute(spark):
    out = q_jl_distortion(spark, SF).toPandas().iloc[0]
    vec_ids, q = _q()
    d = q.shape[1]
    smat = np.array(
        [
            [_sign("jl", j, dim) for dim in range(d)]
            for j in range(1, _JL_K + 1)
        ]
    )
    y = q @ smat.T  # (n, k) exact ints
    rs = []
    for i in range(len(q) - 1):
        d2o = int(((q[i] - q[i + 1]) ** 2).sum())
        d2p = int(((y[i] - y[i + 1]) ** 2).sum())
        rs.append(d2p / _JL_K / d2o)
    assert out.n_pairs == len(rs)
    assert abs(out.min_distortion - round(min(rs), 6)) < 1e-6
    assert abs(out.mean_distortion - round(sum(rs) / len(rs), 6)) < 1e-5
    assert abs(out.max_distortion - round(max(rs), 6)) < 1e-6
    # sign-JL is unbiased: the mean ratio should hover near 1
    assert 0.5 < out.mean_distortion < 2.0
