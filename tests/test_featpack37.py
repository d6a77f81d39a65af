"""Semantic tests for feature-eng pack #37: pinball-loss forecast
eval, variance-time Hurst, running records, turning-points test,
char-bigram conditional entropy, and centroid silhouette (brute
python replicas; cross-engine parity is proven by the check_entry
sweeps)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pandas as pd

from crawlfe.queries import (
    q_char_bigram_entropy,
    q_hurst_vt,
    q_pinball_loss,
    q_running_records,
    q_silhouette_lite,
    q_turning_points,
)

SF = "/root/testdata/sf0.001"


def _r6(x: float) -> float:
    return float(
        Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP)
    )


def _events():
    e = pd.read_parquet(f"{SF}/events.parquet")
    return e.assign(
        us=lambda x: x.ts.astype("datetime64[us]").astype("int64"),
        cents=lambda x: round(x.value * 100).astype("int64"),
    )


def test_pinball_loss_brute(spark):
    out = q_pinball_loss(spark, SF).toPandas().set_index("event_type")
    e = _events()
    cut = (int(e.us.min()) + int(e.us.max())) // 2
    tr, te = e[e.us < cut], e[e.us >= cut]
    seen = 0
    for et in e.event_type.unique():
        t = tr[tr.event_type == et]
        s = te[te.event_type == et]
        if len(t) == 0 or len(s) == 0:
            assert et not in out.index
            continue
        seen += 1
        q = float(np.percentile(t.cents, 90, method="linear"))
        loss = [
            0.9 * (c - q) if c >= q else 0.1 * (q - c) for c in s.cents
        ]
        cov = sum(c >= q for c in s.cents) / len(s)
        row = out.loc[et]
        assert row.n_train == len(t) and row.n_test == len(s)
        assert abs(row.q90 - _r6(q / 100.0)) < 2e-6
        assert abs(row.pinball - _r6(sum(loss) / len(loss) / 100.0)) < 2e-6
        assert abs(row.test_coverage - _r6(cov)) < 1e-12
        # a well-calibrated p90 should cover ~10% of test points
        assert 0.0 <= row.test_coverage <= 1.0
    assert len(out) == seen


def test_hurst_vt_brute(spark):
    out = q_hurst_vt(spark, SF).toPandas().set_index("event_type")
    e = _events()
    e = e.assign(day=e.ts.dt.date)
    for et, g in e.groupby("event_type"):
        daily = g.groupby("day").size().sort_index()
        cs = daily.tolist()
        n = len(cs)
        v1 = (n * sum(c * c for c in cs) - sum(cs) ** 2) / (n * n)
        blocks = [
            sum(cs[i : i + 4]) for i in range(0, n - n % 4, 4)
        ]
        m = len(blocks)
        row = out.loc[et]
        assert row.n_days == n and row.n_blocks == m
        assert abs(row.var_1d - _r6(v1)) < 1e-9
        v4 = (m * sum(b * b for b in blocks) - sum(blocks) ** 2) / (m * m)
        assert abs(row.var_4d - _r6(v4)) < 1e-9
        if v1 > 0 and v4 > 0:
            h = math.log(v4 / v1) / (2 * math.log(4))
            assert abs(row.hurst - _r6(h)) < 2e-6
        else:
            assert pd.isna(row.hurst)
    assert len(out) == e.event_type.nunique()


def test_running_records_brute(spark):
    out = q_running_records(spark, SF).toPandas().set_index("user_id")
    e = _events().sort_values(["user_id", "us", "event_id"])
    for uid, g in e.groupby("user_id"):
        best = None
        rec = 0
        for c in g.cents:
            if best is None or c > best:
                rec += 1
                best = c
        n = len(g)
        hn = sum(1.0 / k for k in range(1, n + 1))
        row = out.loc[uid]
        assert row.n_events == n and row.n_records == rec
        assert abs(row.h_n - _r6(hn)) < 2e-6
        assert abs(row.record_ratio - _r6(rec / hn)) < 2e-6
        assert 1 <= row.n_records <= n
    assert len(out) == e.user_id.nunique()


def test_turning_points_brute(spark):
    out = q_turning_points(spark, SF).toPandas().set_index("user_id")
    e = _events().sort_values(["user_id", "us", "event_id"])
    seen = 0
    for uid, g in e.groupby("user_id"):
        xs = g.cents.tolist()
        n = len(xs)
        if n < 3:
            assert uid not in out.index
            continue
        seen += 1
        t = sum(
            (xs[i] - xs[i - 1]) * (xs[i] - xs[i + 1]) > 0
            for i in range(1, n - 1)
        )
        exp = 2.0 * (n - 2) / 3.0
        z = (t - exp) / math.sqrt((16.0 * n - 29.0) / 90.0)
        row = out.loc[uid]
        assert row.n_events == n and row.t_points == t
        assert abs(row.expected_t - _r6(exp)) < 1e-12
        assert abs(row.z - _r6(z)) < 2e-6
        assert 0 <= t <= n - 2
    assert len(out) == seen


def test_char_bigram_entropy_brute(spark):
    out = (
        q_char_bigram_entropy(spark, SF).toPandas().set_index("source")
    )
    d = pd.read_parquet(f"{SF}/documents.parquet")
    cp = defaultdict(Counter)
    for src, txt in zip(d.source, d.text):
        low = txt.lower()
        for i in range(len(low) - 1):
            cp[src][low[i : i + 2]] += 1
    assert set(out.index) == set(cp)
    for src, cnt in cp.items():
        n = sum(cnt.values())
        plg = sum(c * math.log2(c) for c in cnt.values())
        cf = Counter()
        for pair, c in cnt.items():
            cf[pair[0]] += c
        flg = sum(c * math.log2(c) for c in cf.values())
        row = out.loc[src]
        assert row.n_bigrams == n
        assert row.vocab_bigrams == len(cnt)
        h_pair = math.log2(n) - plg / n
        h_cond = (flg - plg) / n
        assert abs(row.h_pair - _r6(h_pair)) < 2e-6
        assert abs(row.h_cond - _r6(h_cond)) < 2e-6
        # conditioning can only reduce entropy
        assert row.h_cond <= row.h_pair + 1e-9


def test_silhouette_lite_brute(spark):
    out = q_silhouette_lite(spark, SF).toPandas().set_index("label")
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    vecs = np.stack(emb.embedding.to_numpy()).astype(np.float64)
    labels = emb.label.to_numpy()
    uniq = np.unique(labels)
    cents = {l: vecs[labels == l].mean(axis=0) for l in uniq}
    a = np.zeros(len(vecs))
    b = np.zeros(len(vecs))
    sil = np.zeros(len(vecs))
    for i, (v, l) in enumerate(zip(vecs, labels)):
        a[i] = np.linalg.norm(v - cents[l])
        b[i] = min(
            np.linalg.norm(v - cents[o]) for o in uniq if o != l
        )
        m = max(a[i], b[i])
        sil[i] = (b[i] - a[i]) / m if m > 0 else 0.0
    assert set(out.index) == set(uniq.tolist())
    for l in uniq:
        mask = labels == l
        row = out.loc[l]
        assert row.n_vecs == int(mask.sum())
        assert abs(row.mean_intra - _r6(a[mask].mean())) < 2e-6
        assert abs(row.mean_nearest - _r6(b[mask].mean())) < 2e-6
        assert abs(row.mean_silhouette - _r6(sil[mask].mean())) < 2e-6
        # b >= 0 and nearest-other is at least as far as a on average
        # only for well-separated clusters; just sanity-bound sil
        assert -1.0 - 1e-9 <= row.mean_silhouette <= 1.0 + 1e-9
