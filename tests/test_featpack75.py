"""Semantic tests for feature-eng pack #75: read-split bin packing,
online/offline feature skew, prefix-truncation dedup (brute python
replicas; cross-engine parity is proven by the check_entry sweeps)."""

from __future__ import annotations

import math

import pandas as pd

from crawlfe.queries import (
    _PREFIX_BLOCK_CHARS,
    _SKEW_CUTOFF_DAY,
    _SPLIT_BUDGET_CENTS,
    q_dedup_prefix,
    q_online_offline_skew,
    q_scan_split_plan,
)

SF = "/root/testdata/sf0.001"


def _events():
    e = pd.read_parquet(f"{SF}/events.parquet")
    return e.assign(
        cents=lambda x: round(x.value * 100).astype("int64"),
        day=lambda x: x.ts.dt.day,
        hr=lambda x: x.ts.dt.hour,
    )


def test_scan_split_plan_brute(spark):
    out = q_scan_split_plan(spark, SF).toPandas().set_index("day")
    e = _events()
    files = (
        e.groupby(["day", "hr"])
        .cents.sum()
        .rename("bytes")
        .reset_index()
        .sort_values(["day", "hr"])
    )
    for day, g in files.groupby("day"):
        cum = 0
        splits = {}
        for _, row in g.iterrows():
            sid = cum // _SPLIT_BUDGET_CENTS
            splits.setdefault(sid, 0)
            splits[sid] += row.bytes
            cum += row.bytes
        r = out.loc[day]
        assert r.n_files == len(g)
        assert r.n_splits == len(splits)
        assert r.max_split_bytes == max(splits.values())
        assert r.total_bytes == g.bytes.sum()
    # the budget bounds every split except for single oversized files
    assert (out.n_splits >= 1).all()


def test_online_offline_skew_brute(spark):
    out = q_online_offline_skew(spark, SF).toPandas().iloc[0]
    e = _events().sort_values(
        ["ts", "event_id"], ascending=[False, False]
    )
    online = e.groupby("user_id").first().cents
    offline = (
        e[e.day <= _SKEW_CUTOFF_DAY].groupby("user_id").first().cents
    )
    both = pd.DataFrame({"on": online, "off": offline}).dropna()
    both["off"] = both["off"].astype("int64")
    n = len(both)
    assert out.n_users == n
    assert out.n_changed == int((both.on != both.off).sum())
    assert abs(
        out.mean_abs_diff
        - round((both.on - both.off).abs().sum() / (100.0 * n), 4)
    ) < 1e-9
    k = 5
    onb = both.on.map(lambda c: min(4, c // 2500)).value_counts()
    offb = both.off.map(lambda c: min(4, c // 2500)).value_counts()
    psi = 0.0
    for b in set(onb.index) | set(offb.index):
        po = (onb.get(b, 0) + 1) / (n + k)
        pf = (offb.get(b, 0) + 1) / (n + k)
        psi += (po - pf) * math.log(po / pf)
    assert abs(out.psi - round(psi, 6)) < 1e-6
    assert out.psi >= 0  # PSI is a nonneg divergence


def test_dedup_prefix_brute(spark):
    out = q_dedup_prefix(spark, SF).toPandas()
    d = pd.read_parquet(f"{SF}/documents.parquet")
    d = d[d.n_chars >= _PREFIX_BLOCK_CHARS]
    expect = set()
    by_blk = {}
    for _, r in d.iterrows():
        by_blk.setdefault(r.text[:_PREFIX_BLOCK_CHARS], []).append(r)
    for rows in by_blk.values():
        for a in rows:
            for b in rows:
                if a.n_chars < b.n_chars and b.text.startswith(a.text):
                    expect.add((a.doc_id, b.doc_id))
    got = set(zip(out.short_id, out.long_id))
    assert got == expect
    assert len(got) > 0  # the fixture genuinely contains truncation dupes
    for _, r in out.iterrows():
        assert r.short_chars < r.long_chars
