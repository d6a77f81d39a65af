"""Deterministic scale-tier generator for the r5 scaling-exponent study
(VERDICT.md r4 next-round item #1).

Generates the full 10-table star schema with the SAME schemas, value
ranges, and cardinality-scaling rules as the driver's /root/testdata
tiers (measured in-repo from sf0.01 vs sf0.1: every table scales ~x10
per decade except embeddings, x4 per decade, and the calendar — 30 days
of 2024-01 — and region/nation, which are fixed), so every registry key
runs unmodified on a generated dir.  Values are REGENERATED from
numpy PCG64(seed), not copied: the study measures each key at TWO tiers
produced by THIS generator (e.g. --sf 0.1 and --sf 1.0) so the
runtime-vs-rows exponent is generator-consistent and the driver's data
is never touched.

Usage: python scripts/gen_tier.py --sf 1.0 --out .scratch/gsf1 [--seed 42]
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# sf0.1 baseline cardinalities (measured from the driver tier)
BASE = {
    "events": 100_000, "users": 1_500, "documents": 5_000,
    "embeddings": 2_000, "lineitem_orders": 150_000, "customer": 15_000,
    "part": 20_000, "supplier": 1_000,
}

EPOCH_2024 = np.datetime64("2024-01-01T00:00:00", "us").astype("int64")
DAYS30_US = 30 * 86_400_000_000
EPOCH_1995 = np.datetime64("1995-01-01", "us").astype("int64")
ORD_SPAN_US = (np.datetime64("2001-08-01", "us").astype("int64") - EPOCH_1995)

VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "row",
    "the", "agg", "key", "query", "a", "scan", "batch", "dup",
]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.41, 0.15, 0.15, 0.15, 0.14]
EVENT_TYPES = ["view", "click", "signup", "purchase", "error"]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
MKTSEG = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
OPRIO = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["LARGE", "STANDARD", "MEDIUM", "ECONOMY", "SMALL", "PROMO"]
ADJ = ["large", "hot", "blue", "old", "cold", "new", "dark", "light"]
NOUN = ["ring", "bolt", "plate", "gear", "screw", "wheel", "pin", "cap"]


def ts_col(us: np.ndarray) -> pa.Array:
    return pa.array(us, type=pa.timestamp("us"))


def write(out: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(out, f"{name}.parquet"))
    print(f"  {name}: {table.num_rows} rows")


def gen(sf: float, out: str, seed: int) -> None:
    os.makedirs(out, exist_ok=True)
    ratio = sf / 0.1
    rng = np.random.default_rng(seed)

    # region / nation (fixed dims)
    write(out, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))
    write(out, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))

    # events: uniform ts over 30 days, sorted, sequential event_id
    n_ev = int(BASE["events"] * ratio)
    n_users = int(BASE["users"] * ratio)
    us = np.sort(rng.integers(0, DAYS30_US, n_ev)) + EPOCH_2024
    write(out, "events", pa.table({
        "event_id": pa.array(np.arange(n_ev), pa.int64()),
        "ts": ts_col(us),
        "user_id": pa.array(rng.integers(0, n_users, n_ev), pa.int64()),
        "event_type": pa.array(rng.choice(EVENT_TYPES, n_ev)),
        "value": np.round(rng.exponential(50.0, n_ev), 2),
        "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, n_ev)],
    }))

    # documents: Heaps-law vocabulary, ~0.2% injected exact duplicates.
    # The driver fixture uses a FIXED 31-word vocab at every tier; held
    # fixed while docs grow 100x, every pair of documents collides with
    # every other (simhash buckets saturate, token groupBys have 31
    # keys for 28M rows) — an adversarial density stress no real corpus
    # exhibits. Real text follows Heaps' law V ~ K n^0.5, so the
    # extrapolation tiers grow a Zipf-weighted tail vocabulary with the
    # corpus: 31 head words keep ~85% of token mass (driver-like), a
    # sqrt-scaled tail carries the rest.
    n_doc = int(BASE["documents"] * ratio)
    tail_n = max(100, int(40 * np.sqrt(n_doc)))
    tail = np.array([f"w{i:05d}" for i in range(tail_n)])
    # Zipf-ish tail weights (1/rank), normalized
    tail_p = 1.0 / np.arange(1, tail_n + 1)
    tail_p /= tail_p.sum()
    vocab = np.array(VOCAB)
    n_words = rng.integers(8, 108, n_doc)
    texts = []
    for k in n_words:
        n_tail = int(rng.binomial(k, 0.15))
        words = np.concatenate([
            vocab[rng.integers(0, len(vocab), k - n_tail)],
            rng.choice(tail, n_tail, p=tail_p),
        ])
        rng.shuffle(words)
        texts.append(" ".join(words))
    n_dup = max(1, n_doc // 600)
    dup_dst = rng.integers(0, n_doc, n_dup)
    dup_src = rng.integers(0, n_doc, n_dup)
    for d, s in zip(dup_dst, dup_src):
        texts[d] = texts[s]
    write(out, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_doc), pa.int64()),
        "text": texts,
        "lang": pa.array(rng.choice(LANGS, n_doc, p=LANG_P)),
        "source": pa.array([f"src{i}" for i in rng.integers(0, 20, n_doc)]),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    # embeddings: unit-norm float32[64]; x4 per x10 of sf
    n_emb = int(round(BASE["embeddings"] * 4 ** np.log10(max(ratio, 1e-9))))
    mat = rng.standard_normal((n_emb, 64)).astype(np.float32)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    write(out, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_emb), pa.int64()),
        "embedding": pa.array(list(mat), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n_emb), pa.int32()),
    }))

    # customer / supplier / part
    n_cust = int(BASE["customer"] * ratio)
    write(out, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": pa.array(rng.choice(MKTSEG, n_cust)),
    }))
    n_supp = int(BASE["supplier"] * ratio)
    write(out, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2),
    }))
    n_part = int(BASE["part"] * ratio)
    pk = np.arange(n_part)
    write(out, "part", pa.table({
        "p_partkey": pa.array(pk, pa.int64()),
        "p_name": [
            f"{ADJ[a]} {NOUN[b]}"
            for a, b in zip(rng.integers(0, 8, n_part),
                            rng.integers(0, 8, n_part))
        ],
        "p_brand": [f"Brand#{i}" for i in rng.integers(0, 25, n_part)],
        "p_type": pa.array(rng.choice(PTYPES, n_part)),
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(900.0 + (pk % 1000) / 10.0, 2),
    }))

    # orders + lineitem (~4.07 lines/order, ship = order + 1..95 days)
    n_ord = int(BASE["lineitem_orders"] * ratio)
    odate_us = (
        rng.integers(0, ORD_SPAN_US // 86_400_000_000, n_ord)
        * 86_400_000_000 + EPOCH_1995
    )
    write(out, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": pa.array(rng.choice(["O", "P", "F"], n_ord)),
        "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
        "o_orderdate": ts_col(odate_us),
        "o_orderpriority": pa.array(rng.choice(OPRIO, n_ord)),
    }))
    nlines = 1 + np.minimum(rng.poisson(3.07, n_ord), 16)
    lo = np.repeat(np.arange(n_ord), nlines)
    n_li = len(lo)
    lnum = np.concatenate([np.arange(1, k + 1) for k in nlines])
    ship_us = (
        np.repeat(odate_us, nlines)
        + rng.integers(1, 96, n_li) * 86_400_000_000
    )
    write(out, "lineitem", pa.table({
        "l_orderkey": pa.array(lo, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(lnum, pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105000, n_li), 2),
        "l_discount": rng.integers(0, 11, n_li) / 100.0,
        "l_tax": rng.integers(0, 9, n_li) / 100.0,
        "l_returnflag": pa.array(rng.choice(["A", "N", "R"], n_li)),
        "l_linestatus": pa.array(rng.choice(["O", "F"], n_li)),
        "l_shipdate": ts_col(ship_us),
    }))

    meta = {"sf": sf, "seed": seed, "generator": "scripts/gen_tier.py"}
    with open(os.path.join(out, "TIER.json"), "w") as f:
        json.dump(meta, f)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--out", required=True)
    ap.add_argument("--seed", type=int, default=42)
    a = ap.parse_args()
    print(f"generating sf={a.sf} -> {a.out}")
    gen(a.sf, a.out, a.seed)
