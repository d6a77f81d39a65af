"""Deterministic synthetic Common-Crawl-style pages table.

Schema (BASELINE.json:15 input_hint):
    url string, warc_ts timestamp, html binary, text string, lang string

Every value is a pure function of (seed, url_id, snapshot_k) via
crawlfe.hashing.h64 — zero RNG state — so the distributed Spark generator
(mapInPandas over spark.range(n_urls)) and the single-node pandas oracle
produce byte-identical tables regardless of partitioning (SURVEY.md §7
hard-part #5; task brief: "synthesise it deterministically at small scale").

Structure knobs (FIXTURES.md §A):
  * one hot domain owning ~hot_frac of all rows (skew/salting tests)
  * 1..max_snapshots snapshots per url, strictly increasing warc_ts with
    gaps drawn from {minutes, hours, days} buckets (sessionization signal)
  * html with nested tags, entities, multi-byte UTF-8, whitespace noise
    (byte-identical extractor workout); ``text`` column is the frozen
    extractor's output of ``html`` (doubles as golden value)
  * lang stable per url except a hash-chosen subset flipping mid-history

Role-model in the reference: the dataset manifest + audio corpus the
reference pipeline loops over (ref: acoss/utils.py dataset CSVs and
acoss/extractors.py::batch_feature_extractor input contract [R]).
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime, timezone

import numpy as np
import pandas as pd

from .extract import extract_text
from .hashing import h64

BASE_TS = datetime(2024, 1, 1, tzinfo=timezone.utc)
_BASE_US = int(BASE_TS.timestamp() * 1_000_000)

_LANGS = ("en", "de", "fr", "pt", "es", "zz")

# Fixed 256-word vocabulary, built once from syllables (pure function).
_SYLLABLES = (
    "ba be bi bo bu da de di do du ka ke ki ko ku la le li lo lu "
    "ma me mi mo mu na ne ni no nu ra re ri ro ru sa se si so su "
    "ta te ti to tu va ve vi vo vu za ze zi zo zu"
).split()
_VOCAB = tuple(
    "".join(
        _SYLLABLES[h64(7, w, j) % len(_SYLLABLES)]
        for j in range(2 + h64(7, w) % 3)
    )
    for w in range(250)
) + ("café", "naïve", "über", "señor", "中文页", "données")


@dataclass(frozen=True)
class SynthConfig:
    seed: int = 42
    n_urls: int = 200
    n_domains: int = 50
    hot_frac: float = 0.30
    max_snapshots: int = 12
    # fraction of urls whose html never changes across snapshots (dedup)
    static_frac: float = 0.20
    # fraction of urls whose lang flips mid-history
    lang_flip_frac: float = 0.10
    # fraction of body tags decorated with realistic attributes
    # (class/id/href/data-*, quoted and bare values). Default 0.0 keeps
    # every pre-r4 fixture byte-identical; the attribute-bearing variant
    # exists to measure the fast extractor's hit rate on real-web-shaped
    # HTML (VERDICT r3 next-round #4 — real pages are attribute-dense).
    attr_frac: float = 0.0


def _domain(cfg: SynthConfig, i: int) -> str:
    h = h64(cfg.seed, i, 1)
    if (h % 10_000) < int(cfg.hot_frac * 10_000):
        return "hot.example.com"
    return f"d{1 + h % (cfg.n_domains - 1)}.example.com"


def _n_snapshots(cfg: SynthConfig, i: int) -> int:
    return 1 + h64(cfg.seed, i, 2) % cfg.max_snapshots


def _gap_seconds(cfg: SynthConfig, i: int, k: int) -> int:
    g = h64(cfg.seed, i, 3, k)
    bucket = g % 3
    r = (g >> 8) & 0xFFFF
    if bucket == 0:  # minutes
        return (5 + r % 51) * 60
    if bucket == 1:  # hours
        return (1 + r % 23) * 3600
    return (1 + r % 20) * 86400  # days


def _sentence(cfg: SynthConfig, i: int, rev: int, s: int) -> str:
    n_words = 4 + h64(cfg.seed, i, 5, rev, s) % 9
    words = [
        _VOCAB[h64(cfg.seed, i, 6, rev, s, w) % len(_VOCAB)]
        for w in range(n_words)
    ]
    return " ".join(words)


def _attr(cfg: SynthConfig, i: int, rev: int, s: int, slot: int) -> str:
    """Deterministic realistic attribute string (leading space) or ''."""
    if cfg.attr_frac <= 0.0:
        return ""
    a = h64(cfg.seed, i, 12, rev, s, slot)
    if (a % 10_000) >= int(cfg.attr_frac * 10_000):
        return ""
    kind = (a >> 16) % 6
    v = a % 997
    if kind == 0:
        return f' class="c{v % 37}"'
    if kind == 1:
        return f" id='e{v}'"
    if kind == 2:  # bare value with '/' — html.parser folds it greedily
        return f" href=/page/{v}?r={rev}&amp;s={s}"
    if kind == 3:
        return f' data-rank="{v}" class=w{v % 11}'
    if kind == 4:  # boolean attribute, no value
        return " hidden"
    return f' style="margin:{v % 9}px" title="t {v}"'


def _html(cfg: SynthConfig, i: int, k: int) -> bytes:
    static = (h64(cfg.seed, i, 7) % 10_000) < int(cfg.static_frac * 10_000)
    rev = 0 if static else k
    h = h64(cfg.seed, i, 8, rev)
    n_sent = 2 + h % 6
    parts = [
        f"<html><head><title>T{h % 100_000} — {_sentence(cfg, i, rev, 99)}"
        f"</title>\n<script>var x = {h % 7};</script>"
        f"<style>.c{h % 5} {{color:red}}</style></head>\n<body"
        f"{_attr(cfg, i, rev, 98, 0)}>"
    ]
    for s in range(n_sent):
        sent = _sentence(cfg, i, rev, s)
        mode = h64(cfg.seed, i, 9, rev, s) % 4
        a0 = _attr(cfg, i, rev, s, 1)
        a1 = _attr(cfg, i, rev, s, 2)
        if mode == 0:
            parts.append(f"<p{a0}>  {sent} &amp; more\t</p>")
        elif mode == 1:
            parts.append(f"<div{a0}><p><b{a1}>{sent}</b> — tail {s}</p></div>")
        elif mode == 2:
            parts.append(f"<li{a0}>{sent}</li>\n<li{a1}>item&nbsp;{s}</li>")
        else:
            parts.append(f"<pre{a0}>{sent}\n  indented {s}</pre>")
    parts.append(f"<p>rev {rev} of page {i}</p></body></html>")
    return "\n".join(parts).encode("utf-8")


def _lang(cfg: SynthConfig, i: int, k: int, n_snaps: int) -> str:
    base = _LANGS[h64(cfg.seed, i, 10) % len(_LANGS)]
    flips = (h64(cfg.seed, i, 11) % 10_000) < int(cfg.lang_flip_frac * 10_000)
    if flips and k >= max(1, n_snaps // 2):
        return _LANGS[(h64(cfg.seed, i, 10) + 1) % len(_LANGS)]
    return base


def gen_pages_pdf(cfg: SynthConfig, url_lo: int, url_hi: int) -> pd.DataFrame:
    """Pages for url ids in [url_lo, url_hi) — the shared pure generator."""
    urls, tss, htmls, texts, langs = [], [], [], [], []
    for i in range(url_lo, url_hi):
        dom = _domain(cfg, i)
        url = f"https://{dom}/p/{i}"
        n_snaps = _n_snapshots(cfg, i)
        ts_us = _BASE_US + (h64(cfg.seed, i, 4) % (30 * 86400)) * 1_000_000
        for k in range(n_snaps):
            if k > 0:
                ts_us += _gap_seconds(cfg, i, k) * 1_000_000
            html = _html(cfg, i, k)
            urls.append(url)
            tss.append(ts_us)
            htmls.append(html)
            texts.append(extract_text(html))
            langs.append(_lang(cfg, i, k, n_snaps))
    return pd.DataFrame(
        {
            "url": pd.Series(urls, dtype="object"),
            "warc_ts": pd.Series(
                np.array(tss, dtype="datetime64[us]"), dtype="datetime64[us]"
            ),
            "html": pd.Series(htmls, dtype="object"),
            "text": pd.Series(texts, dtype="object"),
            "lang": pd.Series(langs, dtype="object"),
        }
    )


def gen_pages_pdf_slice(
    cfg: SynthConfig, url_lo: int, url_hi: int, k_lo: int, k_hi: int
) -> pd.DataFrame:
    """Pages for url ids in [url_lo, url_hi) restricted to snapshot
    indices k in [k_lo, k_hi) — the microbatch slice of the streaming
    source (crawlfe/pagestream.py). Values are BYTE-IDENTICAL to the
    matching rows of ``gen_pages_pdf`` (same pure functions, same ts
    accumulation); the union of slices over k = the batch table."""
    urls, tss, htmls, texts, langs, ks = [], [], [], [], [], []
    for i in range(url_lo, url_hi):
        n_snaps = _n_snapshots(cfg, i)
        hi = min(k_hi, n_snaps)
        if k_lo >= hi:
            continue
        url = f"https://{_domain(cfg, i)}/p/{i}"
        ts_us = _BASE_US + (h64(cfg.seed, i, 4) % (30 * 86400)) * 1_000_000
        for k in range(hi):
            if k > 0:
                ts_us += _gap_seconds(cfg, i, k) * 1_000_000
            if k < k_lo:
                continue
            html = _html(cfg, i, k)
            urls.append(url)
            tss.append(ts_us)
            htmls.append(html)
            texts.append(extract_text(html))
            langs.append(_lang(cfg, i, k, n_snaps))
            ks.append(k)
    return pd.DataFrame(
        {
            "url": pd.Series(urls, dtype="object"),
            "warc_ts": pd.Series(
                np.array(tss, dtype="datetime64[us]"), dtype="datetime64[us]"
            ),
            "html": pd.Series(htmls, dtype="object"),
            "text": pd.Series(texts, dtype="object"),
            "lang": pd.Series(langs, dtype="object"),
            "snapshot_k": pd.Series(ks, dtype="int32"),
        }
    )


PAGES_SCHEMA = (
    "url string, warc_ts timestamp_ntz, html binary, text string, lang string"
)


def synth_pages(
    spark,
    cfg: SynthConfig,
    n_partitions: int | None = None,
    url_lo: int = 0,
    url_hi: int | None = None,
):
    """Distributed deterministic pages DataFrame.

    spark.range over url ids -> mapInPandas running the SAME pure generator
    as the oracle. Partitioning never affects values; at 10^12-page scale
    this is the same shape as a parallel WARC scan: each task materializes
    only its url-range slice.
    """
    if n_partitions is None:
        n_partitions = max(2, spark.sparkContext.defaultParallelism)

    def gen(iterator):
        for pdf in iterator:
            ids = pdf["id"].to_numpy()
            if len(ids):
                yield gen_pages_pdf(cfg, int(ids.min()), int(ids.max()) + 1)

    if url_hi is None:
        url_hi = cfg.n_urls
    rng = spark.range(url_lo, url_hi, 1, n_partitions)
    return rng.mapInPandas(gen, schema=PAGES_SCHEMA)


def query_grid_pdf(cfg: SynthConfig, pages: pd.DataFrame) -> pd.DataFrame:
    """Deterministic as-of probe grid (FIXTURES.md §A): for each url,
    probe timestamps at / between / before / after its snapshots."""
    rows = []
    for url, grp in pages.groupby("url", sort=True):
        ts = grp["warc_ts"].sort_values().to_numpy()
        first, last = ts[0], ts[-1]
        rows.append((url, first))  # exact match
        rows.append((url, first - np.timedelta64(3600, "s")))  # before-first
        rows.append((url, last + np.timedelta64(7200, "s")))  # after-last
        if len(ts) > 1:
            mid = ts[0] + (ts[1] - ts[0]) // 2
            rows.append((url, mid))  # between snapshots
    out = pd.DataFrame(rows, columns=["url", "join_ts"])
    out["join_ts"] = out["join_ts"].astype("datetime64[us]")
    return out.sort_values(["url", "join_ts"], ignore_index=True)
