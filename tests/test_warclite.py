"""Tests for the warclite container + Spark 4 Python DataSource
(crawlfe/warclite.py) and the pack #14 ingest queries: container
round-trip without Spark, file-granular partition planning, scan
parity through the registered source, Variant extraction, XML scan."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from crawlfe import warclite
from crawlfe.queries import q_scan_warclite, q_scan_xml, q_variant_json

SF = "/root/testdata/sf0.001"


def _records():
    return [
        {
            "url": f"https://ex.org/{i}",
            "warc_ts_us": 10**15 + i,
            "lang": ["en", "de"][i % 2],
            "payload": bytes([i % 251]) * (i + 1),
        }
        for i in range(7)
    ]


def test_container_roundtrip_pure_python(tmp_path):
    p = os.path.join(tmp_path, "a.wlr")
    recs = _records()
    warclite.write_warclite(p, recs)
    back = list(warclite.read_warclite_file(p))
    assert len(back) == len(recs)
    for r, (url, ts, lang, payload) in zip(recs, back):
        assert (url, ts, lang, payload) == (
            r["url"], r["warc_ts_us"], r["lang"], r["payload"]
        )


def test_container_rejects_corruption(tmp_path):
    p = os.path.join(tmp_path, "bad.wlr")
    warclite.write_warclite(p, _records()[:2])
    data = open(p, "rb").read()
    open(p, "wb").write(b"XXXX" + data[4:])
    with pytest.raises(ValueError, match="bad magic"):
        list(warclite.read_warclite_file(p))
    # truncated payload
    open(p, "wb").write(data[:-3])
    with pytest.raises(ValueError, match="truncated"):
        list(warclite.read_warclite_file(p))


def test_datasource_scan_and_partitions(spark, tmp_path):
    # 3 container files -> the source must plan 3 partitions and the
    # scanned rows must equal the written records
    want = []
    for f in range(3):
        recs = [
            {
                "url": f"https://ex.org/{f}/{i}",
                "warc_ts_us": 10**15 + f * 100 + i,
                "lang": "en",
                "payload": f"doc {f}-{i}".encode(),
            }
            for i in range(5)
        ]
        warclite.write_warclite(
            os.path.join(tmp_path, f"part-{f}.wlr"), recs
        )
        want += recs
    warclite.register(spark)
    df = spark.read.format("warclite").load(str(tmp_path))
    assert df.rdd.getNumPartitions() == 3
    got = df.toPandas().sort_values("url", ignore_index=True)
    wf = pd.DataFrame(
        [
            (r["url"], r["warc_ts_us"], r["lang"], r["payload"])
            for r in want
        ],
        columns=["url", "warc_ts_us", "lang", "payload"],
    ).sort_values("url", ignore_index=True)
    assert (got["url"] == wf["url"]).all()
    assert (got["warc_ts_us"] == wf["warc_ts_us"]).all()
    assert (
        got["payload"].map(bytes) == wf["payload"].map(bytes)
    ).all()


def test_scan_warclite_query_matches_documents(spark):
    out = q_scan_warclite(spark, SF).toPandas().set_index("lang")
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    g = docs.groupby("lang")
    assert set(out.index) == set(g.groups)
    for lang, grp in g:
        assert out.loc[lang, "n_records"] == len(grp)
        assert out.loc[lang, "n_bytes"] == int(
            grp["text"].str.encode("utf-8").str.len().sum()
        )
        assert out.loc[lang, "min_ts_us"] == 10**15 + grp["doc_id"].min() * 10**6
        assert out.loc[lang, "max_ts_us"] == 10**15 + grp["doc_id"].max() * 10**6


def test_variant_json_brute(spark):
    out = q_variant_json(spark, SF).toPandas().set_index("event_type")
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev["k"] = ev["props"].str.extract(r'"k": (\d+)')[0].astype(int)
    g = ev.groupby("event_type")["k"]
    for et in g.groups:
        assert out.loc[et, "n"] == g.count()[et]
        assert out.loc[et, "sum_k"] == g.sum()[et]
        assert out.loc[et, "max_k"] == g.max()[et]
        assert out.loc[et, "avg_k"] == round(g.sum()[et] / g.count()[et], 4)


def test_scan_xml_query_matches_nation(spark):
    out = q_scan_xml(spark, SF).toPandas().set_index("n_regionkey")
    n = pd.read_parquet(f"{SF}/nation.parquet")
    g = n.groupby("n_regionkey")
    assert set(out.index) == set(g.groups)
    for rk, grp in g:
        assert out.loc[rk, "n_nations"] == len(grp)
        assert out.loc[rk, "key_sum"] == grp["n_nationkey"].sum()
        assert out.loc[rk, "last_nation"] == grp["n_name"].max()


def test_datasource_writer_roundtrip_two_phase(spark, tmp_path):
    """df.write.format('warclite'): staged writes become visible only
    at driver commit (part-*.wlr + _MANIFEST.json, no .tmp leftovers),
    and the read-back equals what was written."""
    import json

    out = str(tmp_path / "out")
    pdf = pd.DataFrame(
        {
            "url": [f"https://w.example/{i}" for i in range(20)],
            "warc_ts_us": [10**15 + i for i in range(20)],
            "lang": [["en", "de", "fr"][i % 3] for i in range(20)],
            "payload": [f"payload {i}".encode() for i in range(20)],
        }
    )
    warclite.register(spark)
    df = spark.createDataFrame(pdf)
    # Python data sources accept only Append/Overwrite save modes
    df.repartition(4).write.format("warclite").mode("append").save(out)

    names = sorted(os.listdir(out))
    assert "_MANIFEST.json" in names
    assert not any(n.endswith(".tmp") for n in names)
    assert "_staging" not in names
    manifest = json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert manifest["n_records"] == 20

    back = (
        spark.read.format("warclite").load(out)
        .toPandas()
        .sort_values("url", ignore_index=True)
    )
    want = pdf.sort_values("url", ignore_index=True)
    assert (back["url"] == want["url"]).all()
    assert (back["warc_ts_us"] == want["warc_ts_us"]).all()
    assert (back["lang"] == want["lang"]).all()
    assert (
        back["payload"].map(bytes) == want["payload"].map(bytes)
    ).all()

    # overwrite mode replaces, append mode errors on column mismatch
    df.limit(5).repartition(1).write.format("warclite").mode(
        "overwrite"
    ).save(out)
    assert spark.read.format("warclite").load(out).count() == 5


def test_datasource_lang_filter_pushdown(spark, tmp_path):
    """lang = 'x' is evaluated at record-decode time inside the source
    (pushFilters); result parity with a post-scan filter, and the
    pushed filter no longer appears as a Spark-side Filter node."""
    p = str(tmp_path)
    recs = [
        {
            "url": f"https://ex.org/{i}",
            "warc_ts_us": 10**15 + i,
            "lang": ["en", "de"][i % 2],
            "payload": b"x" * (i + 1),
        }
        for i in range(10)
    ]
    warclite.write_warclite(os.path.join(p, "a.wlr"), recs)
    warclite.register(spark)
    df = spark.read.format("warclite").load(p)
    got = df.where(df.lang == "en").toPandas()
    assert len(got) == 5
    assert (got["lang"] == "en").all()
    # unsupported predicates still work (evaluated post-scan by Spark)
    got2 = df.where((df.lang == "en") & (df.warc_ts_us % 4 == 0)).toPandas()
    assert len(got2) == 3  # en rows are i in {0,2,4,6,8}; ts % 4 == 0 keeps i in {0,4,8}
    # reader-level check: pushFilters keeps only the lang EqualTo
    from pyspark.sql.datasource import EqualTo, GreaterThan

    r = warclite.WarcLiteReader({"path": p})
    remaining = list(
        r.pushFilters(
            [EqualTo(("lang",), "en"), GreaterThan(("warc_ts_us",), 5)]
        )
    )
    assert len(remaining) == 1 and isinstance(remaining[0], GreaterThan)
    import pyarrow as pa

    batches = [b for part in r.partitions() for b in r.read(part)]
    tbl = pa.Table.from_batches(batches)
    assert tbl.num_rows == 5
    assert all(v == "en" for v in tbl.column("lang").to_pylist())
