"""Bucketed feature store (the 100 TB co-located join story): writing
the features table bucketed+sorted by url lets every downstream
url-keyed stage — window features, the as-of payload re-join, per-url
aggregates — read pre-partitioned data with NO exchange. This test
pins the exchange-elimination property so a regression in conf or plan
shape is caught."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from crawlfe.features import featurize
from crawlfe.synth import SynthConfig, synth_pages


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    # external table: data in tmp, metadata in the session catalog
    # (spark.sql.warehouse.dir is static — cannot be set per-test)
    wh = str(tmp_path_factory.mktemp("warehouse"))
    feats = featurize(
        synth_pages(spark, SynthConfig(n_urls=150), n_partitions=4),
        use_html=True,
    )
    name = "features_bucketed_t"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    (
        feats.write.bucketBy(8, "url")
        .sortBy("url", "warc_ts")
        .option("path", f"{wh}/{name}")
        .saveAsTable(name)
    )
    yield spark.table(name)
    spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_aggregate_has_no_exchange(spark, bucketed):
    q = bucketed.groupBy("url").agg(
        F.count(F.lit(1)).alias("n"),
        F.max("warc_ts").alias("latest"),
    )
    plan = plan_of(q)
    assert "Exchange" not in plan, plan


def test_bucketed_self_join_has_no_exchange(spark, bucketed):
    a = bucketed.select("url", "warc_ts", "text_sha256").alias("a")
    b = bucketed.select("url", "warc_ts").alias("b")
    # force SMJ: at real scale neither side broadcasts, and broadcast
    # planning disables the bucketed scan we are asserting on
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = a.join(b, ["url", "warc_ts"])
        plan = plan_of(j)
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
    # co-partitioned bucketed scan on both sides: subset co-partition
    # match (requireAllClusterKeysForCoPartition=false) -> no shuffle
    assert "Exchange" not in plan, plan


def test_bucketed_results_match_unbucketed(spark, bucketed):
    feats = featurize(
        synth_pages(spark, SynthConfig(n_urls=150), n_partitions=4),
        use_html=True,
    )
    want = (
        feats.groupBy("url").agg(F.count(F.lit(1)).alias("n")).toPandas()
        .sort_values("url", ignore_index=True)
    )
    got = (
        bucketed.groupBy("url").agg(F.count(F.lit(1)).alias("n")).toPandas()
        .sort_values("url", ignore_index=True)
    )
    assert (got["url"] == want["url"]).all()
    assert (got["n"] == want["n"]).all()


def test_bucketed_window_needs_no_exchange(spark, bucketed):
    """lag/lead over url-partitioned windows on a bucketed-sorted scan:
    only a partition-local Sort, never an Exchange."""
    from pyspark.sql import Window

    w = Window.partitionBy("url").orderBy("warc_ts")
    q = bucketed.select(
        "url", "warc_ts", F.lag("warc_ts").over(w).alias("prev_ts")
    )
    plan = plan_of(q)
    assert "Exchange" not in plan, plan
    assert re.search(r"\bSort\b", plan)
