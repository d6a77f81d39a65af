"""Window operator parity vs pandas oracles (SURVEY.md §5.2.2):
lag/lead, sessionize, session bounds, backfill, rolling, latest."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from crawlfe import windows as W
from crawlfe.oracle import (
    oracle_backfill,
    oracle_lag_lead,
    oracle_sessionize,
)
from crawlfe.synth import SynthConfig, gen_pages_pdf, synth_pages

CFG = SynthConfig(n_urls=100)


@pytest.fixture(scope="module")
def pages(spark):
    return synth_pages(spark, CFG).select("url", "warc_ts").cache()


@pytest.fixture(scope="module")
def pages_pdf():
    return gen_pages_pdf(CFG, 0, CFG.n_urls)[["url", "warc_ts"]]


def test_lag_lead(spark, pages, pages_pdf):
    got = (
        W.with_lag_lead(pages, "url", "warc_ts")
        .toPandas()
        .sort_values(["url", "warc_ts"], ignore_index=True)
    )
    want = oracle_lag_lead(pages_pdf, "url", "warc_ts")
    for c in ("lag_gap_s", "lead_gap_s"):
        a, b = got[c].to_numpy(float), want[c].to_numpy(float)
        assert ((a == b) | (np.isnan(a) & np.isnan(b))).all(), c
    assert (got["snapshot_idx"] == want["snapshot_idx"]).all()


@pytest.mark.parametrize("gap", [3600, 86400])
def test_sessionize(spark, pages, pages_pdf, gap):
    got = (
        W.sessionize(pages, "url", "warc_ts", gap)
        .toPandas()
        .sort_values(["url", "warc_ts"], ignore_index=True)
    )
    want = oracle_sessionize(pages_pdf, "url", "warc_ts", gap)
    assert (got["session_id"].to_numpy() == want["session_id"].to_numpy()).all()


def test_session_bounds(spark, pages, pages_pdf):
    got = (
        W.session_bounds(pages, "url", "warc_ts", 86400)
        .toPandas()
        .sort_values(["url", "session_id"], ignore_index=True)
    )
    o = oracle_sessionize(pages_pdf, "url", "warc_ts", 86400)
    want = (
        o.groupby(["url", "session_id"])
        .agg(
            session_start=("warc_ts", "min"),
            session_end=("warc_ts", "max"),
            n_snapshots=("warc_ts", "size"),
        )
        .reset_index()
        .sort_values(["url", "session_id"], ignore_index=True)
    )
    assert len(got) == len(want)
    assert (
        got["session_start"].astype("datetime64[us]").to_numpy()
        == want["session_start"].to_numpy()
    ).all()
    assert (got["n_snapshots"] == want["n_snapshots"]).all()


def test_backfill(spark, pages, pages_pdf):
    df = pages.withColumn("text_len", F.length("url").cast("double"))
    pdf = pages_pdf.copy()
    pdf["text_len"] = pdf["url"].str.len().astype(float)
    got = (
        W.backfill_grid(df, ["text_len"], "url", "warc_ts", "1 day")
        .toPandas()
        .sort_values(["url", "grid_ts"], ignore_index=True)
    )
    want = oracle_backfill(
        pdf, ["text_len"], "url", "warc_ts", pd.Timedelta(days=1)
    ).sort_values(["url", "grid_ts"], ignore_index=True)
    assert len(got) == len(want), (len(got), len(want))
    assert (
        got["grid_ts"].astype("datetime64[us]").to_numpy()
        == want["grid_ts"].to_numpy()
    ).all()
    assert (
        got["text_len"].to_numpy(float) == want["text_len"].to_numpy(float)
    ).all()
    assert (got["backfilled"] == want["backfilled"]).all()


def test_latest_snapshot(spark, pages, pages_pdf):
    got = (
        W.latest_snapshot(pages, "url", "warc_ts")
        .toPandas()
        .sort_values("url", ignore_index=True)
    )
    want = (
        pages_pdf.sort_values("warc_ts")
        .groupby("url", sort=True)
        .tail(1)
        .sort_values("url", ignore_index=True)
    )
    assert len(got) == CFG.n_urls
    assert (
        got["warc_ts"].astype("datetime64[us]").to_numpy()
        == want["warc_ts"].to_numpy()
    ).all()


def test_rolling(spark, pages):
    df = pages.withColumn("x", F.length("url").cast("double") + F.dayofmonth("warc_ts"))
    got = (
        W.with_rolling(df, "x", "url", "warc_ts", k=3)
        .toPandas()
        .sort_values(["url", "warc_ts"], ignore_index=True)
    )
    pdf = got[["url", "warc_ts", "x"]].copy()
    g = pdf.groupby("url", sort=False)["x"]
    want_mean = g.rolling(3, min_periods=1).mean().reset_index(drop=True)
    assert np.allclose(got["roll_mean_x"].to_numpy(), want_mean.to_numpy())
